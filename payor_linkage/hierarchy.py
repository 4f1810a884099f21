"""Parent/child hierarchy inference between golden records.

Two signals, as in `int_hierarchy_inferred.sql`:

- J5 ``name_ref_match`` (`:29-44`): a source record's non-empty
  ``parent_ref`` equals (upper/trim) another golden's ``payor_name``;
  the child is the record's own golden via xref. Executed as a
  *broadcast* of the golden name→id map into ``map_batches`` over the
  staged records (goldens are the post-merge entity set — small relative
  to input; SURVEY §2.4 J5).
- J6 ``name_substring`` (`:47-63`): golden parent name (len ≥ 6) is a
  substring of a strictly-longer golden child name. Executed with a
  broadcast 4-gram-prefix index over parent names: each child probes the
  index with its own 4-grams, then verifies real containment — O(len ×
  bucket) per child instead of the reference's O(G²) self-join.

Output mirrors `payor_hierarchy.sql`: relationship_type='parent_company',
steward_confirmed=false; hierarchy ids are uuid5 of
(parent|child|method) — deterministic, unlike the reference's
`uuid_string()`.
"""

from __future__ import annotations

import uuid
from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from payor_linkage.rayutil import smart_join

_H_NS = uuid.uuid5(uuid.NAMESPACE_DNS, "payor-linkage.hierarchy")


def _norm(s: str | None) -> str | None:
    return s.strip().upper() if s else None


def _signals_distributed(golden: Dataset, refs: Dataset) -> tuple[Dataset, Dataset]:
    """Shuffle-join variant of the two inference signals, used above the
    broadcast bound. Signal 1 is a plain equi-join on the normalized name;
    signal 2 re-expresses the 4-gram prefix index as an equi-join key:
    parent candidates key on `name[:4]`, children emit one probe row per
    4-gram window (bounded by name length), verify + distinct downstream.
    Partitioning assumption: gram keys are short and skew-bounded by the
    name-prefix distribution (same blocking family as `blocking.py`)."""
    def norm_names(b: pa.Table) -> pa.Table:
        n = pc.utf8_upper(pc.utf8_trim_whitespace(b["payor_name"]))
        t = pa.table({"g_name": n, "g_id": b["master_payor_id"]})
        return t.filter(pc.and_(pc.is_valid(n), pc.not_equal(n, "")))

    gnames = golden.select_columns(["master_payor_id", "payor_name"]).map_batches(
        norm_names, batch_format="pyarrow").materialize()

    # signal 1: normalized parent_ref ⋈ normalized golden name
    def norm_ref(b: pa.Table) -> pa.Table:
        return pa.table({
            "g_name": pc.utf8_upper(pc.utf8_trim_whitespace(b["parent_ref"])),
            "child_master_id": b["master_payor_id"]})

    j1 = smart_join(refs.map_batches(norm_ref, batch_format="pyarrow"),
                    gnames, "g_name")

    def emit1(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["g_id"], b["child_master_id"])
        m = b.filter(keep)
        return pa.table({
            "parent_master_id": m["g_id"],
            "child_master_id": m["child_master_id"],
            "inference_method": pa.array(
                ["name_ref_match"] * m.num_rows, pa.string())})

    s1 = j1.map_batches(emit1, batch_format="pyarrow")

    # signal 2: parents keyed by their 4-char prefix (len >= 6), children
    # probe every 4-gram window of their name
    def parent_side(b: pa.Table) -> pa.Table:
        m = b.filter(pc.greater_equal(pc.utf8_length(b["g_name"]), 6))
        return pa.table({"gram": pc.utf8_slice_codeunits(m["g_name"], 0, 4),
                         "p_name": m["g_name"], "parent_master_id": m["g_id"]})

    def child_side(b: pa.Table) -> pa.Table:
        grams, names, ids = [], [], []
        for cn, cid in zip(b["g_name"].to_pylist(), b["g_id"].to_pylist()):
            for i in range(len(cn) - 3):
                grams.append(cn[i:i + 4])
                names.append(cn)
                ids.append(cid)
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "c_name": pa.array(names, pa.string()),
                         "child_master_id": pa.array(ids, pa.string())})

    j2 = smart_join(gnames.map_batches(child_side, batch_format="pyarrow"),
                    gnames.map_batches(parent_side, batch_format="pyarrow"),
                    "gram")

    def emit2(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(b["parent_master_id"], b["child_master_id"]),
            pc.greater(pc.utf8_length(b["c_name"]),
                       pc.utf8_length(b["p_name"])))
        # containment needs a per-row pattern (no scalar-pattern kernel
        # applies) — the joined subset is already gram-blocked small
        cn = b["c_name"].to_pylist()
        pn = b["p_name"].to_pylist()
        contains = pa.array([p in c for p, c in zip(pn, cn)], pa.bool_())
        m = b.filter(pc.and_(keep, contains))
        return pa.table({
            "parent_master_id": m["parent_master_id"],
            "child_master_id": m["child_master_id"],
            "inference_method": pa.array(
                ["name_substring"] * m.num_rows, pa.string())})

    # a (parent, child) pair reached via several windows is deduped by the
    # caller's distinct union
    s2 = j2.map_batches(emit2, batch_format="pyarrow")
    return s1, s2


# above this many goldens the two broadcast lookup structures stop being
# "small" (multi-GB at ~10M names) — switch to the shuffle-join signals
BROADCAST_GOLDEN_BOUND = 2_000_000


def infer_hierarchy(golden: Dataset, unified: Dataset, xref: Dataset) -> Dataset:
    """golden + staged records + xref → inferred parent/child edge Dataset."""
    golden_slim = golden.select_columns(
        ["master_payor_id", "payor_name"]).materialize()

    # signal 1 input: parent_ref matches — stream over staged records
    refs = unified.select_columns(["source_record_id", "parent_ref"]).map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b["parent_ref"]),
                                   pc.not_equal(b["parent_ref"], ""))),
        batch_format="pyarrow").materialize()
    if refs.count() == 0:
        # no record carries a parent_ref (an entirely valid corpus class):
        # short-circuit — an empty filtered dataset can lose its schema,
        # which crashes any join it feeds
        import ray.data as rd

        refs = rd.from_arrow(pa.schema([
            ("source_record_id", pa.string()), ("parent_ref", pa.string()),
            ("master_payor_id", pa.string())]).empty_table())
    else:
        child_map = xref.select_columns(["source_record_id", "master_payor_id"])
        # smart_join (CLAUDE.md convention): the raw hash join crashes with
        # `ArrowInvalid: No match ... FieldRef` on empty partition blocks
        refs = smart_join(refs, child_map, "source_record_id")

    if golden_slim.count() > BROADCAST_GOLDEN_BOUND:
        # too many goldens to broadcast — shuffle-join signals instead
        s1, s2 = _signals_distributed(golden_slim, refs)
        return _distinct_finalize(s1, s2)

    # goldens are the merged entity set — collect the two small lookup
    # structures once and broadcast (ray.put), never re-shipped per batch
    gold = golden_slim.take_all()
    name_to_ids: dict[str, list[str]] = defaultdict(list)
    for r in gold:
        n = _norm(r["payor_name"])
        if n:
            name_to_ids[n].append(r["master_payor_id"])
    # 4-gram prefix index of parent-candidate names (len >= 6, `:59`)
    prefix_index: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for r in gold:
        n = _norm(r["payor_name"])
        if n and len(n) >= 6:
            prefix_index[n[:4]].append((n, r["master_payor_id"]))
    bcast = ray.put((dict(name_to_ids), dict(prefix_index)))

    def signal1(batch: pa.Table) -> pa.Table:
        names, _ = ray.get(bcast)
        parents, children = [], []
        for ref, child in zip(batch["parent_ref"].to_pylist(),
                              batch["master_payor_id"].to_pylist()):
            for pid in names.get(_norm(ref), ()):
                if pid != child:
                    parents.append(pid)
                    children.append(child)
        return pa.table({
            "parent_master_id": pa.array(parents, pa.string()),
            "child_master_id": pa.array(children, pa.string()),
            "inference_method": pa.array(["name_ref_match"] * len(parents), pa.string()),
        })

    s1 = refs.map_batches(signal1, batch_format="pyarrow")

    # signal 2: substring containment — stream over goldens as children
    def signal2(batch: pa.Table) -> pa.Table:
        _, index = ray.get(bcast)
        parents, children = [], []
        for child_name, child_id in zip(batch["payor_name"].to_pylist(),
                                        batch["master_payor_id"].to_pylist()):
            cn = _norm(child_name)
            if not cn:
                continue
            seen: set[str] = set()
            for i in range(len(cn) - 3):
                for pn, pid in index.get(cn[i:i + 4], ()):
                    if (pid != child_id and pid not in seen
                            and len(cn) > len(pn) and pn in cn):
                        seen.add(pid)
                        parents.append(pid)
                        children.append(child_id)
        return pa.table({
            "parent_master_id": pa.array(parents, pa.string()),
            "child_master_id": pa.array(children, pa.string()),
            "inference_method": pa.array(["name_substring"] * len(parents), pa.string()),
        })

    s2 = golden_slim.map_batches(signal2, batch_format="pyarrow")
    return _distinct_finalize(s1, s2)


def _distinct_finalize(s1: Dataset, s2: Dataset) -> Dataset:
    # distinct union (O3) + final shape (payor_hierarchy.sql)
    edges = s1.union(s2).groupby(
        ["parent_master_id", "child_master_id", "inference_method"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")

    def finalize(b: pa.Table) -> pa.Table:
        hids = [str(uuid.uuid5(_H_NS, f"{p}|{c}|{m}")) for p, c, m in zip(
            b["parent_master_id"].to_pylist(), b["child_master_id"].to_pylist(),
            b["inference_method"].to_pylist())]
        n = b.num_rows
        return pa.table({
            "hierarchy_id": pa.array(hids, pa.string()),
            "parent_master_id": b["parent_master_id"],
            "child_master_id": b["child_master_id"],
            "relationship_type": pa.array(["parent_company"] * n, pa.string()),
            "source": b["inference_method"],
            "steward_confirmed": pa.array([False] * n, pa.bool_()),
        })

    return edges.map_batches(finalize, batch_format="pyarrow")

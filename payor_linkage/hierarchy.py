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

import numpy as np
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


def _signal_structures(golden_tbl: pa.Table, parent_filter=None):
    """The two broadcast lookup structures as PARALLEL ARROW ARRAYS
    (probed with ``pc.index_in`` — never a per-row Python dict lookup),
    optionally restricted to a parent-id subset:

    - name map: sorted unique normalized names + (start, count) into a
      flat golden-id array (signal 1);
    - 4-gram prefix index of parent-candidate names (len ≥ 6): sorted
      unique prefixes + (start, count) into flat (name, id, len) arrays
      (signal 2)."""
    names = pc.utf8_upper(pc.utf8_trim_whitespace(
        golden_tbl["payor_name"]))
    ids = golden_tbl["master_payor_id"]
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    valid = pc.and_(pc.is_valid(names), pc.not_equal(names, ""))
    if parent_filter is not None:
        valid = pc.and_(valid, pc.is_in(ids, value_set=parent_filter))
    valid = valid.fill_null(False)
    names = names.filter(valid)
    ids = ids.filter(valid)

    def runs_of(sorted_keys):
        codes = sorted_keys.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        if len(codes) == 0:
            return np.array([], np.int64), np.array([], np.int64)
        first = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(codes)))
        return starts, counts

    order = pc.sort_indices(names)
    sn, sid = names.take(order), ids.take(order)
    key_starts, key_counts = runs_of(sn)
    keys = sn.take(pa.array(key_starts))

    plen_all = pc.utf8_length(names).to_numpy(zero_copy_only=False)
    pmask = pa.array(plen_all >= 6)
    pnames, pids = names.filter(pmask), ids.filter(pmask)
    plens = plen_all[plen_all >= 6]
    prefixes = pc.utf8_slice_codeunits(pnames, 0, 4)
    porder = pc.sort_indices(prefixes)
    sp = prefixes.take(porder)
    p_starts, p_counts = runs_of(sp)
    return {
        "keys": keys, "key_starts": key_starts, "key_counts": key_counts,
        "flat_ids": sid,
        "pkeys": sp.take(pa.array(p_starts)) if len(p_starts) else
            pa.array([], pa.string()),
        "p_starts": p_starts, "p_counts": p_counts,
        "flat_pnames": pnames.take(porder),
        "flat_pids": pids.take(porder),
        "flat_plens": plens[porder.to_numpy(zero_copy_only=False)]
            if len(plens) else np.array([], np.int64),
    }


def _expand_hits(idx: np.ndarray, starts: np.ndarray,
                 counts: np.ndarray):
    """For probe rows whose ``pc.index_in`` produced key index ``idx``
    (−1 = miss): flat positions into the index's value arrays plus the
    probe-row index each position belongs to — pure repeat/arange
    arithmetic."""
    hits = np.flatnonzero(idx >= 0)
    k = idx[hits]
    cnt = counts[k]
    total = int(cnt.sum())
    if total == 0:
        return np.array([], np.int64), np.array([], np.int64)
    probe_row = np.repeat(hits, cnt)
    base = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    pos = np.repeat(starts[k], cnt)         + (np.arange(total, dtype=np.int64) - np.repeat(base, cnt))
    return probe_row, pos


def _probe_parent_refs(batch: pa.Table, s, child_col: str) -> pa.Table:
    """Signal-1 probe core: parent_ref equality against the broadcast
    parent-name map → one hit row per (parent entry, probing row),
    carrying ``child_col`` from the batch (the child's golden id on the
    full path; the raw source_record_id on the incremental
    probe-then-attach path, where the child golden is joined AFTER this
    delta-bounded hit set is known). No self-edge filter here — the
    caller applies it once child ids are attached."""
    out = pa.schema([("parent_master_id", pa.string()),
                     (child_col, pa.string())])
    if batch.num_rows == 0 or len(s["keys"]) == 0:
        return out.empty_table()
    rn = pc.utf8_upper(pc.utf8_trim_whitespace(batch["parent_ref"]))
    if isinstance(rn, pa.ChunkedArray):
        rn = rn.combine_chunks()
    idx = pc.index_in(rn, value_set=s["keys"]).fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    probe_row, pos = _expand_hits(idx, s["key_starts"], s["key_counts"])
    if len(pos) == 0:
        return out.empty_table()
    child = batch[child_col].combine_chunks().take(pa.array(probe_row))
    parents = s["flat_ids"].take(pa.array(pos))
    return pa.table({"parent_master_id": parents, child_col: child})


def _signal1_tbl(batch: pa.Table, s) -> pa.Table:
    """Signal-1 (parent_ref equality) over one batch/table against a
    ``_signal_structures`` struct — shared by the distributed probe and
    the incremental driver-local path."""
    hits = _probe_parent_refs(batch, s, "master_payor_id")
    keep = pc.not_equal(hits["parent_master_id"],
                        hits["master_payor_id"])
    hits = hits.filter(keep)
    return pa.table({
        "parent_master_id": hits["parent_master_id"],
        "child_master_id": hits["master_payor_id"],
        "inference_method": pa.array(
            ["name_ref_match"] * hits.num_rows, pa.string())})


def _signal2_tbl(batch: pa.Table, s) -> pa.Table:
    """Signal-2 (name-substring containment, 4-gram blocked) over one
    batch/table against a ``_signal_structures`` struct — shared by the
    distributed probe and the incremental driver-local path."""
    out = pa.schema([("parent_master_id", pa.string()),
                     ("child_master_id", pa.string()),
                     ("inference_method", pa.string())])
    if batch.num_rows == 0 or len(s["pkeys"]) == 0:
        return out.empty_table()
    cn = pc.utf8_upper(pc.utf8_trim_whitespace(batch["payor_name"]))
    if isinstance(cn, pa.ChunkedArray):
        cn = cn.combine_chunks()
    valid = pc.and_(pc.is_valid(cn), pc.not_equal(cn, ""))             .fill_null(False)
    cn = cn.filter(valid)
    cid = batch["master_payor_id"].combine_chunks().filter(valid)
    if len(cn) == 0:
        return out.empty_table()
    nchars = pc.utf8_length(cn).to_numpy(zero_copy_only=False)             .astype(np.int64)
    nbytes = pc.binary_length(cn).to_numpy(zero_copy_only=False)             .astype(np.int64)
    counts = np.maximum(nchars - 3, 0)
    total = int(counts.sum())
    if total == 0:
        return out.empty_table()
    parent_row = np.repeat(np.arange(len(cn), dtype=np.int64),
                           counts)
    if (nchars == nbytes).all() and not pa.types.is_large_string(
            cn.type):
        off = np.frombuffer(cn.buffers()[1], dtype=np.int32,
                            count=len(cn) + 1,
                            offset=cn.offset * 4).astype(np.int64)
        data = np.frombuffer(cn.buffers()[2], dtype=np.uint8)
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) \
            - np.repeat(cum, counts)
        starts = off[:-1][parent_row] + within
        win = np.lib.stride_tricks.sliding_window_view(
            data, 4)[starts]
        new_off = (np.arange(total + 1, dtype=np.int32) * 4)
        grams = pa.StringArray.from_buffers(
            total, pa.py_buffer(new_off.tobytes()),
            pa.py_buffer(win.tobytes()))
    else:
        texts = cn.to_pylist()
        grams = pa.array(
            [t[w:w + 4] for t, c in zip(texts, counts)
             for w in range(int(c))], pa.string())
    gidx = pc.index_in(grams, value_set=s["pkeys"]).fill_null(-1)             .to_numpy(zero_copy_only=False).astype(np.int64)
    probe_pos, pos = _expand_hits(gidx, s["p_starts"],
                                  s["p_counts"])
    if len(pos) == 0:
        return out.empty_table()
    child_row = parent_row[probe_pos]
    # dedupe (child, parent-entry) pairs reached via several windows
    pair_key = child_row * (len(s["flat_pids"]) + 1) + pos
    _, uix = np.unique(pair_key, return_index=True)
    child_row, pos = child_row[uix], pos[uix]
    # cheap vectorized pre-filters: strictly longer child, id differs
    lens_ok = nchars[child_row] > s["flat_plens"][pos]
    child_row, pos = child_row[lens_ok], pos[lens_ok]
    c_ids = cid.take(pa.array(child_row))
    p_ids = s["flat_pids"].take(pa.array(pos))
    differ = pc.not_equal(p_ids, c_ids).to_numpy(
        zero_copy_only=False)
    child_row, pos = child_row[differ], pos[differ]
    if len(pos) == 0:
        return out.empty_table()
    # containment verify — Python only on the gram-blocked
    # candidates (no scalar-pattern kernel takes per-row patterns)
    c_txt = cn.take(pa.array(child_row)).to_pylist()
    p_txt = s["flat_pnames"].take(pa.array(pos)).to_pylist()
    ok = np.fromiter((p in c for p, c in zip(p_txt, c_txt)),
                     dtype=bool, count=len(p_txt))
    child_row, pos = child_row[ok], pos[ok]
    return pa.table({
        "parent_master_id": s["flat_pids"].take(pa.array(pos)),
        "child_master_id": cid.take(pa.array(child_row)),
        "inference_method": pa.array(
            ["name_substring"] * len(pos), pa.string())})



def _broadcast_signals(refs: Dataset, children: Dataset, bcast) -> tuple:
    """Signal datasets against broadcast ``_signal_structures``:
    s1 = parent_ref equality over ``refs`` rows, s2 = substring
    containment probed with ``children`` golden rows. Both probes are
    one ``pc.index_in`` + repeat/arange expansion per batch; Python
    touches only signal 2's verified-candidate containment check
    (gram-blocked — a handful of rows). Non-ASCII names fall back to
    codepoint slicing for window extraction only (normalization is the
    same Arrow kernel either way)."""
    def signal1(batch: pa.Table) -> pa.Table:
        return _signal1_tbl(batch, ray.get(bcast))

    def signal2(batch: pa.Table) -> pa.Table:
        return _signal2_tbl(batch, ray.get(bcast))
    return (refs.map_batches(signal1, batch_format="pyarrow"),
            children.map_batches(signal2, batch_format="pyarrow"))


def _refs_with_child(unified: Dataset, xref: Dataset) -> Dataset:
    """Staged records carrying a non-empty parent_ref, joined to their
    golden id (the signal-1 input surface)."""
    refs = unified.select_columns(
        ["source_record_id", "parent_ref"]).map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b["parent_ref"]),
                                   pc.not_equal(b["parent_ref"], ""))),
        batch_format="pyarrow").materialize()
    if refs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema([
            ("source_record_id", pa.string()), ("parent_ref", pa.string()),
            ("master_payor_id", pa.string())]).empty_table())
    child_map = xref.select_columns(["source_record_id", "master_payor_id"])
    return smart_join(refs, child_map, "source_record_id")


def _gold_slim_block(t: pa.Table) -> pa.Table | None:
    """(master_payor_id, payor_name) projection of one golden block —
    scatter_blocks kernel for the patch path's broadcast map build."""
    if t.num_rows == 0 or "master_payor_id" not in t.column_names:
        return None
    return t.select(["master_payor_id", "payor_name"])


def _refs_probe_block(t: pa.Table, aff_maps) -> pa.Table | None:
    """One unified block → parent_ref rows probed against the
    affected-parent maps (signal-1b hits) — scatter_blocks kernel
    fusing the refs filter and the probe into a single raw-task pass."""
    if t.num_rows == 0 or "parent_ref" not in t.column_names:
        return None
    b = t.select(["source_record_id", "parent_ref"])
    b = b.filter(pc.and_(pc.is_valid(b["parent_ref"]),
                         pc.not_equal(b["parent_ref"], "")))
    return _probe_parent_refs(b, aff_maps, "source_record_id")


def _xref_slim_hit_block(t: pa.Table, hid) -> pa.Table | None:
    """One xref block restricted to hit record ids, slimmed to the
    (record, golden) map — scatter_blocks kernel."""
    if t.num_rows == 0 or "source_record_id" not in t.column_names:
        return None
    b = t.filter(pc.is_in(t["source_record_id"], value_set=hid))
    return b.select(["source_record_id", "master_payor_id"])


def _unaffected_edges_block(t: pa.Table, aff) -> pa.Table | None:
    """One prior-hierarchy block restricted to edges with BOTH
    endpoints unaffected — scatter_blocks kernel for the kept side."""
    if t.num_rows == 0 or "parent_master_id" not in t.column_names:
        return None
    keep = pc.and_(
        pc.invert(pc.is_in(t["parent_master_id"], value_set=aff)),
        pc.invert(pc.is_in(t["child_master_id"], value_set=aff)))
    return t.filter(keep)


def patch_hierarchy(golden: Dataset, unified: Dataset, xref: Dataset,
                    prior_hierarchy: Dataset, affected_ids,
                    local_sub: tuple | None = None) -> Dataset:
    """Incremental hierarchy maintenance: recompute ONLY edges with at
    least one endpoint in ``affected_ids`` (new or member-changed
    goldens), keep prior edges between two unaffected goldens verbatim
    — exact, because an edge's signals read only its two endpoints (and
    a new record's child golden is itself affected).

    Four restricted probes: affected children vs the full maps, and all
    rows vs maps restricted to affected parents (small index → small
    buckets); recomputed edges dedup through the same distinct-finalize
    as a full run, so ids are byte-identical. Falls back to a full
    recompute above the broadcast bound.

    No corpus-wide join anywhere: the signal-1 inputs are built
    probe-first — (a) for affected CHILDREN, the xref slice for
    affected goldens (delta-bounded) selects its ref rows by broadcast
    id filter and attaches the child golden with a bounded lookup_join;
    (b) for affected PARENTS, all parent_ref rows stream through the
    affected-parent probe FIRST (map-only, 2 columns) and only the
    delta-bounded HITS get their child golden attached. Probe-then-
    attach ≡ attach-then-probe because the probe never reads the child
    id; the self-edge filter runs post-attach as in a full run."""
    from payor_linkage.rayutil import lookup_join, scatter_blocks

    golden_slim = None
    if local_sub is not None:
        # golden is a materialized patched table — project its blocks
        # with raw tasks instead of launching a select stage
        n_gold = golden.count()
    else:
        golden_slim = golden.select_columns(
            ["master_payor_id", "payor_name"]).materialize()
        n_gold = golden_slim.count()
    if n_gold > BROADCAST_GOLDEN_BOUND or not len(affected_ids):
        return infer_hierarchy(golden, unified, xref)

    aff_pa = pa.array(sorted(set(affected_ids)), pa.string())
    aff_arr = ray.put(aff_pa)
    if golden_slim is not None:
        gold_tbl = pa.concat_tables(
            ray.get(golden_slim.to_arrow_refs()),
            promote_options="default").combine_chunks()
    else:
        gold_tbl = scatter_blocks(
            golden, _gold_slim_block,
            schema=pa.schema([("master_payor_id", pa.string()),
                              ("payor_name", pa.string())]))

    def only_aff(col):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[col], value_set=ray.get(aff_arr)))
        return f

    refs_raw = unified.select_columns(
        ["source_record_id", "parent_ref"]).map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b["parent_ref"]),
                                   pc.not_equal(b["parent_ref"], ""))),
        batch_format="pyarrow")

    # (a) refs whose CHILD golden is affected. With ``local_sub`` (the
    # pipeline's driver-built delta tables: the affected-member unified
    # slice, the rebuilt golden rows, the rebuilt xref rows) every
    # delta-bounded signal leg runs as driver Arrow kernels — the
    # patched xref/golden restricted to ``affected_ids`` ARE the
    # rebuilt rows (dropped prior ids no longer exist in the patched
    # tables), so no corpus scan is needed to derive them.
    full_maps_s = _signal_structures(gold_tbl)
    aff_maps_s = _signal_structures(gold_tbl, parent_filter=aff_pa)
    full_maps = ray.put(full_maps_s)
    aff_maps = ray.put(aff_maps_s)
    s1a_tbl = s2a_tbl = s2b_tbl = None
    if local_sub is not None:
        from payor_linkage.survivorship import _attach_by_key

        unified_tbl, golden_sub_tbl, xref_sub_tbl = local_sub
        refs_tbl = unified_tbl.select(["source_record_id", "parent_ref"])
        rmask = pc.and_(pc.is_valid(refs_tbl["parent_ref"]),
                        pc.not_equal(refs_tbl["parent_ref"], ""))
        refs_tbl = refs_tbl.filter(rmask)
        refs_aff_tbl = _attach_by_key(
            refs_tbl, xref_sub_tbl.select(
                ["source_record_id", "master_payor_id"]),
            on="source_record_id")
        children_aff_tbl = golden_sub_tbl.select(
            ["master_payor_id", "payor_name"])
        s1a_tbl = _signal1_tbl(refs_aff_tbl, full_maps_s)
        s2a_tbl = _signal2_tbl(children_aff_tbl, full_maps_s)
        # (c) FULL golden names vs affected-parent maps — gold_tbl is
        # already on the driver
        s2b_tbl = _signal2_tbl(gold_tbl, aff_maps_s)
    else:
        xref_sub = xref.map_batches(only_aff("master_payor_id"),
                                    batch_format="pyarrow").select_columns(
            ["source_record_id", "master_payor_id"]).materialize()
        sid_tbl = pa.concat_tables(ray.get(xref_sub.to_arrow_refs()),
                                   promote_options="default")
        sid_ref = ray.put(sid_tbl["source_record_id"].combine_chunks())

        def only_sub_ids(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["source_record_id"],
                                     value_set=ray.get(sid_ref)))

        refs_aff = lookup_join(
            refs_raw.map_batches(only_sub_ids, batch_format="pyarrow"),
            xref_sub, on="source_record_id")
        children_aff = golden_slim.map_batches(only_aff("master_payor_id"),
                                               batch_format="pyarrow")

        s1a, s2a = _broadcast_signals(refs_aff, children_aff, full_maps)

    # (b) ALL refs vs affected parents: probe first (map-only), attach
    # the child golden only for the delta-bounded hits. Local path:
    # one raw-task scatter fuses the refs filter + probe per block.
    hits = htbl = None
    if local_sub is not None:
        htbl = scatter_blocks(unified, _refs_probe_block, aff_maps_s)
    else:
        hits = refs_raw.map_batches(
            lambda b: _probe_parent_refs(b, ray.get(aff_maps),
                                         "source_record_id"),
            batch_format="pyarrow").materialize()
    import ray.data as rd

    def finish_s1b(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["parent_master_id"],
                            b["master_payor_id"])
        b = b.filter(keep)
        return pa.table({
            "parent_master_id": b["parent_master_id"],
            "child_master_id": b["master_payor_id"],
            "inference_method": pa.array(
                ["name_ref_match"] * b.num_rows, pa.string())})

    s1b_tbl = _EDGE_SCHEMA.empty_table()
    s1b = None
    if local_sub is not None:
        if htbl is not None and htbl.num_rows:
            # hits are already in hand — pull the delta-bounded child
            # map with one more scatter and finish driver-side
            hid = pc.unique(htbl["source_record_id"].combine_chunks())
            cm_tbl = scatter_blocks(
                xref, _xref_slim_hit_block, hid,
                schema=pa.schema([("source_record_id", pa.string()),
                                  ("master_payor_id", pa.string())]))
            from payor_linkage.survivorship import _attach_by_key

            s1b_tbl = finish_s1b(_attach_by_key(
                htbl, cm_tbl, on="source_record_id"))
    elif hits.count():
        htbl = pa.concat_tables(ray.get(hits.to_arrow_refs()),
                                promote_options="default")
        hid_ref = ray.put(pc.unique(
            htbl["source_record_id"].combine_chunks()))

        def only_hit_ids(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["source_record_id"],
                                     value_set=ray.get(hid_ref)))

        child_map = xref.map_batches(
            only_hit_ids, batch_format="pyarrow").select_columns(
            ["source_record_id", "master_payor_id"])
        joined = lookup_join(hits, child_map, on="source_record_id")
        s1b = joined.map_batches(finish_s1b, batch_format="pyarrow")
    if local_sub is not None:
        # kept edges scatter too, and the whole patched table returns
        # as ONE combined block — prior_hierarchy is delta-small and
        # the downstream materialize becomes a no-op
        recomputed_tbl = _distinct_finalize_tbl(
            [s1a_tbl, s1b_tbl, s2a_tbl, s2b_tbl])
        kept_tbl = scatter_blocks(prior_hierarchy,
                                  _unaffected_edges_block, aff_pa,
                                  schema=recomputed_tbl.schema)
        return rd.from_arrow(pa.concat_tables(
            [kept_tbl, recomputed_tbl],
            promote_options="default").combine_chunks())
    else:
        if s1b is None:
            s1b = rd.from_arrow(_EDGE_SCHEMA.empty_table())
        refs_none = rd.from_arrow(pa.schema(
            [("source_record_id", pa.string()), ("parent_ref", pa.string()),
             ("master_payor_id", pa.string())]).empty_table())
        _, s2b = _broadcast_signals(refs_none, golden_slim, aff_maps)
        from payor_linkage.cluster import INCR_LOCAL_ROWS_BOUND

        recomputed = _distinct_finalize(s1a.union(s1b), s2a.union(s2b),
                                        local_rows_bound=INCR_LOCAL_ROWS_BOUND)

    def both_unaffected(b: pa.Table) -> pa.Table:
        a = ray.get(aff_arr)
        keep = pc.and_(
            pc.invert(pc.is_in(b["parent_master_id"], value_set=a)),
            pc.invert(pc.is_in(b["child_master_id"], value_set=a)))
        return b.filter(keep)

    kept = prior_hierarchy.map_batches(both_unaffected,
                                       batch_format="pyarrow")
    return kept.union(recomputed)


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
    # structures once (parallel Arrow arrays) and broadcast (ray.put),
    # never re-shipped per batch; probes are vectorized index_in scans
    gold_tbl = pa.concat_tables(
        ray.get(golden_slim.to_arrow_refs()),
        promote_options="default").combine_chunks()
    bcast = ray.put(_signal_structures(gold_tbl))
    s1, s2 = _broadcast_signals(refs, golden_slim, bcast)
    return _distinct_finalize(s1, s2)


_EDGE_SCHEMA = pa.schema([("parent_master_id", pa.string()),
                          ("child_master_id", pa.string()),
                          ("inference_method", pa.string())])


def _edge_keyed(b: pa.Table) -> pa.Table:
    return b.append_column("__k", pc.binary_join_element_wise(
        b["parent_master_id"], b["child_master_id"],
        b["inference_method"], "|"))


def _edge_firsts(b: pa.Table, starts, ends) -> pa.Table:
    return b.take(pa.array(np.asarray(starts, dtype=np.int64))) \
        .select(["parent_master_id", "child_master_id",
                 "inference_method"])


def _edge_finalize(b: pa.Table) -> pa.Table:
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


def _distinct_finalize_tbl(tbls: list) -> pa.Table:
    """Driver-local distinct union + final shape over in-memory signal
    tables (the incremental patch path) — same keyed/first/uuid5 kernels
    as ``_distinct_finalize``, zero Ray stages."""
    from payor_linkage.rayutil import local_grouped_runs

    parts = [t for t in tbls if t.num_rows]
    if not parts:
        return _edge_finalize(_EDGE_SCHEMA.empty_table())
    u = _edge_keyed(pa.concat_tables(parts, promote_options="default")
                    .combine_chunks())
    edges = local_grouped_runs(u, "__k", _EDGE_SCHEMA,
                               runs_fn=_edge_firsts,
                               scatter_above_rows=0)
    return _edge_finalize(edges)


def _distinct_finalize(s1: Dataset, s2: Dataset,
                       local_rows_bound: int = 0) -> Dataset:
    # distinct union (O3) + final shape (payor_hierarchy.sql) — one
    # synthetic-key grouped_apply (sort + run-first slicing) instead of
    # groupby().map_groups: Ray's sort fans one reduce partition per
    # input block, and the patch path unions four many-block signal
    # datasets (observed 138 s of pure task overhead on a 5k-row edge
    # set at sf0.01 before this)
    from payor_linkage.rayutil import grouped_apply

    edges = grouped_apply(
        s1.union(s2).map_batches(_edge_keyed, batch_format="pyarrow"),
        "__k", out_schema=_EDGE_SCHEMA, runs_fn=_edge_firsts,
        local_rows_bound=local_rows_bound)

    return edges.map_batches(_edge_finalize, batch_format="pyarrow")

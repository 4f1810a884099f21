"""Survivorship + golden-record construction.

One ``groupby(match_group_id).map_groups`` pass computes every
survivorship rule and the golden metrics (SURVEY §2.8):

- A1 source_priority  — first non-null by source_trust_rank asc
  (`int_survivorship.sql:22-53`); ties broken by source_record_id (the
  reference's window is order-nondeterministic on ties — we pin it)
- A2 cms_priority     — cms_reference first, then trust+10 (`:57-73`)
- A3 most_recent      — first non-null by loaded_at desc nulls last (`:76-108`)
- A4 most_complete    — longest non-empty payor_name_alt (`:111-121`)
- A5 any_true         — BOOLOR_AGG(is_active) (`:124-133`)
- A6 earliest/latest  — MIN(effective_date) / MAX(termination_date) (`:136-146`)
- A7 rules-as-data    — the rule per field comes from SurvivorshipConfig
  (the reference seeds a config table but hard-codes the rules inline,
  `07_seed_survivorship_config.sql` vs the dbt model; we actually
  dispatch on it). The full declared vocabulary
  (`05_create_master_tables.sql:96-98`) is implemented: source_priority,
  most_recent, most_complete, most_frequent, any_true, any_non_null,
  earliest, latest, manual.
- A8 source_count, A9 confidence_score, A10 completeness_score
  (`golden_payors.sql:22-71`)

The golden row carries the *survivor document's spans verbatim*
(span-sequence fidelity invariant — the engine never rebuilds spans).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
from ray.data import Dataset

from payor_linkage.rayutil import lookup_join
from payor_linkage.schema import COMPLETENESS_FIELDS, GOLDEN_FIELDS, GOLDEN_SCHEMA


@dataclass
class SurvivorshipConfig:
    """Per-field rule_type — editable without code changes (reference's
    SURVIVORSHIP_CONFIG design, `05_create_master_tables.sql:93-110`)."""

    rules: dict[str, str] = field(default_factory=lambda: {
        "payor_name": "source_priority",
        "tax_id": "source_priority",
        "npi": "source_priority",
        "website": "source_priority",
        "payor_type": "source_priority",
        "line_of_business": "source_priority",
        "cms_plan_id": "cms_priority",
        "address_line_1": "most_recent",
        "address_line_2": "most_recent",
        "city": "most_recent",
        "state_code": "most_recent",
        "zip_code": "most_recent",
        "phone": "most_recent",
        "payor_name_alt": "most_complete",
        "is_active": "any_true",
        "effective_date": "earliest",
        "termination_date": "latest",
    })


def _first_non_null(vals: list, order) -> object:
    for i in order:
        v = vals[i]
        if v is not None:
            return v
    return None


def _apply_rule(rule: str, cols: dict, col: str,
                trust_order: list, recent_order: list):
    """One survivorship rule over one group's plain-python column lists."""
    vals = cols[col]
    if rule == "source_priority":
        return _first_non_null(vals, trust_order)
    if rule == "cms_priority":
        # cms_reference outranks everything, then trust+10 (`:63`)
        n = len(vals)
        order = sorted(range(n), key=lambda i: (
            1 if cols["source_system"][i] == "cms_reference"
            else (cols["source_trust_rank"][i] or 0) + 10,
            cols["source_record_id"][i]))
        return _first_non_null(vals, order)
    if rule == "most_recent":
        return _first_non_null(vals, recent_order)
    if rule == "most_complete":
        cand = [str(v) for v in vals if v is not None and str(v).strip() != ""]
        if not cand:
            return None
        mx = max(len(c) for c in cand)
        return sorted(c for c in cand if len(c) == mx)[0]  # deterministic tie
    if rule == "most_frequent":
        from collections import Counter

        nn = [v for v in vals if v is not None]
        if not nn:
            return None
        counts = Counter(nn)
        mx = max(counts.values())
        return sorted(k for k, c in counts.items() if c == mx)[0]
    if rule == "any_true":
        nn = [v for v in vals if v is not None]
        return any(nn) if nn else None
    if rule == "any_non_null":
        return _first_non_null(vals, trust_order)
    if rule == "earliest":
        nn = [v for v in vals if v is not None]
        return min(nn) if nn else None
    if rule == "latest":
        nn = [v for v in vals if v is not None]
        return max(nn) if nn else None
    if rule == "manual":
        return None  # steward-only field: never auto-populated
    raise ValueError(f"unknown survivorship rule: {rule}")


_GOLDEN_JSON_SCHEMA = pa.schema(
    [f if f.name != "spans" else pa.field("spans_json", pa.string())
     for f in GOLDEN_SCHEMA])

_GROUP_COLS = ["match_group_id", "source_record_id", "source_system",
               "source_trust_rank", "is_survivor", "group_confidence",
               "loaded_us", "spans_json"] + GOLDEN_FIELDS


def make_golden_fn(cfg: SurvivorshipConfig):
    """Group fn in pyarrow batch format with plain-python rule logic —
    groups are tiny (a handful of source records), so python beats
    pandas-per-group by an order of magnitude."""
    rules = cfg.rules

    def golden_for_group(g: pa.Table) -> pa.Table:
        cols = {c: g[c].to_pylist() for c in _GROUP_COLS if c in g.column_names}
        n = g.num_rows
        rid = cols["source_record_id"]
        trust = cols["source_trust_rank"]
        trust_order = sorted(range(n), key=lambda i: (trust[i] or 999, rid[i]))
        loaded = cols["loaded_us"]
        recent_order = sorted(range(n), key=lambda i: (
            loaded[i] is None,
            -loaded[i] if loaded[i] is not None else 0,
            rid[i]))

        out = {"master_payor_id": cols["match_group_id"][0]}
        for col in GOLDEN_FIELDS:
            out[col] = _apply_rule(rules[col], cols, col, trust_order, recent_order)

        # A10 completeness over the 15 named fields, round 4
        nn = sum(1 for c in COMPLETENESS_FIELDS if out[c] is not None)
        out["completeness_score"] = round(nn / 15.0, 4)
        # A8 distinct source systems
        out["source_count"] = len(set(cols["source_system"]))
        # A9 avg(coalesce(group_confidence, 1.0)) — constant per group
        conf = cols["group_confidence"][0]
        out["confidence_score"] = float(conf) if conf is not None else 1.0

        # survivor's spans verbatim (fidelity invariant, byte-carried JSON)
        surv = cols["is_survivor"]
        si = next((i for i in range(n) if surv[i]), 0)
        out["survivor_record_id"] = rid[si]
        out["spans_json"] = cols.get("spans_json", [None] * n)[si]

        return pa.Table.from_arrays(
            [pa.array([out.get(f.name)], type=f.type) for f in _GOLDEN_JSON_SCHEMA],
            schema=_GOLDEN_JSON_SCHEMA)

    return golden_for_group


# rules the vectorized election kernel handles — each is "first value
# under a per-rule sort order", so the whole election becomes Arrow
# multi-key sorts + one np.minimum.reduceat per column (no boxing).
# most_frequent (mode) is the one declared rule without a first-by-order
# form; a config using it falls back to the python kernel.
_VECTOR_RULES = {"source_priority", "cms_priority", "most_recent",
                 "most_complete", "any_true", "any_non_null",
                 "earliest", "latest", "manual"}


def make_golden_runs_vec(cfg: SurvivorshipConfig, with_spans: bool = True):
    """Vectorized election kernel — byte-identical to the python kernel
    (``_make_golden_runs_py``, equality pytest-gated) for every rule in
    ``_VECTOR_RULES``.

    Key identity: every supported rule elects "the first valid value
    under some total order": source_priority/any_non_null by
    (trust-or-999, rid), cms_priority by (cms-first, trust+10, rid),
    most_recent by (loaded desc nulls-last, rid), most_complete by
    (len desc, value asc) over non-empty candidates, any_true by
    (value desc) — the first valid IS any(), earliest/latest by
    (value asc/desc). So the kernel computes one Arrow sort permutation
    per order and, per column, the first valid row per group via a
    masked ``np.minimum.reduceat`` — zero per-group python, zero
    ``to_pylist`` boxing (measured 11.9 s → sub-second single-thread at
    409k members / 112k groups)."""
    import numpy as np

    rules = cfg.rules
    schema = (_GOLDEN_JSON_SCHEMA if with_spans else
              pa.schema([f for f in _GOLDEN_JSON_SCHEMA if f.name != "spans_json"]))
    py_fn = None  # lazy fallback for non-string most_complete columns

    def golden_runs(b: pa.Table, starts, ends) -> pa.Table:
        nonlocal py_fn
        import pyarrow.compute as pc

        if len(starts) == 0:
            return schema.empty_table()
        for col, rule in rules.items():
            if rule == "most_complete" and col in b.column_names \
                    and not pa.types.is_string(b.schema.field(col).type):
                # str(v)/len(v) on non-string types has python semantics
                # the Arrow path can't reproduce — use the exact kernel
                if py_fn is None:
                    py_fn = _make_golden_runs_py(cfg, with_spans)
                return py_fn(b, starts, ends)
        starts = np.asarray(starts, np.int64)
        ends = np.asarray(ends, np.int64)
        off = int(starts[0])
        n = int(ends[-1]) - off
        if off or int(ends[-1]) != b.num_rows:
            b = b.slice(off, n)
            starts = starts - off
            ends = ends - off
        b = b.combine_chunks()
        ng = len(starts)
        idx_np = np.arange(n, dtype=np.int64)
        seg = np.zeros(n, np.int64)
        seg[starts] = 1
        seg_pa = pa.array(np.cumsum(seg) - 1)
        starts_pa = pa.array(starts)

        rid = b["source_record_id"].combine_chunks()
        trust = b["source_trust_rank"].combine_chunks()

        def perm_of(*keys) -> np.ndarray:
            cols = {"__s": seg_pa}
            sort_keys = [("__s", "ascending")]
            for i, (arr, order) in enumerate(keys):
                cols[f"__k{i}"] = arr
                sort_keys.append((f"__k{i}", order))
            return pc.sort_indices(
                pa.table(cols), sort_keys=sort_keys,
                null_placement="at_end").to_numpy().astype(np.int64)

        def first_rows(perm: np.ndarray, valid_np: np.ndarray) -> np.ndarray:
            # per group: original-domain row of the first valid value
            # under `perm`, or -1 when the group has none
            pos = np.where(valid_np[perm], idx_np, n)
            firsts = np.minimum.reduceat(pos, starts)
            return np.where(firsts < n, perm[np.minimum(firsts, n - 1)], -1)

        def take_rows(col, rows: np.ndarray):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return col.take(pa.array(rows, pa.int64(), mask=rows < 0))

        def valid_np_of(col) -> np.ndarray:
            v = pc.is_valid(col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return v.to_numpy(zero_copy_only=False)

        # shared order permutations
        tz = pc.fill_null(trust, 0)
        trust_key = pc.if_else(pc.equal(tz, 0), pa.scalar(999, tz.type), tz)
        perm_trust = perm_of((trust_key, "ascending"), (rid, "ascending"))
        perm_cms = perm_recent = None
        if "cms_priority" in rules.values():
            ss = b["source_system"].combine_chunks()
            cms_key = pc.if_else(
                pc.equal(ss, "cms_reference"),
                pa.scalar(1, tz.type), pc.add(tz, pa.scalar(10, tz.type)))
            perm_cms = perm_of((cms_key, "ascending"), (rid, "ascending"))
        if "most_recent" in rules.values():
            loaded = b["loaded_us"].combine_chunks()
            lnull = pc.is_null(loaded)
            neg = pc.multiply(pc.fill_null(loaded, 0),
                              pa.scalar(-1, pa.int64()))
            perm_recent = perm_of((lnull, "ascending"), (neg, "ascending"),
                                  (rid, "ascending"))

        out = {"master_payor_id": b["match_group_id"].combine_chunks()
               .take(starts_pa)}
        for col in GOLDEN_FIELDS:
            rule = rules[col]
            c = b[col].combine_chunks()
            if rule == "manual":
                out[col] = pa.nulls(ng, c.type)
                continue
            if rule in ("source_priority", "any_non_null"):
                rows = first_rows(perm_trust, valid_np_of(c))
            elif rule == "cms_priority":
                rows = first_rows(perm_cms, valid_np_of(c))
            elif rule == "most_recent":
                rows = first_rows(perm_recent, valid_np_of(c))
            elif rule == "most_complete":
                nonempty = pc.and_kleene(
                    pc.is_valid(c),
                    pc.not_equal(pc.utf8_trim_whitespace(pc.fill_null(c, "")),
                                 ""))
                ln = pc.fill_null(pc.utf8_length(c), -1)
                perm = perm_of((ln, "descending"), (c, "ascending"))
                rows = first_rows(perm, nonempty.to_numpy(
                    zero_copy_only=False))
            elif rule == "any_true":
                perm = perm_of((c, "descending"))
                rows = first_rows(perm, valid_np_of(c))
            elif rule == "earliest":
                perm = perm_of((c, "ascending"))
                rows = first_rows(perm, valid_np_of(c))
            elif rule == "latest":
                perm = perm_of((c, "descending"))
                rows = first_rows(perm, valid_np_of(c))
            else:  # pragma: no cover - guarded by the dispatcher
                raise ValueError(f"unvectorizable rule: {rule}")
            out[col] = take_rows(c, rows)

        # completeness: non-null count over the ELECTED outputs
        nn = np.zeros(ng, np.int64)
        for col in COMPLETENESS_FIELDS:
            nn += valid_np_of(out[col]).astype(np.int64)
        out["completeness_score"] = pa.array(
            [round(v / 15.0, 4) for v in nn.tolist()], pa.float64())

        # distinct source systems per group
        ssc = b["source_system"].combine_chunks()
        perm_ss = perm_of((ssc, "ascending"))
        ssp = ssc.take(pa.array(perm_ss))
        if n > 1:
            flags = pc.not_equal(ssp.slice(1), ssp.slice(0, n - 1)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flags = np.concatenate([[1], flags])
        else:
            flags = np.ones(1, np.int64)
        flags[starts] = 1
        out["source_count"] = pa.array(
            np.add.reduceat(flags, starts), pa.int64())

        conf = b["group_confidence"].combine_chunks().take(starts_pa)
        out["confidence_score"] = pc.fill_null(
            pc.cast(conf, pa.float64()), 1.0)

        surv = pc.fill_null(b["is_survivor"].combine_chunks(), False) \
            .to_numpy(zero_copy_only=False)
        srows = first_rows(idx_np, surv)
        srows = np.where(srows >= 0, srows, starts)
        out["survivor_record_id"] = rid.take(pa.array(srows))
        if with_spans:
            if "spans_json" in b.column_names:
                out["spans_json"] = b["spans_json"].combine_chunks() \
                    .take(pa.array(srows))
            else:
                out["spans_json"] = pa.nulls(ng, pa.string())

        return pa.Table.from_arrays(
            [pc.cast(out[f.name], f.type) for f in schema], schema=schema)

    return golden_runs


def make_golden_runs_fn(cfg: SurvivorshipConfig, with_spans: bool = True):
    """Election kernel dispatcher: the vectorized kernel when every
    configured rule supports it (the default config does), else the
    python reference kernel (``most_frequent`` needs per-group mode)."""
    if all(r in _VECTOR_RULES for r in cfg.rules.values()):
        return make_golden_runs_vec(cfg, with_spans)
    return _make_golden_runs_py(cfg, with_spans)


def _make_golden_runs_py(cfg: SurvivorshipConfig, with_spans: bool = True):
    """Block-level variant: extract columns once per block, run the
    per-group rules on python list slices, emit ONE table per block —
    kills the per-group Arrow overhead (rules are identical to
    make_golden_fn). ``with_spans=False`` elects without the span payload
    (the caller joins the survivor's spans back afterwards). Kept as the
    semantic REFERENCE kernel: the vectorized path is tested equal to
    this one, and non-vectorizable rule vocab (most_frequent) runs it."""
    rules = cfg.rules
    schema = (_GOLDEN_JSON_SCHEMA if with_spans else
              pa.schema([f for f in _GOLDEN_JSON_SCHEMA if f.name != "spans_json"]))
    out_names = [f.name for f in schema]

    def golden_runs(b: pa.Table, starts, ends) -> pa.Table:
        present = [c for c in _GROUP_COLS if c in b.column_names]
        all_cols = {c: b[c].to_pylist() for c in present}
        out_rows: dict[str, list] = {name: [] for name in out_names}

        for s_, e_ in zip(starts, ends):
            cols = {c: v[s_:e_] for c, v in all_cols.items()}
            n = e_ - s_
            rid = cols["source_record_id"]
            trust = cols["source_trust_rank"]
            trust_order = sorted(range(n), key=lambda i: (trust[i] or 999, rid[i]))
            loaded = cols["loaded_us"]
            recent_order = sorted(range(n), key=lambda i: (
                loaded[i] is None,
                -loaded[i] if loaded[i] is not None else 0,
                rid[i]))

            out = {"master_payor_id": cols["match_group_id"][0]}
            for col in GOLDEN_FIELDS:
                out[col] = _apply_rule(rules[col], cols, col, trust_order, recent_order)
            nn = sum(1 for c in COMPLETENESS_FIELDS if out[c] is not None)
            out["completeness_score"] = round(nn / 15.0, 4)
            out["source_count"] = len(set(cols["source_system"]))
            conf = cols["group_confidence"][0]
            out["confidence_score"] = float(conf) if conf is not None else 1.0
            surv = cols["is_survivor"]
            si = next((i for i in range(n) if surv[i]), 0)
            out["survivor_record_id"] = rid[si]
            if with_spans:
                out["spans_json"] = cols.get("spans_json", [None] * n)[si]
            for name in out_names:
                out_rows[name].append(out.get(name))

        return pa.Table.from_arrays(
            [pa.array(out_rows[f.name], type=f.type) for f in schema],
            schema=schema)

    return golden_runs


def build_golden(groups: Dataset, unified: Dataset,
                 cfg: SurvivorshipConfig | None = None,
                 num_partitions: int | None = None,
                 local_rows_bound: int = 0) -> Dataset:
    """MATCH_GROUPS ⋈ unified → one golden record per group (golden rows
    carry the survivor document's spans, re-hydrated to list<struct>).

    The span payload (by far the widest column) is NOT dragged through
    the election join + group sort: survivorship elects fields over the
    slim columns, then ONE targeted join attaches the survivor's
    spans_json (golden-count rows, not member-count)."""
    from payor_linkage.normalize import spans_from_json

    from payor_linkage.rayutil import grouped_apply

    cfg = cfg or SurvivorshipConfig()
    slim_cols = [c for c in unified.schema().names if c != "spans_json"]
    # groups is unique-keyed by source_record_id and narrow → broadcast
    # lookup attach (zero shuffle) instead of a two-sided hash join
    members = lookup_join(unified.select_columns(slim_cols), groups,
                          on="source_record_id")

    def precast(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # loaded_at → int64 µs: ordering key only; avoids per-group
        # datetime materialization (os.environ TZ lookups per row)
        loaded = pc.cast(b["loaded_at"], pa.int64())
        return b.drop_columns(["loaded_at"]).append_column("loaded_us", loaded)

    members = members.map_batches(precast, batch_format="pyarrow")
    elect_schema = pa.schema([f for f in _GOLDEN_JSON_SCHEMA
                              if f.name != "spans_json"])
    golden = grouped_apply(members, "match_group_id",
                           out_schema=elect_schema,
                           runs_fn=make_golden_runs_fn(cfg, with_spans=False),
                           local_rows_bound=local_rows_bound)

    # survivor spans attach: golden (one row per group, narrow) is the
    # broadcast side; the span payload streams through un-shuffled
    spans_map = unified.map_batches(
        lambda b: pa.table({"survivor_record_id": b["source_record_id"],
                            "spans_json": b["spans_json"]}),
        batch_format="pyarrow")
    golden = lookup_join(spans_map, golden, on="survivor_record_id")

    def hydrate(b: pa.Table) -> pa.Table:
        spans = spans_from_json(b["spans_json"])
        b = b.drop_columns(["spans_json"]).append_column("spans", spans)
        return b.select([f.name for f in GOLDEN_SCHEMA])

    # the spans attach streams over UNIFIED's blocks, so the golden
    # output inherits corpus block count (hundreds of tiny blocks for a
    # golden-sized table) — pin it so every downstream consumer
    # (hierarchy probes, audit, serving scans) runs O(cpus) tasks
    return golden.map_batches(hydrate, batch_format="pyarrow") \
        .repartition(_default_blocks())


def _attach_by_key(big: pa.Table, small: pa.Table, on: str) -> pa.Table:
    """Driver-local inner lookup_join: attach ``small``'s payload columns
    to ``big`` rows via ``pc.index_in`` (small unique-keyed). Same
    row/column semantics as ``rayutil.lookup_join(how='inner')``."""
    import pyarrow.compute as pc

    keys = small[on].combine_chunks()
    pos = pc.index_in(big[on], value_set=keys)
    if isinstance(pos, pa.ChunkedArray):
        pos = pos.combine_chunks()
    hit = pc.is_valid(pos)
    m = big.filter(hit)
    idx = pos.filter(hit)
    for c in small.column_names:
        if c != on and c not in m.column_names:
            m = m.append_column(c, small[c].combine_chunks().take(idx))
    return m


def local_golden(groups_tbl: pa.Table, unified_tbl: pa.Table,
                 cfg: SurvivorshipConfig | None = None) -> pa.Table:
    """Driver-local ``build_golden`` over delta-bounded Arrow tables
    (the incremental patch path): identical election/span semantics —
    same ``make_golden_runs_fn`` kernel over the same member rows, spans
    attached by survivor-id probe — with zero Ray stages."""
    import pyarrow.compute as pc

    from payor_linkage.normalize import spans_from_json
    from payor_linkage.rayutil import local_grouped_runs

    cfg = cfg or SurvivorshipConfig()
    slim = unified_tbl.select(
        [c for c in unified_tbl.column_names if c != "spans_json"])
    members = _attach_by_key(slim, groups_tbl, on="source_record_id")
    loaded = pc.cast(members["loaded_at"], pa.int64())
    members = members.drop_columns(["loaded_at"]).append_column(
        "loaded_us", loaded)
    elect_schema = pa.schema([f for f in _GOLDEN_JSON_SCHEMA
                              if f.name != "spans_json"])
    golden = local_grouped_runs(
        members, "match_group_id", elect_schema,
        runs_fn=make_golden_runs_fn(cfg, with_spans=False))
    # survivor spans: unique-id probe into the unified slice
    upos = pc.index_in(golden["survivor_record_id"],
                       value_set=unified_tbl["source_record_id"]
                       .combine_chunks())
    if isinstance(upos, pa.ChunkedArray):
        upos = upos.combine_chunks()
    spans_json = unified_tbl["spans_json"].combine_chunks().take(upos)
    spans = spans_from_json(spans_json)
    golden = golden.append_column("spans", spans)
    return golden.select([f.name for f in GOLDEN_SCHEMA])


def local_xref(groups_tbl: pa.Table, unified_tbl: pa.Table) -> pa.Table:
    """Driver-local ``build_xref`` over delta-bounded Arrow tables."""
    slim = unified_tbl.select(
        ["source_record_id", "source_system", "source_id"])
    j = _attach_by_key(
        slim, groups_tbl.select(
            ["source_record_id", "match_group_id", "group_confidence"]),
        on="source_record_id")
    return pa.table({
        "source_record_id": j["source_record_id"],
        "master_payor_id": j["match_group_id"],
        "source_system": j["source_system"],
        "source_id": j["source_id"],
        "match_confidence": j["group_confidence"],
    })


def build_xref(groups: Dataset, unified: Dataset, num_partitions: int | None = None) -> Dataset:
    """XREF: every source record → its master (xref.sql:16-25)."""
    import pyarrow as pa

    slim = unified.select_columns(["source_record_id", "source_system", "source_id"])
    j = lookup_join(slim, groups.select_columns(
        ["source_record_id", "match_group_id", "group_confidence"]),
        on="source_record_id")

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "source_record_id": b["source_record_id"],
            "master_payor_id": b["match_group_id"],
            "source_system": b["source_system"],
            "source_id": b["source_id"],
            "match_confidence": b["group_confidence"],
        })

    # same block-count pinning rationale as build_golden
    return j.map_batches(proj, batch_format="pyarrow") \
        .repartition(_default_blocks())


def _default_blocks() -> int:
    import ray

    try:
        return 2 * int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 8


# ── truth discovery: source agreement + accuracy estimation ────────────────

# compact informative claim fields (string-compared; dates/bools are cast
# to their ISO/lowercase string forms so engine and SQL agree exactly)
CLAIM_FIELDS = ["payor_name", "tax_id", "cms_plan_id", "zip_code", "phone",
                "website"]


def source_agreement(unified: Dataset, golden: Dataset, xref: Dataset,
                     fields: list[str] | None = None) -> Dataset:
    """Per-(source_system, field) agreement with the elected golden
    value, as exact integers ``(source_system, field, n_claims,
    n_agree)`` — the data-driven read on the reference's hand-set
    source trust ranks (`snowflake/08_survivorship.sql` trust CASE):
    a claim is a non-null record value; it agrees when it string-equals
    its master's golden value.

    Scale shape: ONE record-grain master attach (`lookup_join`,
    hash-join fallback), ONE golden-grain value attach, then per-batch
    long-form (source, field) partial counts and a bounded grouped
    sum — only counters ride the exchange."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import smart_join

    fields = list(fields or CLAIM_FIELDS)
    recs = unified.select_columns(
        ["source_record_id", "source_system"] + fields)

    def to_str(prefix):
        def f(b: pa.Table) -> pa.Table:
            cols = {c: b[c] for c in b.column_names if c not in fields}
            for c in fields:
                cols[prefix + c] = pc.cast(b[c], pa.string())
            return pa.table(cols)
        return f

    recs = recs.map_batches(to_str(""), batch_format="pyarrow")
    withm = lookup_join(
        recs, xref.select_columns(["source_record_id", "master_payor_id"]),
        on="source_record_id")
    gvals = golden.select_columns(["master_payor_id"] + fields) \
        .map_batches(to_str("g_"), batch_format="pyarrow")
    j = smart_join(withm, gvals, "master_payor_id")

    def partial(b: pa.Table) -> pa.Table:
        parts = []
        for c in fields:
            claim = b[c].is_valid()
            agree = pc.and_kleene(claim, pc.fill_null(
                pc.equal(b[c], b["g_" + c]), False))
            parts.append(pa.table({
                "source_system": b["source_system"],
                "field": pa.array([c] * b.num_rows, pa.string()),
                "n_claims": pc.cast(claim, pa.int64()),
                "n_agree": pc.cast(agree, pa.int64())}))
        t = pa.concat_tables(parts)
        p = t.group_by(["source_system", "field"]).aggregate(
            [("n_claims", "sum"), ("n_agree", "sum")])
        return p.rename_columns(
            ["source_system", "field", "n_claims", "n_agree"])

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["source_system", "field"]).aggregate(
                Sum("n_claims", alias_name="n_claims"),
                Sum("n_agree", alias_name="n_agree")))


def source_claims(unified: Dataset, xref: Dataset,
                  fields: list[str] | None = None) -> Dataset:
    """Distinct long-form claims ``(master_payor_id, field,
    source_system, value)`` (non-null, values cast to string) — the
    input grain of truth-discovery. One master attach + a distinct
    groupby at claim grain."""
    import pyarrow.compute as pc

    fields = list(fields or CLAIM_FIELDS)
    recs = unified.select_columns(
        ["source_record_id", "source_system"] + fields)
    withm = lookup_join(
        recs, xref.select_columns(["source_record_id", "master_payor_id"]),
        on="source_record_id")

    def explode(b: pa.Table) -> pa.Table:
        parts = []
        for c in fields:
            v = pc.cast(b[c], pa.string())
            keep = v.is_valid()
            parts.append(pa.table({
                "master_payor_id": b["master_payor_id"].filter(keep),
                "field": pa.array([c] * int(pc.sum(pc.cast(
                    keep, pa.int64())).as_py() or 0), pa.string()),
                "source_system": b["source_system"].filter(keep),
                "value": v.filter(keep)}))
        return pa.concat_tables(parts)

    return (withm.map_batches(explode, batch_format="pyarrow")
            .groupby(["master_payor_id", "field", "source_system",
                      "value"]).count().drop_columns(["count()"]))


def source_vote_patterns(claims: Dataset,
                         sources: list[str]) -> Dataset:
    """The sufficient statistic of source-accuracy EM (the
    Fellegi-pattern trick applied to truth discovery): each
    (master, field) group's claims collapse to a canonical VOTE
    PATTERN — ``srcidx:valueclass`` tokens joined in (srcidx,
    valueclass) order, where valueclass is the dense rank of the
    claimed value within the group — and EM only ever needs the
    ≤(set-partition count) pattern histogram, so the corpus-sized
    claim set is touched once.

    Shape: one grouped pass computes value dense-ranks (vectorized
    across runs: unique (run, value-code) pairs + per-run position
    arithmetic — no per-group Python), one `grouped_string_agg`
    serializes each group (inherent per-group join: output IS one
    string per group), one bounded count."""
    import numpy as np
    import pyarrow.compute as pc

    from payor_linkage.dataops.aggregates import grouped_string_agg
    from payor_linkage.rayutil import grouped_apply

    src_arr = pa.array(sorted(sources), pa.string())

    def prep(b: pa.Table) -> pa.Table:
        gk = pc.binary_join_element_wise(
            b["master_payor_id"], b["field"], "\x1f")
        si = pc.cast(pc.index_in(b["source_system"], value_set=src_arr),
                     pa.int64())
        return pa.table({"gk": gk, "src_idx": si, "value": b["value"]})

    prepped = claims.map_batches(prep, batch_format="pyarrow")

    cls_schema = pa.schema([("gk", pa.string()), ("src_idx", pa.int64()),
                            ("cls", pa.int64())])

    def cls_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        n = hi - lo
        sizes = (ends - starts).astype(np.int64)
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        enc = b["value"].combine_chunks().dictionary_encode()
        raw = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        drank = np.empty(len(enc.dictionary), dtype=np.int64)
        drank[pc.sort_indices(enc.dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)] = \
            np.arange(len(enc.dictionary))
        codes = drank[raw][lo:hi]
        k = int(codes.max()) + 1 if n else 1
        pairs = rid * k + codes
        u, inv = np.unique(pairs, return_inverse=True)
        urid = u // k
        first = np.searchsorted(urid, np.arange(len(starts)))
        cls = (np.arange(len(u), dtype=np.int64) - first[urid])[inv]
        return pa.table({"gk": b["gk"].slice(lo, n),
                         "src_idx": b["src_idx"].slice(lo, n),
                         "cls": pa.array(cls, pa.int64())})

    with_cls = grouped_apply(prepped, "gk", out_schema=cls_schema,
                             runs_fn=cls_runs)

    def token(b: pa.Table) -> pa.Table:
        t = pc.binary_join_element_wise(
            pc.cast(b["src_idx"], pa.string()),
            pc.cast(b["cls"], pa.string()), ":")
        return pa.table({"gk": b["gk"], "src_idx": b["src_idx"],
                         "cls": b["cls"], "tok": t})

    agg = grouped_string_agg(
        with_cls.map_batches(token, batch_format="pyarrow"),
        ["gk"], "tok", ["src_idx", "cls"], sep=",", out_col="pattern")
    return (agg.groupby("pattern").count()
            .map_batches(lambda b: pa.table({
                "pattern": b["pattern"],
                "n": pc.cast(b["count()"], pa.int64())}),
                batch_format="pyarrow"))


def source_accuracy_em(patterns, sources: list[str], iters: int = 25,
                       prior: float = 0.8, eps: float = 1e-6):
    """TruthFinder-style source-accuracy EM over the vote-pattern
    histogram: per group, P(value-class true) ∝ Σ accuracy of its
    claiming sources; a source's accuracy is the mean P of its claims.
    Driver-tier by construction — the histogram is bounded by the
    set-partition count of ≤#sources claims, never corpus size.
    Returns an Arrow table ``(source_system, accuracy, n_claims)``
    (floats — pytest-gated against a per-claim reference, not SQL)."""
    import numpy as np

    srcs = sorted(sources)
    if hasattr(patterns, "to_pandas") and not isinstance(
            patterns, pa.Table):
        patterns = patterns.to_pandas()
    pats = [p.split(",") for p in patterns["pattern"]]
    cnts = np.asarray(patterns["n"], dtype=np.float64)
    # parse once: per pattern, arrays of (src_idx, cls)
    parsed = [np.array([[int(a), int(c)] for a, c in
                        (tok.split(":") for tok in p)], dtype=np.int64)
              for p in pats]
    acc = np.full(len(srcs), float(prior))
    claim_totals = np.zeros(len(srcs))
    for p, n in zip(parsed, cnts):
        np.add.at(claim_totals, p[:, 0], n)
    for _ in range(iters):
        new = np.zeros(len(srcs))
        for p, n in zip(parsed, cnts):
            w = acc[p[:, 0]]
            cls_w = np.bincount(p[:, 1], weights=w)
            pclaim = cls_w[p[:, 1]] / max(cls_w.sum(), 1e-300)
            np.add.at(new, p[:, 0], n * pclaim)
        acc = np.clip(new / np.maximum(claim_totals, 1e-300),
                      eps, 1.0 - eps)
    return pa.table({
        "source_system": pa.array(srcs, pa.string()),
        "accuracy": pa.array(acc, pa.float64()),
        "n_claims": pa.array(claim_totals.astype(np.int64), pa.int64()),
    })


def medoid_name(groups: Dataset, unified: Dataset,
                name_col: str = "payor_name_clean",
                quant: int = 1_000_000) -> Dataset:
    """Medoid golden-name election: per match group, the member name
    maximizing total Jaro–Winkler similarity to the other members —
    the centroid-style alternative to the reference's trust-rank
    survivorship (useful when no source is trusted a priori). Ties
    break to the lexicographically smallest name. Returns
    ``(match_group_id, medoid_name, total_sim_micro)`` where the sum
    is FLOOR-quantized to integer micro-units, so the gate is float-
    free: JW itself runs through DuckDB's C++ kernel (the scorer's
    precedent), byte-identical to a SQL oracle, and integer sums are
    order-independent.

    Shape: one member attach (`lookup_join`), one grouped pass; within
    each run the k² pair index matrix is pure numpy arithmetic
    (bounded by the cluster cap), all pairs across runs JW-scored in
    ONE DuckDB call per block, and per-name sums collapse via
    bincount."""
    import duckdb
    import numpy as np
    import pyarrow.compute as pc

    from payor_linkage.rayutil import grouped_apply, lookup_join

    members = lookup_join(
        groups.select_columns(["source_record_id", "match_group_id"]),
        unified.select_columns(["source_record_id", name_col]),
        on="source_record_id")

    def prep(b: pa.Table) -> pa.Table:
        name = pc.fill_null(pc.cast(b[name_col], pa.string()), "")
        return pa.table({"g": b["match_group_id"], "name": name})

    prepped = members.map_batches(prep, batch_format="pyarrow")
    out_schema = pa.schema([("match_group_id", pa.string()),
                            ("medoid_name", pa.string()),
                            ("total_sim_micro", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        n = hi - lo
        sizes = (ends - starts).astype(np.int64)
        names = b["name"].combine_chunks().slice(lo, n)
        # k² ordered pair indices per run, vectorized across runs
        sq = sizes * sizes
        total = int(sq.sum())
        cum = np.concatenate([[0], np.cumsum(sq)[:-1]])
        p = np.arange(total, dtype=np.int64) - np.repeat(cum, sq)
        base = np.repeat(starts - lo, sq)
        krep = np.repeat(sizes, sq)
        li = base + p // krep
        ri = base + p % krep
        keep = li != ri
        li, ri = li[keep], ri[keep]
        if len(li):
            con = duckdb.connect()
            con.register("t", pa.table({
                "a": names.take(pa.array(li)),
                "b": names.take(pa.array(ri))}))
            jw = con.execute(
                f"SELECT CAST(FLOOR(jaro_winkler_similarity(a, b) * "
                f"{quant}) AS BIGINT) AS s FROM t").arrow()["s"] \
                .to_numpy(zero_copy_only=False)
            con.close()
        else:
            jw = np.empty(0, np.int64)
        per_name = np.zeros(n, np.int64)
        np.add.at(per_name, li, jw)
        # argmax per run with (sum DESC, name ASC) tie-break: lexsort
        # by (name rank asc) then stable max scan — use order trick
        enc = names.dictionary_encode()
        raw = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        drank = np.empty(len(enc.dictionary), dtype=np.int64)
        drank[pc.sort_indices(enc.dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)] = \
            np.arange(len(enc.dictionary))
        nrank = drank[raw]
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        order = np.lexsort((nrank, -per_name, rid))
        firsts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        win = order[firsts]
        gfirst = pa.array((starts).astype(np.int64))
        return pa.table({
            "match_group_id": b["g"].take(gfirst),
            "medoid_name": names.take(pa.array(win)),
            "total_sim_micro": pa.array(per_name[win], pa.int64()),
        }).cast(out_schema)

    return grouped_apply(prepped, "g", out_schema=out_schema, runs_fn=runs)

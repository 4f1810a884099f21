"""Grouped analytical operators: per-key top-k, exact discrete
quantiles, pivoted counts, per-key sequence numbers.

Each operator is shuffle-minimal: per-batch partial aggregation (a
combiner) shrinks what the one grouped exchange moves, and the final
per-group work runs through ``rayutil.grouped_apply`` (block-amortized
run slicing — raw ``map_groups`` pays ~1ms/group of harness overhead).
All outputs are integers or *selected* (not computed) floats so the
DuckDB oracles compare byte-exact (no float-arithmetic parity traps).

Reference parity: the reference exposes these as SQL windows /
conditional aggregation in its transform models (e.g.
transform/payor_mdm/models/match – ROW_NUMBER / FILTER patterns);
here they are first-class distributed operators.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from payor_linkage.rayutil import grouped_apply


def _run_ids(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Run index per row of the contiguous span [starts[0], ends[-1]).
    grouped_apply's runs_fn contract: the given runs are consecutive and
    tile exactly that sub-span of the block (edge runs are deferred to
    the consolidation pass), so callers slice columns to the span."""
    return np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)


def grouped_topk(ds: Dataset, key: str, order_col: str, k: int,
                 tie_col: str, keep_cols: list[str] | None = None) -> Dataset:
    """Top-k rows per key by (order_col DESC, tie_col ASC), with a 1-based
    ``rank`` column — the distributed form of
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order DESC, tie) <= k``.

    Scale shape: a per-batch combiner keeps at most k rows per key per
    batch (so the grouped exchange moves O(k · keys · blocks) rows, never
    the corpus), then one ``grouped_apply`` emits the global top-k per
    run. ``order_col`` must be numeric; ``tie_col`` must be a numeric
    unique tiebreaker (ids)."""
    keep_cols = keep_cols if keep_cols is not None else [tie_col, order_col]
    proj = [key] + [c for c in dict.fromkeys([tie_col, order_col] + keep_cols)
                    if c != key]

    def _topk_indices(keyc: np.ndarray, order: np.ndarray, tie: np.ndarray,
                      limit: int) -> tuple[np.ndarray, np.ndarray]:
        """Row indices of the per-key top-`limit` plus their 0-based
        within-key positions, for rows grouped by `keyc` codes."""
        sel = np.lexsort((tie, -order, keyc))
        ks = keyc[sel]
        run_starts = np.nonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))[0]
        lens = np.diff(np.concatenate([run_starts, [len(ks)]]))
        pos = np.arange(len(ks), dtype=np.int64) - np.repeat(run_starts, lens)
        m = pos < limit
        return sel[m], pos[m]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        codes = pc.dictionary_encode(b[key]).combine_chunks().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = b[order_col].to_numpy(zero_copy_only=False)
        tie = b[tie_col].to_numpy(zero_copy_only=False)
        idx, _ = _topk_indices(codes, order, tie, k)
        return b.take(pa.array(np.sort(idx)))

    pruned = ds.select_columns(proj).map_batches(partial, batch_format="pyarrow")

    fields = [(key, ds.schema().base_schema.field(key).type),
              ("rank", pa.int64())]
    fields += [(c, ds.schema().base_schema.field(c).type)
               for c in keep_cols if c != key]
    out_schema = pa.schema(fields)

    def final_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        order = b[order_col].to_numpy(zero_copy_only=False)[lo:hi]
        tie = b[tie_col].to_numpy(zero_copy_only=False)[lo:hi]
        idx, pos = _topk_indices(rid, order, tie, k)
        take = pa.array(idx + lo)
        cols = {key: b[key].take(take),
                "rank": pa.array(pos + 1, pa.int64())}
        for c in keep_cols:
            if c != key:
                cols[c] = b[c].take(take)
        return pa.table(cols).cast(out_schema)

    return grouped_apply(pruned, key, out_schema=out_schema, runs_fn=final_runs)


def grouped_quantiles(ds: Dataset, key: str, value_col: str,
                      qs: dict[str, Fraction] | None = None) -> Dataset:
    """Exact discrete quantiles per key (one output row per key, one
    column per quantile) — ``quantile_disc`` semantics: the element at
    index ``ceil(q·n) - 1`` of the sorted run.

    Quantiles are passed as exact ``Fraction``s and the index is computed
    with integer ceil-division, so there is no float-rounding edge at
    q·n ∈ ℤ; the emitted value is *selected* from the input (never
    computed), so float columns compare byte-exact against DuckDB's
    ``quantile_disc``. One sort-shuffle total (inside grouped_apply);
    per-run selection is vectorized across every group in a block."""
    qs = qs if qs is not None else {"q25": Fraction(1, 4),
                                    "q50": Fraction(1, 2),
                                    "q75": Fraction(3, 4)}
    vt = ds.schema().base_schema.field(value_col).type
    out_schema = pa.schema([(key, ds.schema().base_schema.field(key).type)]
                           + [(name, vt) for name in qs])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo = starts[0]
        rid = _run_ids(starts, ends)
        vals = b[value_col].to_numpy(zero_copy_only=False)[lo:ends[-1]]
        order = np.lexsort((vals, rid))
        sv = vals[order]
        n = (ends - starts).astype(np.int64)
        cols = {key: b[key].take(pa.array(starts))}
        for name, q in qs.items():
            # ceil(n*q) - 1, exact in integers
            in_run = -((-n * q.numerator) // q.denominator) - 1
            cols[name] = pa.array(sv[(starts - lo) + in_run])
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns([key, value_col]), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_winsorize(ds: Dataset, key: str, value_col: str,
                      lo: Fraction = Fraction(1, 10),
                      hi: Fraction = Fraction(9, 10),
                      out_col: str = "value_w",
                      keep_cols: list[str] | None = None) -> Dataset:
    """Per-key winsorization — clip ``value_col`` into the key's exact
    discrete [lo, hi] quantiles (``quantile_disc`` semantics), the
    standard outlier-capping step before training-statistics or
    loss-weight computation.

    Scale shape: the bounds table is ONE row per key (grouped_quantiles
    — a single sort exchange over (key, value) only), then attached by
    broadcast binary-search (``rayutil.lookup_join``) and clipped in one
    vectorized map pass; the wide row payload is never shuffled. The
    emitted value is SELECTED from stored inputs (the original or a
    stored quantile — no arithmetic), so float parity vs SQL
    ``GREATEST/LEAST`` is byte-exact."""
    from payor_linkage import rayutil

    keep_cols = keep_cols if keep_cols is not None else []
    bounds = grouped_quantiles(ds, key, value_col,
                               qs={"__lo": lo, "__hi": hi})
    proj = list(dict.fromkeys([key, value_col] + keep_cols))
    joined = rayutil.lookup_join(ds.select_columns(proj), bounds, key)

    def clip(b: pa.Table) -> pa.Table:
        w = pc.min_element_wise(
            pc.max_element_wise(b[value_col], b["__lo"]), b["__hi"])
        return (b.drop_columns(["__lo", "__hi"])
                .append_column(out_col, w))

    return joined.map_batches(clip, batch_format="pyarrow")


def fit_range_bounds(ds: Dataset, value_col: str, n_parts: int) -> list:
    """Equi-depth range-partition boundaries: the exact quantile_disc
    values at i/n_parts (i = 1..n_parts−1) — the fit step of a range
    partitioner (pick boundaries once, then assign rows WITHOUT a global
    sort). ONE distributed sort + per-block counts (global_ntile's
    prefix shape); only the n_parts−1 boundary VALUES reach the driver.
    Exact integer rank arithmetic (ceil(i·n/k)), so duplicates and
    n % k ≠ 0 follow quantile_disc semantics byte-for-byte."""
    from payor_linkage.dataops.reshape import global_ntile

    slim = ds.select_columns([value_col])
    n = slim.count()
    ranks = sorted({-((-n * i) // n_parts) for i in range(1, n_parts)})
    ranked = global_ntile(slim, [value_col], k=1)
    want = set(ranks)

    def pick(b: pa.Table) -> pa.Table:
        m = np.isin(b["rn"].to_numpy(zero_copy_only=False),
                    np.fromiter(want, np.int64, len(want)))
        return b.filter(pa.array(m))

    rows = ranked.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["rn"])
    return [r[value_col] for r in rows]


def range_partition_counts(ds: Dataset, value_col: str,
                           bounds: list) -> Dataset:
    """Assign every row its range partition (count of boundaries
    strictly below the value — ``np.searchsorted(bounds, v, 'left')``)
    and return per-partition row counts: the balance check of a fitted
    range partitioner (`fit_range_bounds`). Boundaries broadcast once
    (ray.put); assignment is one vectorized searchsorted per batch; the
    exchange moves (partition_id, count) partials only."""
    import ray

    bref = ray.put(np.asarray(bounds))

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(ray.get(bref), v, side="left")
        u, c = np.unique(pid, return_counts=True)
        return pa.table({"partition_id": pa.array(u.astype(np.int64)),
                         "n_rows": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("partition_id")
            .aggregate(Sum("n_rows", alias_name="n_rows")))


def fd_violations(ds: Dataset, det_col: str, dep_col: str) -> Dataset:
    """Functional-dependency profiling: for ``det_col → dep_col``, the
    determinant values that map to MORE than one distinct dependent
    value (the violation witnesses), with their distinct-dependent
    count — the data-quality check behind "should this column key that
    one". One row per violating determinant: (det, n_distinct_dep).

    Shape: per-batch distinct (det, dep) pairs (a combiner — bounded by
    the batch's pair vocabulary) → one grouped distinct + count; only
    (det, dep) pairs ever shuffle."""
    def pairs(b: pa.Table) -> pa.Table:
        return (pa.table({"det": b[det_col], "dep": b[dep_col]})
                .group_by(["det", "dep"]).aggregate([]))

    distinct = (ds.select_columns([det_col, dep_col])
                .map_batches(pairs, batch_format="pyarrow")
                .groupby(["det", "dep"]).count()
                .map_batches(lambda b: b.select(["det"]),
                             batch_format="pyarrow"))
    counts = distinct.groupby("det").count()

    def viol(b: pa.Table) -> pa.Table:
        m = pc.greater(b["count()"], 1)
        t = b.filter(m)
        return pa.table({"det": t["det"],
                         "n_distinct_dep": pc.cast(t["count()"],
                                                   pa.int64())})

    return counts.map_batches(viol, batch_format="pyarrow")


def grouped_lag_delta(ds: Dataset, key: str, order_cols: list[str],
                      value_col: str, out_col: str = "delta") -> Dataset:
    """Per-key LAG delta: ``value - LAG(value) OVER (PARTITION BY key
    ORDER BY order_cols)`` with the leading NULL row of each partition
    dropped — emitting only rows that HAVE a predecessor keeps NULL/NaN
    encoding out of the oracle compare, and a single subtraction of two
    *stored* doubles is deterministic (no accumulation), so float parity
    is exact. One grouped sort; diffs vectorized across every run in a
    block (np.diff over the contiguous span, run firsts masked)."""
    proj = [key] + [c for c in order_cols if c != key] + [value_col]
    vt = ds.schema().base_schema.field(value_col).type
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, vt)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        vals = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order]
        delta = np.empty_like(vals)
        delta[1:] = vals[1:] - vals[:-1]
        # after the (rid, order_cols) sort, runs stay contiguous with the
        # same lengths, so run firsts sit at the original start offsets
        keep = np.ones(len(vals), dtype=bool)
        keep[starts - lo] = False
        take = pa.array(order[keep] + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(delta[keep])
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_string_agg(ds: Dataset, keys: list[str], value_col: str,
                       order_col: str | list[str], sep: str = ",",
                       out_col: str = "agg") -> Dataset:
    """Ordered list-collect per key group, serialized as a separated
    string — ``STRING_AGG(value, sep ORDER BY order_cols)`` semantics
    (values cast to string first). ``order_col`` should be a total order
    within each group (pass a list ending in a unique tiebreaker) or the
    tie order is engine-defined, exactly as in SQL. One grouped sort over
    a composite key; the per-run join is the only per-group step
    (inherent: output IS one string per group). Output: the key columns
    + ``out_col``."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    gk, vcol = "__gk", "__val"
    ocols = [f"__ord{i}" for i in range(len(order_cols))]
    out_schema = pa.schema(
        [(k, ds.schema().base_schema.field(k).type) for k in keys]
        + [(out_col, pa.string())])

    def prep(b: pa.Table) -> pa.Table:
        comp = b[keys[0]].cast(pa.string()) if len(keys) == 1 else \
            pc.binary_join_element_wise(
                *[pc.cast(b[k], pa.string()) for k in keys], "\x1f")
        cols = {k: b[k] for k in keys}
        cols[gk] = comp
        # order columns stay in their native types (a string cast of a
        # numeric value_col would make the ordering lexicographic)
        for oc, c in zip(ocols, order_cols):
            cols[oc] = b[c]
        cols[vcol] = pc.cast(b[value_col], pa.string())
        return pa.table(cols)

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        ovs = tuple(b[oc].to_numpy(zero_copy_only=False)[lo:hi]
                    for oc in reversed(ocols))
        order = np.lexsort(ovs + (rid,))
        vals = b[vcol].to_numpy(zero_copy_only=False)[lo:hi][order]
        offs = np.concatenate([starts - lo, [hi - lo]])
        joined = [sep.join(vals[offs[i]:offs[i + 1]])
                  for i in range(len(starts))]
        first = pa.array(starts)
        cols = {k: b[k].take(first) for k in keys}
        cols[out_col] = pa.array(joined, pa.string())
        return pa.table(cols).cast(out_schema)

    prepped = ds.select_columns(
        list(dict.fromkeys(keys + order_cols + [value_col]))).map_batches(
        prep, batch_format="pyarrow")
    return grouped_apply(prepped, gk, out_schema=out_schema, runs_fn=runs)


def running_cummax(ds: Dataset, key: str, order_cols: list[str],
                   value_col: str, out_col: str = "run_max") -> Dataset:
    """Per-key running maximum — ``max(value) OVER (PARTITION BY key
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``. The emitted value is
    *selected* from the input (never computed), so float parity is
    byte-exact. One grouped sort; the cumulative max runs through
    pandas' Cython groupby-cummax across all runs in a block (no
    per-group Python)."""
    import pandas as pd

    proj = [key] + [c for c in order_cols if c != key] + [value_col]
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, ds.schema().base_schema.field(value_col).type)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        vals = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order]
        run_max = pd.Series(vals).groupby(rid).cummax().to_numpy()
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(run_max)
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def rollup_counts(ds: Dataset, cols: list[str],
                  total_label: str = "ALL"):
    """Multi-level counts — ``GROUP BY ROLLUP(cols)`` semantics with the
    rolled-up levels encoded as ``total_label`` (no NULL crosses the
    oracle compare; key columns must be strings free of the label).

    Scale shape: ONE distributed shuffle total — the finest-level
    aggregate; every coarser level folds driver-side from that bounded
    result (|distinct key combos| rows, orders of magnitude below the
    corpus), the standard rollup-from-partials pattern. Returns a
    pyarrow Table."""
    base = ds.groupby(cols).count().rename_columns(
        {"count()": "n"}).to_pandas()
    frames = [base]
    for level in range(len(cols) - 1, -1, -1):
        keep = cols[:level]
        f = (base.groupby(keep, as_index=False)["n"].sum() if keep
             else base[["n"]].sum().to_frame().T)
        for c in cols[level:]:
            f[c] = total_label
        frames.append(f[cols + ["n"]])
    import pandas as pd

    out = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(out[cols + ["n"]], preserve_index=False) \
        .cast(pa.schema([(c, pa.string()) for c in cols] + [("n", pa.int64())]))


def cube_counts(ds: Dataset, cols: list[str],
                total_label: str = "ALL"):
    """Multi-dimensional margin counts — ``GROUP BY CUBE(cols)``
    semantics (every subset of the grouping columns, 2^n levels) with
    rolled-up dimensions encoded as ``total_label``. Same scale shape as
    ``rollup_counts``: ONE distributed shuffle (the finest level); every
    margin folds driver-side from that bounded partial — the
    cube-from-partials pattern. Returns a pyarrow Table."""
    import itertools

    import pandas as pd

    base = ds.groupby(cols).count().rename_columns(
        {"count()": "n"}).to_pandas()
    frames = []
    for mask in itertools.product([True, False], repeat=len(cols)):
        keep = [c for c, m in zip(cols, mask) if m]
        f = (base.groupby(keep, as_index=False)["n"].sum() if keep
             else base[["n"]].sum().to_frame().T)
        for c, m in zip(cols, mask):
            if not m:
                f[c] = total_label
        frames.append(f[cols + ["n"]])
    out = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(out[cols + ["n"]], preserve_index=False) \
        .cast(pa.schema([(c, pa.string()) for c in cols] + [("n", pa.int64())]))


def prorate_integer(ds: Dataset, key: str, weight_col: str, order_col: str,
                    total: int, out_col: str = "alloc") -> Dataset:
    """Largest-remainder integer proration: allocate ``total`` units per
    ``key`` group across its rows proportional to positive integer
    weights, EXACTLY — per-group allocations always sum to ``total``.
    Each row gets ``floor(total*w/W)`` plus one extra unit for the
    ``total - sum(floor)`` largest remainders (ties broken by
    ``order_col`` ascending). All arithmetic is int64, so DuckDB window
    parity is byte-exact.

    One grouped sort; shares / remainders / leftover are vectorized
    across every run in a block (reduceat per-run sums); the remainder
    ranking reuses the rid-primary lexsort invariant (runs keep their
    span offsets), so rank-within-run is pure index arithmetic."""
    proj = list(dict.fromkeys([key, order_col, weight_col]))
    s = ds.schema().base_schema
    out_schema = pa.schema([(key, s.field(key).type),
                            (order_col, s.field(order_col).type),
                            (out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        w = b[weight_col].to_numpy(zero_copy_only=False)[lo:hi] \
            .astype(np.int64)
        if not (w > 0).all():
            raise ValueError("prorate_integer requires positive weights")
        ordv = b[order_col].to_numpy(zero_copy_only=False)[lo:hi]
        wsum = np.add.reduceat(w, starts - lo)
        wrow = wsum[rid]
        base = (total * w) // wrow
        rem = (total * w) % wrow
        leftover = total - np.add.reduceat(base, starts - lo)
        order = np.lexsort((ordv, -rem, rid))
        # rid-primary sort keeps each run on its original span, so the
        # i-th sorted element's rank within its run is i - run start
        pos_sorted = np.arange(len(w)) - np.repeat(starts - lo,
                                                   ends - starts)
        rank = np.empty(len(w), np.int64)
        rank[order] = pos_sorted
        alloc = base + (rank < leftover[rid])
        return pa.table({
            key: b[key].slice(lo, hi - lo),
            order_col: b[order_col].slice(lo, hi - lo),
            out_col: pa.array(alloc, pa.int64()),
        }).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_mad(ds: Dataset, key: str, value_col: str,
                out_med: str = "med", out_mad: str = "mad") -> Dataset:
    """Per-key median + median absolute deviation, EXACT on integer
    values (``quantile_disc`` selection semantics twice — both outputs
    are *selected* elements, never computed, so the robust-outlier
    statistic is float-parity-free).

    Scale shape: one grouped-quantile pass for the medians, the bounded
    per-key median table broadcast back (``lookup_join``, zero shuffle),
    one vectorized |x − med| map, one more grouped-quantile pass, and a
    final bounded join of the two per-key tables."""
    from payor_linkage.rayutil import lookup_join

    med = grouped_quantiles(ds.select_columns([key, value_col]), key,
                            value_col, {out_med: Fraction(1, 2)})
    dev = lookup_join(ds.select_columns([key, value_col]), med, key)

    def adev(b: pa.Table) -> pa.Table:
        d = pc.abs(pc.subtract(b[value_col], b[out_med]))
        return pa.table({key: b[key], "_adev": d})

    mad = grouped_quantiles(
        dev.map_batches(adev, batch_format="pyarrow"), key, "_adev",
        {out_mad: Fraction(1, 2)})
    return lookup_join(med, mad, key)


def grouped_weighted_median(ds: Dataset, key: str, value_col: str,
                            weight_col: str,
                            out_col: str = "wmed") -> Dataset:
    """Per-key weighted (lower) median with positive integer weights:
    the smallest value whose running weight reaches ceil(W/2) in value
    order — the element ``quantile_disc`` would select if every row were
    repeated ``weight`` times, without materializing the repeats. The
    value is SELECTED, never computed, and the rule is pure integer
    comparison (2·cumw ≥ W, i.e. cumw ≥ ceil(W/2)), so parity is exact.

    One grouped sort; per-run selection is a vectorized block-wide
    cumsum (run starts subtracted) + one first-hit
    scan across every run in a block."""
    s = ds.schema().base_schema
    out_schema = pa.schema([(key, s.field(key).type),
                            (out_col, s.field(value_col).type)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        vals = b[value_col].to_numpy(zero_copy_only=False)[lo:hi]
        w = b[weight_col].to_numpy(zero_copy_only=False)[lo:hi] \
            .astype(np.int64)
        if not (w > 0).all():
            raise ValueError("grouped_weighted_median requires positive "
                             "weights")
        order = np.lexsort((vals, rid))
        ws = w[order]
        cum = np.cumsum(ws)
        run_tot = np.add.reduceat(ws, starts - lo)
        # rid-primary sort keeps runs on their span offsets: rebase the
        # block-wide cumsum to per-run, then first index with
        # 2·cumw ≥ W
        base = np.concatenate([[0], cum[(ends - lo) - 1][:-1]])
        cum_run = cum - np.repeat(base, ends - starts)
        hit = 2 * cum_run >= np.repeat(run_tot, ends - starts)
        # first hit per run: hits are monotone within a run, so the
        # count of non-hits before it is the offset
        n_miss = np.add.reduceat((~hit).astype(np.int64), starts - lo)
        pick = (starts - lo) + n_miss
        return pa.table({
            key: b[key].take(pa.array(starts)),
            out_col: pa.array(vals[order][pick]),
        }).cast(out_schema)

    return grouped_apply(ds.select_columns(
        list(dict.fromkeys([key, value_col, weight_col]))), key,
        out_schema=out_schema, runs_fn=runs)


def grouped_checksum(ds: Dataset, key: str, content_cols: list[str],
                     out_sum: str = "checksum",
                     out_n: str = "n") -> Dataset:
    """Order-independent per-group content checksum: SUM of per-row
    32-bit md5-prefix hashes over canonically-serialized content (cols
    cast to string, joined with the \\x1f unit separator) plus the row
    count — the anti-entropy primitive for verifying two copies of a
    table agree WITHOUT moving or sorting either (compare the bounded
    per-group checksum tables instead). 32-bit per-row values keep the
    int64 sum exact to 2^31 rows per group.

    Scale shape: md5 runs through DuckDB's vectorized C++ kernel per
    batch (the scorer's JW precedent — no per-row Python), each batch
    pre-aggregates with Arrow ``group_by``, and ONE bounded grouped Sum
    finishes. SQL-identical by construction, so the oracle gate is
    byte-exact."""
    import duckdb
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        parts = [pc.cast(b[c], pa.string()) for c in content_cols]
        s = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "\x1f")
        t = pa.table({key: b[key], "_s": s})
        con = duckdb.connect()
        con.register("t", t)
        h = con.execute(
            "SELECT ('0x' || substr(md5(_s), 1, 8))::BIGINT AS h "
            "FROM t").arrow()["h"]
        con.close()
        part = pa.table({key: b[key], out_sum: h,
                         out_n: pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by(key).aggregate([(out_sum, "sum"), (out_n, "sum")])
        return part.rename_columns([key, out_sum, out_n])

    return (ds.select_columns(list(dict.fromkeys([key] + content_cols)))
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum(out_sum, alias_name=out_sum),
                                    Sum(out_n, alias_name=out_n)))


def share_of_group_bps(ds: Dataset, key: str, value_col: str,
                       carry_cols: list[str],
                       out_col: str = "bps") -> Dataset:
    """Each row's share of its group total in basis points:
    ``(value · 10000) // group_total`` — pure int64 (non-negative
    integer values required), so the window-share report is
    float-parity-free. One bounded grouped Sum for the totals, a
    zero-shuffle broadcast attach (``lookup_join``), one vectorized
    division."""
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    proj = list(dict.fromkeys([key, value_col] + carry_cols))
    tot = ds.select_columns([key, value_col]).groupby(key).aggregate(
        Sum(value_col, alias_name="_tot"))
    j = lookup_join(ds.select_columns(proj), tot, key)

    def share(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["_tot"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (v < 0).any() or (t <= 0).any():
            raise ValueError("share_of_group_bps requires non-negative "
                             "values and positive group totals")
        cols = {c: b[c] for c in proj}
        cols[out_col] = pa.array((v * 10000) // t, pa.int64())
        return pa.table(cols)

    return j.map_batches(share, batch_format="pyarrow")


def bag_except_counts(ds: Dataset, key_col: str, part_col: str,
                      keep: str, drop: str,
                      out_col: str = "n_excess") -> Dataset:
    """EXCEPT ALL with bag semantics, as counts: for each value, how
    many MORE times it appears in the ``keep`` partition than in the
    ``drop`` partition (positive rows only) — multiplicity-aware set
    difference without materializing repeated rows. One tagged pass +
    one bounded grouped Sum (per-batch Arrow group_by combiner)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        isk = pc.equal(b[part_col], keep)
        isd = pc.equal(b[part_col], drop)
        m = b.filter(pc.or_(isk, isd))
        flag = pc.equal(m[part_col], keep).to_numpy(zero_copy_only=False)
        t = pa.table({key_col: m[key_col],
                      "_k": pa.array(flag.astype(np.int64)),
                      "_d": pa.array((~flag).astype(np.int64))})
        return t.group_by(key_col).aggregate(
            [("_k", "sum"), ("_d", "sum")]) \
            .rename_columns([key_col, "_k", "_d"])

    agg = (ds.select_columns([key_col, part_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(key_col).aggregate(Sum("_k", alias_name="_k"),
                                       Sum("_d", alias_name="_d")))

    def excess(b: pa.Table) -> pa.Table:
        e = pc.subtract(b["_k"], b["_d"])
        m = pa.table({key_col: b[key_col], out_col: e}) \
            .filter(pc.greater(e, 0))
        return m

    return agg.map_batches(excess, batch_format="pyarrow")


def distinct_count_topk(ds: Dataset, key: str, distinct_col: str,
                        k: int, out_n: str = "n_distinct") -> Dataset:
    """Rank keys by DISTINCT count of another column, keep the top-k —
    e.g. top event types by distinct users. Two-level shrink: per-batch
    (key, value) dedup bounds the first exchange at pairs × blocks, a
    grouped count collapses to one row per key (bounded by the key
    vocabulary), and the final rank runs on that bounded table with a
    deterministic tie-break (count DESC, key ASC)."""
    def dedup(b: pa.Table) -> pa.Table:
        return b.group_by([key, distinct_col]).aggregate([])

    pairs = (ds.select_columns([key, distinct_col])
             .map_batches(dedup, batch_format="pyarrow")
             .groupby([key, distinct_col]).count()
             .groupby(key).count())

    def rank_batch(b: pa.Table) -> pa.Table:
        n = b["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = pc.sort_indices(pa.table({"n": pa.array(-n),
                                          "k": b[key]}),
                                sort_keys=[("n", "ascending"),
                                           ("k", "ascending")])
        o = order.to_numpy(zero_copy_only=False)[:k]
        return pa.table({
            key: b[key].take(pa.array(o)),
            "rank": pa.array(np.arange(1, len(o) + 1, dtype=np.int64)),
            out_n: pa.array(n[o], pa.int64()),
        })

    # key vocabulary is bounded: one coalesced pass ranks globally
    return pairs.repartition(1).map_batches(rank_batch,
                                            batch_format="pyarrow",
                                            batch_size=None)


def grouped_mode(ds: Dataset, key: str, value_col: str,
                 out_val: str = "mode_val", out_n: str = "n") -> Dataset:
    """Most frequent value per key with deterministic tie-break
    (count DESC, value ASC) — the ``mode()`` aggregate made reproducible.
    Scale shape: one (key, value) count shuffle (per-batch pyarrow
    group_by combiner), then a grouped argmax through ``grouped_apply``
    over the bounded count table."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key], value_col: b[value_col],
                      out_n: pa.array(np.ones(b.num_rows, dtype=np.int64))})
        return t.group_by([key, value_col]).aggregate(
            [(out_n, "sum")]).rename_columns([key, value_col, out_n])

    counts = (ds.select_columns([key, value_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([key, value_col]).aggregate(Sum(out_n, alias_name=out_n)))

    out_schema = pa.schema([
        (key, ds.schema().base_schema.field(key).type),
        (out_val, ds.schema().base_schema.field(value_col).type),
        (out_n, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        n = b[out_n].to_numpy(zero_copy_only=False)[lo:hi]
        # value ASC tie-break needs a sortable numpy key: rank-encode the
        # value column with an Arrow sort (object-dtype argsort pays a
        # Python richcompare per comparison)
        vals = b[value_col].combine_chunks().slice(lo, hi - lo)
        vrank = np.empty(hi - lo, dtype=np.int64)
        vrank[pc.sort_indices(vals).to_numpy(zero_copy_only=False)
              .astype(np.int64)] = np.arange(hi - lo)
        order = np.lexsort((vrank, -n, rid))
        # run firsts in the (rid, -n, vrank) order sit at the run starts
        first = order[starts - lo] + lo
        take = pa.array(first)
        return pa.table({
            key: b[key].take(take),
            out_val: b[value_col].take(take),
            out_n: b[out_n].take(take),
        }).cast(out_schema)

    return grouped_apply(counts, key, out_schema=out_schema, runs_fn=runs)


def grouped_ntile(ds: Dataset, key: str, order_cols: list[str], k: int,
                  out_col: str = "tile") -> Dataset:
    """NTILE(k) OVER (PARTITION BY key ORDER BY order_cols) — integer
    bucket 1..k per row, first ``n mod k`` buckets one row larger
    (standard SQL NTILE fill). Pass a total order (unique tiebreaker
    last) for determinism. One grouped sort; bucket assignment is pure
    integer arithmetic vectorized across all runs in a block."""
    proj = [key] + [c for c in order_cols if c != key]
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        lens = (ends - starts).astype(np.int64)
        pos = np.arange(hi - lo, dtype=np.int64) - np.repeat(starts - lo, lens)
        n = np.repeat(lens, lens)
        size_small = n // k
        n_large = n % k
        cut = n_large * (size_small + 1)
        in_large = pos < cut
        tile = np.where(
            in_large,
            pos // np.maximum(size_small + 1, 1),
            n_large + np.where(size_small > 0,
                               (pos - cut) // np.maximum(size_small, 1), 0))
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(tile + 1, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_dense_rank(ds: Dataset, key: str, value_col: str,
                       carry_cols: list[str] | None = None,
                       out_col: str = "drank") -> Dataset:
    """DENSE_RANK() OVER (PARTITION BY key ORDER BY value_col) — 1-based
    rank with no gaps; equal values share a rank. ``carry_cols`` ride
    along unchanged (include a unique id for a deterministic output
    surface). One grouped sort; rank assignment is a change-flag cumsum
    vectorized across all runs in a block. Values are compared, never
    computed on, so float parity with SQL is exact."""
    proj = ([key, value_col]
            + [c for c in (carry_cols or []) if c not in (key, value_col)])
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        val = b[value_col].to_numpy(zero_copy_only=False)[lo:hi]
        tie = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
               for c in proj[2:]]
        order = np.lexsort(tuple(reversed(tie)) + (val, rid))
        v = val[order]
        new = np.ones(hi - lo, dtype=bool)
        new[1:] = v[1:] != v[:-1]
        new[starts - lo] = True  # rank restarts at every run boundary
        ranks = np.cumsum(new)
        lens = (ends - starts).astype(np.int64)
        dense = ranks - np.repeat(ranks[starts - lo] - 1, lens)
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(dense, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_moments(ds: Dataset, key: str, value_col: str) -> Dataset:
    """Integer moment sketch per key: (n, sum_v, sum_sq) — the algebraic
    aggregate from which mean/variance/stddev derive downstream, kept as
    EXACT int64 so no order-dependent float sum ever rides the shuffle
    (the repo's float-parity rule). ``value_col`` must be exact-integral
    (casts with truncation). Per-batch pyarrow combiner → one grouped
    Sum over the key grain."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({key: b[key],
                      "n": pa.array(np.ones(len(v), dtype=np.int64)),
                      "sum_v": pa.array(v),
                      "sum_sq": pa.array(v * v)})
        return (t.group_by(key)
                .aggregate([("n", "sum"), ("sum_v", "sum"),
                            ("sum_sq", "sum")])
                .rename_columns([key, "n", "sum_v", "sum_sq"]))

    return (ds.select_columns([key, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("n", alias_name="n"),
                                    Sum("sum_v", alias_name="sum_v"),
                                    Sum("sum_sq", alias_name="sum_sq")))


def grouped_first_last(ds: Dataset, key: str, order_cols: list[str],
                       value_col: str, out_first: str = "first_val",
                       out_last: str = "last_val") -> Dataset:
    """FIRST_VALUE / LAST_VALUE OVER (PARTITION BY key ORDER BY
    order_cols ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    attached to every row. Values are selected, never computed — exact
    float parity. One grouped sort; the per-run first/last indices
    broadcast via one ``np.repeat``."""
    proj = ([key] + [c for c in order_cols if c != key]
            + ([value_col] if value_col not in order_cols
               and value_col != key else []))
    vt = ds.schema().base_schema.field(value_col).type
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_first, vt), (out_last, vt)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        lens = (ends - starts).astype(np.int64)
        first_pos = order[starts - lo] + lo
        last_pos = order[ends - lo - 1] + lo
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        vcol = b[value_col]
        cols[out_first] = vcol.take(pa.array(np.repeat(first_pos, lens)))
        cols[out_last] = vcol.take(pa.array(np.repeat(last_pos, lens)))
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def value_histogram(ds: Dataset, value_col: str, divisor: float) -> Dataset:
    """Fixed-width histogram: ``bin = floor(value / divisor)`` → count.
    The bin is a single IEEE divide + floor (identical in numpy and SQL,
    no accumulation), so parity is exact. Scale shape: each batch
    pre-aggregates to one row per distinct bin (pyarrow group_by — a
    combiner), then one grouped Sum over at most |bins| · blocks rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        bins = pc.cast(pc.floor(pc.divide(
            pc.cast(b[value_col], pa.float64()), float(divisor))), pa.int64())
        t = pa.table({"bin": bins, "n": pa.array(
            np.ones(len(bins), dtype=np.int64))})
        return t.group_by("bin").aggregate([("n", "sum")]) \
            .rename_columns(["bin", "n"])

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n")))


def distinct_except(ds: Dataset, key_col: str, part_col: str,
                    keep: str, drop: str) -> Dataset:
    """Set difference as aggregation: DISTINCT ``key_col`` values present
    in partition ``keep`` but absent from partition ``drop`` — EXCEPT
    semantics without materializing either side. One shuffle: per-batch
    membership flags collapse to one row per (key, flags) via a pyarrow
    group_by combiner, then a grouped Max + filter."""
    from ray.data.aggregate import Max

    def flags(b: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: b[key_col],
            "in_keep": pc.cast(pc.equal(b[part_col], keep), pa.int64()),
            "in_drop": pc.cast(pc.equal(b[part_col], drop), pa.int64()),
        })
        return t.group_by(key_col).aggregate(
            [("in_keep", "max"), ("in_drop", "max")]).rename_columns(
            [key_col, "in_keep", "in_drop"])

    agg = (ds.select_columns([key_col, part_col])
           .map_batches(flags, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Max("in_keep", alias_name="in_keep"),
                      Max("in_drop", alias_name="in_drop")))

    def sel(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b["in_keep"], 1), pc.equal(b["in_drop"], 0))
        return b.filter(m).select([key_col])

    return agg.map_batches(sel, batch_format="pyarrow")


def distinct_intersect(ds: Dataset, key_col: str, part_col: str,
                       part_a: str, part_b: str) -> Dataset:
    """Set intersection as aggregation: DISTINCT ``key_col`` values
    present in BOTH partitions — INTERSECT semantics without
    materializing either side. Same one-shuffle flag shape as
    ``distinct_except``."""
    from ray.data.aggregate import Max

    def flags(b: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: b[key_col],
            "in_a": pc.cast(pc.equal(b[part_col], part_a), pa.int64()),
            "in_b": pc.cast(pc.equal(b[part_col], part_b), pa.int64()),
        })
        return t.group_by(key_col).aggregate(
            [("in_a", "max"), ("in_b", "max")]).rename_columns(
            [key_col, "in_a", "in_b"])

    agg = (ds.select_columns([key_col, part_col])
           .map_batches(flags, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Max("in_a", alias_name="in_a"),
                      Max("in_b", alias_name="in_b")))

    def sel(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(b["in_a"], 1), pc.equal(b["in_b"], 1))
        return b.filter(m).select([key_col])

    return agg.map_batches(sel, batch_format="pyarrow")


def sliding_max(ds: Dataset, key: str, order_cols: list[str],
                value_col: str, frame: int,
                out_col: str = "win_max") -> Dataset:
    """Bounded-frame window max:
    ``max(value) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``.

    One grouped sort, then ``frame-1`` vectorized shift-max passes over
    the whole block (run boundaries masked) — O(frame·n) with no Python
    row loop; ``frame`` is a small constant by contract. Max only, no
    arithmetic, so float parity with SQL is exact."""
    proj = ([key] + [c for c in order_cols if c != key]
            + ([value_col] if value_col not in order_cols
               and value_col != key else []))
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, ds.schema().base_schema.field(value_col).type)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        v = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order]
        lens = (ends - starts).astype(np.int64)
        pos = np.arange(hi - lo, dtype=np.int64) - np.repeat(starts - lo, lens)
        out = v.copy()
        for s in range(1, frame):
            idx = np.nonzero(pos >= s)[0]  # stay inside the run
            out[idx] = np.maximum(out[idx], v[idx - s])
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(out)
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def running_cumsum(ds: Dataset, key: str, order_cols: list[str],
                   value_col: str, out_col: str = "run_sum") -> Dataset:
    """Running total of an INTEGER column:
    ``sum(value) OVER (PARTITION BY key ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)``. Integer-only by contract — float
    running sums are order-dependent and break oracle parity; callers
    cast exact-integral doubles down first. Vectorized: one block-wide
    cumsum minus repeated run-start offsets."""
    proj = ([key] + [c for c in order_cols if c != key]
            + ([value_col] if value_col not in order_cols
               and value_col != key else []))
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        v = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order] \
            .astype(np.int64)
        lens = (ends - starts).astype(np.int64)
        total = np.cumsum(v)
        base = total[starts - lo] - v[starts - lo]
        run_sum = total - np.repeat(base, lens)
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(run_sum, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def pivot_counts(ds: Dataset, row_key: str, col_key: str,
                 col_values: list[str]) -> Dataset:
    """Pivot ``col_key`` into count columns (``n_<value>``) per
    ``row_key`` — the distributed form of
    ``count(*) FILTER (WHERE col_key = v)`` conditional aggregation.

    ``col_values`` is the fixed, known-ahead vocabulary (schema must not
    depend on data). Scale shape: each batch pre-aggregates to one row
    per distinct row_key (pyarrow group_by — a combiner), then one
    grouped Sum over at most |keys| · blocks rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        cols = {row_key: b[row_key]}
        for v in col_values:
            cols[f"n_{v}"] = pc.cast(pc.equal(b[col_key], v), pa.int64())
        t = pa.table(cols)
        # pyarrow group_by emits [key, <agg>_sum...]
        return t.group_by(row_key).aggregate(
            [(f"n_{v}", "sum") for v in col_values]).rename_columns(
            [row_key] + [f"n_{v}" for v in col_values])

    aggs = [Sum(f"n_{v}", alias_name=f"n_{v}") for v in col_values]
    return (ds.select_columns([row_key, col_key])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(row_key).aggregate(*aggs))


def running_seq(ds: Dataset, key: str, order_cols: list[str],
                out_col: str = "seq") -> Dataset:
    """1-based sequence number per key ordered by ``order_cols`` —
    the distributed form of
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_cols)``.

    One grouped sort; numbering is vectorized across all runs in a block
    (arange minus repeated run starts). Emits every input row."""
    proj = [key] + [c for c in order_cols if c != key]
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        lens = ends - starts
        pos = np.arange(len(rid), dtype=np.int64) - np.repeat(starts - lo, lens)
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = pa.array(pos + 1, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_rank(ds: Dataset, key: str, value_col: str,
                 carry_cols: list[str] | None = None,
                 out_rank: str = "rnk",
                 out_pct: str = "pct_rank",
                 out_cume: str = "cume_dist") -> Dataset:
    """RANK() + PERCENT_RANK() OVER (PARTITION BY key ORDER BY
    value_col) — 1-based rank with gaps (ties share the rank of their
    first peer; the next distinct value jumps past the peer group).
    ``pct_rank = (rank - 1) / (n - 1)`` (0.0 for single-row partitions)
    and ``cume_dist`` (peers through the END of the tie group over n)
    are each ONE IEEE double division on two exact integers, so they are
    bit-identical to the SQL engine's — no accumulated float crosses the
    compare. ``carry_cols`` ride along (include a unique id for a
    deterministic output surface).

    One grouped sort; rank assignment is vectorized across all runs in
    a block: peer-group anchors (value-change positions, forced at run
    starts) forward-fill through a global-position ``maximum.accumulate``
    — monotone positions make cross-run carry impossible."""
    proj = ([key, value_col]
            + [c for c in (carry_cols or []) if c not in (key, value_col)])
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_rank, pa.int64()), (out_pct, pa.float64()),
           (out_cume, pa.float64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        vcol = b[value_col].combine_chunks()
        if pa.types.is_string(vcol.type) or \
                pa.types.is_large_string(vcol.type):
            # no object-dtype lexsort (Python richcompare per element):
            # dictionary codes remapped to the dictionary's sort ranks
            # order AND compare exactly like the strings
            enc = vcol.dictionary_encode()
            drank = np.empty(len(enc.dictionary), dtype=np.int64)
            drank[pc.sort_indices(enc.dictionary)
                  .to_numpy(zero_copy_only=False).astype(np.int64)] = \
                np.arange(len(enc.dictionary))
            val = drank[enc.indices.to_numpy(zero_copy_only=False)
                        .astype(np.int64)[lo:hi]]
        else:
            val = vcol.to_numpy(zero_copy_only=False)[lo:hi]
        tie = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
               for c in proj[2:]]
        order = np.lexsort(tuple(reversed(tie)) + (val, rid))
        v = val[order]
        span = hi - lo
        new = np.ones(span, dtype=bool)
        new[1:] = v[1:] != v[:-1]
        new[starts - lo] = True  # peer groups restart at run boundaries
        idx = np.arange(span, dtype=np.int64)
        anchor = np.maximum.accumulate(np.where(new, idx, -1))
        lens = (ends - starts).astype(np.int64)
        run_start = np.repeat((starts - lo).astype(np.int64), lens)
        rank = anchor - run_start + 1
        n = np.repeat(lens, lens)
        pct = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        # last index of each tie group: backward-min over next-change
        # markers (monotone indices make cross-run carry impossible —
        # a run's own closing marker bounds anything later)
        is_last = np.empty(span, dtype=bool)
        is_last[:-1] = new[1:]
        is_last[-1] = True
        mark = np.where(is_last, idx, span)
        last = np.minimum.accumulate(mark[::-1])[::-1]
        cume = (last - run_start + 1) / n
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_rank] = pa.array(rank, pa.int64())
        cols[out_pct] = pa.array(pct, pa.float64())
        cols[out_cume] = pa.array(cume, pa.float64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def sliding_sum(ds: Dataset, key: str, order_cols: list[str],
                value_col: str, frame: int,
                out_col: str = "win_sum") -> Dataset:
    """Bounded-frame window sum over an INTEGER column:
    ``sum(value) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``. The integer-only
    contract keeps float order-dependence out of the oracle compare
    (same rule as ``running_cumsum``).

    One grouped sort, then ONE block-wide cumsum: the window sum is
    ``cum[i] - cum[window_start - 1]`` with the start clipped to the
    run boundary — cross-run cumsum contributions cancel exactly, so
    no per-frame pass and no Python row loop (O(n) regardless of
    frame)."""
    proj = ([key] + [c for c in order_cols if c != key]
            + ([value_col] if value_col not in order_cols
               and value_col != key else []))
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
                for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        v = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order] \
            .astype(np.int64)
        lens = (ends - starts).astype(np.int64)
        run_start = np.repeat(
            np.cumsum(np.concatenate([[0], lens[:-1]])), lens)
        pos = np.arange(hi - lo, dtype=np.int64) - run_start
        c = np.cumsum(v)
        wstart = run_start + np.maximum(pos - frame + 1, 0)
        win = c - np.where(wstart > 0, c[wstart - 1], 0)
        take = pa.array(order + lo)
        cols = {col: b[col].take(take) for col in proj}
        cols[out_col] = pa.array(win, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def range_frame_sum(ds: Dataset, key: str, ts_col: str, value_col: str,
                    delta_us: int, out_col: str = "win_sum") -> Dataset:
    """Value-based window frame over an INTEGER column:
    ``sum(value) OVER (PARTITION BY key ORDER BY ts
    RANGE BETWEEN delta PRECEDING AND CURRENT ROW)`` — the RANGE
    complement of ``sliding_sum``'s ROWS frame. SQL RANGE semantics
    kept exactly: all PEERS of the current row (equal ts) are inside
    the frame, even ones later in the sort.

    One grouped sort + ONE cumsum; both frame boundaries come from two
    vectorized searchsorted probes over run-offset timestamps (each
    run's ts shifted by run_index × K with K > span + delta, so the
    concatenated block array is sorted and a probe can never cross a
    run boundary) — O(n log n) in the block, no per-row Python."""
    proj = [key, ts_col, value_col]
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        ts = pc.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((ts, rid))
        r, t = rid[order], ts[order]
        v = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order] \
            .astype(np.int64)
        t0 = t - t.min()
        K = np.int64(t0.max()) + np.int64(delta_us) + 2
        tshift = t0 + r * K
        c = np.cumsum(v)
        left = np.searchsorted(tshift, tshift - delta_us, side="left")
        right = np.searchsorted(tshift, tshift, side="right")
        win = c[right - 1] - np.where(left > 0, c[left - 1], 0)
        take = pa.array(order + lo)
        cols = {col: b[col].take(take) for col in proj}
        cols[out_col] = pa.array(win, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def profile_nulls(ds: Dataset, columns: list[str] | None = None) -> Dataset:
    """Column-level completeness profile: one row per column with total
    and null counts — the data-quality scan that decides which fields a
    pipeline can trust. ONE streaming pass: each batch emits a
    (col_name, n, n_null) micro-table straight off the Arrow validity
    bitmaps (no value ever inspected), and a tiny grouped Sum collapses
    the partials — the exchange moves columns × blocks rows, never
    data."""
    from ray.data.aggregate import Sum

    cols = columns or [f.name for f in ds.schema().base_schema]
    name_arr = pa.array(sorted(cols), pa.string())

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "col_name": name_arr,
            "n": pa.array([b.num_rows] * len(name_arr), pa.int64()),
            "n_null": pa.array([b[c].null_count for c in sorted(cols)],
                               pa.int64()),
        })

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow")
    return parts.groupby("col_name").aggregate(
        Sum("n", alias_name="n"), Sum("n_null", alias_name="n_null"))


def pareto_frontier(ds: Dataset, x_col: str, y_col: str,
                    carry: list[str] | None = None) -> Dataset:
    """2-D Pareto frontier (maximize both): rows not dominated by any
    other row (dominated = another row is ≥ in both dims and > in at
    least one; exact duplicates don't dominate each other — all kept).

    The frontier is an ASSOCIATIVE reduction — frontier(A ∪ B) =
    frontier(frontier(A) ∪ frontier(B)) — so each block shrinks to its
    own (tiny) partial frontier before the single-block final merge:
    the classic combiner shape, no global sort of the corpus. Per-block
    work is one lexsort + grouped cummax sweep, fully vectorized.
    Output values are SELECTED rows, never computed — byte-exact parity
    with the n² NOT-EXISTS dominance oracle."""
    carry = carry or []
    cols = [x_col, y_col] + carry

    def frontier(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(cols)
        x = b[x_col].to_numpy(zero_copy_only=False)
        y = b[y_col].to_numpy(zero_copy_only=False)
        # x desc, then y desc — reversed ascending lexsort, so
        # non-negatable dtypes (datetime64) work too
        order = np.lexsort((y, x))[::-1]
        xs, ys = x[order], y[order]
        # group runs of equal x (descending): within a group only the
        # max-y rows survive; across groups a strict-x running max of
        # group maxima dominates anything ≤ it
        gstart = np.nonzero(np.concatenate([[True], xs[1:] != xs[:-1]]))[0]
        gid = np.cumsum(np.concatenate([[0], (xs[1:] != xs[:-1])
                                        .astype(np.int64)]))
        gy = ys[gstart]  # y desc within group → first is the group max
        cmax = np.maximum.accumulate(gy)
        keep = ys == gy[gid]
        nf = gid > 0  # first x-group has no strictly-greater-x rival
        # dtype-safe (no -inf sentinel): int64/datetime64 y unharmed
        keep[nf] &= ys[nf] > cmax[gid[nf] - 1]
        return b.take(pa.array(order[keep])).select(cols)

    partial = ds.select_columns(cols).map_batches(
        frontier, batch_format="pyarrow")
    return partial.repartition(1).map_batches(
        frontier, batch_format="pyarrow", batch_size=None)


def grouped_islands(ds: Dataset, key: str, seq_col: str) -> Dataset:
    """Gaps-and-islands: maximal runs of CONSECUTIVE integers in
    ``seq_col`` per key → (key, island_start, island_end, n) — the
    distributed form of the classic ``seq - ROW_NUMBER()`` grouping
    trick. All-integer outputs → byte-exact oracle parity.

    One grouped sort (inside grouped_apply); island detection is a
    single vectorized diff across every run in a block — a new island
    starts at a run boundary or wherever the sorted sequence steps by
    ≠ 1. Distinct ``seq_col`` values per key assumed (true for id
    columns; duplicates would merge into one island both here and in
    the SQL trick only if deduped first)."""
    s = ds.schema().base_schema
    out_schema = pa.schema([(key, s.field(key).type),
                            ("island_start", pa.int64()),
                            ("island_end", pa.int64()),
                            ("n", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        seq = b[seq_col].to_numpy(zero_copy_only=False)[lo:hi] \
            .astype(np.int64)
        order = np.lexsort((seq, rid))
        sseq = seq[order]
        new_island = np.concatenate(
            [[True], (rid[order][1:] != rid[order][:-1])
             | (sseq[1:] != sseq[:-1] + 1)])
        is_starts = np.nonzero(new_island)[0]
        is_ends = np.concatenate([is_starts[1:], [len(sseq)]])
        row_take = order[is_starts] + lo
        return pa.table({
            key: b[key].take(pa.array(row_take)),
            "island_start": pa.array(sseq[is_starts]),
            "island_end": pa.array(sseq[is_ends - 1]),
            "n": pa.array(is_ends - is_starts),
        }).cast(out_schema)

    return grouped_apply(ds.select_columns([key, seq_col]), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_bits(ds: Dataset, key: str, value_col: str) -> Dataset:
    """Per-key bitwise OR and AND of an integer column — mergeable
    (associative + commutative), so a per-batch partial collapses each
    block to ≤ distinct-keys rows before the one grouped exchange; the
    final fold reuses the same reduceat kernel inside grouped_apply."""
    s = ds.schema().base_schema
    out_schema = pa.schema([(key, s.field(key).type),
                            ("bits_or", pa.int64()),
                            ("bits_and", pa.int64())])

    def _fold(keyc, orv, andv):
        order = np.argsort(keyc, kind="stable")
        ks = keyc[order]
        rs = np.nonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))[0]
        return (order[rs],
                np.bitwise_or.reduceat(orv[order], rs),
                np.bitwise_and.reduceat(andv[order], rs))

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        codes = pc.dictionary_encode(b[key]).combine_chunks().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        take, orv, andv = _fold(codes, v, v)
        return pa.table({key: b[key].take(pa.array(take)),
                         "bits_or": pa.array(orv),
                         "bits_and": pa.array(andv)}).cast(out_schema)

    partials = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow")

    def final_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        orv = b["bits_or"].to_numpy(zero_copy_only=False)[lo:hi]
        andv = b["bits_and"].to_numpy(zero_copy_only=False)[lo:hi]
        rs = starts - lo
        return pa.table({
            key: b[key].take(pa.array(starts)),
            "bits_or": pa.array(np.bitwise_or.reduceat(orv, rs)),
            "bits_and": pa.array(np.bitwise_and.reduceat(andv, rs)),
        }).cast(out_schema)

    return grouped_apply(partials, key, out_schema=out_schema,
                         runs_fn=final_runs)


def running_distinct(ds: Dataset, key: str, value_col: str,
                     order_cols: list[str], id_col: str) -> Dataset:
    """Cumulative COUNT(DISTINCT value) per key in event order — every
    row annotated with how many distinct values its key has seen so far
    (the window form SQL expresses as SUM(first-occurrence flag) OVER).
    One grouped sort; first-occurrence flags come from ONE extra lexsort
    over (run, value, order) and the cumulative count from a segmented
    cumsum — both vectorized across every run in a block."""
    s = ds.schema().base_schema
    out_schema = pa.schema([(key, s.field(key).type),
                            (id_col, s.field(id_col).type),
                            ("n_distinct", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        vals = pc.dictionary_encode(
            b[value_col].slice(lo, hi - lo).combine_chunks()).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ordv = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
                for c in order_cols]
        # event order within runs
        ev_order = np.lexsort(tuple(reversed(ordv)) + (rid,))
        pos = np.empty(hi - lo, np.int64)
        pos[ev_order] = np.arange(hi - lo)      # event rank in block
        # first occurrence of (run, value) = the min event rank
        vo = np.lexsort((pos, vals, rid))
        first = np.concatenate([[True], (rid[vo][1:] != rid[vo][:-1])
                                | (vals[vo][1:] != vals[vo][:-1])])
        flag = np.zeros(hi - lo, np.int64)
        flag[vo[first]] = 1
        # segmented cumsum of flags in event order
        f_ev = flag[ev_order]
        cs = np.cumsum(f_ev)
        run_of_ev = rid[ev_order]
        run_first_ev = np.nonzero(np.concatenate(
            [[True], run_of_ev[1:] != run_of_ev[:-1]]))[0]
        base = np.repeat(cs[run_first_ev] - f_ev[run_first_ev],
                         np.diff(np.concatenate([run_first_ev,
                                                 [hi - lo]])))
        nd = cs - base
        take = pa.array(ev_order + lo)
        return pa.table({
            key: b[key].take(take),
            id_col: b[id_col].take(take),
            "n_distinct": pa.array(nd),
        }).cast(out_schema)

    proj = list(dict.fromkeys([key, value_col, id_col] + order_cols))
    return grouped_apply(ds.select_columns(proj), key,
                         out_schema=out_schema, runs_fn=runs)


def grouped_intersection_count(a: Dataset, b: Dataset, key: str,
                               val: str) -> Dataset:
    """Per-key set-intersection size between two datasets' value sets —
    the retrieval-evaluation primitive (recall@k = overlap of an
    approximate and an exact ranking per query). Values are assumed
    unique per (key, side) (true for rankings). One tagged union, one
    grouped Sum over (key, val) bitmask tags, one bounded count — no
    join."""
    from ray.data.aggregate import Sum

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({key: t[key], val: t[val],
                             "side": pa.array([side] * t.num_rows,
                                              pa.int64())})
        return f

    both = (a.select_columns([key, val])
            .map_batches(tag(1), batch_format="pyarrow")
            .union(b.select_columns([key, val])
                   .map_batches(tag(2), batch_format="pyarrow")))
    summed = both.groupby([key, val]).aggregate(
        Sum("side", alias_name="side"))
    inter = summed.map_batches(
        lambda t: t.filter(pc.equal(t["side"], 3)),
        batch_format="pyarrow")
    return (inter.groupby(key).count()
            .map_batches(lambda t: t.rename_columns([key, "n_common"]),
                         batch_format="pyarrow"))


def first_digit_profile(ds: Dataset, col: str) -> Dataset:
    """Benford-style first-significant-digit histogram of a positive
    numeric column — the classic data-forensics profile (fabricated,
    truncated or unit-mixed numeric feeds diverge from the expected
    log-uniform digit law). Rows with value < 1 are excluded (no
    leading significant digit in the integer part). One row per digit:
    (digit ∈ 1..9, n).

    Shape: digit extraction is pure Arrow — floor → int64 → string →
    first code unit (NO float log10, so exact at powers of ten);
    per-batch partial counts combine first, so the one grouped
    exchange moves ≤ 9 rows per block."""
    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(pc.floor(pc.cast(b[col], pa.float64())), pa.int64())
        x = pc.filter(x, pc.greater_equal(x, 1))
        d = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(x, pa.string()), 0, 1), pa.int64())
        g = pa.table({"digit": d}).group_by("digit") \
            .aggregate([([], "count_all")])
        return pa.table({"digit": g["digit"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    counts = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("digit").sum("n")
    return counts.map_batches(
        lambda b: pa.table({"digit": b["digit"],
                            "n": pc.cast(b["sum(n)"], pa.int64())}),
        batch_format="pyarrow")


def rule_mask_profile(ds: Dataset, rules) -> Dataset:
    """Data-validation rule profile (expectation-suite / quarantine
    routing summary): ``rules`` is an ordered list of ``(name,
    predicate)`` where ``predicate(batch)`` returns a boolean array;
    every row gets a bitmask (rule i → bit i, NULL predicate = rule
    not violated) and the output is one row per observed mask with its
    row count — mask 0 counts the fully-clean rows, and any per-rule
    or per-combination total is a mask-bit rollup of this table.

    Shape: predicates are vectorized Arrow kernels; per-batch partial
    counts combine first, so the exchange moves ≤ 2**len(rules) rows
    per block."""
    def partial(b: pa.Table) -> pa.Table:
        mask = np.zeros(b.num_rows, dtype=np.int64)
        for i, (_name, fn) in enumerate(rules):
            bits = pc.fill_null(pc.cast(fn(b), pa.bool_()), False)
            mask |= bits.to_numpy(zero_copy_only=False) \
                .astype(np.int64) << i
        g = pa.table({"mask": pa.array(mask, pa.int64())}) \
            .group_by("mask").aggregate([([], "count_all")])
        return pa.table({"mask": g["mask"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("mask").sum("n")
    return counts.map_batches(
        lambda b: pa.table({"mask": b["mask"],
                            "n": pc.cast(b["sum(n)"], pa.int64())}),
        batch_format="pyarrow")


def join_skew_profile(left: Dataset, right: Dataset, left_key: str,
                      right_key: str, k: int = 20) -> Dataset:
    """Pre-shuffle join planning: per-key fan-out of ``left ⋈ right``
    — the top-``k`` keys by output cardinality ``n_left * n_right``
    (ties broken by key), the skew check run BEFORE committing to a
    hash join (a handful of hot keys producing most of the output is
    the signal to salt or broadcast). One row per hot key:
    (key, n_left, n_right, pairs).

    Shape: both sides collapse to per-key counts first (grouped
    count — the only corpus-sized exchange), so the join itself is
    counts-sized; top-k is a sort + limit over the counts table."""
    from payor_linkage.rayutil import smart_join

    lc = left.select_columns([left_key]).groupby(left_key).count() \
        .map_batches(lambda b: pa.table(
            {"key": b[left_key],
             "n_left": pc.cast(b["count()"], pa.int64())}),
            batch_format="pyarrow")
    rc = right.select_columns([right_key]).groupby(right_key).count() \
        .map_batches(lambda b: pa.table(
            {"key": b[right_key],
             "n_right": pc.cast(b["count()"], pa.int64())}),
            batch_format="pyarrow")
    j = smart_join(lc, rc, "key")

    def pairs(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pairs", pc.multiply_checked(b["n_left"], b["n_right"]))

    return (j.map_batches(pairs, batch_format="pyarrow")
            .sort(["pairs", "key"], descending=[True, False]).limit(k))


def histogram_drift(old: Dataset, new: Dataset, value_col: str,
                    divisor: float) -> Dataset:
    """Distribution-drift monitor between two snapshots: fixed-width
    bin counts side by side — (bin, n_old, n_new, delta) — the
    histogram-level diff run between pipeline generations (PSI-style
    drift gates consume exactly this table; counts stay integers so
    the check is exact, the float ratio belongs downstream).

    Tagged-union grouped aggregate (the CDC shape): each side
    collapses to per-batch (bin, n) partials with its count in its OWN
    column, then ONE union + grouped sum — no join, one exchange over
    ≤ |bins| rows per block."""
    from ray.data.aggregate import Sum

    def partial(is_new: bool):
        def f(b: pa.Table) -> pa.Table:
            bins = pc.cast(pc.floor(pc.divide(
                pc.cast(b[value_col], pa.float64()), float(divisor))),
                pa.int64())
            g = pa.table({"bin": bins}).group_by("bin") \
                .aggregate([([], "count_all")])
            n = pc.cast(g["count_all"], pa.int64())
            zero = pa.array(np.zeros(len(g), dtype=np.int64))
            return pa.table({"bin": g["bin"],
                             "n_old": zero if is_new else n,
                             "n_new": n if is_new else zero})
        return f

    o = old.select_columns([value_col]).map_batches(
        partial(False), batch_format="pyarrow")
    n = new.select_columns([value_col]).map_batches(
        partial(True), batch_format="pyarrow")
    merged = o.union(n).groupby("bin").aggregate(
        Sum("n_old", alias_name="n_old"),
        Sum("n_new", alias_name="n_new"))

    def fin(b: pa.Table) -> pa.Table:
        no = pc.cast(b["n_old"], pa.int64())
        nn = pc.cast(b["n_new"], pa.int64())
        return pa.table({"bin": b["bin"], "n_old": no, "n_new": nn,
                         "delta": pc.subtract(nn, no)})

    return merged.map_batches(fin, batch_format="pyarrow")


def k_anonymity_risk(ds: Dataset, quasi_cols: list[str],
                     k: int) -> Dataset:
    """k-anonymity risk profile: the quasi-identifier combinations
    shared by FEWER than ``k`` rows (re-identifiable cohorts), with
    their row counts — the privacy check run before releasing a
    column subset. One grouped count over the quasi-identifier tuple;
    the under-k filter runs in a map pass (``Dataset.filter(expr=…)``
    cannot parse aggregate column names). Quasi-identifier columns keep
    their input dtypes (Ray's groupby upcasts narrow ints)."""
    base = ds.schema().base_schema
    key_types = {c: base.field(c).type for c in quasi_cols}
    counts = ds.select_columns(quasi_cols).groupby(quasi_cols).count()

    def under(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b["count()"], k))
        cols = {c: pc.cast(t[c], key_types[c]) for c in quasi_cols}
        cols["n"] = pc.cast(t["count()"], pa.int64())
        return pa.table(cols)

    return counts.map_batches(under, batch_format="pyarrow")


def grouped_corr_stats(ds: Dataset, key: str, x_col: str,
                       y_col: str) -> Dataset:
    """Bivariate correlation sufficient statistics per key:
    (n, sum_x, sum_y, sum_xx, sum_yy, sum_xy) as EXACT int64 — the
    algebraic sketch from which Pearson r / covariance / OLS slope
    derive downstream without any order-dependent float sum riding the
    shuffle (the repo's float-parity rule; inputs cast with
    truncation, so both engine and oracle floor identically).

    Per-batch pyarrow combiner → one grouped Sum over the key grain
    (the ``grouped_moments`` shape, widened to the cross term)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({key: b[key],
                      "n": pa.array(np.ones(len(x), dtype=np.int64)),
                      "sum_x": pa.array(x), "sum_y": pa.array(y),
                      "sum_xx": pa.array(x * x),
                      "sum_yy": pa.array(y * y),
                      "sum_xy": pa.array(x * y)})
        cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
        return (t.group_by(key).aggregate([(c, "sum") for c in cols])
                .rename_columns([key] + cols))

    return (ds.select_columns([key, x_col, y_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(
                *[Sum(c, alias_name=c)
                  for c in ["n", "sum_x", "sum_y", "sum_xx",
                            "sum_yy", "sum_xy"]]))


def mad_outliers(ds: Dataset, key: str, value_col: str, id_col: str,
                 k: float = 3.0) -> Dataset:
    """Robust per-key outlier flags: rows where |value − median| >
    k · MAD — the standard robust filter run before training
    statistics (mean/σ break on the very rows being hunted). Both
    median and MAD are SELECTED elements (``grouped_mad``'s
    quantile_disc semantics), the comparison operands are single
    float ops identical on any engine, and the output carries only
    selected values — no computed float ever leaves the operator.

    Scale shape: two grouped-quantile passes (via ``grouped_mad``),
    the bounded per-key (med, mad) table broadcast back
    (``lookup_join``), one vectorized filter map."""
    from payor_linkage.rayutil import lookup_join

    stats = grouped_mad(ds.select_columns([key, value_col]), key,
                        value_col)
    joined = lookup_join(ds.select_columns([key, id_col, value_col]),
                         stats, key)

    def flag(b: pa.Table) -> pa.Table:
        dev = pc.abs(pc.subtract(b[value_col], b["med"]))
        m = pc.greater(dev, pc.multiply(b["mad"], k))
        return b.filter(m)

    return joined.map_batches(flag, batch_format="pyarrow")


def l_diversity_risk(ds: Dataset, quasi_cols: list[str],
                     sensitive_col: str, l: int) -> Dataset:
    """l-diversity risk profile (companion to ``k_anonymity_risk``):
    quasi-identifier cohorts whose SENSITIVE attribute takes fewer
    than ``l`` distinct values — cohorts where knowing the
    quasi-identifiers reveals the sensitive value. Emits
    (quasi..., n_rows, n_sensitive) for the at-risk cohorts.

    Shape: per-batch (quasi, sensitive) collapse, one grouped sum
    over the (quasi, sensitive) grain, then a counts-sized second
    grouped sum over the quasi grain — the distinct count never
    re-touches raw rows. Quasi columns keep their input dtypes."""
    from ray.data.aggregate import Sum

    base = ds.schema().base_schema
    key_types = {c: base.field(c).type for c in quasi_cols}
    cols = quasi_cols + [sensitive_col]

    def partial(b: pa.Table) -> pa.Table:
        g = (b.select(cols).group_by(cols)
             .aggregate([([], "count_all")]))
        return g.rename_columns(cols + ["n"])

    pair_counts = (ds.select_columns(cols)
                   .map_batches(partial, batch_format="pyarrow")
                   .groupby(cols).aggregate(Sum("n", alias_name="n")))

    def to_quasi(b: pa.Table) -> pa.Table:
        t = {c: b[c] for c in quasi_cols}
        t["n_rows"] = pc.cast(b["n"], pa.int64())
        t["n_sensitive"] = pa.array(np.ones(len(b), dtype=np.int64))
        return pa.table(t)

    cohorts = (pair_counts.map_batches(to_quasi, batch_format="pyarrow")
               .groupby(quasi_cols)
               .aggregate(Sum("n_rows", alias_name="n_rows"),
                          Sum("n_sensitive", alias_name="n_sensitive")))

    def under(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b["n_sensitive"], l))
        out = {c: pc.cast(t[c], key_types[c]) for c in quasi_cols}
        out["n_rows"] = pc.cast(t["n_rows"], pa.int64())
        out["n_sensitive"] = pc.cast(t["n_sensitive"], pa.int64())
        return pa.table(out)

    return cohorts.map_batches(under, batch_format="pyarrow")


def grouped_nth_value(ds: Dataset, key: str, order_cols: list[str],
                      value_col: str, n: int,
                      out_col: str = "nth_val") -> Dataset:
    """NTH_VALUE(value, n) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) attached
    to every row — NULL when the partition has fewer than ``n`` rows
    (SQL semantics). Values are selected, never computed — exact float
    parity. One grouped sort; the per-run nth indices broadcast via one
    ``np.repeat`` (the ``grouped_first_last`` shape)."""
    proj = ([key] + [c for c in order_cols if c != key]
            + ([value_col] if value_col not in order_cols
               and value_col != key else []))
    vt = ds.schema().base_schema.field(value_col).type
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, vt)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
                for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        lens = (ends - starts).astype(np.int64)
        # nth position per run where it exists; sentinel -1 → null
        nth_pos = np.where(lens >= n, order[np.minimum(
            starts - lo + n - 1, ends - lo - 1)] + lo, -1)
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        rep = np.repeat(nth_pos, lens)
        vals = b[value_col].take(
            pa.array(np.where(rep >= 0, rep, 0)))
        cols[out_col] = pc.if_else(pa.array(rep >= 0), vals,
                                   pa.scalar(None, vt))
        return pa.table(cols).cast(out_schema)

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(ds.select_columns(list(dict.fromkeys(
        proj + order_cols))), key, out_schema=out_schema, runs_fn=runs)


def grouped_trend(ds: Dataset, key_cols: list[str], x_col: str,
                  y_col: str) -> Dataset:
    """Per-group OLS trend of integer ``y`` against integer ``x`` as
    EXACT integer sufficient statistics: slope = slope_num/slope_den
    with slope_num = n·Σxy − Σx·Σy and slope_den = n·Σx² − (Σx)².
    Emitting the numerator/denominator (never the float quotient)
    keeps the result order-independent and oracle-exact; both values
    are invariant to any constant shift of x, so magnitudes can be
    bounded upstream by re-basing x without changing the output.

    Scale shape: the map-combine pattern — each batch pre-aggregates
    (n, Σx, Σy, Σxy, Σx²) per key with an in-batch Arrow group_by, so
    the shuffle carries one row per (key × block), then one small
    grouped sum and a final integer kernel. Inputs must fit int64
    after the products (≈ |x|·|y|·n < 2⁶³)."""
    from ray.data.aggregate import Sum

    sums = ["n", "sx", "sy", "sxy", "sxx"]

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(b[x_col], pa.int64())
        y = pc.cast(b[y_col], pa.int64())
        t = pa.table({
            **{k: b[k] for k in key_cols},
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "sx": x, "sy": y, "sxy": pc.multiply(x, y),
            "sxx": pc.multiply(x, x)})
        return (t.group_by(key_cols)
                .aggregate([(c, "sum") for c in sums])
                .rename_columns(key_cols + sums))

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(key_cols if len(key_cols) > 1 else key_cols[0])
           .aggregate(*[Sum(c, alias_name=c) for c in sums]))

    def finalize(b: pa.Table) -> pa.Table:
        n, sx, sy = b["n"], b["sx"], b["sy"]
        num = pc.subtract(pc.multiply(n, b["sxy"]), pc.multiply(sx, sy))
        den = pc.subtract(pc.multiply(n, b["sxx"]), pc.multiply(sx, sx))
        return pa.table({**{k: b[k] for k in key_cols}, "n": n,
                         "slope_num": num, "slope_den": den})

    return agg.map_batches(finalize, batch_format="pyarrow")


def grouping_sets_counts(ds: Dataset, cols: list[str],
                         sets: list[list[str]],
                         total_label: str = "ALL"):
    """Arbitrary ``GROUP BY GROUPING SETS`` counts — the general form
    ROLLUP and CUBE specialize (each set lists the columns it groups
    by; the rest are encoded as ``total_label``, so no NULL crosses
    the oracle compare; key columns must be strings free of the
    label). Duplicate sets duplicate rows, exactly as in SQL.

    Scale shape: ONE distributed shuffle total — the finest-level
    (all-columns) aggregate; every requested set folds driver-side
    from that bounded result (the `rollup_counts` pattern). Returns a
    pyarrow Table ``(cols..., n)``."""
    import pandas as pd

    for s in sets:
        unknown = set(s) - set(cols)
        if unknown:
            raise ValueError(f"grouping_sets_counts: {unknown} not in "
                             f"{cols}")
    base = ds.groupby(cols).count().rename_columns(
        {"count()": "n"}).to_pandas()
    frames = []
    for s in sets:
        keep = [c for c in cols if c in s]  # canonical column order
        f = (base.groupby(keep, as_index=False)["n"].sum() if keep
             else base[["n"]].sum().to_frame().T)
        for c in cols:
            if c not in keep:
                f[c] = total_label
        frames.append(f[cols + ["n"]])
    out = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(out[cols + ["n"]],
                                preserve_index=False).cast(
        pa.schema([(c, pa.string()) for c in cols] + [("n", pa.int64())]))

"""Enrichment / association operators: broadcast range lookup (map a
numeric column to a labeled tier by boundary table — the IP-to-geo /
price-band ETL step) and within-key item co-occurrence counts (the
market-basket / association-mining primitive).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from payor_linkage.rayutil import grouped_apply


def range_lookup(ds: Dataset, value_col: str, boundaries: list[float],
                 labels: list[str], out_col: str = "tier") -> Dataset:
    """Attach the label of the half-open range a value falls in:
    ``labels[i]`` covers ``boundaries[i-1] <= v < boundaries[i]``
    (``labels[0]`` below the first boundary, ``labels[-1]`` at/above the
    last; ``len(labels) == len(boundaries) + 1``). Nulls stay null.

    Map-only: the (tiny, driver-held) boundary table rides the closure;
    each batch is ONE ``np.searchsorted`` probe + a dictionary take —
    never a join, never a shuffle. The 100 TB shape for any bounded
    lookup keyed by range rather than equality."""
    if len(labels) != len(boundaries) + 1:
        raise ValueError("need len(labels) == len(boundaries) + 1")
    bounds = np.asarray(boundaries, dtype=np.float64)
    if (np.diff(bounds) <= 0).any():
        raise ValueError("boundaries must be strictly increasing")
    lab_arr = pa.array(labels, pa.string())

    def f(b: pa.Table) -> pa.Table:
        col = b[value_col].combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(bounds, v, side="right")
        tier = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype(np.int32)), lab_arr).cast(pa.string())
        if col.null_count:
            tier = pc.if_else(pc.is_valid(col), tier,
                              pa.scalar(None, pa.string()))
        return b.append_column(out_col, tier)

    return ds.map_batches(f, batch_format="pyarrow")


def cooccurrence_counts(ds: Dataset, key: str, item_col: str) -> Dataset:
    """Global co-occurrence counts: for every unordered pair of DISTINCT
    items appearing under the same key, the number of keys where both
    appear (``item_a < item_b``) — the self-join + GROUP BY
    market-basket shape without a self-join.

    Partitioning assumption (document per the build guide): distinct
    items per key are bounded by the item vocabulary (event types,
    tags), so per-key pair fan-out is O(vocab²) — tiny — while keys are
    many. One grouped sort; within-block pair emission is pure index
    arithmetic vectorized across all runs (no per-run Python loop), and
    a per-block Arrow ``group_by`` pre-count bounds the final exchange
    at (vocab² × blocks) rows."""
    out_schema = pa.schema([("item_a", pa.string()),
                            ("item_b", pa.string()),
                            ("n", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        items = b[item_col].combine_chunks()
        enc = items.dictionary_encode() if not pa.types.is_dictionary(
            items.type) else items
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)[lo:hi]
        # code order must equal string order for the a<b contract
        drank = np.empty(len(enc.dictionary), dtype=np.int64)
        drank[pc.sort_indices(enc.dictionary)
              .to_numpy(zero_copy_only=False).astype(np.int64)] = \
            np.arange(len(enc.dictionary))
        codes = drank[codes]
        order = np.lexsort((codes, rid))
        r, g = rid[order], codes[order]
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
        r, g = r[keep], g[keep]  # distinct (key, item), item-sorted
        # per-run m_i distinct items → m_i² index pairs, mask to i<j
        run_starts = np.nonzero(
            np.concatenate([[True], r[1:] != r[:-1]]))[0]
        m = np.diff(np.concatenate([run_starts, [len(r)]]))
        sq = m * m
        total = int(sq.sum())
        if total == 0:
            return out_schema.empty_table()
        cum = np.concatenate([[0], np.cumsum(sq)[:-1]])
        p = np.arange(total, dtype=np.int64) - np.repeat(cum, sq)
        mrep = np.repeat(m, sq)
        srep = np.repeat(run_starts, sq)
        i = srep + p // mrep
        j = srep + p % mrep
        mask = i < j
        ia, ib = g[i[mask]], g[j[mask]]
        inv = np.empty(len(drank), dtype=np.int64)
        inv[drank] = np.arange(len(drank))
        dict_sorted = enc.dictionary.take(pa.array(inv))
        part = pa.table({
            "item_a": dict_sorted.take(pa.array(ia)),
            "item_b": dict_sorted.take(pa.array(ib)),
        }).group_by(["item_a", "item_b"]).aggregate([([], "count_all")])
        return pa.table({
            "item_a": part["item_a"], "item_b": part["item_b"],
            "n": pc.cast(part["count_all"], pa.int64()),
        }).cast(out_schema)

    partials = grouped_apply(ds.select_columns([key, item_col]), key,
                             out_schema=out_schema, runs_fn=runs)
    from ray.data.aggregate import Sum

    return partials.groupby(["item_a", "item_b"]).aggregate(
        Sum("n", alias_name="n"))


def rank_against(ds: Dataset, ref: Dataset, value_col: str,
                 carry_cols: list[str], ref_value_col: str | None = None,
                 max_ref_rows: int = 5_000_000,
                 out_rank: str = "n_le", out_n: str = "ref_n") -> Dataset:
    """Percentile rank of every row against a REFERENCE distribution
    (score calibration): attaches ``n_le`` = count of reference values ≤
    the row's value, plus the reference size — integer counts, so the
    calibration curve is float-parity-free (divide downstream if a
    ratio is wanted).

    Scale shape: the reference collects ONCE to a sorted numpy array and
    broadcasts via ``ray.put`` (bounded by contract — a calibration
    reference is a sample or a small labeled set; above ``max_ref_rows``
    this raises rather than silently collecting a corpus), then every
    batch is one vectorized ``searchsorted`` probe — zero shuffle."""
    import ray

    rcol = ref_value_col or value_col
    ref = ref.select_columns([rcol]).materialize()
    n_ref = ref.count()
    if n_ref > max_ref_rows:
        raise ValueError(
            f"rank_against: reference has {n_ref} rows (> {max_ref_rows});"
            " pass a sampled/bounded reference")
    vals = np.sort(np.concatenate([
        t[rcol].to_numpy(zero_copy_only=False)
        for t in ray.get(ref.to_arrow_refs())]) if n_ref else
        np.array([], dtype=np.float64))
    ref_ref = ray.put(vals)

    proj = list(dict.fromkeys(carry_cols + [value_col]))

    def probe(b: pa.Table) -> pa.Table:
        rv = ray.get(ref_ref)
        v = b[value_col].to_numpy(zero_copy_only=False)
        cols = {c: b[c] for c in proj}
        cols[out_rank] = pa.array(
            np.searchsorted(rv, v, side="right").astype(np.int64),
            pa.int64())
        cols[out_n] = pa.array(np.full(b.num_rows, len(rv), np.int64))
        return pa.table(cols)

    return ds.select_columns(proj).map_batches(probe,
                                               batch_format="pyarrow")


def association_supports(ds: Dataset, key: str, item_col: str,
                         min_support: int = 1) -> Dataset:
    """Association-rule support table (the A-Priori counting step):
    for every unordered item pair co-occurring under ≥ ``min_support``
    keys, the integer supports (n_ab, n_a, n_b, n_keys) from which
    confidence (n_ab/n_a) and lift (n_ab·n_keys / (n_a·n_b)) derive
    downstream — keeping the output integral keeps the DuckDB-oracle
    gate float-free.

    Shape: pair supports via ``cooccurrence_counts`` (no self-join);
    item supports via the two-level distinct (per-batch (key, item)
    dedup partials → one grouped count at item grain — vocab-bounded);
    the bounded item-support table broadcasts back onto the pair rows
    (two ``lookup_join``s); the distinct-key total is one counts-sized
    scalar."""
    from payor_linkage.rayutil import lookup_join

    pairs = cooccurrence_counts(ds, key, item_col)

    def keep_pair(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["n"], min_support))
        return pa.table({"item_a": t["item_a"], "item_b": t["item_b"],
                         "n_ab": pc.cast(t["n"], pa.int64())})

    pairs = pairs.map_batches(keep_pair, batch_format="pyarrow")

    def distinct_pairs(b: pa.Table) -> pa.Table:
        return (b.select([key, item_col]).group_by([key, item_col])
                .aggregate([]))

    baskets = (ds.select_columns([key, item_col])
               .map_batches(distinct_pairs, batch_format="pyarrow")
               .groupby([key, item_col]).count()
               .select_columns([key, item_col])).materialize()
    n_keys = baskets.select_columns([key]).groupby(key).count().count()

    def item_rows(side: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({f"item_{side}": b[item_col],
                             f"n_{side}": pc.cast(b["count()"],
                                                  pa.int64())})
        return f

    sup = baskets.select_columns([item_col]).groupby(item_col).count()
    sup_a = sup.map_batches(item_rows("a"), batch_format="pyarrow")
    sup_b = sup.map_batches(item_rows("b"), batch_format="pyarrow")

    out = lookup_join(lookup_join(pairs, sup_a, "item_a"),
                      sup_b, "item_b")

    def add_total(b: pa.Table) -> pa.Table:
        return b.append_column(
            "n_keys", pa.array(np.full(len(b), n_keys, dtype=np.int64)))

    return out.map_batches(add_total, batch_format="pyarrow")

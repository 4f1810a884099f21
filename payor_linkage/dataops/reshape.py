"""Reshaping operators: unpivot (melt) and deterministic weighted
interleave — the dataset-mixing primitive a training-data pipeline uses
to blend sources at fixed ratios.

Reference parity: the reference app pivots/unpivots measure columns in
its SQL models; interleaving is the standard corpus-mixing step of a
large-scale training-data pipeline (weighted round-robin across sources).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def melt(ds: Dataset, id_cols: list[str], value_cols: list[str],
         var_name: str = "metric", value_name: str = "val") -> Dataset:
    """Unpivot ``value_cols`` into (``var_name``, ``value_name``) rows —
    ``UNPIVOT`` / ``UNION ALL`` of one projection per measure.

    Map-only (no shuffle): each batch emits ``len(value_cols)`` stacked
    projections; the measure label is a dictionary-encoded constant
    column (no per-row Python). Values pass through unchanged (cast to
    float64), so float parity with a SQL unpivot is exact."""
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in id_cols]
        + [(var_name, pa.string()), (value_name, pa.float64())])

    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        zeros = pa.array(np.zeros(n, dtype=np.int32))
        parts = []
        for c in value_cols:
            cols = {ic: b[ic] for ic in id_cols}
            cols[var_name] = pa.DictionaryArray.from_arrays(
                zeros, pa.array([c], pa.string()))
            cols[value_name] = b[c].cast(pa.float64())
            parts.append(pa.table(cols).cast(out_schema))
        return pa.concat_tables(parts)

    return (ds.select_columns(id_cols + value_cols)
            .map_batches(f, batch_format="pyarrow"))


def interleave_position(ds: Dataset, part_col: str, order_cols: list[str],
                        weights: dict[str, int], out_rank: str = "src_rank",
                        out_col: str = "pos") -> Dataset:
    """Deterministic weighted round-robin interleave: assign every row a
    global sequence position such that reading positions in order yields
    the parts mixed at the given integer ratios (an epoch of
    ``W = sum(weights)`` slots repeats; part ``p`` owns ``weights[p]``
    contiguous slots at a fixed offset).

    The training-data mixing primitive: blend corpora at fixed ratios
    without materializing the merged order — each row's position is pure
    arithmetic on its per-part rank ``r``:
    ``pos = (r // w) * W + off + (r % w)``.

    Every part must appear in ``weights``; pass a total order (unique
    tiebreaker last in ``order_cols``) for a deterministic row↔position
    assignment. Emits 1-based ``src_rank`` and 0-based ``pos``.

    Scale shape: parts are FEW by nature (languages / sources), so a
    per-part grouped apply would funnel nearly every row through the
    single boundary-consolidation task. Instead this uses the standard
    distributed ROW_NUMBER construction: ONE global sort by
    (part, order), then a tiny (blocks × parts) count table collected to
    the driver turns per-part ranking into pure per-block arithmetic —
    no row ever leaves its block after the sort."""
    import ray
    import ray.data as rd

    parts = sorted(weights)
    w_of = {p: int(weights[p]) for p in parts}
    off_of, acc = {}, 0
    for p in parts:
        off_of[p] = acc
        acc += w_of[p]
    total_w = acc

    proj = [part_col] + [c for c in order_cols if c != part_col]
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_rank, pa.int64()), (out_col, pa.int64())])

    sds = (ds.select_columns(proj)
           .sort([part_col] + [c for c in order_cols if c != part_col])
           .materialize())
    refs = sds.to_arrow_refs()
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    @ray.remote
    def _part_counts(tbl: pa.Table) -> dict:
        vc = tbl[part_col].combine_chunks().value_counts()
        return dict(zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()))

    counts = ray.get([_part_counts.remote(r) for r in refs])
    # exclusive per-part prefix across blocks (blocks are in sorted
    # order): base rank of each part at the start of each block
    bases, acc2 = [], {p: 0 for p in parts}
    for c in counts:
        bases.append(dict(acc2))
        for p, n in c.items():
            acc2[p] += n

    @ray.remote
    def _emit(tbl: pa.Table, base: dict) -> pa.Table:
        n_rows = tbl.num_rows
        if n_rows == 0:
            return out_schema.empty_table()
        pv = tbl[part_col].combine_chunks()
        enc = pv.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # runs of equal part are contiguous (block is sorted by part)
        change = np.concatenate([[True], codes[1:] != codes[:-1]])
        starts = np.nonzero(change)[0]
        lens = np.diff(np.concatenate([starts, [n_rows]]))
        run_parts = [enc.dictionary[int(codes[s])].as_py() for s in starts]
        r0 = np.array([base[p] for p in run_parts], np.int64)
        r = (np.arange(n_rows, dtype=np.int64)
             - np.repeat(starts, lens) + np.repeat(r0, lens))
        w = np.repeat(np.array([w_of[p] for p in run_parts], np.int64),
                      lens)
        off = np.repeat(np.array([off_of[p] for p in run_parts], np.int64),
                        lens)
        pos = (r // w) * total_w + off + (r % w)
        cols = {c: tbl[c] for c in proj}
        cols[out_rank] = pa.array(r + 1, pa.int64())
        cols[out_col] = pa.array(pos, pa.int64())
        return pa.table(cols).cast(out_schema)

    return rd.from_arrow_refs(
        [_emit.remote(ref, bases[i]) for i, ref in enumerate(refs)])


def pack_positions(ds: Dataset, length_col: str, order_cols: list[str],
                   budget: int, out_cum: str = "cum",
                   out_bin: str = "bin_id") -> Dataset:
    """Sequence packing: assign every document a global running length
    total and the index of the fixed-capacity context window its FIRST
    token lands in — the "pack documents into ``budget``-token training
    sequences" step of an LLM data pipeline, with contiguous-fill
    semantics (documents are laid end-to-end in the global order; a
    document may straddle a window boundary, as token-level packing
    does).

    ``cum`` is the inclusive running sum of ``length_col`` over the
    total order given by ``order_cols``; ``bin_id = (cum - len) //
    budget`` — pure integer arithmetic, so a SQL window-cumsum oracle
    matches bit-for-bit.

    Scale shape: the distributed prefix-sum construction (same as
    ``interleave_position``'s distributed ROW_NUMBER): ONE global sort,
    then only the per-block subtotals (one int per block) are collected
    to the driver; each block turns its exclusive base into per-row
    cumsums with one vectorized ``np.cumsum`` — no row ever leaves its
    block after the sort, and no single task sees more than a block."""
    import ray
    import ray.data as rd

    proj = list(dict.fromkeys(order_cols + [length_col]))
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_cum, pa.int64()), (out_bin, pa.int64())])

    sds = ds.select_columns(proj).sort(order_cols).materialize()
    refs = sds.to_arrow_refs()
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    @ray.remote
    def _subtotal(tbl: pa.Table) -> int:
        if tbl.num_rows == 0:
            return 0
        import pyarrow.compute as _pc
        return int(_pc.sum(tbl[length_col]).as_py() or 0)

    subtotals = ray.get([_subtotal.remote(r) for r in refs])
    bases = np.concatenate([[0], np.cumsum(subtotals[:-1], dtype=np.int64)]) \
        if len(subtotals) > 1 else np.zeros(1, dtype=np.int64)

    @ray.remote
    def _emit(tbl: pa.Table, base: int) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        lens = tbl[length_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(lens) + base
        cols = {c: tbl[c] for c in proj}
        cols[out_cum] = pa.array(cum, pa.int64())
        cols[out_bin] = pa.array((cum - lens) // budget, pa.int64())
        return pa.table(cols).cast(out_schema)

    return rd.from_arrow_refs(
        [_emit.remote(ref, int(bases[i])) for i, ref in enumerate(refs)])


def global_ntile(ds: Dataset, order_cols: list[str], k: int,
                 out_rn: str = "rn", out_bucket: str = "bucket") -> Dataset:
    """Global (un-partitioned) ROW_NUMBER + NTILE(k) over a total order
    — equi-depth bucketing of a whole table (train/val/test splits by
    rank, percentile banding). SQL-exact NTILE fill: the first
    ``n mod k`` buckets get ``floor(n/k) + 1`` rows.

    Scale shape: the same distributed prefix construction as
    ``pack_positions`` — ONE global sort, per-block row counts (one int
    each) to the driver, then both the row number and the bucket are
    pure per-block integer arithmetic. The grouped-apply alternative
    would funnel every row through one task (a single group); this
    never moves a row after the sort."""
    import ray
    import ray.data as rd

    proj = list(dict.fromkeys(order_cols))
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_rn, pa.int64()), (out_bucket, pa.int64())])

    sds = ds.select_columns(proj).sort(order_cols).materialize()
    refs = sds.to_arrow_refs()
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        return tbl.num_rows

    counts = np.array(ray.get([_count.remote(r) for r in refs]),
                      dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    size, rem = divmod(n_total, k)
    split = rem * (size + 1)  # rows in the first `rem` (bigger) buckets

    @ray.remote
    def _emit(tbl: pa.Table, base: int) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        rn = np.arange(tbl.num_rows, dtype=np.int64) + base + 1
        r0 = rn - 1
        if size == 0:
            bucket = r0 + 1  # n < k: one row per leading bucket
        else:
            bucket = np.where(
                r0 < split,
                r0 // (size + 1) + 1,
                rem + (r0 - split) // size + 1)
        cols = {c: tbl[c] for c in proj}
        cols[out_rn] = pa.array(rn, pa.int64())
        cols[out_bucket] = pa.array(bucket, pa.int64())
        return pa.table(cols).cast(out_schema)

    return rd.from_arrow_refs(
        [_emit.remote(ref, int(bases[i])) for i, ref in enumerate(refs)])


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``v`` to even positions
    (0b1011 → 0b01_00_01_01) — the magic-number dilation used by
    Morton/z-order encoding."""
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def zorder_code(ds: Dataset, x_col: str, y_col: str,
                out_col: str = "z") -> Dataset:
    """Append the 2-D Morton (z-order) code of two non-negative integer
    columns (low 16 bits each): bit-interleaved so that sorting or
    range-partitioning by ``out_col`` keeps rows close in BOTH
    dimensions — the standard multi-dimensional data-layout trick that
    lets a min/max-pruned scan (`storage.read_filtered`) skip row
    groups for 2-D predicates. Map-only, pure int64 bit arithmetic per
    batch; the oracle re-derives the dilation with the same
    magic-number steps in SQL."""
    def f(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z = _spread_bits16(x) | (_spread_bits16(y) << 1)
        return b.append_column(out_col, pa.array(z, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def union_by_name(a: Dataset, b: Dataset) -> Dataset:
    """Schema-evolution union (UNION ALL BY NAME): align two datasets by
    COLUMN NAME — reordering freely, null-filling columns missing from
    either side — the landing-zone primitive for feeds whose schema
    drifted between drops. Shared columns must agree on type. Map-only
    (each side reshapes in place); the union itself moves nothing."""
    sa, sb = a.schema().base_schema, b.schema().base_schema
    ta = {f.name: f.type for f in sa}
    tb = {f.name: f.type for f in sb}
    for n in set(ta) & set(tb):
        if ta[n] != tb[n]:
            raise ValueError(f"union_by_name: column {n!r} has type "
                             f"{ta[n]} vs {tb[n]}")
    names = list(ta) + [n for n in tb if n not in ta]
    types = {**tb, **ta}
    canon = pa.schema([(n, types[n]) for n in names])

    def align(have):
        def f(batch: pa.Table) -> pa.Table:
            cols = {}
            for n in names:
                cols[n] = (batch[n] if n in have
                           else pa.nulls(batch.num_rows, types[n]))
            return pa.table(cols).cast(canon)
        return f

    return (a.map_batches(align(set(ta)), batch_format="pyarrow")
            .union(b.map_batches(align(set(tb)), batch_format="pyarrow")))


def seeded_shuffle(ds: Dataset, id_col: str, seed: str,
                   out_pos: str = "pos") -> Dataset:
    """Deterministic seeded global shuffle: every row gets its 1-based
    position in the permutation ordered by ``md5(seed || '|' || id)``
    — the reproducible corpus-shuffle step before training-data
    sharding (a different ``seed`` yields an independent permutation;
    the same seed yields the same order on any cluster size, unlike
    ``Dataset.random_shuffle``). SQL-exact: ``ROW_NUMBER() OVER (ORDER
    BY md5(...), id)``.

    Scale shape: hashing runs through the vectorized DuckDB md5 kernel
    per batch (``dedup._content_md5``); then ONE global sort over the
    32-char key and the ``global_ntile`` distributed-ROW_NUMBER prefix
    construction — per-block row counts (one int each) to the driver,
    no row moves after the sort."""
    import pyarrow.compute as pc

    from .dedup import _content_md5

    def key(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.string())
        joined = pc.binary_join_element_wise(
            pa.scalar(seed, pa.string()), ids.combine_chunks()
            if isinstance(ids, pa.ChunkedArray) else ids,
            pa.scalar("|", pa.string()))
        return pa.table({"_sk": _content_md5(joined), id_col: b[id_col]})

    keyed = ds.select_columns([id_col]).map_batches(
        key, batch_format="pyarrow")
    nt = global_ntile(keyed, ["_sk", id_col], k=1, out_rn=out_pos)
    return nt.map_batches(lambda b: b.select([id_col, out_pos]),
                          batch_format="pyarrow")

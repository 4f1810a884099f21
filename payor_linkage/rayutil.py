"""Small Ray helpers shared by the pipeline stages."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def join_partitions(requested: int | None = None, cap: int = 64) -> int:
    """Safe hash-join partition count for the *current* cluster.

    ``Dataset.join`` spawns one aggregator actor per partition; asking for
    more partitions than schedulable CPUs deadlocks the streaming executor
    on a small cluster (observed with 32 partitions on 8 CPUs). On a real
    multi-node cluster, scale with total CPUs up to ``cap``.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    auto = max(2, min(cap, cpus // 2))
    if requested is None:
        return auto
    return max(2, min(requested, auto))


def coalesce_small_blocks(ds: Dataset, min_rows_per_block: int = 4096,
                          materialize: bool = True) -> Dataset:
    """Coalesce a MATERIALIZED dataset whose average block is tiny.

    Many-small-block datasets (one block per synth replica chunk, per
    scorer task, per patched stage) make every downstream pass pay one
    task of scheduling overhead per block — at 35k rows × 656 blocks the
    overhead IS the stage. Fires only when the mean block is under
    ``min_rows_per_block`` rows, and targets ``max(2·cpus, rows/8192)``
    blocks, so a genuinely large dataset (fat blocks at 100 TB) is
    returned untouched — this is a small-block pathology fix, not a
    general repartition."""
    n_blocks = ds.num_blocks()
    n_rows = ds.count()
    if n_blocks <= 1 or n_rows == 0 or n_rows / n_blocks >= min_rows_per_block:
        return ds
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    target = max(2 * cpus, -(-n_rows // 8192))
    if target >= n_blocks:
        return ds
    out = ds.repartition(target)
    return out.materialize() if materialize else out


def _runs_slice_task(runs_fn, tbl: pa.Table, starts, ends) -> pa.Table:
    return runs_fn(tbl, starts, ends)


def _scatter_block_task(fn, shared, *tbls) -> pa.Table:
    outs = [t for t in (fn(tbl, *shared) for tbl in tbls)
            if t is not None and t.num_rows]
    if not outs:
        return None
    return pa.concat_tables(
        outs, promote_options="default").combine_chunks()


def scatter_blocks(ds: Dataset, fn, *shared, schema: pa.Schema = None,
                   combine: bool = True) -> pa.Table:
    """Apply ``fn(block, *shared)`` to every block of a MATERIALIZED
    dataset as raw Ray tasks and concat the results on the driver.

    For delta-bounded filters over corpus-sized in-plasma state, this
    beats both alternatives: a ``map_batches`` stage pays ~0.5-1 s of
    fixed stage-launch latency, and a driver-side ``ray.get`` loop pays
    single-threaded deserialization of every (wide) block just to throw
    most rows away. Raw tasks cost ~ms each, the block never leaves the
    worker, and only the (small) filtered pieces return. ``shared``
    values (e.g. an is_in value set) are ``ray.put`` once, not pickled
    per task. ``fn`` must be module-level (cheap to pickle) and must
    handle 0-row / schema-less blocks itself (it may return ``None``
    for them). Blocks are batched ~2 per CPU slot per round: one task
    per block made the driver deserialize hundreds of tiny result
    pieces (~3 s measured across 5 scatters) where ~2·cpus combined
    pieces cost ~0.3 s. The concat result is ``combine_chunks``-ed by
    default — downstream ``ray.put`` / ``from_arrow`` of a many-chunk
    table pays per-chunk offset-buffer copies (measured 8 s on a
    78k-chunk table)."""
    refs = ds.to_arrow_refs()
    if not refs:
        return schema.empty_table() if schema is not None else None
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n_tasks = max(1, min(len(refs), cpus * 2))
    per = -(-len(refs) // n_tasks)
    shared_ref = ray.put(list(shared))
    rfn = ray.remote(num_returns=1)(_scatter_block_task)
    futs = [rfn.remote(fn, shared_ref, *refs[i:i + per])
            for i in range(0, len(refs), per)]
    parts = [t for t in ray.get(futs) if t is not None and t.num_rows]
    if not parts:
        return schema.empty_table() if schema is not None else None
    out = pa.concat_tables(parts, promote_options="default")
    return out.combine_chunks() if combine else out


def local_grouped_runs(tbl: pa.Table, key: str, out_schema: pa.Schema,
                       group_fn=None, runs_fn=None,
                       scatter_above_rows: int = 100_000) -> pa.Table:
    """Driver-local core of ``grouped_apply``: one Arrow sort by ``key``
    + run slicing, then the same group_fn/runs_fn the distributed path
    runs. Callers own the bound check — this collects nothing, it takes
    an in-memory table. Shared by grouped_apply's ``local_rows_bound``
    tier and the incremental pipeline's delta-bounded patch kernels.

    Above ``scatter_above_rows`` the runs_fn work is SCATTERED over raw
    Ray tasks on group-aligned contiguous slices (one barrier, zero
    shuffle — the sort already happened here): per-group Python finalize
    is the only real compute on this path and would otherwise serialize
    on the driver."""
    import numpy as np

    if tbl.num_rows == 0:
        return out_schema.empty_table()
    tbl = tbl.sort_by(key).combine_chunks()
    arr = tbl[key].to_numpy(zero_copy_only=False)
    starts = np.nonzero(np.concatenate([[True], arr[1:] != arr[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(arr)]])
    if runs_fn is not None:
        n_runs = len(starts)
        if (scatter_above_rows and tbl.num_rows > scatter_above_rows
                and n_runs > 8 and ray.is_initialized()):
            try:
                cpus = int(ray.cluster_resources().get("CPU", 4))
            except Exception:
                cpus = 4
            n_tasks = max(2, min(cpus, n_runs // 4))
            bounds = np.unique(np.linspace(
                0, n_runs, n_tasks + 1).astype(np.int64))
            rfn = ray.remote(_runs_slice_task)
            futs = []
            for c in range(len(bounds) - 1):
                lo, hi = bounds[c], bounds[c + 1]
                off = int(starts[lo])
                end_row = int(ends[hi - 1])
                futs.append(rfn.remote(
                    runs_fn, tbl.slice(off, end_row - off),
                    starts[lo:hi] - off, ends[lo:hi] - off))
            return pa.concat_tables(ray.get(futs),
                                    promote_options="default")
        return runs_fn(tbl, starts, ends)
    outs = [group_fn(tbl.slice(starts[i], ends[i] - starts[i]))
            for i in range(len(starts))]
    return pa.concat_tables(outs) if outs else out_schema.empty_table()


def grouped_apply(ds: Dataset, key: str, group_fn=None, out_schema: pa.Schema = None,
                  runs_fn=None, local_rows_bound: int = 0) -> Dataset:
    """``groupby(key).map_groups(group_fn)`` with block-amortized overhead.

    Ray's ``map_groups`` pays ~1ms of harness overhead per group — ruinous
    for millions of tiny groups. This sorts once, then slices group runs
    *inside* each block vectorized; only the runs touching a block edge
    (a key can straddle blocks) are deferred to a single small
    consolidation pass. Exact: every group processed exactly once.

    Provide either ``group_fn`` (pa.Table of one complete group →
    pa.Table(out_schema)) or ``runs_fn`` (pa.Table block + starts/ends
    numpy arrays of complete runs → pa.Table(out_schema)) — runs_fn lets
    the caller vectorize ACROSS groups in a block.

    Partitioning assumption: DISTINCT KEYS ≫ BLOCKS. With only a handful
    of keys (e.g. a language column) almost every block boundary falls
    inside a group and the whole dataset funnels through the single
    consolidation task. For few-key per-group ranking use the
    sort + per-block count-prefix pattern instead
    (``dataops.reshape.interleave_position``).

    ``local_rows_bound`` (opt-in) adds a DRIVER-LOCAL tier: when the
    input has at most that many rows, skip the distributed sort and run
    the same runs_fn/group_fn over one driver-side Arrow sort — the
    cluster.py/BPE tiering pattern. Each Ray stage barrier costs ~1 s of
    fixed latency regardless of data size, so a delta-bounded input
    (incremental patch stages) pays more in barriers than in work.
    Callers must pass it ONLY when the fn is within-run order-
    insensitive (all pipeline runs_fns are — they do their own
    deterministic tie-breaking) and the bound is memory-safe on the
    driver.
    """
    import numpy as np

    assert (group_fn is None) != (runs_fn is None)
    # normalize the block count BEFORE the sort: Ray's sort fans out one
    # reduce partition per input block, so a many-small-block input (e.g.
    # from an upstream row-balanced repartition) multiplies sort tasks;
    # a too-few-block input starves the CPUs. Pin to 2 blocks/CPU — the
    # repartition is a cheap split/merge (no shuffle) on a lazy dataset.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    # Size the sort width to the DATA, not just the cluster: Ray's sort
    # fans out one reduce partition per input block, so cpus*2 is right
    # for big inputs — but on a small input it makes hundreds-of-row
    # blocks where any group larger than a block becomes a boundary run
    # and funnels into the single consolidation task (observed: a 2.5s
    # serial tail under 64×625-row blocks). Floor the partition size at
    # ~8k rows so small inputs sort into few, fat blocks.
    s0 = ds.materialize()
    n_rows = s0.count()
    empty = out_schema.empty_table()

    if local_rows_bound and n_rows <= local_rows_bound:
        import ray.data as rd

        if n_rows == 0:
            return rd.from_arrow(empty)
        tbl = pa.concat_tables(ray.get(s0.to_arrow_refs()),
                               promote_options="default")
        return rd.from_arrow(local_grouped_runs(
            tbl, key, out_schema, group_fn=group_fn, runs_fn=runs_fn))

    blocks = max(1, min(cpus * 2, -(-n_rows // 8192)))
    s = s0.repartition(blocks).sort(key).materialize()

    def _runs(keys) -> tuple:
        arr = keys.to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.concatenate([[True], arr[1:] != arr[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(arr)]])
        return starts, ends

    def apply_runs(b: pa.Table, starts, ends) -> pa.Table:
        if len(starts) == 0:
            return empty
        if runs_fn is not None:
            return runs_fn(b, starts, ends)
        outs = [group_fn(b.slice(starts[i], ends[i] - starts[i]))
                for i in range(len(starts))]
        return pa.concat_tables(outs) if outs else empty

    def interior(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        starts, ends = _runs(b[key])
        return apply_runs(b, starts[1:-1], ends[1:-1])  # skip first+last run

    def boundary_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        starts, ends = _runs(b[key])
        if len(starts) == 1:
            return b  # single-key block: everything is boundary
        head = b.slice(0, ends[0])
        tail = b.slice(starts[-1], b.num_rows - starts[-1])
        return pa.concat_tables([head, tail])

    def consolidate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        starts, ends = _runs(b[key])
        return apply_runs(b, starts, ends)

    part_a = s.map_batches(interior, batch_format="pyarrow", batch_size=None)
    part_b = (s.map_batches(boundary_rows, batch_format="pyarrow", batch_size=None)
              .repartition(1)
              .map_batches(consolidate, batch_format="pyarrow", batch_size=None))
    return part_a.union(part_b)


def smart_join(left: Dataset, right: Dataset, on: str,
               small_threshold: int = 5_000) -> Dataset:
    """Inner equi-join choosing the implementation by size: Ray's hash
    join for real data (partitions sized so none is empty — the hash-join
    aggregator crashes on empty partition blocks), the union-merge join
    below for small inputs where empty partitions are likely."""
    left = left.materialize()
    right = right.materialize()
    n = min(left.count(), right.count())
    if n < small_threshold:
        return nested_safe_join(left, right, on)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    # one partition per ~40k rows, capped at half the cluster CPUs (each
    # partition is an aggregator actor; more aggregators than cpus//2
    # measurably thrashes), floor 2; partitions non-empty at these sizes
    num_partitions = max(2, min(n // 40_000 + 1, cpus // 2))
    return left.join(right, join_type="inner", num_partitions=num_partitions,
                     on=(on,))


def lookup_join(big: Dataset, small: Dataset, on: str,
                max_rows: int = 5_000_000, how: str = "inner") -> Dataset:
    """Equi-join where ``small`` has UNIQUE keys and provably bounded
    size: collect it to sorted arrays once, broadcast (ray.put), and
    attach its columns to ``big`` with a binary-search map — zero shuffle
    (vs two full-shuffle sides for a hash join). ``how="inner"`` drops
    unmatched ``big`` rows; ``how="left"`` keeps them with null payload.
    Falls back to ``smart_join`` when ``small`` exceeds ``max_rows`` (a
    cluster-scale side must shuffle, not broadcast; left fallback
    unsupported there)."""
    import numpy as np

    if how not in ("inner", "left"):
        raise ValueError(f"lookup_join: unknown how={how!r}")
    small = small.materialize()
    if small.count() > max_rows:
        if how != "inner":
            # silently degrading to the hash join would turn left into
            # inner semantics (dropping unmatched big rows)
            raise ValueError("left lookup_join requires a bounded small side")
        return smart_join(big, small, on)
    tbl = pa.concat_tables(
        ray.get(small.to_arrow_refs()), promote_options="default")
    # keep keys/payload as ARROW end to end: boxing keys to a numpy
    # object array (the old np.searchsorted probe) paid a python
    # richcompare per comparison AND pickled the broadcast string by
    # string; pc.index_in is a C hash probe over plasma-shared buffers
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(on, "ascending")]))
    k_arrow = tbl[on].combine_chunks()
    payload_names = [c for c in tbl.column_names if c != on]
    payload = {c: tbl[c].combine_chunks() for c in payload_names}
    ref = ray.put((k_arrow, payload))

    def attach(b: pa.Table) -> pa.Table:
        k, pay = ray.get(ref)
        if len(k) == 0:
            if how == "inner":  # empty small side → drops everything
                m = b.slice(0, 0)
                for c in payload_names:
                    m = m.append_column(c, pay[c].slice(0, 0))
                return m
            m = b
            for c in payload_names:
                if c not in m.column_names:
                    m = m.append_column(
                        c, pa.nulls(m.num_rows, pay[c].type))
            return m
        col = b[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pos = pc.index_in(col, value_set=k)
        if how == "inner":
            hit = pc.is_valid(pos)
            m = b.filter(hit)
            idx = pos.filter(hit)
            for c in payload_names:
                if c not in m.column_names:
                    m = m.append_column(c, pay[c].take(idx))
            return m
        # left: misses keep the row; take(null index) → null payload
        m = b
        for c in payload_names:
            if c not in m.column_names:
                m = m.append_column(c, pay[c].take(pos))
        return m

    return big.map_batches(attach, batch_format="pyarrow")


def nested_safe_join(left: Dataset, right: Dataset, on: str) -> Dataset:
    """Inner equi-join that tolerates nested (list/struct) payload columns.

    ``Dataset.join`` finalizes with pyarrow acero, which rejects
    ``list<struct<...>>`` non-key fields (e.g. our carried ``spans``
    column). This variant unions the two sides with a ``_side`` tag and
    merges per key inside ``groupby(on).map_groups`` — a sort shuffle,
    which pyarrow handles fine for nested payloads. Use only where a
    nested column must survive the join; plain joins are cheaper.
    """
    # force Arrow blocks so schema types are pyarrow DataTypes (pandas-block
    # datasets report numpy/python types, which pa.nulls can't take)
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))
    l_types = {n: t for n, t in l_schema.items() if n != on}
    r_types = {n: t for n, t in r_schema.items() if n != on and n not in l_schema}

    def pad_left(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "_side": pa.array([0] * b.num_rows, pa.int8())}
        for n in l_types:
            cols[n] = b[n]
        for n, t in r_types.items():
            cols[n] = pa.nulls(b.num_rows, t)
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "_side": pa.array([1] * b.num_rows, pa.int8())}
        for n, t in l_types.items():
            cols[n] = pa.nulls(b.num_rows, t)
        for n in r_types:
            cols[n] = b[n]
        return pa.table(cols)

    u = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow"))

    l_cols = list(l_types)
    r_cols = list(r_types)
    out_schema = pa.schema(
        [(on, l_schema[on])] + [(n, l_types[n]) for n in l_cols]
        + [(n, r_types[n]) for n in r_cols])

    def merge_runs(b: pa.Table, starts, ends) -> pa.Table:
        # block-amortized merge: per key-run, a within-key cartesian
        # (typically 1×1 or 1×n) expressed as index arrays; ONE take per
        # block column instead of a per-group map_groups harness call
        # (~1ms/group — this sits on the distributed-CC label-prop hot
        # path via cluster._label_edges).
        import numpy as np
        side = b["_side"].to_numpy(zero_copy_only=False)
        lidx, ridx = [], []
        for s, e in zip(starts, ends):
            sl = side[s:e]
            li = s + np.nonzero(sl == 0)[0]
            ri = s + np.nonzero(sl == 1)[0]
            if len(li) == 0 or len(ri) == 0:
                continue  # key on one side only → inner join drops it
            lidx.append(np.repeat(li, len(ri)))
            ridx.append(np.tile(ri, len(li)))
        if not lidx:
            return out_schema.empty_table()
        lrep = pa.array(np.concatenate(lidx))
        rrep = pa.array(np.concatenate(ridx))
        cols = [b[on].take(lrep)]
        cols += [b[n].take(lrep) for n in l_cols]
        cols += [b[n].take(rrep) for n in r_cols]
        return pa.table(cols, schema=out_schema)

    return grouped_apply(u, on, runs_fn=merge_runs, out_schema=out_schema)


def broadcast_semi_join(big: Dataset, keys: Dataset, big_on: str,
                        keys_on: str | None = None, anti: bool = False,
                        max_rows: int = 5_000_000) -> Dataset:
    """Semi (``anti=False``) / anti (``anti=True``) join: keep rows of
    ``big`` whose key is / is not present in ``keys``. The key column is
    collected once (bounded by ``max_rows``; uniqueness not required),
    broadcast via ray.put, and probed per batch with ``pc.is_in`` (a C
    hash probe) — zero shuffle, ``big`` streams. The 100 TB shape for
    existence filters against a bounded key set; an unbounded key set
    must use a shuffle join instead (this raises rather than degrade)."""
    keys_on = keys_on or big_on
    keys = keys.select_columns([keys_on]).materialize()
    if keys.count() > max_rows:
        raise ValueError("broadcast_semi_join requires a bounded key set")
    tbl = pa.concat_tables(ray.get(keys.to_arrow_refs()),
                           promote_options="default")
    value_set = pc.unique(tbl[keys_on].combine_chunks())
    ref = ray.put(value_set)

    def probe(b: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        mask = pc.is_in(b[big_on], value_set=vs)
        if anti:
            mask = pc.invert(mask)
        return b.filter(mask)

    return big.map_batches(probe, batch_format="pyarrow")


def replicate_join(big: Dataset, small: Dataset, on: str,
                   max_rows: int = 2_000_000) -> Dataset:
    """Inner equi-join where ``small`` is BOUNDED but may carry
    DUPLICATE keys (the case `lookup_join` refuses): collect small
    once sorted by key, broadcast, and per ``big`` batch probe each
    row's key range with two binary searches, then repeat/take to emit
    one output row per match — zero shuffle, ``big`` streams. This is
    the replicated side of a skew-aware join: a hot key's entire
    match set ships once per worker, not once per row. Raises above
    ``max_rows`` (an unbounded small side must shuffle) and on payload
    column collisions. Integer keys probe at numpy speed; string keys
    pay an object-compare per probe — dictionary-encode hot string
    keys upstream if that shows up."""
    import numpy as np

    small = small.materialize()
    clash = (set(small.schema().names) - {on}) & set(big.schema().names)
    if clash:
        raise ValueError(f"replicate_join: column collision {clash}")
    if small.count() > max_rows:
        raise ValueError("replicate_join requires a bounded small side")
    tbl = pa.concat_tables(ray.get(small.to_arrow_refs()),
                           promote_options="default")
    order = pc.sort_indices(tbl[on])
    tbl = tbl.take(order).combine_chunks()
    skeys = tbl[on].combine_chunks()
    payload_cols = [c for c in tbl.column_names if c != on]
    ref = ray.put((skeys, tbl.select(payload_cols)))

    def probe(b: pa.Table) -> pa.Table:
        sk, pay = ray.get(ref)
        skn = sk.to_numpy(zero_copy_only=False)
        bkn = b[on].combine_chunks().to_numpy(zero_copy_only=False)
        # range per big row: [lo, hi) of matching small rows
        lo = np.searchsorted(skn, bkn, side="left")
        hi = np.searchsorted(skn, bkn, side="right")
        cnt = (hi - lo).astype(np.int64)
        big_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), cnt)
        small_idx = (np.repeat(lo, cnt)
                     + (np.arange(int(cnt.sum()), dtype=np.int64)
                        - np.repeat(np.concatenate(
                            [[0], np.cumsum(cnt)[:-1]]), cnt)))
        out = b.take(pa.array(big_idx))
        for c in payload_cols:
            out = out.append_column(c, pay[c].take(pa.array(small_idx)))
        return out

    return big.map_batches(probe, batch_format="pyarrow")


def skew_join(left: Dataset, right: Dataset, on: str,
              hot_count: int = 100_000,
              hot_side_bound: int = 2_000_000) -> Dataset:
    """Skew-aware inner equi-join: keys whose RIGHT-side multiplicity
    exceeds ``hot_count`` would make one hash partition a straggler —
    their right rows are REPLICATED (broadcast + range probe,
    `replicate_join`) while the cold remainder takes the ordinary
    hash join; one union at the end. The hot set is discovered with a
    bounded count aggregate; hot right rows must fit the broadcast
    bound (``hot_side_bound`` — a key hotter than that needs salting
    upstream, raise rather than degrade). Equivalent to a plain inner
    join (equality pytest-gated)."""
    import numpy as np

    counts = right.groupby(on).count().materialize()

    def hot_only(b: pa.Table) -> pa.Table:
        m = pc.greater(pc.cast(b["count()"], pa.int64()), hot_count)
        return pa.table({on: b[on].filter(m)})

    hot = counts.map_batches(hot_only, batch_format="pyarrow") \
        .materialize()
    n_hot = hot.count()
    if n_hot == 0:
        return smart_join(left, right, on)
    hot_tbl = pa.concat_tables(ray.get(hot.to_arrow_refs()),
                               promote_options="default")
    hot_arr = pc.sort_indices(hot_tbl[on])
    hot_keys = hot_tbl[on].combine_chunks().take(hot_arr)
    kref = ray.put(hot_keys)

    def split(keep_hot: bool):
        def f(b: pa.Table) -> pa.Table:
            hk = ray.get(kref)
            m = pc.is_in(b[on], value_set=hk)
            m = pc.fill_null(m, False)
            return b.filter(m if keep_hot else pc.invert(m))
        return f

    right_hot = right.map_batches(split(True), batch_format="pyarrow")
    cold = smart_join(left.map_batches(split(False),
                                       batch_format="pyarrow"),
                      right.map_batches(split(False),
                                        batch_format="pyarrow"), on)
    hot_joined = replicate_join(
        left.map_batches(split(True), batch_format="pyarrow"),
        right_hot, on, max_rows=hot_side_bound)
    # align column orders before union
    cols = sorted(set(cold.schema().names))
    return cold.select_columns(cols).union(
        hot_joined.select_columns(cols))

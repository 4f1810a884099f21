"""Similarity search over an embedding column (`list<float>`).

- `ann_topk`: brute-force cosine top-k — numpy f64 matmul per batch
  against a broadcast query matrix (`ray.put` once), partial top-k per
  batch, final top-k per query in one small groupby. The baseline.
- `ivf_topk`: IVF-style scale path — seeded mini k-means centroids
  (sampled, driver-side), assignments per batch, probe only the
  `nprobe` closest centroid partitions.
- `lsh_neardup_pairs`: random-hyperplane LSH bucketing for cosine
  near-dup at corpus scale (no broadcast of the full matrix).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _to_matrix(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix WITHOUT a Python
    row loop: flatten the Arrow list values (one C kernel), confirm the
    fixed width, reshape. Falls back to per-row stacking only for
    ragged input."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = int(lens[0])
    if (lens == dim).all() and col.null_count == 0:
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(len(lens), dim)
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in col.to_pylist()])


def _rows_as_binary(M: np.ndarray) -> pa.Array:
    """(n, dim) float64 matrix → binary column of the rows' raw bytes,
    built from ONE contiguous buffer + arithmetic offsets (no per-row
    Python .tobytes()). The fixed-width-bytes shuffle shape."""
    M = np.ascontiguousarray(M, dtype=np.float64)
    n, dim = M.shape
    width = dim * 8
    offsets = (np.arange(n + 1, dtype=np.int32) * width)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets.tobytes()),
                         pa.py_buffer(M.tobytes())])


def _binary_to_matrix(col, dim_bytes_hint: int | None = None) -> np.ndarray:
    """binary column of equal-width float64 row bytes → (n, dim) matrix,
    zero-copy: rows built by ``_rows_as_binary`` tile the Arrow value
    buffer with uniform-stride offsets, so the buffer IS the matrix.
    Guards: large_binary has int64 offsets; a slice start or buffer base
    not 8-byte-aligned forces ONE contiguous copy (never per-row
    Python)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    off_dt, off_w = (np.int64, 8) if pa.types.is_large_binary(col.type) \
        else (np.int32, 4)
    off = np.frombuffer(col.buffers()[1], dtype=off_dt, count=n + 1,
                        offset=col.offset * off_w).astype(np.int64)
    width = int(off[1] - off[0]) if n else 0
    if width > 0 and width % 8 == 0 and (np.diff(off) == width).all():
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        flat = data[int(off[0]):int(off[0]) + n * width]
        if flat.ctypes.data % 8:
            flat = flat.copy()
        return flat.view(np.float64).reshape(n, width // 8)
    # ragged rows (not produced by _rows_as_binary) — one-copy fallback
    vals = col.to_pylist()
    return np.frombuffer(b"".join(vals), dtype=np.float64) \
        .reshape(len(vals), -1)


def _query_matrix(ds: Dataset, query_ids: list[int], id_col: str,
                  vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Collect only the requested query rows: the id filter runs inside
    `map_batches` so only |query_ids| rows ever reach the driver (the
    whole-table `take_all()` this replaces collects the full corpus at
    100 TB just to pick a handful of rows)."""
    qset = ray.put(np.asarray(sorted(set(query_ids))))

    def pick(b: pa.Table) -> pa.Table:
        wanted = ray.get(qset)
        mask = np.isin(np.asarray(b[id_col].to_pylist()), wanted)
        return b.filter(pa.array(mask))

    rows = (ds.select_columns([id_col, vec_col])
            .map_batches(pick, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in rows])
    Q = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                             for r in rows]))
    return qids, Q


def ann_topk(ds: Dataset, query_ids: list[int], k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> Dataset:
    """Top-k cosine neighbors for each query vector (queries selected by id
    from the dataset itself). Output (query_id, rank, neighbor_id), self
    excluded, ties broken by neighbor id — deterministic."""
    qids, Q = _query_matrix(ds, query_ids, id_col, vec_col)
    ref = ray.put((qids, Q))

    def partial(b: pa.Table) -> pa.Table:
        ids_q, Qm = ray.get(ref)
        bid = np.asarray(b[id_col].to_numpy(zero_copy_only=False))
        B = _normalize(_to_matrix(b[vec_col]))
        cos = Qm @ B.T                       # (nq, batch)
        nq, nb = cos.shape
        kk = min(k + 1, nb)                  # +1 to survive self-removal
        part = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(ids_q, kk)),
            "neighbor_id": pa.array(bid[part.ravel()]),
            "cos": pa.array(np.take_along_axis(cos, part, axis=1).ravel(),
                            pa.float64()),
        })

    return _finalize_topk(ds.map_batches(partial, batch_format="pyarrow"), k)


def _finalize_topk(cands: Dataset, k: int) -> Dataset:
    """(query_id, neighbor_id, cos) partials → global per-query top-k with
    1-based rank, self-pairs excluded, ties broken by neighbor id — via
    ``grouped_topk`` (block-amortized run slicing), not
    ``groupby().map_groups`` (~1 ms/group of harness overhead)."""
    from payor_linkage.dataops.aggregates import grouped_topk

    noself = cands.map_batches(
        lambda b: b.filter(pc.not_equal(b["query_id"], b["neighbor_id"])),
        batch_format="pyarrow")
    return grouped_topk(noself, "query_id", "cos", k,
                        tie_col="neighbor_id", keep_cols=["neighbor_id"])


def hard_negatives(ds: Dataset, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> Dataset:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k cosine neighbors whose ``label_col`` DIFFERS from
    the query's — the standard "closest wrong-class examples" selection
    a retrieval/embedding trainer feeds back as negatives. Output
    (query_id, rank, neighbor_id), ties broken by neighbor id.

    Scale shape: identical to ``ann_topk`` — queries are broadcast once
    (ray.put), each batch computes one masked matmul against the corpus
    stream, per-batch partial top-(k+1) bounds the exchange to
    O(k · queries · blocks) rows. Same-label columns are masked with a
    sentinel below the cosine floor and dropped from the partial, so a
    masked row can never reach the global top-k."""
    qset = ray.put(np.asarray(sorted(set(query_ids))))

    def pick(b: pa.Table) -> pa.Table:
        wanted = ray.get(qset)
        mask = np.isin(np.asarray(b[id_col].to_pylist()), wanted)
        return b.filter(pa.array(mask))

    rows = (ds.select_columns([id_col, vec_col, label_col])
            .map_batches(pick, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in rows])
    qlab = np.array([r[label_col] for r in rows])
    Q = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                             for r in rows]))
    ref = ray.put((qids, qlab, Q))

    def partial(b: pa.Table) -> pa.Table:
        ids_q, lab_q, Qm = ray.get(ref)
        bid = np.asarray(b[id_col].to_numpy(zero_copy_only=False))
        blab = np.asarray(b[label_col].to_numpy(zero_copy_only=False))
        B = _normalize(_to_matrix(b[vec_col]))
        cos = Qm @ B.T                        # (nq, batch)
        cos = np.where(lab_q[:, None] == blab[None, :], -2.0, cos)
        nq, nb = cos.shape
        kk = min(k + 1, nb)
        part = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        vals = np.take_along_axis(cos, part, axis=1).ravel()
        keep = vals > -1.5                    # drop masked same-label slots
        return pa.table({
            "query_id": pa.array(np.repeat(ids_q, kk)[keep]),
            "neighbor_id": pa.array(bid[part.ravel()[keep]]),
            "cos": pa.array(vals[keep], pa.float64()),
        })

    return _finalize_topk(ds.map_batches(partial, batch_format="pyarrow"), k)


def _mini_kmeans(sample: np.ndarray, n_centroids: int, iters: int = 10,
                 seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    C = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(C).T, axis=1)
        for c in range(len(C)):
            members = sample[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return _normalize(C)


def ivf_topk(ds: Dataset, query_ids: list[int], k: int = 5, n_centroids: int = 16,
             nprobe: int = 4, sample_size: int = 4096,
             id_col: str = "vec_id", vec_col: str = "embedding") -> Dataset:
    """IVF-bucketed ANN: vectors are assigned to their nearest centroid;
    each query scans only its ``nprobe`` closest centroid partitions.
    Approximate (recall < 1 by design) — the scale path."""
    sample = _to_matrix(
        pa.chunked_array([pa.array([r[vec_col] for r in
                                    ds.limit(sample_size).take_all()])]))
    C = _mini_kmeans(sample, n_centroids)
    qids, Q = _query_matrix(ds, query_ids, id_col, vec_col)
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    ref = ray.put((qids, Q, C, probes))

    def partial(b: pa.Table) -> pa.Table:
        ids_q, Qm, Cm, probe = ray.get(ref)
        bid = np.asarray(b[id_col].to_numpy(zero_copy_only=False))
        B = _normalize(_to_matrix(b[vec_col]))
        assign = np.argmax(B @ Cm.T, axis=1)              # vector → centroid
        # ONE (nq, batch) matmul, then mask scores outside each query's
        # probed partitions to -inf and take a vectorized partial top-k
        # across every query at once — the per-query Python loop this
        # replaces re-sliced B once per query
        cos = Qm @ B.T                                    # (nq, batch)
        probed = (assign[None, :, None] == probe[:, None, :]).any(axis=2)
        cos = np.where(probed, cos, -np.inf)
        nq, nb = cos.shape
        kk = min(k + 1, nb)
        part = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        flat_q = np.repeat(ids_q, kk)
        flat_n = bid[part.ravel()]
        flat_c = np.take_along_axis(cos, part, axis=1).ravel()
        keep = np.isfinite(flat_c)                        # drop unprobed
        return pa.table({"query_id": pa.array(flat_q[keep], pa.int64()),
                         "neighbor_id": pa.array(flat_n[keep], pa.int64()),
                         "cos": pa.array(flat_c[keep], pa.float64())})

    return _finalize_topk(ds.map_batches(partial, batch_format="pyarrow"), k)


def lsh_neardup_pairs(ds: Dataset, threshold: float = 0.4, n_planes: int = 12,
                      n_tables: int = 4, seed: int = 13, max_bucket: int = 4000,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      metrics: dict | None = None) -> Dataset:
    """Cosine near-dup at corpus scale: random-hyperplane signatures bucket
    the vectors (`n_tables` independent tables); exact cosine verify inside
    buckets. No full-matrix broadcast — the 100 TB path.

    Pass a ``metrics`` dict to get dropped-pair accounting filled in
    eagerly (``parked_buckets`` / ``parked_rows`` /
    ``parked_pairs_bound``): buckets over ``max_bucket`` emit no pairs —
    acceptable LSH semantics, but the parking must be visible."""
    from ray.data.aggregate import Min

    # dimension probed from one row
    dim = len(ds.limit(1).take_all()[0][vec_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_planes, dim)
    pref = ray.put(planes)

    def sig(b: pa.Table) -> pa.Table:
        P = ray.get(pref)
        id_arr = b[id_col]
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        B = _normalize(_to_matrix(b[vec_col]))
        n = len(id_arr)
        nt = P.shape[0]
        # all tables in one einsum; bucket labels and the fixed-width
        # binary vector payload are assembled with zero per-row Python
        # (the vector ships as raw float64 bytes — ≈3× smaller rows,
        # zero-copy decode); labels are a vectorized string join over
        # cast int columns, never an f-string loop
        bits = np.einsum("nd,tkd->tnk", B, P) > 0
        codes = (bits * (1 << np.arange(bits.shape[2]))).sum(axis=2)
        tlab = np.repeat(np.arange(nt), n).astype(np.int64)
        buckets = pc.binary_join_element_wise(
            pc.cast(pa.array(tlab, pa.int64()), pa.string()),
            pc.cast(pa.array(codes.reshape(-1), pa.int64()), pa.string()),
            "|")
        ids_tiled = pa.concat_arrays([id_arr] * nt) if nt > 1 else id_arr
        return pa.table({"bucket": buckets,
                         "id": ids_tiled,
                         "vec": _rows_as_binary(np.tile(B, (nt, 1)))})

    def emit(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2 or n > max_bucket:
            return pa.schema([("pair", pa.string()), ("id_a", g["id"].type),
                              ("id_b", g["id"].type)]).empty_table()
        id_arr = g["id"]
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        ids = id_arr.to_numpy(zero_copy_only=False)
        V = _binary_to_matrix(g["vec"])
        cos = V @ V.T
        ri, ci = np.nonzero(cos >= threshold)
        keep = ids[ri] < ids[ci]
        a_ids = id_arr.take(pa.array(ri[keep], pa.int64()))
        b_ids = id_arr.take(pa.array(ci[keep], pa.int64()))
        return pa.table({
            "pair": pc.binary_join_element_wise(
                pc.cast(a_ids, pa.string()), pc.cast(b_ids, pa.string()),
                "|"),
            "id_a": a_ids,
            "id_b": b_ids,
        })

    from payor_linkage.rayutil import grouped_apply

    sch = ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    pair_schema = pa.schema([("pair", pa.string()), ("id_a", idt),
                             ("id_b", idt)])
    sigs = ds.map_batches(sig, batch_format="pyarrow")
    if metrics is not None:
        # dropped-pair accounting (SURVEY §4): over-cap buckets vanish
        # from `emit` by design — count them so "no pairs found" is
        # distinguishable from "pairs parked". Bucket sizes come from a
        # per-batch partial count over the bucket column only (the
        # blocking.py key_counts shape) — never the vectors.
        from ray.data.aggregate import Sum

        sigs = sigs.materialize()
        sizes = (sigs.select_columns(["bucket"])
                 .map_batches(lambda t: t.group_by("bucket")
                 .aggregate([([], "count_all")])
                 .rename_columns(["bucket", "n"]), batch_format="pyarrow")
                 .groupby("bucket").aggregate(Sum("n", alias_name="n")))
        over = sizes.map_batches(
            lambda t: t.filter(pc.greater(t["n"], max_bucket)),
            batch_format="pyarrow").materialize()
        ns = [r["n"] for r in over.take_all()]
        metrics["parked_buckets"] = len(ns)
        metrics["parked_rows"] = int(sum(ns))
        metrics["parked_pairs_bound"] = int(sum(n * (n - 1) // 2 for n in ns))
    pairs = grouped_apply(sigs, "bucket", group_fn=emit,
                          out_schema=pair_schema)
    return (pairs.groupby("pair")
            .aggregate(Min("id_a", alias_name="id_a"), Min("id_b", alias_name="id_b"))
            .map_batches(lambda b: b.drop_columns(["pair"]), batch_format="pyarrow"))


def knn_join(ds: Dataset, k: int = 5, n_centroids: int = 16,
             nprobe: int = 4, sample_size: int = 4096,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_partition: int = 100_000) -> Dataset:
    """kNN self-join / kNN-graph construction: top-k cosine neighbors
    for EVERY vector (self excluded, ties by neighbor id) — the
    all-rows generalization of ``ann_topk`` that never broadcasts a
    query matrix (that broadcast is the thing that cannot scale when
    every row is a query).

    IVF partitioning: each vector's data copy lives in exactly ONE
    partition (its nearest centroid — so a (query, neighbor) candidate
    is emitted at most once and needs no dedup), while its query role
    probes its ``nprobe`` nearest partitions. Per-partition work is one
    dense f64 matmul + vectorized per-query partial top-k; a final
    ``grouped_topk`` (cos DESC, id ASC) merges partials per query.
    Normalized vectors ship through the one grouped shuffle as raw
    float64 bytes (fixed width, zero-copy decode — same trick as
    ``lsh_neardup_pairs``).

    ``n_centroids=1`` is the exact-complete configuration (every pair
    verified — the oracle-checked mode; the whole corpus must then fit
    one partition, enforced by ``max_partition``); multi-centroid is
    the approximate scale path (recall pytest-gated)."""
    from payor_linkage.dataops.aggregates import grouped_topk
    from payor_linkage.rayutil import grouped_apply

    sample = _to_matrix(
        pa.chunked_array([pa.array([r[vec_col] for r in
                                    ds.limit(sample_size).take_all()])]))
    C = _mini_kmeans(sample, n_centroids)
    cref = ray.put(C)

    def emit_roles(b: pa.Table) -> pa.Table:
        Cm = ray.get(cref)
        bid = np.asarray(b[id_col].to_pylist(), dtype=np.int64)
        B = _normalize(_to_matrix(b[vec_col]))
        sims = B @ Cm.T
        p = min(nprobe, Cm.shape[0])
        if p < Cm.shape[0]:
            # top-p centroids via argpartition (O(C) not O(C log C)),
            # then order those p so col 0 is the argmax (the data copy)
            part = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            rows = np.arange(len(part))[:, None]
            order = np.argsort(-sims[rows, part], axis=1)
            probes = part[rows, order]
        else:
            probes = np.argsort(-sims, axis=1)[:, :p]  # col 0 == argmax
        n = len(bid)
        part = probes.reshape(-1)
        rid = np.repeat(np.arange(n), p)
        is_data = np.zeros(n * p, dtype=bool)
        is_data[::p] = True                            # nearest = data copy
        return pa.table({
            "part": pa.array(part.astype(np.int64)),
            "id": pa.array(bid[rid]),
            "is_data": pa.array(is_data),
            "vec": _rows_as_binary(B[rid]),
        })

    cand_schema = pa.schema([("query_id", pa.int64()),
                             ("neighbor_id", pa.int64()),
                             ("cos", pa.float64())])

    def partition_topk(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return cand_schema.empty_table()
        if n > max_partition:
            raise ValueError(
                f"knn_join partition of {n} rows exceeds max_partition="
                f"{max_partition}; raise n_centroids")
        ids = np.asarray(g["id"].to_pylist(), dtype=np.int64)
        V = _binary_to_matrix(g["vec"])
        dmask = np.asarray(g["is_data"].to_pylist(), dtype=bool)
        if not dmask.any():
            return cand_schema.empty_table()
        D, did = V[dmask], ids[dmask]
        cos = V @ D.T                                  # (queries, data)
        kk = min(k + 1, cos.shape[1])                  # +1 survives self
        top = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(np.arange(len(ids)), kk)
        ni = top.reshape(-1)
        qid, nid = ids[qi], did[ni]
        keep = qid != nid
        return pa.table({
            "query_id": pa.array(qid[keep]),
            "neighbor_id": pa.array(nid[keep]),
            "cos": pa.array(cos[qi, ni][keep], pa.float64()),
        })

    cands = grouped_apply(
        ds.select_columns([id_col, vec_col])
        .map_batches(emit_roles, batch_format="pyarrow"),
        "part", group_fn=partition_topk, out_schema=cand_schema)
    out = grouped_topk(cands, "query_id", "cos", k,
                       tie_col="neighbor_id", keep_cols=["neighbor_id"])
    return out


# ── scalar quantization (int8 codes) ───────────────────────────────────────


def embedding_ranges(ds: Dataset, vec_col: str = "embedding"
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-dimension (lo, hi) over an embedding column in ONE
    streaming pass: each block emits a single row of per-dim min/max
    lists, the driver reduces n_blocks × dim floats (corpus-size-free).
    min/max are exact (no float-sum order dependence), so the result is
    bit-stable regardless of block layout."""
    def partial(b: pa.Table) -> pa.Table:
        M = _to_matrix(b[vec_col])
        if M.size == 0:
            return pa.table({"lo": pa.array([], pa.list_(pa.float64())),
                             "hi": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"lo": pa.array([M.min(axis=0).tolist()],
                                        pa.list_(pa.float64())),
                         "hi": pa.array([M.max(axis=0).tolist()],
                                        pa.list_(pa.float64()))})

    parts = (ds.select_columns([vec_col])
             .map_batches(partial, batch_format="pyarrow").take_all())
    lo = np.min(np.stack([np.asarray(r["lo"]) for r in parts]), axis=0)
    hi = np.max(np.stack([np.asarray(r["hi"]) for r in parts]), axis=0)
    return lo, hi


def quantize_embeddings(ds: Dataset, levels: int = 256,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        ranges: tuple[np.ndarray, np.ndarray] | None = None
                        ) -> Dataset:
    """Scalar (per-dimension min/max) quantization of an embedding
    column to integer codes in [0, levels): the standard int8
    compression step before quantized ANN — 4× smaller vectors, integer
    distance kernels downstream.

    ``code = min(floor((x - lo) * levels / (hi - lo)), levels - 1)``
    computed in float64. Every operation (min/max, subtract, multiply,
    divide, floor) is order-independent IEEE arithmetic, so the codes
    are EXACTLY reproducible by any engine — the SQL oracle recomputes
    them bit-for-bit (unlike float sums, which are order-dependent; see
    CLAUDE.md oracle-parity notes). Output is long format
    (id, dim 1-based, code) for direct comparison; ``dim==lo`` columns
    quantize to 0.

    Scale shape: one bounded range pass (``embedding_ranges``), then one
    broadcast streaming encode pass — no shuffle anywhere."""
    if ranges is None:
        ranges = embedding_ranges(ds, vec_col)
    lo, hi = ranges
    ref = ray.put((np.asarray(lo, np.float64), np.asarray(hi, np.float64),
                   float(levels)))

    def encode(b: pa.Table) -> pa.Table:
        lo_, hi_, lv = ray.get(ref)
        M = _to_matrix(b[vec_col])
        n, d = M.shape if M.size else (0, len(lo_))
        span = hi_ - lo_
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor((M - lo_) * lv / span)
        codes = np.where(span > 0, codes, 0.0)
        codes = np.minimum(codes, lv - 1).astype(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "code": pa.array(codes.reshape(-1)),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow")


def quantized_topk(ds: Dataset, query_ids: list[int], k: int = 5,
                   levels: int = 256, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> Dataset:
    """Top-k nearest neighbors by squared L2 over the quantized codes
    (asymmetric-distance-style search on the compressed representation):
    integer distances → exactly oracle-checkable, unlike float cosine.
    Self excluded; ties broken by neighbor id.

    Scale shape: bounded range pass, query codes collected via an
    in-dataset id filter (never a full ``take_all``), then one streaming
    pass — per batch a single (nq, batch) int64 distance matrix from the
    ||q||² + ||b||² − 2q·b expansion (integer matmul), partial top-k per
    batch, global ``grouped_topk`` merge."""
    lo, hi = embedding_ranges(ds, vec_col)
    lo64, hi64 = np.asarray(lo, np.float64), np.asarray(hi, np.float64)
    lv = float(levels)

    def codes_of(M: np.ndarray) -> np.ndarray:
        span = hi64 - lo64
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.floor((M - lo64) * lv / span)
        c = np.where(span > 0, c, 0.0)
        return np.minimum(c, lv - 1).astype(np.int64)

    qids, Qraw = _query_rows(ds, query_ids, id_col, vec_col)
    Qc = codes_of(Qraw)
    ref = ray.put((qids, Qc))

    def partial(b: pa.Table) -> pa.Table:
        ids_q, Qm = ray.get(ref)
        bid = b[id_col].to_numpy(zero_copy_only=False)
        Bc = codes_of(_to_matrix(b[vec_col]))
        # int64 squared-L2 via the dot expansion: exact (codes < 2^8,
        # dim ≲ 2^16 → no overflow near int64)
        q2 = (Qm * Qm).sum(axis=1)[:, None]
        b2 = (Bc * Bc).sum(axis=1)[None, :]
        dist = q2 + b2 - 2 * (Qm @ Bc.T)
        nq, nb = dist.shape
        kk = min(k + 1, nb)
        part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(ids_q, kk)),
            "neighbor_id": pa.array(bid[part.ravel()]),
            "neg_dist": pa.array(
                -np.take_along_axis(dist, part, axis=1).ravel()),
            "dist": pa.array(
                np.take_along_axis(dist, part, axis=1).ravel()),
        })

    from payor_linkage.dataops.aggregates import grouped_topk

    cands = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow")
    noself = cands.map_batches(
        lambda b: b.filter(pc.not_equal(b["query_id"], b["neighbor_id"])),
        batch_format="pyarrow")
    return grouped_topk(noself, "query_id", "neg_dist", k,
                        tie_col="neighbor_id",
                        keep_cols=["neighbor_id", "dist"])


def _query_rows(ds: Dataset, query_ids: list[int], id_col: str,
                vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Like ``_query_matrix`` but returns RAW (un-normalized) vectors —
    quantization needs the original coordinates."""
    qset = ray.put(np.asarray(sorted(set(query_ids))))

    def pick(b: pa.Table) -> pa.Table:
        wanted = ray.get(qset)
        mask = np.isin(b[id_col].to_numpy(zero_copy_only=False), wanted)
        return b.filter(pa.array(mask))

    rows = (ds.select_columns([id_col, vec_col])
            .map_batches(pick, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: r[id_col])
    qids = np.array([r[id_col] for r in rows])
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return qids, Q


# ── product quantization ───────────────────────────────────────────────────


def pq_fit(ds: Dataset, m: int = 4, k: int = 16, iters: int = 8,
           sample_size: int = 4096, vec_col: str = "embedding",
           seed: int = 23) -> np.ndarray:
    """Product-quantization codebooks: split the embedding dimension
    into ``m`` contiguous subspaces and fit ``k`` L2 (plain Lloyd, NOT
    spherical) centroids per subspace — the standard PQ compression
    trainer (m log2(k)-bit codes per vector, e.g. 4×4 bits here vs 64
    float32s). Returns (m, k, dim/m) float64 codebooks.

    Scale shape mirrors ``kmeans_fit``: deterministic init from a
    BOUNDED sample, then per iteration ONE streaming pass over the
    corpus — all m subspaces assigned in the same batch kernel, each
    block emitting m·k partial (count, sum) rows; only m·k·dim floats
    reach the driver per round. Float-iterative → pytest reference gate
    (numpy Lloyd with identical init/accumulation), not a SQL oracle —
    the kmeans/pagerank precedent."""
    sample = _to_matrix(
        pa.chunked_array([pa.array([r[vec_col] for r in
                                    ds.limit(sample_size).take_all()])]))
    n, dim = sample.shape
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    dsub = dim // m
    rng = np.random.RandomState(seed)
    C = np.stack([sample[rng.choice(n, size=min(k, n), replace=False),
                         s * dsub:(s + 1) * dsub].copy()
                  for s in range(m)])                       # (m, k, dsub)

    proj = ds.select_columns([vec_col])
    for _ in range(iters):
        ref = ray.put(C)

        def partial(b: pa.Table) -> pa.Table:
            Cm = ray.get(ref)                               # (m, k, dsub)
            M = _to_matrix(b[vec_col])
            mm, kk, dd = Cm.shape
            rows_s, rows_c, rows_n, rows_sum = [], [], [], []
            for s in range(mm):
                X = M[:, s * dd:(s + 1) * dd]               # (n, dsub)
                d2 = ((X[:, None, :] - Cm[s][None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d2, axis=1)
                for c in range(kk):
                    mem = X[a == c]
                    rows_s.append(s)
                    rows_c.append(c)
                    rows_n.append(len(mem))
                    rows_sum.append(mem.sum(axis=0) if len(mem)
                                    else np.zeros(dd))
            return pa.table({
                "s": pa.array(rows_s, pa.int64()),
                "c": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "sum": pa.array([x.tolist() for x in rows_sum],
                                pa.list_(pa.float64()))})

        parts = pa.concat_tables(
            [t for t in ray.get(
                proj.map_batches(partial, batch_format="pyarrow")
                .materialize().to_arrow_refs()) if t.num_rows],
            promote_options="default")
        ss = parts["s"].to_numpy(zero_copy_only=False)
        cs = parts["c"].to_numpy(zero_copy_only=False)
        ns = parts["n"].to_numpy(zero_copy_only=False)
        S = _to_matrix(parts["sum"])
        newC = C.copy()
        for s in range(m):
            for c in range(k):
                sel = (ss == s) & (cs == c)
                n_tot = ns[sel].sum()
                if n_tot:
                    newC[s, c] = S[sel].sum(axis=0) / n_tot
        C = newC
    return C


def pq_encode(ds: Dataset, codebooks: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding") -> Dataset:
    """One streaming pass: every vector → its m-subspace PQ code
    (nearest codebook centroid per subspace, ties by centroid id via
    argmin's first-hit). Output (id, sub 1-based, code) long format."""
    ref = ray.put(np.ascontiguousarray(codebooks))

    def encode(b: pa.Table) -> pa.Table:
        Cm = ray.get(ref)
        M = _to_matrix(b[vec_col])
        mm, kk, dd = Cm.shape
        n = M.shape[0] if M.size else 0
        ids = b[id_col].to_numpy(zero_copy_only=False)
        codes = np.empty((n, mm), dtype=np.int64)
        for s in range(mm):
            X = M[:, s * dd:(s + 1) * dd]
            d2 = ((X[:, None, :] - Cm[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pa.table({
            id_col: pa.array(np.repeat(ids, mm)),
            "sub": pa.array(np.tile(np.arange(1, mm + 1, dtype=np.int64),
                                    n)),
            "code": pa.array(codes.reshape(-1)),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow")


# ── distributed k-means ────────────────────────────────────────────────────


def kmeans_fit(ds: Dataset, k: int = 8, iters: int = 10,
               sample_size: int = 4096, id_col: str = "vec_id",
               vec_col: str = "embedding", seed: int = 11) -> np.ndarray:
    """Distributed Lloyd's k-means (spherical / cosine) over an
    embedding column: returns the (k, dim) L2-normalized centroid
    matrix. The clustering primitive behind IVF partitioning, corpus
    topic bucketing and diversity-aware sampling.

    Scale shape: deterministic init from a BOUNDED sample (the
    ``_mini_kmeans`` seed ``ivf_topk`` already uses), then per
    iteration ONE streaming pass — centroids broadcast via ``ray.put``,
    each block emits k partial rows (count, per-dim float64 sum) from a
    single argmax matmul, and only k × dim × n_blocks floats reach the
    driver for the update (corpus-size-free). Vectors are never
    collected; assignment is a separate streaming pass
    (``kmeans_assign``). Float-iterative by nature → exact pytest
    reference gate rather than a SQL oracle (the pagerank/bm25
    precedent)."""
    sample = _to_matrix(
        pa.chunked_array([pa.array([r[vec_col] for r in
                                    ds.limit(sample_size).take_all()])]))
    C = _mini_kmeans(sample, k, seed=seed)
    proj = ds.select_columns([vec_col])
    for _ in range(iters):
        ref = ray.put(C)

        def partial(b: pa.Table) -> pa.Table:
            Cm = ray.get(ref)
            B = _normalize(_to_matrix(b[vec_col]))
            assign = np.argmax(B @ Cm.T, axis=1)
            rows_c, rows_n, rows_s = [], [], []
            for c in range(len(Cm)):
                members = B[assign == c]
                rows_c.append(c)
                rows_n.append(len(members))
                rows_s.append(members.sum(axis=0) if len(members)
                              else np.zeros(Cm.shape[1]))
            return pa.table({
                "c": pa.array(rows_c, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array([s.tolist() for s in rows_s],
                              pa.list_(pa.float64()))})

        parts = pa.concat_tables(
            [t for t in ray.get(
                proj.map_batches(partial, batch_format="pyarrow")
                .materialize().to_arrow_refs()) if t.num_rows],
            promote_options="default")
        cs = parts["c"].to_numpy(zero_copy_only=False)
        ns = parts["n"].to_numpy(zero_copy_only=False)
        S = _to_matrix(parts["s"])
        newC = C.copy()
        for c in range(k):
            m = cs == c
            n_tot = ns[m].sum()
            if n_tot:
                newC[c] = S[m].sum(axis=0) / n_tot
        C = _normalize(newC)
    return C


def kmeans_assign(ds: Dataset, centroids: np.ndarray,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> Dataset:
    """One streaming argmax pass: (id, cluster) against a broadcast
    centroid matrix — the ``kmeans_fit`` output applied to any corpus."""
    ref = ray.put(np.ascontiguousarray(centroids))

    def f(b: pa.Table) -> pa.Table:
        B = _normalize(_to_matrix(b[vec_col]))
        a = np.argmax(B @ ray.get(ref).T, axis=1)
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.select_columns([id_col, vec_col]).map_batches(
        f, batch_format="pyarrow")


def kmeans(ds: Dataset, k: int = 8, iters: int = 10,
           sample_size: int = 4096, id_col: str = "vec_id",
           vec_col: str = "embedding", seed: int = 11) -> Dataset:
    """Fit + assign: (id, cluster) for every vector (see ``kmeans_fit``
    for the scale shape and the determinism/parity gates)."""
    C = kmeans_fit(ds, k=k, iters=iters, sample_size=sample_size,
                   id_col=id_col, vec_col=vec_col, seed=seed)
    return kmeans_assign(ds, C, id_col=id_col, vec_col=vec_col)


def mutual_nn(ds: Dataset, id_col: str = "vec_id",
              vec_col: str = "embedding", n_centroids: int = 1,
              nprobe: int = 1) -> Dataset:
    """Mutual-nearest-neighbor pairs: (id_a, id_b) with a < b where
    each vector is the other's cosine top-1 — the reciprocal-best-match
    link rule (far higher precision than one-directional NN; the
    standard bitext/embedding alignment filter).

    Shape: one ``knn_join(k=1)`` pass (exact-complete at
    ``n_centroids=1``, IVF-approximate on the scale path), then each
    directed edge canonicalizes to (min, max) and ONE grouped count
    keeps pairs seen from both directions — no self-join, the
    mutuality check shuffles only id pairs."""
    from ray.data.aggregate import Sum

    nn1 = knn_join(ds, k=1, n_centroids=n_centroids, nprobe=nprobe,
                   id_col=id_col, vec_col=vec_col)

    def canon(b: pa.Table) -> pa.Table:
        q, n = b["query_id"], b["neighbor_id"]
        return pa.table({
            "id_a": pc.min_element_wise(q, n),
            "id_b": pc.max_element_wise(q, n),
            "n_dir": pa.array(np.ones(len(b), dtype=np.int64)),
        })

    both = (nn1.map_batches(canon, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(Sum("n_dir", alias_name="n_dir")))

    def mutual(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["n_dir"], 2))
        return t.drop_columns(["n_dir"])

    return both.map_batches(mutual, batch_format="pyarrow")

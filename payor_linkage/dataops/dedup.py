"""Deduplication operators over a document table (id + text columns).

All scale-shaped: hashes/signatures computed vectorized per batch,
candidate generation via groupby shuffles on bounded keys, exact-dedup as
a single aggregate (no per-group Python). The LSH pipeline is the guide's
canonical shingle → minhash → band → bucket-groupby → verify shape.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min

_DUCK_CON = None


def _duck_con():
    """One DuckDB connection per worker process, created lazily and
    reused across batches (connect/close per batch measurably hurts the
    hash pass). Raises ImportError when duckdb is unavailable so callers
    can fall back to pure-python hashlib."""
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb

        _DUCK_CON = duckdb.connect()
    return _DUCK_CON


def _pool_shape(ds: Dataset, rows_per_actor: int = 4096) -> tuple[int, int, int]:
    """(cpus, rows-per-block, pool-max) for a signature actor pool.

    Pool size scales with the DATA, capped at cluster CPUs: actor spawn
    (~0.5s each) dwarfs the signature work on small corpora, while a
    whole-corpus run wants every CPU. Blocks are row-balanced so pool
    tasks (which consume whole upstream blocks) can't be starved by a
    single-file read.

    NOTE: ``ds.count()`` is metadata-cheap for read_parquet / already-
    materialized inputs (the expected callers); composing these operators
    onto a long UN-materialized pipeline would execute it twice — pass a
    materialized Dataset there."""
    import ray as _ray
    try:
        cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    n = ds.count()
    pool_max = max(2, min(cpus, n // rows_per_actor + 1))
    rpb = max(64, n // (pool_max * 2) + 1)
    return cpus, rpb, pool_max


# ── exact dedup ────────────────────────────────────────────────────────────


def _content_md5(col) -> pa.Array:
    """md5 of a string column through DuckDB's vectorized C++ kernel
    (the grouped_checksum precedent) — at 100 TB the hash pass IS the
    dedup cost, so a per-row Python hashlib loop here would dominate
    the stage. One connection per worker process (module-level cache),
    with a pure-python hashlib fallback when duckdb is unavailable (the
    scoring.py use_duckdb pattern)."""
    try:
        con = _duck_con()
    except ImportError:
        import hashlib

        return pa.array(
            [hashlib.md5(v.encode()).hexdigest() if v is not None
             else None for v in col.to_pylist()], pa.string())
    t = pa.table({"_t": col})
    con.register("t", t)
    h = con.execute("SELECT md5(_t) AS h FROM t").arrow()["h"] \
        .combine_chunks()
    con.unregister("t")
    return h


def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct text: (text, keeper_id = min id, n_dups).

    Content-pointer shape: only (md5, id) ride the group shuffle — a
    bounded-width key/value even for huge documents. The keeper's text is
    attached afterwards by a keeper-grain join back to the source scan
    (broadcast binary-search below `lookup_join`'s 5M bound, hash join
    above it) — no document text moves through the dedup shuffle."""
    from payor_linkage.rayutil import lookup_join

    def add_hash(b: pa.Table) -> pa.Table:
        return pa.table({
            "_h": _content_md5(b[text_col]),
            id_col: b[id_col],
        })

    keepers = (ds.map_batches(add_hash, batch_format="pyarrow")
               .groupby("_h")
               .aggregate(Min(id_col, alias_name="keeper_id"),
                          Count(alias_name="n_dups"))
               .map_batches(lambda b: b.drop_columns(["_h"]),
                            batch_format="pyarrow"))

    def as_keeper_grain(b: pa.Table) -> pa.Table:
        return pa.table({"keeper_id": b[id_col], text_col: b[text_col]})

    content = ds.map_batches(as_keeper_grain, batch_format="pyarrow")
    # inner join drops non-keeper rows; keepers' keys are unique by
    # construction (Min over a partition of the ids)
    out = lookup_join(content, keepers, on="keeper_id")
    return out.map_batches(
        lambda b: b.select([text_col, "keeper_id", "n_dups"]),
        batch_format="pyarrow")


def normalized_dedup(ds: Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    """Exact dedup after canonicalization (lowercase, collapse runs of
    non-[a-z0-9] to one space, trim) — the C4/RefinedWeb-style
    "normalize before hashing" step that catches trivially-reformatted
    duplicates (case, punctuation, whitespace) plain ``exact_dedup``
    misses. Output one row per distinct normalized text:
    (keeper_id = min id, n_dups).

    Same content-pointer shape as ``exact_dedup``: normalization and
    hashing are vectorized Arrow kernels per batch; only (md5, id)
    rides the group shuffle — the normalized text itself never moves."""
    def add_hash(b: pa.Table) -> pa.Table:
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(b[text_col]), "[^a-z0-9]+", " "),
            " ")
        return pa.table({"_h": _content_md5(norm), id_col: b[id_col]})

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("_h")
            .aggregate(Min(id_col, alias_name="keeper_id"),
                       Count(alias_name="n_dups"))
            .map_batches(lambda b: b.drop_columns(["_h"]),
                         batch_format="pyarrow"))


def write_dedup_state(ds: Dataset, state_dir: str, text_col: str = "text",
                      n_buckets: int = 64) -> list:
    """Persist the bucketed content-hash state ``exact_dedup_incremental``
    probes: one distinct md5 per row, hash-bucketed on disk
    (``storage.write_bucketed``) so any hash's location is computable
    without reading data. Size ``n_buckets`` so one bucket's hashes fit
    a worker (corpus_hashes / n_buckets rows)."""
    from payor_linkage import storage

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"h": _content_md5(b[text_col])})

    distinct = (ds.map_batches(project, batch_format="pyarrow")
                .groupby("h").count()
                .map_batches(lambda b: b.select(["h"]),
                             batch_format="pyarrow"))
    return storage.write_bucketed(distinct, state_dir, "h", n_buckets)


def exact_dedup_incremental(new_docs: Dataset, state_dir: str,
                            text_col: str = "text", id_col: str = "doc_id",
                            n_buckets: int = 64):
    """Incremental exact dedup against persisted bucketed hash state —
    the O(delta) maintenance form of ``exact_dedup``: a new landing
    drop is deduped against a 100 TB corpus WITHOUT touching the
    corpus.

    I/O shape: the delta's hashes pick their buckets arithmetically
    (crc32 % n_buckets); ONLY those bucket files are read (touched ×
    corpus/n_buckets rows — size n_buckets so a bucket fits a worker),
    the delta keeps the first doc (min ``id_col``) per previously
    unseen hash, and the kept hashes are APPENDED to the state
    (``storage.append_bucketed`` — O(delta) new part files, existing
    files untouched, crash-idempotent). Returns ``(kept, buckets)``:
    the kept delta docs as a streaming filter over ``new_docs`` and the
    touched bucket ids."""
    import os
    import zlib

    import ray
    import ray.data as rd

    from payor_linkage import storage

    def project(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b[id_col],
                         "h": _content_md5(b[text_col])})

    parts = [t for t in ray.get(
        new_docs.map_batches(project, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return new_docs, []
    dtbl = pa.concat_tables(parts, promote_options="default") \
        .combine_chunks()

    hashes = dtbl["h"].to_pylist()
    buckets = sorted({zlib.crc32(h.encode()) % n_buckets for h in hashes})
    dirs = [d for d in (os.path.join(state_dir, f"_bucket={b}")
                        for b in buckets) if os.path.isdir(d)]
    if dirs:
        prior = rd.read_parquet(dirs, columns=["h"],
                                file_extensions=["parquet"])
        ptbl = pa.concat_tables(
            [t for t in ray.get(prior.materialize().to_arrow_refs())
             if t.num_rows], promote_options="default")
        prior_h = ptbl["h"].combine_chunks() if ptbl.num_rows \
            else pa.array([], pa.string())
    else:
        prior_h = pa.array([], pa.string())

    unseen = dtbl.filter(pc.invert(pc.is_in(
        dtbl["h"], value_set=prior_h)))
    # first delta doc per unseen hash: one Arrow sort + run firsts
    unseen = unseen.sort_by([("h", "ascending"),
                             (id_col, "ascending")]).combine_chunks()
    if unseen.num_rows:
        harr = unseen["h"].to_numpy(zero_copy_only=False)
        firsts = np.nonzero(
            np.concatenate([[True], harr[1:] != harr[:-1]]))[0]
        kept_tbl = unseen.take(pa.array(firsts))
    else:
        kept_tbl = unseen
    kept_ids = kept_tbl[id_col].combine_chunks()
    kid_ref = ray.put(kept_ids)

    def only_kept(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col], value_set=ray.get(kid_ref)))

    kept = new_docs.map_batches(only_kept, batch_format="pyarrow")
    if kept_tbl.num_rows:
        storage.append_bucketed(rd.from_arrow(kept_tbl.select(["h"])),
                                state_dir, "h", n_buckets)
    return kept, buckets


# ── MinHash + LSH ──────────────────────────────────────────────────────────

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    if len(text) < k:
        grams = [text]
    else:
        grams = [text[i:i + k] for i in range(len(text) - k + 1)]
    return np.unique(np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.int64))


def _minhash_sig(text: str, a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    sh = _shingles(text, k)
    # (num_perm, n_shingles) universal hashing, min over shingles
    hv = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
    return hv.min(axis=1)


def _jaccard_shingles(ta: str, tb: str, k: int) -> float:
    sa, sb = set(_shingles(ta, k).tolist()), set(_shingles(tb, k).tolist())
    u = sa | sb
    return len(sa & sb) / len(u) if u else 0.0


class MinHasher:
    """Actor-pool stage: permutation params built once per actor.

    Emits (bucket, id) ONLY — document text never rides through the band
    explosion (bands× duplication through the shuffle at 100 TB); the
    verify stage joins content back per surviving candidate pair."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.a, self.b = _perm_params(num_perm)
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc → one row per LSH band: (bucket, id)."""
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        buckets, out_ids = [], []
        for i, t in enumerate(texts):
            sig = _minhash_sig(t, self.a, self.b, self.k)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band:(band + 1) * self.rows_per_band]
                bucket = f"{band}|{hashlib.md5(chunk.tobytes()).hexdigest()[:16]}"
                buckets.append(bucket)
                out_ids.append(ids[i])
        return pa.table({
            "bucket": pa.array(buckets, pa.string()),
            "id": pa.array(out_ids),
        })


def minhash_lsh_pairs(ds: Dataset, threshold: float = 0.5, num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 2000) -> Dataset:
    """Near-duplicate pairs by MinHash-LSH, verified with exact shingle
    Jaccard ≥ threshold. Output: (id_a, id_b, n_inter, n_union) —
    integer shingle-set sizes (jaccard = n_inter/n_union); integers keep
    the DuckDB oracle exact (no computed-float-ratio columns).

    Shape: shingle→minhash per batch (actor pool) → explode to TEXT-FREE
    band-bucket rows → groupby(bucket) pair emission (bounded by
    ``max_bucket``) → pair dedup (aggregate) → join content back by id
    (both sides) → exact shingle verify. This is the 100 TB shape: the
    band shuffle moves only (bucket, id); content moves once per
    *surviving candidate pair*, not bands× per document."""
    from payor_linkage.rayutil import smart_join

    k = shingle_k

    # size the signature pool to the cluster and row-balance the input:
    # actor-pool tasks consume whole upstream blocks, so a single-file
    # read (1 block) would serialize the per-doc signature work no matter
    # the pool size (CLAUDE.md block-skew note)
    _cpus, rpb, pool_max = _pool_shape(ds)
    band_rows = ds.repartition(target_num_rows_per_block=rpb).map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, shingle_k=k,
                                   text_col=text_col, id_col=id_col),
        concurrency=(1, pool_max), batch_size=None)

    sch = ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    pair_schema = pa.schema([("id_a", idt), ("id_b", idt)])

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        """All buckets in a block at once — singleton runs (the vast
        majority at bands×docs bucket counts) are skipped by a vectorized
        length filter; per-run work is only the triu index assembly
        (cached by run length)."""
        lens = ends - starts
        live = np.nonzero((lens >= 2) & (lens <= max_bucket))[0]
        if len(live) == 0:
            return pair_schema.empty_table()
        ids_arr = b["id"].combine_chunks()
        ids_np = ids_arr.to_numpy(zero_copy_only=False)
        tri_cache: dict = {}
        ai_parts, bi_parts = [], []
        for ri in live:
            s_, n = starts[ri], lens[ri]
            tri = tri_cache.get(n)
            if tri is None:
                tri = tri_cache[n] = np.triu_indices(n, k=1)
            order = np.argsort(ids_np[s_:s_ + n], kind="stable") + s_
            ai_parts.append(order[tri[0]])
            bi_parts.append(order[tri[1]])
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        return pa.table({
            "id_a": ids_arr.take(pa.array(ai)),
            "id_b": ids_arr.take(pa.array(bi)),
        }).cast(pair_schema)

    # grouped_apply, not groupby().map_groups: buckets are numerous and
    # mostly singletons — the per-group map_groups harness (~1ms/group)
    # dominates at bucket counts of bands×docs
    from payor_linkage.rayutil import grouped_apply

    pairs = grouped_apply(band_rows, "bucket", runs_fn=emit_runs,
                          out_schema=pair_schema)
    # a pair sharing k bands appears k times — two-column groupby dedup
    deduped = (pairs.groupby(["id_a", "id_b"]).count()
               .map_batches(lambda b: b.drop_columns(["count()"]),
                            batch_format="pyarrow"))

    return _content_verify(ds, deduped, lambda t: set(_shingles(t, k).tolist()),
                           threshold, text_col, id_col)


_LSH_DELTA_LOCAL_BOUND = 5_000_000


def write_lsh_state(ds: Dataset, state_dir: str, num_perm: int = 64,
                    bands: int = 16, shingle_k: int = 3,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 64) -> list:
    """Persist the band-bucket index ``minhash_lsh_incremental`` probes:
    the corpus's TEXT-FREE (bucket, id) band rows, hash-bucketed on disk
    by bucket string (``storage.write_bucketed``) so any band bucket's
    location is computable without reading data. Signature params must
    match the incremental probe's (same seed → same permutations)."""
    from payor_linkage import storage

    _cpus, rpb, pool_max = _pool_shape(ds)
    band_rows = ds.repartition(target_num_rows_per_block=rpb).map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, text_col=text_col,
                                   id_col=id_col),
        concurrency=(1, pool_max), batch_size=None)
    return storage.write_bucketed(band_rows, state_dir, "bucket", n_buckets)


def minhash_lsh_incremental(new_docs: Dataset, corpus_ds: Dataset,
                            state_dir: str, threshold: float = 0.5,
                            num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 3, text_col: str = "text",
                            id_col: str = "doc_id", max_bucket: int = 2000,
                            n_buckets: int = 64):
    """Incremental MinHash-LSH near-dup against persisted band-bucket
    state — the O(delta) maintenance form of ``minhash_lsh_pairs``: a
    new landing drop is near-dup-checked against a 100 TB corpus
    WITHOUT re-hashing the corpus.

    I/O shape: the delta's band rows pick their state buckets
    arithmetically (crc32(bucket) % n_buckets); ONLY those bucket files
    are read and immediately filtered to the delta's exact bucket
    strings, so prior rows entering the computation are
    delta-proportional under stable bucket occupancy. Pairs are emitted
    per shared band bucket with at least one NEW side (old–old pairs
    were emitted when the old docs arrived — the delta-blocking
    emission rule), deduped, then exact-Jaccard verified by
    ``_content_verify`` over ``corpus_ds.union(new_docs)`` (content
    moves once per surviving candidate). The delta's band rows APPEND
    to the state (``storage.append_bucketed`` — O(delta) part files,
    crash-idempotent).

    Exactness: because the state holds EVERY prior doc's band rows, a
    touched bucket's total occupancy here equals its occupancy in a
    fresh full run — so the ``max_bucket`` cap binds identically and
    the output equals ``minhash_lsh_pairs`` over the full corpus
    restricted to pairs with ≥1 delta side (pytest parity gate).

    Driver tier: the delta band table (bands × |delta| rows of
    (bucket, id)) and the touched prior rows collect to the driver —
    bounded by ``_LSH_DELTA_LOCAL_BOUND`` (5M rows, the
    ``exact_dedup_incremental`` precedent); above it, raise and run the
    full ``minhash_lsh_pairs`` recompute instead.

    Returns ``(pairs, buckets)``: verified (id_a, id_b, n_inter,
    n_union) pairs and the touched state bucket ids."""
    import os
    import zlib

    import ray
    import ray.data as rd

    from payor_linkage import storage

    k = shingle_k
    _cpus, rpb, pool_max = _pool_shape(new_docs)
    band_ds = new_docs.repartition(target_num_rows_per_block=rpb) \
        .map_batches(
            MinHasher, batch_format="pyarrow",
            fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                       shingle_k=k, text_col=text_col,
                                       id_col=id_col),
            concurrency=(1, pool_max), batch_size=None).materialize()
    parts = [t for t in ray.get(band_ds.to_arrow_refs()) if t.num_rows]
    sch = new_docs.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    empty_pairs = pa.schema([("id_a", idt), ("id_b", idt),
                             ("n_inter", pa.int64()),
                             ("n_union", pa.int64())]).empty_table()
    if not parts:
        return rd.from_arrow(empty_pairs), []
    dband = pa.concat_tables(parts, promote_options="default") \
        .combine_chunks()
    if dband.num_rows > _LSH_DELTA_LOCAL_BOUND:
        raise ValueError(
            f"delta band rows {dband.num_rows} exceed the driver bound "
            f"{_LSH_DELTA_LOCAL_BOUND}; run minhash_lsh_pairs over the "
            "full corpus instead")

    dbuckets = pc.unique(dband["bucket"])
    touched = sorted({zlib.crc32(s.encode()) % n_buckets
                      for s in dbuckets.to_pylist()})
    dirs = [d for d in (os.path.join(state_dir, f"_bucket={b}")
                        for b in touched) if os.path.isdir(d)]
    if dirs:
        prior = rd.read_parquet(dirs, columns=["bucket", "id"],
                                file_extensions=["parquet"])
        ptbl = pa.concat_tables(
            [t for t in ray.get(prior.materialize().to_arrow_refs())
             if t.num_rows], promote_options="default")
        ptbl = ptbl.filter(pc.is_in(ptbl["bucket"], value_set=dbuckets)) \
            if ptbl.num_rows else ptbl
    else:
        ptbl = pa.schema([("bucket", pa.string()), ("id", idt)]) \
            .empty_table()
    if ptbl.num_rows + dband.num_rows > _LSH_DELTA_LOCAL_BOUND:
        raise ValueError(
            "touched prior band rows exceed the driver bound; "
            "run minhash_lsh_pairs over the full corpus instead")

    both = pa.concat_tables([
        ptbl.append_column("is_new", pa.array(
            np.zeros(ptbl.num_rows, dtype=bool))),
        dband.append_column("is_new", pa.array(
            np.ones(dband.num_rows, dtype=bool)))],
        promote_options="default") \
        .sort_by([("bucket", "ascending"), ("id", "ascending")]) \
        .combine_chunks()
    barr = both["bucket"].to_numpy(zero_copy_only=False)
    ids = both["id"].combine_chunks()
    newf = both["is_new"].to_numpy(zero_copy_only=False)
    brk = np.nonzero(np.concatenate(
        [[True], barr[1:] != barr[:-1], [True]]))[0]
    starts, ends = brk[:-1], brk[1:]
    lens = ends - starts
    live = np.nonzero((lens >= 2) & (lens <= max_bucket))[0]
    tri_cache: dict = {}
    ai_parts, bi_parts = [], []
    for ri in live:
        s_, n = starts[ri], lens[ri]
        tri = tri_cache.get(n)
        if tri is None:
            tri = tri_cache[n] = np.triu_indices(n, k=1)
        ai, bi = tri[0] + s_, tri[1] + s_
        m = newf[ai] | newf[bi]
        ai_parts.append(ai[m])
        bi_parts.append(bi[m])
    if ai_parts:
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        cand = pa.table({"id_a": ids.take(pa.array(ai)),
                         "id_b": ids.take(pa.array(bi))}) \
            .group_by(["id_a", "id_b"]).aggregate([])
    else:
        cand = empty_pairs.select(["id_a", "id_b"])

    storage.append_bucketed(rd.from_arrow(dband.select(["bucket", "id"])),
                            state_dir, "bucket", n_buckets)
    if cand.num_rows == 0:
        return rd.from_arrow(empty_pairs), touched
    pairs = _content_verify(
        corpus_ds.union(new_docs), rd.from_arrow(cand),
        lambda t: set(_shingles(t, k).tolist()), threshold,
        text_col, id_col)
    return pairs, touched


def _attach_pair_content(ds: Dataset, deduped: Dataset,
                         text_col: str, id_col: str) -> Dataset:
    """Attach both documents' content to candidate (id_a, id_b) pairs:
    content moves once per surviving candidate.

    The candidate set is bounded by the near-dup rate (≪ corpus), so
    when provably small we broadcast the id set, filter the corpus in
    ONE scan (no shuffle) and join the two now-tiny sides; the
    size-aware hash join is the fallback for degenerate corpora where
    candidates stay large."""
    deduped = deduped.materialize()
    n_cand = deduped.count()
    if n_cand <= 1_000_000:
        import ray

        idtbl = pa.concat_tables(
            ray.get(deduped.select_columns(["id_a", "id_b"]).to_arrow_refs()),
            promote_options="default")
        needed = pc.unique(pa.chunked_array(
            [idtbl["id_a"].combine_chunks(), idtbl["id_b"].combine_chunks()]
        ).combine_chunks())
        ref = ray.put(needed)

        def pick(b: pa.Table) -> pa.Table:
            m = b.filter(pc.is_in(b[id_col], value_set=ray.get(ref)))
            return pa.table({"id": m[id_col], "text": m[text_col]})

        content = ds.map_batches(pick, batch_format="pyarrow").materialize()
        content_a = content.map_batches(
            lambda b: pa.table({"id_a": b["id"], "text_a": b["text"]}),
            batch_format="pyarrow")
        content_b = content.map_batches(
            lambda b: pa.table({"id_b": b["id"], "text_b": b["text"]}),
            batch_format="pyarrow")
    else:  # pragma: no cover - degenerate candidate volume
        content_a = ds.map_batches(
            lambda b: pa.table({"id_a": b[id_col], "text_a": b[text_col]}),
            batch_format="pyarrow")
        content_b = ds.map_batches(
            lambda b: pa.table({"id_b": b[id_col], "text_b": b[text_col]}),
            batch_format="pyarrow")
    # content sides are unique-keyed and bounded (candidate-driven) →
    # broadcast binary-search attach, no shuffle; lookup_join itself
    # falls back to the hash join above its row bound
    from payor_linkage.rayutil import lookup_join

    return lookup_join(lookup_join(deduped, content_a, "id_a"),
                       content_b, "id_b")


def _content_verify(ds: Dataset, deduped: Dataset, set_of, threshold: float,
                    text_col: str, id_col: str) -> Dataset:
    """Exact set-Jaccard verification over ``_attach_pair_content``'s
    enriched candidates: integer (n_inter, n_union) output with an
    unrounded ratio threshold — the same IEEE division the DuckDB
    oracles perform."""
    enriched = _attach_pair_content(ds, deduped, text_col, id_col)

    def verify(b: pa.Table) -> pa.Table:
        inter, union = [], []
        for ta, tb in zip(b["text_a"].to_pylist(), b["text_b"].to_pylist()):
            sa = set_of(ta)
            sb = set_of(tb)
            inter.append(len(sa & sb))
            union.append(len(sa | sb))
        out = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                        "n_inter": pa.array(inter, pa.int64()),
                        "n_union": pa.array(union, pa.int64())})
        # unrounded ratio compare — identical IEEE division to the oracle
        keep = [u > 0 and i / u >= threshold for i, u in zip(inter, union)]
        return out.filter(pa.array(keep, pa.bool_()))

    return enriched.map_batches(verify, batch_format="pyarrow")


# ── SimHash ────────────────────────────────────────────────────────────────


_SHIFTS = np.arange(64, dtype=np.uint64)


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (16-bit lookup, 4 gathers per word) →
    int32. Replaces a per-pair Python ``bin(int(v)).count('1')`` loop
    (~100× slower); ~3× faster than SWAR bit-slicing's 7 temporaries."""
    v = np.ascontiguousarray(x).view(np.uint16)
    return _POP16[v].reshape(len(x), 4).sum(axis=1, dtype=np.int32)


class SimHasher:
    """Actor-pool signature stage: token→hash memo persists per actor
    (stopword-heavy corpora repeat tokens massively — the md5 cost
    amortizes to ~one call per distinct token per actor)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self._memo: dict[str, int] = {}

    def _token_hash(self, t: str) -> int:
        h = self._memo.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            if len(self._memo) < 4_000_000:
                self._memo[t] = h
        return h

    def _sig(self, tokens: list[str]) -> int:
        if not tokens:
            return 0
        hv = np.array([self._token_hash(t) for t in tokens], dtype=np.uint64)
        bits = (hv[:, None] >> _SHIFTS[None, :]) & np.uint64(1)   # (n_tok, 64)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        b = (acc > 0).astype(np.uint64)
        return int((b << _SHIFTS).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self._sig(t.split()) for t in batch[self.text_col].to_pylist()]
        # stored as int64 (bit-reinterpreted) so parquet/DuckDB xor works
        return pa.table({
            "id": batch[self.id_col],
            "sig": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64)),
        })


def simhash_signatures(ds: Dataset, text_col: str = "text",
                       id_col: str = "doc_id") -> Dataset:
    """64-bit SimHash per document: (id, sig:int64)."""
    _cpus, rpb, pool_max = _pool_shape(ds)
    return ds.repartition(target_num_rows_per_block=rpb).map_batches(
        SimHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        concurrency=(1, pool_max), batch_size=None)


def _simhash_band_tbl(b: pa.Table, n_chunks: int) -> pa.Table:
    """Pigeonhole band rows with INTEGER bucket ids (chunk·2^width +
    part) — vectorized per chunk, so the downstream grouped sort runs
    on int64 keys instead of strings. Shared by the full bucketing pass
    and the persisted-state write/probe sides (one bucket formula)."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    ids = b["id"].combine_chunks()
    sigs = b["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(sigs)
    buckets = np.empty(n * n_chunks, dtype=np.int64)
    for chunk in range(n_chunks):
        part = ((sigs >> np.uint64(width * chunk))
                & np.uint64(mask)).astype(np.int64)
        buckets[chunk * n:(chunk + 1) * n] = chunk * (mask + 1) + part
    rep = pa.array(np.tile(np.arange(n, dtype=np.int64), n_chunks))
    return pa.table({"bucket": pa.array(buckets),
                     "id": ids.take(rep),
                     "sig": pa.array(np.tile(sigs.view(np.int64),
                                             n_chunks))})


def write_simhash_state(ds: Dataset, state_dir: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        n_chunks: int = 4, n_buckets: int = 64) -> list:
    """Persist the pigeonhole band index ``simhash_incremental`` probes:
    (bucket:int64, id, sig) rows hash-bucketed on disk by bucket value
    (``storage.write_bucketed``). Unlike the LSH state, the SIGNATURE
    rides along — hamming verification needs no content join, ever."""
    from payor_linkage import storage

    assert 64 % n_chunks == 0, "n_chunks must divide 64"
    band = simhash_signatures(ds, text_col=text_col, id_col=id_col) \
        .map_batches(lambda b: _simhash_band_tbl(b, n_chunks),
                     batch_format="pyarrow")
    return storage.write_bucketed(band, state_dir, "bucket", n_buckets)


def simhash_incremental(new_docs: Dataset, state_dir: str,
                        max_hamming: int = 3, n_chunks: int = 4,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_bucket: int = 2000, n_buckets: int = 64):
    """Incremental SimHash near-dup against persisted band-bucket state
    — the O(delta) maintenance form of ``simhash_pairs``, completing
    the incremental dedup family (exact / MinHash-LSH / SimHash). A new
    landing drop is checked against a 100 TB corpus WITHOUT re-hashing
    it, and WITHOUT any content join: the persisted rows carry the
    64-bit signature, so hamming verification is one vectorized
    xor+popcount over candidate index pairs.

    Same shape and guarantees as ``minhash_lsh_incremental``: only
    delta-touched state files are read (then filtered to the delta's
    exact integer buckets), pairs need ≥1 new side, the ``max_bucket``
    cap binds identically to a fresh full run (state holds every prior
    doc's bands), and the delta's band rows APPEND as O(delta) part
    files. Output equals ``simhash_pairs`` over the full corpus
    restricted to delta-touching pairs (pytest parity gate); driver
    tier bounded by ``_LSH_DELTA_LOCAL_BOUND`` with the full recompute
    as the documented fallback.

    Returns ``(pairs, buckets)``: (id_a, id_b, hamming ≤ max_hamming)
    and the touched state bucket ids."""
    import os

    import ray
    import ray.data as rd

    from payor_linkage import storage

    assert 64 % n_chunks == 0, "n_chunks must divide 64"
    sig_ds = simhash_signatures(new_docs, text_col=text_col,
                                id_col=id_col).materialize()
    parts = [t for t in ray.get(sig_ds.to_arrow_refs()) if t.num_rows]
    sch = new_docs.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    pair_schema = pa.schema([("id_a", idt), ("id_b", idt),
                             ("hamming", pa.int64())])
    if not parts:
        return rd.from_arrow(pair_schema.empty_table()), []
    dsig = pa.concat_tables(parts, promote_options="default") \
        .combine_chunks()
    dband = _simhash_band_tbl(dsig, n_chunks)
    if dband.num_rows > _LSH_DELTA_LOCAL_BOUND:
        raise ValueError(
            f"delta band rows {dband.num_rows} exceed the driver bound "
            f"{_LSH_DELTA_LOCAL_BOUND}; run simhash_pairs over the "
            "full corpus instead")

    dbuckets = pc.unique(dband["bucket"])
    touched = sorted(set(
        storage._bucket_of(dbuckets, n_buckets).to_pylist()))
    dirs = [d for d in (os.path.join(state_dir, f"_bucket={b}")
                        for b in touched) if os.path.isdir(d)]
    if dirs:
        prior = rd.read_parquet(dirs, columns=["bucket", "id", "sig"],
                                file_extensions=["parquet"])
        ptbl = pa.concat_tables(
            [t for t in ray.get(prior.materialize().to_arrow_refs())
             if t.num_rows], promote_options="default")
        ptbl = ptbl.filter(pc.is_in(ptbl["bucket"], value_set=dbuckets)) \
            if ptbl.num_rows else ptbl
    else:
        ptbl = pa.schema([("bucket", pa.int64()), ("id", idt),
                          ("sig", pa.int64())]).empty_table()
    if ptbl.num_rows + dband.num_rows > _LSH_DELTA_LOCAL_BOUND:
        raise ValueError(
            "touched prior band rows exceed the driver bound; "
            "run simhash_pairs over the full corpus instead")

    both = pa.concat_tables([
        ptbl.append_column("is_new", pa.array(
            np.zeros(ptbl.num_rows, dtype=bool))),
        dband.append_column("is_new", pa.array(
            np.ones(dband.num_rows, dtype=bool)))],
        promote_options="default") \
        .sort_by([("bucket", "ascending"), ("id", "ascending")]) \
        .combine_chunks()
    barr = both["bucket"].to_numpy(zero_copy_only=False)
    ids = both["id"].combine_chunks()
    sig_all = both["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
    newf = both["is_new"].to_numpy(zero_copy_only=False)
    brk = np.nonzero(np.concatenate(
        [[True], barr[1:] != barr[:-1], [True]]))[0]
    starts, ends = brk[:-1], brk[1:]
    lens = ends - starts
    live = np.nonzero((lens >= 2) & (lens <= max_bucket))[0]
    tri_cache: dict = {}
    ai_parts, bi_parts = [], []
    for ri in live:
        s_, n = starts[ri], lens[ri]
        tri = tri_cache.get(n)
        if tri is None:
            tri = tri_cache[n] = np.triu_indices(n, k=1)
        ai, bi = tri[0] + s_, tri[1] + s_
        m = newf[ai] | newf[bi]
        ai_parts.append(ai[m])
        bi_parts.append(bi[m])

    storage.append_bucketed(
        rd.from_arrow(dband.select(["bucket", "id", "sig"])),
        state_dir, "bucket", n_buckets)
    if not ai_parts:
        return rd.from_arrow(pair_schema.empty_table()), touched
    ai = np.concatenate(ai_parts)
    bi = np.concatenate(bi_parts)
    ham = _popcount64(sig_all[ai] ^ sig_all[bi])
    keep = ham <= max_hamming
    ai, bi, ham = ai[keep], bi[keep], ham[keep]
    cand = pa.table({"id_a": ids.take(pa.array(ai)),
                     "id_b": ids.take(pa.array(bi)),
                     "hamming": pa.array(ham.astype(np.int64))}) \
        .group_by(["id_a", "id_b"]).aggregate([("hamming", "min")]) \
        .rename_columns(["id_a", "id_b", "hamming"])
    return rd.from_arrow(cand.cast(pair_schema)), touched


def simhash_pairs_from_sigs(sig_ds: Dataset, max_hamming: int = 3,
                            n_chunks: int = 4, max_bucket: int = 2000) -> Dataset:
    """(id, sig) → near-dup pairs (id_a, id_b, hamming ≤ max_hamming).

    Pigeonhole bucketing: two sigs within hamming ``h`` share at least one
    of ``n_chunks`` equal chunks whenever ``h < n_chunks`` — candidate
    generation is COMPLETE iff ``max_hamming < n_chunks``. Larger chunks
    (fewer n_chunks) give wider buckets but a weaker guarantee; callers
    trade per corpus. Chunk width must divide 64."""
    assert 64 % n_chunks == 0, "n_chunks must divide 64"
    width = 64 // n_chunks
    mask = (1 << width) - 1

    band_rows = sig_ds.map_batches(
        lambda b: _simhash_band_tbl(b, n_chunks), batch_format="pyarrow")

    sig_sch = sig_ds.schema()
    idt = dict(zip(sig_sch.names, sig_sch.types))["id"]
    pair_schema = pa.schema([("id_a", idt), ("id_b", idt),
                             ("hamming", pa.int32())])

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        """All buckets in a block at once: per-run triu index assembly
        (cached by run length — 2-member buckets dominate), then ONE
        vectorized xor + SWAR popcount + threshold filter across every
        candidate pair in the block."""
        ids_arr = b["id"].combine_chunks()
        ids_np = ids_arr.to_numpy(zero_copy_only=False)
        sig_all = b["sig"].to_numpy(zero_copy_only=False).view(np.uint64)
        tri_cache: dict = {}
        ai_parts, bi_parts = [], []
        for s_, e_ in zip(starts, ends):
            n = e_ - s_
            if n < 2 or n > max_bucket:
                continue
            tri = tri_cache.get(n)
            if tri is None:
                tri = tri_cache[n] = np.triu_indices(n, k=1)
            # canonical a<b by id: order positions by id inside the run
            order = np.argsort(ids_np[s_:e_], kind="stable") + s_
            ai_parts.append(order[tri[0]])
            bi_parts.append(order[tri[1]])
        if not ai_parts:
            return pair_schema.empty_table()
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        x = sig_all[ai] ^ sig_all[bi]
        ham = _popcount64(x)
        # verify INSIDE the bucket — only pairs within threshold enter the
        # dedup shuffle (the candidate volume bound at scale)
        keep = ham <= max_hamming
        ai, bi, ham = ai[keep], bi[keep], ham[keep]
        return pa.table({
            "id_a": ids_arr.take(pa.array(ai)),
            "id_b": ids_arr.take(pa.array(bi)),
            "hamming": pa.array(ham),
        }).cast(pair_schema)

    from payor_linkage.rayutil import grouped_apply

    pairs = grouped_apply(band_rows, "bucket", runs_fn=emit_runs,
                          out_schema=pair_schema)
    # a pair found in k shared chunks appears k times — two-column
    # groupby dedup (no serialized pair-string key needed)
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


def simhash_pairs(ds: Dataset, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", max_bucket: int = 2000,
                  n_chunks: int = 4) -> Dataset:
    """Near-duplicate pairs by 64-bit SimHash (signature + bucket + verify).
    Output (id_a, id_b, hamming). Complete iff ``max_hamming < n_chunks``."""
    return simhash_pairs_from_sigs(
        simhash_signatures(ds, text_col=text_col, id_col=id_col),
        max_hamming=max_hamming, n_chunks=n_chunks, max_bucket=max_bucket)


# ── n-gram / char-set Jaccard over blocked pairs ───────────────────────────


def blocked_pairs(ds: Dataset, block_cols: list[str], id_col: str = "doc_id",
                  carry: list[str] | None = None, max_block: int = 5000) -> Dataset:
    """Generic J1-style pair generation: records sharing all ``block_cols``
    → canonical a<b pairs carrying ``carry`` columns from both sides."""
    carry = carry or []

    def keyed(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            *[pc.cast(b[c], pa.string()) for c in block_cols], "|")
        cols = {"bkey": key, "id": b[id_col]}
        for c in carry:
            cols[c] = b[c]
        return pa.table(cols)

    def emit(g: pa.Table) -> pa.Table:
        n = g.num_rows
        fields = [("pair", pa.string()), ("id_a", g["id"].type), ("id_b", g["id"].type)]
        for c in carry:
            fields += [(f"{c}_a", g[c].type), (f"{c}_b", g[c].type)]
        if n < 2 or n > max_block:
            return pa.schema(fields).empty_table()
        ids = g["id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        iu, ju = np.triu_indices(n, k=1)
        ai, bi = order[iu], order[ju]
        cols = {
            "pair": pa.array([f"{ids[a]}|{ids[b]}" for a, b in zip(ai, bi)], pa.string()),
            "id_a": pa.array(ids[ai]), "id_b": pa.array(ids[bi]),
        }
        for c in carry:
            arr = g[c].combine_chunks() if isinstance(g[c], pa.ChunkedArray) else g[c]
            cols[f"{c}_a"] = arr.take(pa.array(ai))
            cols[f"{c}_b"] = arr.take(pa.array(bi))
        return pa.table(cols)

    from payor_linkage.rayutil import grouped_apply

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    fields = [("pair", pa.string()), ("id_a", types[id_col]),
              ("id_b", types[id_col])]
    for c in carry:
        fields += [(f"{c}_a", types[c]), (f"{c}_b", types[c])]
    pairs = grouped_apply(ds.map_batches(keyed, batch_format="pyarrow"),
                          "bkey", group_fn=emit,
                          out_schema=pa.schema(fields))
    aggs = [Min("id_a", alias_name="id_a"), Min("id_b", alias_name="id_b")]
    for c in carry:
        aggs += [Min(f"{c}_a", alias_name=f"{c}_a"), Min(f"{c}_b", alias_name=f"{c}_b")]
    return pairs.groupby("pair").aggregate(*aggs).map_batches(
        lambda b: b.drop_columns(["pair"]), batch_format="pyarrow")


def charset_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard — semantics of DuckDB's ``jaccard()``."""
    sa, sb = set(a), set(b)
    u = sa | sb
    return len(sa & sb) / len(u) if u else 0.0


def ngram_jaccard_pairs(ds: Dataset, block_cols: list[str], threshold: float,
                        k: int = 3, charset: bool = False,
                        text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Jaccard-verified near-dup pairs within blocks. ``charset=True`` uses
    character-set Jaccard (DuckDB ``jaccard()`` parity) and outputs
    (id_a, id_b, jaccard round 4); the k-shingle path outputs integer set
    sizes (id_a, id_b, n_inter, n_union) with an UNROUNDED ratio
    threshold — the same IEEE division its DuckDB oracle performs."""
    pairs = blocked_pairs(ds, block_cols, id_col=id_col, carry=[text_col])

    def verify(b: pa.Table) -> pa.Table:
        ta = b[f"{text_col}_a"].to_pylist()
        tb = b[f"{text_col}_b"].to_pylist()
        if charset:
            jac = [round(charset_jaccard(x, y), 4) for x, y in zip(ta, tb)]
            out = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                            "jaccard": pa.array(jac, pa.float64())})
            return out.filter(pc.greater_equal(out["jaccard"], threshold))
        inter, union = [], []
        for x, y in zip(ta, tb):
            sa = set(_shingles(x, k).tolist())
            sb = set(_shingles(y, k).tolist())
            inter.append(len(sa & sb))
            union.append(len(sa | sb))
        out = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                        "n_inter": pa.array(inter, pa.int64()),
                        "n_union": pa.array(union, pa.int64())})
        keep = [u > 0 and i / u >= threshold for i, u in zip(inter, union)]
        return out.filter(pa.array(keep, pa.bool_()))

    return pairs.map_batches(verify, batch_format="pyarrow")


# ── near-dup clustering ────────────────────────────────────────────────────


def neardup_components(ds: Dataset, pairs: Dataset,
                       id_col: str = "doc_id") -> Dataset:
    """Near-dup *clusters* from verified pair output (any of the pair
    operators above): connected components reusing the linkage engine's
    tiered CC — driver min-label kernel below the edge bound, distributed
    label propagation above. Every document gets its component's
    canonical (minimum) id; singletons are their own cluster.

    Integer ids ride as zero-padded strings through the CC tiers (whose
    labels are string-min) so string-min ≡ numeric min; the pad is
    stripped on output."""
    from payor_linkage.cluster import _propagate_local, propagate_labels

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    is_int = pa.types.is_integer(id_type)
    width = 20

    def enc(col):
        if is_int:
            # zero-pad only orders correctly for non-negative ids
            # ('0…0-123' would break both ordering and the output cast)
            if pc.any(pc.less(col, 0)).as_py():
                raise ValueError("neardup_components requires non-negative "
                                 "integer ids")
            return pc.utf8_lpad(pc.cast(col, pa.string()), width, "0")
        return pc.cast(col, pa.string())

    def as_edges(b: pa.Table) -> pa.Table:
        return pa.table({"src": enc(b["id_a"]), "dst": enc(b["id_b"]),
                         "score": pa.nulls(b.num_rows, pa.float64())})

    def as_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": enc(b[id_col]),
                         "source_trust_rank": pa.nulls(b.num_rows, pa.int32())})

    edges = pairs.map_batches(as_edges, batch_format="pyarrow").materialize()
    nodes = ds.map_batches(as_nodes, batch_format="pyarrow")
    n_edges = edges.count()
    if n_edges == 0:
        labels = nodes.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow")
    elif n_edges <= 2_000_000:
        labels, _ = _propagate_local(edges, nodes,
                                        min_id_labels=True)
    else:
        labels, _ = propagate_labels(edges, nodes)

    def out(b: pa.Table) -> pa.Table:
        node = pc.cast(b["node"], id_type) if is_int else b["node"]
        label = pc.cast(b["label"], id_type) if is_int else b["label"]
        return pa.table({id_col: node, "cluster_id": label,
                         "is_canonical": pc.equal(node, label)})

    return labels.map_batches(out, batch_format="pyarrow")


def cross_corpus_filter(a_docs: Dataset, b_docs: Dataset,
                        threshold: float = 0.5, num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_bucket: int = 2000,
                        max_contaminated: int = 5_000_000) -> Dataset:
    """Cross-corpus near-dup decontamination: rows of ``a_docs`` (train)
    with NO MinHash-verified near-duplicate in ``b_docs`` (eval) —
    paraphrase-grain eval protection the n-gram decontaminator
    (`text.decontaminate`) misses. Ids must be unique across both
    corpora.

    Shape: each side's text-free band rows carry a side flag; ONE bucket
    groupby; the triu emission masks to CROSS-side pairs only (A–A and
    B–B pairs never materialize — same masking trick as
    ``minhash_lsh_incremental``'s ≥1-new-side rule), oriented
    (id_a = train, id_b = eval); exact shingle-Jaccard verify joins
    content once per surviving candidate; then A is filtered by a
    broadcast contaminated-id set (bounded by the verified-match count —
    above ``max_contaminated`` raise and anti-join via smart_join
    instead)."""
    from payor_linkage.rayutil import grouped_apply

    k = shingle_k

    def banded(ds: Dataset, flag: bool) -> Dataset:
        _cpus, rpb, pool_max = _pool_shape(ds)
        rows = ds.repartition(target_num_rows_per_block=rpb).map_batches(
            MinHasher, batch_format="pyarrow",
            fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                       shingle_k=k, text_col=text_col,
                                       id_col=id_col),
            concurrency=(1, pool_max), batch_size=None)
        return rows.map_batches(
            lambda b: b.append_column(
                "is_b", pa.array(np.full(b.num_rows, flag))),
            batch_format="pyarrow")

    sch = a_docs.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    pair_schema = pa.schema([("id_a", idt), ("id_b", idt)])

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        lens = ends - starts
        live = np.nonzero((lens >= 2) & (lens <= max_bucket))[0]
        if len(live) == 0:
            return pair_schema.empty_table()
        ids_arr = b["id"].combine_chunks()
        ids_np = ids_arr.to_numpy(zero_copy_only=False)
        flags = b["is_b"].to_numpy(zero_copy_only=False)
        tri_cache: dict = {}
        ai_parts, bi_parts = [], []
        for ri in live:
            s_, n = starts[ri], lens[ri]
            tri = tri_cache.get(n)
            if tri is None:
                tri = tri_cache[n] = np.triu_indices(n, k=1)
            order = np.argsort(ids_np[s_:s_ + n], kind="stable") + s_
            ai, bi = order[tri[0]], order[tri[1]]
            m = flags[ai] != flags[bi]
            ai, bi = ai[m], bi[m]
            swap = flags[ai]             # True → this side is eval: swap
            ai_parts.append(np.where(swap, bi, ai))
            bi_parts.append(np.where(swap, ai, bi))
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        return pa.table({
            "id_a": ids_arr.take(pa.array(ai)),
            "id_b": ids_arr.take(pa.array(bi)),
        }).cast(pair_schema)

    band_rows = banded(a_docs, False).union(banded(b_docs, True))
    cand = grouped_apply(band_rows, "bucket", runs_fn=emit_runs,
                         out_schema=pair_schema)
    deduped = (cand.groupby(["id_a", "id_b"]).count()
               .map_batches(lambda b: b.drop_columns(["count()"]),
                            batch_format="pyarrow")).materialize()
    if deduped.count() == 0:
        # empty grouped output loses its schema — and with zero cross
        # candidates nothing can be contaminated anyway
        return a_docs
    pairs = _content_verify(a_docs.union(b_docs), deduped,
                            lambda t: set(_shingles(t, k).tolist()),
                            threshold, text_col, id_col)

    bad = pairs.select_columns(["id_a"]).groupby("id_a").count()
    if bad.count() > max_contaminated:
        raise ValueError(
            "contaminated-id set exceeds the broadcast bound "
            f"{max_contaminated}; anti-join via smart_join instead")
    import ray
    bad_ref = ray.put(pa.concat_tables(
        ray.get(bad.materialize().to_arrow_refs()),
        promote_options="default")["id_a"].combine_chunks())

    def keep_clean(b: pa.Table) -> pa.Table:
        bad_ids = ray.get(bad_ref)
        if len(bad_ids) == 0:
            return b
        return b.filter(pc.invert(pc.is_in(b[id_col], value_set=bad_ids)))

    return a_docs.map_batches(keep_clean, batch_format="pyarrow")


def cluster_split(ds: Dataset, pairs: Dataset, id_col: str = "doc_id",
                  eval_hex: str = "33333333") -> Dataset:
    """Leakage-free train/eval split: every document in a near-dup
    cluster lands on the SAME side — the split key is the cluster's
    canonical id, not the document's, so eval can never contain a
    near-duplicate of a training doc (the contamination mode a
    doc-level hash split leaves open). Deterministic and rerun-stable:
    eval iff ``substr(md5(str(cluster_id)), 1, 8) < eval_hex``
    (``eval_hex='33333333'`` ≈ 20% of clusters).

    Shape: components reuse the tiered CC; the md5 runs once per
    DISTINCT cluster id per batch (dictionary-encode + remap), never
    per row. Output (id, cluster_id, split)."""
    comp = neardup_components(ds, pairs, id_col=id_col) \
        .drop_columns(["is_canonical"])
    sides = pa.array(["train", "eval"])

    def assign(b: pa.Table) -> pa.Table:
        d = pc.dictionary_encode(b["cluster_id"].combine_chunks())
        idx = d.indices.to_numpy(zero_copy_only=False)
        is_eval = np.fromiter(
            (hashlib.md5(str(u).encode()).hexdigest()[:8] < eval_hex
             for u in d.dictionary.to_pylist()),
            bool, len(d.dictionary))
        return b.append_column(
            "split", sides.take(pa.array(is_eval[idx].astype(np.int8))))

    return comp.map_batches(assign, batch_format="pyarrow")


# ── embedding cosine near-dup ──────────────────────────────────────────────


def embedding_neardup_pairs(ds: Dataset, threshold: float = 0.4,
                            id_col: str = "vec_id", vec_col: str = "embedding") -> Dataset:
    """Pairs with cosine ≥ threshold: per-batch f64 matmul against the
    broadcast (normalized) full matrix — the brute-force baseline; the
    LSH-bucketed scale path is `similarity.lsh_neardup_pairs`.
    Output: (id_a, id_b) ids only (no float column → exact oracle compare)."""
    import ray

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows])
    M = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    def batch_pairs(b: pa.Table) -> pa.Table:
        all_ids, allM = ray.get(ref)
        bid = np.array(b[id_col].to_pylist())
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col].to_pylist()])
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        cos = B @ allM.T
        ri, ci = np.nonzero(cos >= threshold)
        keep = bid[ri] < all_ids[ci]  # canonical a<b, kills self-pairs
        return pa.table({
            "id_a": pa.array(bid[ri][keep]),
            "id_b": pa.array(all_ids[ci][keep]),
        })

    return ds.map_batches(batch_pairs, batch_format="pyarrow")


_HASH_PRIME = np.uint64(0x100000001B3)  # FNV-64 prime


def _chunk_hash_matrix(win: np.ndarray) -> np.ndarray:
    """Content hash per row of a (n, k) uint8 byte matrix: fold the row
    as little-endian uint64 chunks, ``h = h * FNV_PRIME + chunk`` in
    wraparound uint64 — ceil(k/8) vector multiply-adds instead of k
    (and no (n, k) uint64 intermediate). Rows are zero-padded to the
    chunk width; the same function over the same bytes gives the same
    hash in every batch, which is all winnowing selection needs."""
    n, k = win.shape
    padk = -k % 8
    if padk:
        win = np.concatenate(
            [win, np.zeros((n, padk), dtype=np.uint8)], axis=1)
    chunks = np.ascontiguousarray(win).view(np.uint64)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(chunks.shape[1]):
        h = h * _HASH_PRIME + chunks[:, j]
    return h


def _chunk_hash_bytes(bs: bytes) -> int:
    """Python mirror of ``_chunk_hash_matrix`` for one byte string (the
    non-ASCII fallback path) — bit-identical for the same bytes so a
    gram shared between an ASCII and a non-ASCII batch selects
    consistently."""
    bs = bs + b"\x00" * (-len(bs) % 8)
    h = 0
    for j in range(0, len(bs), 8):
        h = (h * 0x100000001B3
             + int.from_bytes(bs[j:j + 8], "little")) & 0xFFFFFFFFFFFFFFFF
    return h


def substring_dup_pairs(ds: Dataset, k: int = 24, text_col: str = "text",
                        id_col: str = "doc_id",
                        max_bucket: int = 256,
                        winnow_w: int = 1) -> Dataset:
    """Pairs of documents sharing ANY exact k-character substring — the
    fixed-width form of suffix-array exact-substring dedup (the
    "deduplicating training data" signal): any repeated span of length
    ≥ k guarantees a shared k-window, so window-bucketing is complete
    at width k.

    ``winnow_w=1`` is the exact-complete mode: EVERY distinct
    (window, doc) rides the one grouped shuffle (window strings of k
    bytes — the honest cost of completeness). ``winnow_w=w > 1`` is the
    100 TB scale path — Schleimer-style winnowing: each document ships
    only the min-rolling-hash window of every w-neighborhood (expected
    ~2/(w+1) of its windows) with the HARD guarantee that any shared
    span of length ≥ k + w - 1 still shares a selected window; shorter
    overlaps may be missed (gated by the winnowing-guarantee pytest,
    not a SQL oracle). ASCII batches extract
    all windows with ONE numpy sliding-window view over the Arrow value
    buffer and rebuild the gram column from the windowed bytes with
    arithmetic offsets — no per-row Python; non-ASCII batches fall back
    to codepoint slicing. Pair emission reuses the bucket kernel
    (singleton runs skipped vectorized, triu indices cached by run
    length, two-column dedup after)."""
    from payor_linkage.rayutil import grouped_apply

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])

    def _winnow_mask(counts: np.ndarray, hashes: np.ndarray,
                     w: int) -> np.ndarray:
        """Boolean mask over the flat window array (docs concatenated,
        ``counts`` windows each): keep the argmin-hash window of every
        w-neighborhood. Doc boundaries are isolated by w-1 sentinel
        (max-uint64) pads so one vectorized sliding argmin serves the
        whole batch — a neighborhood that straddles the pad can only
        select real windows of the preceding doc (supersets of the
        per-doc guarantee, never misses)."""
        n_docs = len(counts)
        pad = w - 1
        padded_len = int(counts.sum()) + pad * n_docs
        padded = np.full(padded_len, np.uint64(0xFFFFFFFFFFFFFFFF))
        # position of each doc's windows inside the padded array
        doc_pad_start = np.concatenate(
            [[0], np.cumsum(counts[:-1] + pad)])
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        flat_pos = (np.repeat(doc_pad_start, counts)
                    + np.arange(int(counts.sum()), dtype=np.int64)
                    - np.repeat(cum, counts))
        padded[flat_pos] = hashes
        win_view = np.lib.stride_tricks.sliding_window_view(padded, w)
        sel_padded = np.unique(
            np.arange(len(win_view), dtype=np.int64)
            + win_view.argmin(axis=1))
        back = np.full(padded_len, -1, dtype=np.int64)
        back[flat_pos] = np.arange(len(flat_pos), dtype=np.int64)
        orig = back[sel_padded]
        mask = np.zeros(len(flat_pos), dtype=bool)
        mask[orig[orig >= 0]] = True
        return mask

    def grams(b: pa.Table) -> pa.Table:
        txt = b[text_col].combine_chunks()
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nchars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nbytes = pc.binary_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        counts = np.maximum(nchars - k + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "id": pa.array([], pa.int64())})
        parent = np.repeat(np.arange(b.num_rows, dtype=np.int64), counts)
        if (nchars == nbytes).all() and not pa.types.is_large_string(
                txt.type):  # large_string has int64 offsets — fallback
            off = np.frombuffer(txt.buffers()[1], dtype=np.int32,
                                count=len(txt) + 1,
                                offset=txt.offset * 4).astype(np.int64)
            data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)
            cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
            within = np.arange(total, dtype=np.int64) \
                - np.repeat(cum, counts)
            starts = off[:-1][parent] + within
            # one row-gather on a zero-copy sliding view — never a
            # (n_grams × k) index matrix (8× the window bytes in int64)
            win = np.lib.stride_tricks.sliding_window_view(
                data, k)[starts]
            if winnow_w > 1:
                hashes = _chunk_hash_matrix(win)
                keep = _winnow_mask(counts, hashes, winnow_w)
                win, parent = win[keep], parent[keep]
                total = len(parent)
            new_off = (np.arange(total + 1, dtype=np.int32) * k)
            gram_arr = pa.StringArray.from_buffers(
                total, pa.py_buffer(new_off.tobytes()),
                pa.py_buffer(win.tobytes()))
        else:
            texts = txt.to_pylist()
            gram_arr = pa.array(
                [t[w:w + k] for t, c in zip(texts, counts)
                 for w in range(int(c))], pa.string())
            if winnow_w > 1:
                hashes = np.array(
                    [_chunk_hash_bytes(g.as_py().encode())
                     for g in gram_arr], dtype=np.uint64)
                keep = _winnow_mask(counts, hashes, winnow_w)
                gram_arr = gram_arr.filter(pa.array(keep))
                parent = parent[keep]
        t = pa.table({"gram": gram_arr,
                      "id": pa.array(ids[parent], pa.int64())})
        return t.group_by(["gram", "id"]).aggregate([])

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        grams, batch_format="pyarrow")

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        lens = ends - starts
        live = np.nonzero((lens >= 2) & (lens <= max_bucket))[0]
        if len(live) == 0:
            return pair_schema.empty_table()
        ids_arr = b["id"].combine_chunks()
        ids_np = ids_arr.to_numpy(zero_copy_only=False)
        tri_cache: dict = {}
        ai_parts, bi_parts = [], []
        for ri in live:
            s_, n = starts[ri], lens[ri]
            tri = tri_cache.get(n)
            if tri is None:
                tri = tri_cache[n] = np.triu_indices(n, k=1)
            order = np.argsort(ids_np[s_:s_ + n], kind="stable") + s_
            ai_parts.append(order[tri[0]])
            bi_parts.append(order[tri[1]])
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        return pa.table({
            "id_a": ids_arr.take(pa.array(ai)),
            "id_b": ids_arr.take(pa.array(bi)),
        }).cast(pair_schema)

    pairs = grouped_apply(band_rows, "gram", runs_fn=emit_runs,
                          out_schema=pair_schema)
    return (pairs.groupby(["id_a", "id_b"]).count()
            .map_batches(lambda b: b.drop_columns(["count()"]),
                         batch_format="pyarrow"))


# ── edit-distance-≤1 similarity join (deletion neighborhoods) ──────────────


def _lev_le1(x: str, y: str):
    """Levenshtein distance if ≤ 1, else None — O(len) two-pointer, no
    DP table (the verifier only ever sees deletion-bucket candidates)."""
    if x == y:
        return 0
    lx, ly = len(x), len(y)
    if abs(lx - ly) > 1:
        return None
    if lx == ly:
        diff = sum(1 for a, b in zip(x, y) if a != b)
        return 1 if diff == 1 else None
    if lx > ly:
        x, y, lx, ly = y, x, ly, lx
    i = 0
    while i < lx and x[i] == y[i]:
        i += 1
    return 1 if x[i:] == y[i + 1:] else None


def edit_distance_join(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """EXACT-COMPLETE similarity self-join at edit distance ≤ 1 via
    deletion neighborhoods (the FastSS family): every string emits
    itself plus its len(s) single-deletion variants; two strings are
    within one edit iff they share a variant (u = v; del(u,i) = v;
    u = del(v,i); del(u,i) = del(v,i)), so bucketing by variant string
    is a complete blocking scheme — candidates are then verified with a
    real distance check (same-bucket different-position deletions can
    be distance 2). Returns distinct (id_a < id_b, lev).

    Scale shape: variant emission is map-only O(n·L) rows; ONE grouped
    shuffle on the variant string (bounded-width keys); per-bucket pair
    fan-out is the neighborhood's own size (alphabet-bounded for
    near-unique corpora); a final (id_a, id_b) aggregate dedups pairs
    found in several buckets. No n² anywhere — the SQL oracle IS the n²
    all-pairs levenshtein, which is the point of the comparison."""
    from ray.data.aggregate import Min

    from payor_linkage.rayutil import grouped_apply

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                             ("lev", pa.int64())])

    def variants(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        out_key, out_id, out_txt = [], [], []
        for i, t in zip(ids, texts):
            if t is None:
                continue
            out_key.append(t)
            out_id.append(i)
            out_txt.append(t)
            for p in range(len(t)):
                out_key.append(t[:p] + t[p + 1:])
                out_id.append(i)
                out_txt.append(t)
        return pa.table({"vkey": pa.array(out_key, pa.string()),
                         "vid": pa.array(out_id, pa.int64()),
                         "vtxt": pa.array(out_txt, pa.string())})

    vrows = ds.select_columns([id_col, text_col]).map_batches(
        variants, batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        vid = b["vid"].to_numpy(zero_copy_only=False)[lo:hi]
        txt = b["vtxt"].slice(lo, hi - lo).to_pylist()
        m = (ends - starts).astype(np.int64)
        sq = m * m
        total = int(sq.sum())
        if total == 0:
            return pair_schema.empty_table()
        cum = np.concatenate([[0], np.cumsum(sq)[:-1]])
        p = np.arange(total, dtype=np.int64) - np.repeat(cum, sq)
        mrep = np.repeat(m, sq)
        srep = np.repeat((starts - lo).astype(np.int64), sq)
        i = srep + p // mrep
        j = srep + p % mrep
        mask = (vid[i] < vid[j])
        i, j = i[mask], j[mask]
        # drop same-pair duplicates inside this bucket run before the
        # python verifier (identical variants repeat per position)
        seen = set()
        oa, ob, ol = [], [], []
        for ii, jj in zip(i, j):
            key = (vid[ii], vid[jj])
            if key in seen:
                continue
            seen.add(key)
            lev = _lev_le1(txt[ii], txt[jj])
            if lev is not None:
                oa.append(key[0])
                ob.append(key[1])
                ol.append(lev)
        return pa.table({"id_a": pa.array(oa, pa.int64()),
                         "id_b": pa.array(ob, pa.int64()),
                         "lev": pa.array(ol, pa.int64())})

    partials = grouped_apply(vrows, "vkey", out_schema=pair_schema,
                             runs_fn=runs)
    return partials.groupby(["id_a", "id_b"]).aggregate(
        Min("lev", alias_name="lev"))


# ── prefix-filtered exact token-Jaccard join (PPJoin family) ───────────────


def _word_ngrams(text: str, n: int) -> set:
    toks = (text or "").lower().split()
    if n == 1:
        return set(toks)
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def prefix_jaccard_pairs(ds: Dataset, threshold: float = 0.5,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         word_ngram: int = 1) -> Dataset:
    """EXACT-COMPLETE global token-Jaccard self-join via prefix
    filtering (the PPJoin family) — no blocking column, no n²: with
    every document's distinct whitespace tokens sorted by a GLOBAL
    rarity order (df asc, token asc), two documents with
    J ≥ t MUST share a token inside their first
    ``m - ceil(t·m) + 1`` tokens (if they shared none, the
    intersection would be < ceil(t·m) ≤ required). Only those prefix
    tokens are shuffled — the frequent tokens that would create
    quadratic buckets sort to the END of each document and stay home.

    Stages: one vocab-bounded df groupby, one df attach onto the token
    rows (broadcast below `lookup_join`'s bound, hash join above), one
    grouped prefix emission + one grouped candidate emission, then the
    shared `_content_verify` pass (content moves once per surviving
    candidate). Output (id_a, id_b, n_inter, n_union) integers."""
    import math

    from ray.data.aggregate import Count

    from payor_linkage.rayutil import grouped_apply, lookup_join

    sch = ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]

    def tok_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        out_id, out_tok = [], []
        for i, t in zip(ids, b[text_col].to_pylist()):
            for tok in sorted(_word_ngrams(t, word_ngram)):
                out_id.append(i)
                out_tok.append(tok)
        return pa.table({id_col: pa.array(out_id, idt),
                         "token": pa.array(out_tok, pa.string())})

    toks = ds.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow").materialize()
    df = toks.groupby("token").aggregate(Count(alias_name="df"))
    with_df = lookup_join(toks, df, on="token")

    prefix_schema = pa.schema([("token", pa.string()), ("id", idt)])

    def prefix_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        dfv = b["df"].to_numpy(zero_copy_only=False)[lo:hi]
        tok = b["token"].combine_chunks().slice(lo, hi - lo)
        # rarity rank (df asc, token asc) via dictionary codes so the
        # within-run sort never string-compares in Python
        enc = tok.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        drank = np.empty(len(enc.dictionary), dtype=np.int64)
        drank[pc.sort_indices(enc.dictionary)
              .to_numpy(zero_copy_only=False).astype(np.int64)] = \
            np.arange(len(enc.dictionary))
        order = np.lexsort((drank[codes], dfv, rid))
        m = (ends - starts).astype(np.int64)
        plen = m - np.ceil(threshold * m).astype(np.int64) + 1
        # first plen positions of each (sorted) run
        within = np.arange(hi - lo, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        keep = order[within < np.repeat(plen, m)]
        ids = b[id_col].slice(lo, hi - lo)
        return pa.table({"token": tok.take(pa.array(keep)),
                         "id": ids.take(pa.array(keep))})

    prefixes = grouped_apply(with_df, id_col, out_schema=prefix_schema,
                             runs_fn=prefix_runs)

    pair_schema = pa.schema([("id_a", idt), ("id_b", idt)])

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        lens = ends - starts
        live = np.nonzero(lens >= 2)[0]
        if len(live) == 0:
            return pair_schema.empty_table()
        ids_arr = b["id"].combine_chunks()
        ids_np = ids_arr.to_numpy(zero_copy_only=False)
        tri_cache: dict = {}
        ai_parts, bi_parts = [], []
        for ri in live:
            s_, n = starts[ri], lens[ri]
            tri = tri_cache.get(n)
            if tri is None:
                tri = tri_cache[n] = np.triu_indices(n, k=1)
            order = np.argsort(ids_np[s_:s_ + n], kind="stable") + s_
            ai_parts.append(order[tri[0]])
            bi_parts.append(order[tri[1]])
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        return pa.table({
            "id_a": ids_arr.take(pa.array(ai)),
            "id_b": ids_arr.take(pa.array(bi)),
        }).cast(pair_schema)

    pairs = grouped_apply(prefixes, "token", runs_fn=emit_runs,
                          out_schema=pair_schema)
    deduped = (pairs.groupby(["id_a", "id_b"]).count()
               .map_batches(lambda b: b.drop_columns(["count()"]),
                            batch_format="pyarrow"))
    return _content_verify(ds, deduped,
                           lambda t: _word_ngrams(t, word_ngram),
                           threshold, text_col, id_col)


# ── C4-style duplicate-chunk removal ───────────────────────────────────────

_CHUNK_PACK = 1_000_000  # packed = doc_id * PACK + chunk_no (chunk_no < PACK)


def _explode_chunk_rows(b: pa.Table, w: int, id_col: str,
                        text_col: str) -> pa.Table:
    """Vectorized chunk explosion: every ``w``-token chunk of every
    document as one (chunk, packed) row — tokens from ONE
    ``split_pattern`` kernel, chunk strings from ONE ``binary_join``
    over an offsets-rewindowed list view of the flattened tokens."""
    empty = pa.table({"chunk": pa.array([], pa.string()),
                      "packed": pa.array([], pa.int64())})
    if b.num_rows == 0:
        return empty
    txt = b[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern(txt, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(toks)
    nchunks = -(-lens // w)
    tot = int(nchunks.sum())
    if tot == 0:
        return empty
    tok_starts = np.concatenate([[0], np.cumsum(lens)])
    cum_nc = np.concatenate([[0], np.cumsum(nchunks)])
    i_of = np.repeat(np.arange(len(lens), dtype=np.int64), nchunks)
    j_of = np.arange(tot, dtype=np.int64) - cum_nc[i_of]
    starts = tok_starts[i_of] + j_of * w
    offsets = np.concatenate([starts, [tok_starts[-1]]])
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    chunk_str = pc.binary_join(la, " ")
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    assert (nchunks < _CHUNK_PACK).all() and \
        (np.abs(ids) < (1 << 62) // _CHUNK_PACK).all()
    packed = ids[i_of] * _CHUNK_PACK + j_of
    return pa.table({"chunk": chunk_str, "packed": pa.array(packed)})


def _rebuild_docs(chunks: pa.Array, packed: np.ndarray,
                  id_col: str) -> pa.Table:
    """(chunk, packed) rows → one (doc_id, text_clean) row per doc:
    sort by packed (= (doc, chunk_no) order), slice doc runs, ONE
    ``binary_join`` over the run-windowed chunk list."""
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("text_clean", pa.string())])
    if len(packed) == 0:
        return out_schema.empty_table()
    order = np.argsort(packed, kind="stable")
    p_sorted = packed[order]
    ch = chunks.take(pa.array(order))
    docs = p_sorted // _CHUNK_PACK
    run_starts = np.nonzero(
        np.concatenate([[True], docs[1:] != docs[:-1]]))[0]
    run_offsets = np.concatenate([run_starts, [len(docs)]])
    la = pa.ListArray.from_arrays(pa.array(run_offsets, pa.int32()), ch)
    return pa.table({id_col: pa.array(docs[run_starts]),
                     "text_clean": pc.binary_join(la, " ")})


def dedup_chunks(ds: Dataset, w: int = 8, id_col: str = "doc_id",
                 text_col: str = "text") -> Dataset:
    """C4-style repeated-span removal: split every document into
    consecutive ``w``-token chunks, keep only the globally FIRST
    occurrence of each distinct chunk (ordered by (doc_id, chunk_no)),
    and rebuild each document from its surviving chunks in order — the
    corpus-rewriting dedup used by C4/mC4-style training-data pipelines
    (the reference has no corpus ops; this is graft-side scope per the
    build brief). Documents whose every chunk first appeared elsewhere
    drop out of the output entirely.

    Output: (doc_id, text_clean), only docs with ≥1 surviving chunk.

    Scale shape: chunk explosion is one vectorized ``map_batches`` pass —
    tokens come from ONE ``split_pattern`` kernel and chunk strings from
    ONE ``binary_join`` over an offsets-rewindowed list view of the
    flattened tokens (zero-copy on the token values; no Python loop).
    First-occurrence election is a per-block partial min combine then a
    single ``groupby(chunk).min(packed)`` — the winner row IS the
    reconstruction input (chunk text is the group key), so there is no
    join-back shuffle at all. Rebuild is one ``grouped_apply`` over
    doc_id with a cross-group vectorized runs_fn. Requires
    doc_id < 2^63 / PACK and < PACK chunks per document (asserted)."""
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("text_clean", pa.string())])

    def explode(b: pa.Table) -> pa.Table:
        t = _explode_chunk_rows(b, w, id_col, text_col)
        # per-block partial first-occurrence combine: the grouped
        # exchange then moves one row per distinct chunk per block
        return (t.group_by("chunk").aggregate([("packed", "min")])
                .rename_columns(["chunk", "packed"]))

    kept = (ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pyarrow")
            .groupby("chunk").aggregate(Min("packed", alias_name="packed")))

    def decode(b: pa.Table) -> pa.Table:
        p = b["packed"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(p // _CHUNK_PACK),
                         "packed": b["packed"], "chunk": b["chunk"]})

    dec = kept.map_batches(decode, batch_format="pyarrow")

    def rebuild(block: pa.Table, starts: np.ndarray,
                ends: np.ndarray) -> pa.Table:
        if len(starts) == 0:
            return out_schema.empty_table()
        lens_ = ends - starts
        base = np.concatenate([[0], np.cumsum(lens_)[:-1]])
        idx = np.repeat(starts, lens_) + \
            (np.arange(int(lens_.sum()), dtype=np.int64)
             - np.repeat(base, lens_))
        p = block["packed"].to_numpy(zero_copy_only=False)[idx]
        ch = block["chunk"].combine_chunks() \
            if isinstance(block["chunk"], pa.ChunkedArray) \
            else block["chunk"]
        return _rebuild_docs(ch.take(pa.array(idx)), p, id_col)

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(dec, id_col, runs_fn=rebuild,
                         out_schema=out_schema)


def chunk_state_build(docs: Dataset, state_dir: str, w: int = 8,
                      id_col: str = "doc_id", text_col: str = "text",
                      n_buckets: int = 64) -> None:
    """Seed the persisted chunk-hash state for
    ``dedup_chunks_incremental`` from an existing corpus: the DISTINCT
    set of chunk md5s (one grouped shuffle — same cost as one
    ``dedup_chunks`` election), written bucketed by crc32(h) so later
    deltas read only their touched buckets."""
    import ray.data as rd

    from payor_linkage import storage

    def to_hashes(b: pa.Table) -> pa.Table:
        t = _explode_chunk_rows(b, w, id_col, text_col)
        h = _content_md5(t["chunk"])
        return (pa.table({"h": h}).group_by("h").aggregate([])
                if t.num_rows else pa.table({"h": pa.array([], pa.string())}))

    distinct = (docs.select_columns([id_col, text_col])
                .map_batches(to_hashes, batch_format="pyarrow")
                .groupby("h").count()
                .map_batches(lambda b: b.select(["h"]),
                             batch_format="pyarrow"))
    storage.append_bucketed(distinct, state_dir, "h", n_buckets)


def dedup_chunks_incremental(new_docs: Dataset, state_dir: str, w: int = 8,
                             id_col: str = "doc_id", text_col: str = "text",
                             n_buckets: int = 64):
    """Incremental C4-style chunk dedup against persisted chunk-hash
    state — the O(delta) maintenance form of ``dedup_chunks``: a new
    landing drop is span-cleaned against a 100 TB corpus WITHOUT
    touching the corpus. A delta chunk survives iff its md5 is absent
    from the state AND it is the first occurrence within the delta
    (by (doc_id, chunk position)); each delta doc is rebuilt from its
    surviving chunks, and the surviving hashes are APPENDED to the
    state (``storage.append_bucketed`` — O(delta) new part files,
    existing files untouched, crash-idempotent).

    The state stores the corpus's DISTINCT chunk set, which equals its
    first-occurrence set — so chaining deltas is byte-equivalent to one
    full ``dedup_chunks`` run under arrival order (prior corpus first,
    then deltas in order); two-generation parity is pytest-gated.

    I/O shape: the delta's chunk hashes pick their buckets
    arithmetically (crc32 % n_buckets); ONLY those bucket files are
    read. Delta processing runs on the driver tier over collected
    Arrow blocks (the incremental-family precedent: a delta-bounded
    input pays more in Ray stage barriers than in work).

    Returns ``(cleaned, buckets)``: (doc_id, text_clean) rows for delta
    docs with ≥1 surviving chunk, and the touched bucket ids."""
    import os
    import zlib

    import ray
    import ray.data as rd

    from payor_linkage import storage

    parts = [t for t in ray.get(
        new_docs.select_columns([id_col, text_col])
        .map_batches(lambda b: _explode_chunk_rows(b, w, id_col, text_col),
                     batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "text_clean": pa.array([], pa.string())})
    if not parts:
        return rd.from_arrow(empty), []
    dtbl = pa.concat_tables(parts, promote_options="default") \
        .combine_chunks()
    h = _content_md5(dtbl["chunk"])
    dtbl = dtbl.append_column("h", h)

    buckets = sorted({zlib.crc32(x.encode()) % n_buckets
                      for x in set(h.to_pylist())})
    dirs = [d for d in (os.path.join(state_dir, f"_bucket={b}")
                        for b in buckets) if os.path.isdir(d)]
    if dirs:
        prior = rd.read_parquet(dirs, columns=["h"],
                                file_extensions=["parquet"])
        ptbl = pa.concat_tables(
            [t for t in ray.get(prior.materialize().to_arrow_refs())
             if t.num_rows], promote_options="default")
        prior_h = ptbl["h"].combine_chunks() if ptbl.num_rows \
            else pa.array([], pa.string())
    else:
        prior_h = pa.array([], pa.string())

    fresh = dtbl.filter(pc.invert(pc.is_in(dtbl["h"], value_set=prior_h)))
    # first occurrence within the delta: min packed per chunk hash
    fresh = fresh.sort_by([("h", "ascending"), ("packed", "ascending")]) \
        .combine_chunks()
    if fresh.num_rows:
        ha = fresh["h"].to_numpy(zero_copy_only=False)
        firsts = np.nonzero(
            np.concatenate([[True], ha[1:] != ha[:-1]]))[0]
        kept = fresh.take(pa.array(firsts))
    else:
        kept = fresh
    cleaned = _rebuild_docs(
        kept["chunk"].combine_chunks(),
        kept["packed"].to_numpy(zero_copy_only=False), id_col)
    if kept.num_rows:
        storage.append_bucketed(rd.from_arrow(kept.select(["h"])),
                                state_dir, "h", n_buckets)
    return rd.from_arrow(cleaned), buckets


def containment_pairs(ds: Dataset, threshold: float = 0.6,
                      text_col: str = "text", id_col: str = "doc_id",
                      word_ngram: int = 2) -> Dataset:
    """EXACT-COMPLETE asymmetric set-containment self-join (the
    "document inside a larger document" dedup the symmetric Jaccard
    joins miss): ordered pairs where C(A,B) = |A∩B| / |A| ≥ t, emitted
    as integer (id_a, id_b, n_inter, n_a, n_b) with id_a the CONTAINED
    side — the unrounded ratio belongs downstream, so the DuckDB
    oracle (token self-join + group counts) is exact.

    Candidate generation is one-sided prefix filtering: with every
    document's distinct word-n-grams in a GLOBAL rarity order (df asc,
    token asc), a contained document shares ≥ ceil(t·|A|) tokens with
    its container, so at least one of its first ``|A| − ceil(t·|A|) + 1``
    (prefix) tokens must appear in the container's FULL token set.
    Prefix rows join the full inverted index on the token — the
    contained side ships only prefixes (frequent tokens sort to the
    end and stay home); the container side is a linear inverted index
    (at 100 TB, cap the hottest postings with park accounting as in
    ``blocking.py`` — capped tokens are never a document's rarest, so
    recall loss is confined to stopword-only documents).

    Stages: one vocab-bounded df groupby, one df attach
    (``lookup_join``), one grouped prefix emission, one grouped
    (prefix × index) candidate emission, pair dedup, then the shared
    content-attach pass with an exact containment verify."""
    import math

    from ray.data.aggregate import Count

    from payor_linkage.rayutil import grouped_apply, lookup_join

    sch = ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]

    def tok_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        out_id, out_tok = [], []
        for i, t in zip(ids, b[text_col].to_pylist()):
            for tok in sorted(_word_ngrams(t, word_ngram)):
                out_id.append(i)
                out_tok.append(tok)
        return pa.table({id_col: pa.array(out_id, idt),
                         "token": pa.array(out_tok, pa.string())})

    toks = ds.select_columns([id_col, text_col]).map_batches(
        tok_rows, batch_format="pyarrow").materialize()
    df = toks.groupby("token").aggregate(Count(alias_name="df"))
    with_df = lookup_join(toks, df, on="token")

    tagged_schema = pa.schema([("token", pa.string()), ("id", idt),
                               ("is_prefix", pa.bool_())])

    def prefix_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        dfv = b["df"].to_numpy(zero_copy_only=False)[lo:hi]
        tok = b["token"].combine_chunks().slice(lo, hi - lo)
        enc = tok.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        drank = np.empty(len(enc.dictionary), dtype=np.int64)
        drank[pc.sort_indices(enc.dictionary)
              .to_numpy(zero_copy_only=False).astype(np.int64)] = \
            np.arange(len(enc.dictionary))
        order = np.lexsort((drank[codes], dfv, rid))
        m = (ends - starts).astype(np.int64)
        plen = m - np.ceil(threshold * m).astype(np.int64) + 1
        within = np.arange(hi - lo, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        is_prefix = np.empty(hi - lo, dtype=bool)
        is_prefix[order] = within < np.repeat(plen, m)
        ids = b[id_col].slice(lo, hi - lo)
        return pa.table({"token": tok, "id": ids,
                         "is_prefix": pa.array(is_prefix)}) \
            .cast(tagged_schema)

    tagged = grouped_apply(with_df, id_col, out_schema=tagged_schema,
                           runs_fn=prefix_runs)

    pair_schema = pa.schema([("id_a", idt), ("id_b", idt)])

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        """Per token: ordered (prefix-id → any-other-id) candidates —
        the contained side must hold the token in its prefix, the
        container side merely holds it."""
        lens = ends - starts
        live = np.nonzero(lens >= 2)[0]
        if len(live) == 0:
            return pair_schema.empty_table()
        ids_arr = b["id"].combine_chunks()
        pref = b["is_prefix"].to_numpy(zero_copy_only=False)
        ai_parts, bi_parts = [], []
        for ri in live:
            s_, e_ = int(starts[ri]), int(ends[ri])
            idx = np.arange(s_, e_, dtype=np.int64)
            p_idx = idx[pref[s_:e_]]
            if len(p_idx) == 0:
                continue
            ai = np.repeat(p_idx, len(idx))
            bi = np.tile(idx, len(p_idx))
            keep = ai != bi
            ai_parts.append(ai[keep])
            bi_parts.append(bi[keep])
        if not ai_parts:
            return pair_schema.empty_table()
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        return pa.table({
            "id_a": ids_arr.take(pa.array(ai)),
            "id_b": ids_arr.take(pa.array(bi)),
        }).cast(pair_schema)

    pairs = grouped_apply(tagged, "token", runs_fn=emit_runs,
                          out_schema=pair_schema)
    deduped = (pairs.groupby(["id_a", "id_b"]).count()
               .map_batches(lambda b: b.drop_columns(["count()"]),
                            batch_format="pyarrow"))

    enriched = _attach_pair_content(ds, deduped, text_col, id_col)

    def verify(b: pa.Table) -> pa.Table:
        inter, na, nb = [], [], []
        for ta, tb in zip(b["text_a"].to_pylist(),
                          b["text_b"].to_pylist()):
            sa = _word_ngrams(ta, word_ngram)
            sb = _word_ngrams(tb, word_ngram)
            inter.append(len(sa & sb))
            na.append(len(sa))
            nb.append(len(sb))
        out = pa.table({"id_a": b["id_a"], "id_b": b["id_b"],
                        "n_inter": pa.array(inter, pa.int64()),
                        "n_a": pa.array(na, pa.int64()),
                        "n_b": pa.array(nb, pa.int64())})
        keep = [a > 0 and i / a >= threshold
                for i, a in zip(inter, na)]
        return out.filter(pa.array(keep, pa.bool_()))

    return enriched.map_batches(verify, batch_format="pyarrow")


# ── content-defined chunking (storage dedup) ──────────────────────────────


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry gear table (md5 of the byte value —
    process-randomization-free per the repo hashing rule)."""
    import hashlib

    return np.array([int.from_bytes(hashlib.md5(bytes([i])).digest()[:4],
                                    "little")
                     for i in range(256)], dtype=np.uint64)


_GEAR = _gear_table()
_CDC_WINDOW = 32


def _cdc_cut_mask(data: np.ndarray, mask: int) -> np.ndarray:
    """Vectorized gear rolling hash: h_i = Σ_{k<32} gear[b_{i−k}]·2^k
    (mod 2^32) — the classic sequential recurrence h = 2h + gear[b]
    unrolled into 32 shifted adds (uint64 wraparound preserves
    mod 2^32). Returns the boolean cut-after-position-i mask."""
    n = len(data)
    g = _GEAR[data]
    h = np.zeros(n, dtype=np.uint64)
    for k in range(_CDC_WINDOW):
        if k >= n:
            break
        h[k:] += g[:n - k] << np.uint64(k)
    return (h & np.uint64(0xFFFFFFFF) & np.uint64(mask)) == 0


def cdc_chunk_table(ds: Dataset, payload_col: str = "payload",
                    id_col: str = "media_id",
                    mask_bits: int = 8) -> Dataset:
    """Content-defined chunking of a binary payload column (the
    FastCDC/gear storage-dedup primitive): each blob splits where a
    32-byte rolling gear hash has its low ``mask_bits`` bits zero
    (expected chunk ≈ 2^mask_bits bytes), so an insertion near the
    front re-chunks only a window around the edit — downstream chunk
    hashes stay aligned and dedupe (the shift-resistance fixed-size
    chunking lacks; pytest-gated). No min/max clamps: the cut rule is
    pure arithmetic, deterministic on any engine.

    Output: (id, chunk_no, offset, length, crc) — integer rows; the
    global dedup step is any exact-dedup over ``crc`` (chunk store).
    Per-batch work is fully vectorized on the byte buffer except the
    bounded per-chunk crc loop (≈ len/2^mask_bits iterations).
    Rows-only at the driver gate (a rolling hash is not
    SQL-expressible); exactness is pytest-gated against a pure-Python
    byte-at-a-time reference."""
    import zlib

    sch = ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    out_schema = pa.schema([(id_col, idt), ("chunk_no", pa.int64()),
                            ("offset", pa.int64()), ("length", pa.int64()),
                            ("crc", pa.int64())])
    mask = (1 << mask_bits) - 1

    def chunks(b: pa.Table) -> pa.Table:
        ids, cno, off, ln, crc = [], [], [], [], []
        for i, payload in zip(b[id_col].to_pylist(),
                              b[payload_col].to_pylist()):
            if payload is None:
                continue
            data = np.frombuffer(payload, dtype=np.uint8)
            if len(data) == 0:
                continue
            cuts = np.nonzero(_cdc_cut_mask(data, mask))[0] + 1
            bounds = np.concatenate([[0], cuts[cuts < len(data)],
                                     [len(data)]])
            for j in range(len(bounds) - 1):
                s, e = int(bounds[j]), int(bounds[j + 1])
                ids.append(i)
                cno.append(j)
                off.append(s)
                ln.append(e - s)
                crc.append(zlib.crc32(payload[s:e]))
        return pa.table({id_col: pa.array(ids, idt),
                         "chunk_no": pa.array(cno, pa.int64()),
                         "offset": pa.array(off, pa.int64()),
                         "length": pa.array(ln, pa.int64()),
                         "crc": pa.array(crc, pa.int64())}).cast(out_schema)

    return ds.select_columns([id_col, payload_col]).map_batches(
        chunks, batch_format="pyarrow")


def snm_pairs(ds: Dataset, key_cols: list[str], window: int = 6,
              id_col: str = "doc_id") -> Dataset:
    """Sorted-neighborhood blocking (Hernandez & Stolfo's SNM): order
    the corpus by ``key_cols`` (ties broken by ``id_col`` for a total
    order) and emit every canonical pair of records at rank distance
    < ``window`` — the classic ER candidate generator whose pair volume
    is exactly ``(window-1) * n - (window-1)*window/2`` regardless of
    key skew (the property that motivates it over equi-key blocking:
    no hot-block quadratic blowup, at the cost of missing pairs the
    sort separates).

    Scale shape: ONE global sort, then per-block row counts (one int
    each) to the driver — the same distributed ROW_NUMBER construction
    as ``reshape.global_ntile`` — and pair emission is per-block
    integer arithmetic: each block pairs its own rows against rows at
    distance < window, borrowing only the next ``window-1`` rows from
    the following block(s) (tiny head slices fetched by ref; a block
    never ships its body twice). Each pair is emitted exactly once, by
    the block owning its lower-ranked row, so no DISTINCT pass runs."""
    import ray
    import ray.data as rd

    proj = list(dict.fromkeys(key_cols + [id_col]))
    # schema via the materialized sort (a lambda-filtered upstream has
    # no schema until executed)
    sds = (ds.select_columns(proj)
           .sort(key_cols + [id_col]).materialize())
    sch = sds.schema()
    idt = (dict(zip(sch.names, sch.types))[id_col]
           if sch is not None and id_col in sch.names else pa.int64())
    out_schema = pa.schema([("id_a", idt), ("id_b", idt),
                            ("rank_gap", pa.int64())])
    refs = sds.to_arrow_refs()
    if window < 2 or not refs:
        return rd.from_arrow(out_schema.empty_table())

    @ray.remote
    def _count(tbl: pa.Table) -> int:
        return tbl.num_rows

    @ray.remote
    def _head(tbl: pa.Table, n: int) -> pa.Table:
        return tbl.slice(0, n)

    counts = ray.get([_count.remote(r) for r in refs])

    @ray.remote
    def _emit(own: pa.Table, *heads: pa.Table) -> pa.Table:
        m = own.num_rows
        if m == 0:
            return out_schema.empty_table()
        tbl = pa.concat_tables([own, *heads]) if heads else own
        total = tbl.num_rows
        ids = tbl[id_col].combine_chunks()
        lo, hi, gap = [], [], []
        for d in range(1, window):
            k = min(m, total - d)
            if k <= 0:
                break
            lo.append(np.arange(k, dtype=np.int64))
            hi.append(np.arange(d, d + k, dtype=np.int64))
            gap.append(np.full(k, d, dtype=np.int64))
        if not lo:
            return out_schema.empty_table()
        li = pa.array(np.concatenate(lo))
        hj = pa.array(np.concatenate(hi))
        a, b = ids.take(li), ids.take(hj)
        swap = pc.greater(a, b)
        return pa.table({
            "id_a": pc.if_else(swap, b, a),
            "id_b": pc.if_else(swap, a, b),
            "rank_gap": pa.array(np.concatenate(gap)),
        }).cast(out_schema)

    tasks = []
    need_total = window - 1
    for i, ref in enumerate(refs):
        heads, need, j = [], need_total, i + 1
        while need > 0 and j < len(refs):
            take = min(need, counts[j])
            if take > 0:
                heads.append(_head.remote(refs[j], take))
                need -= take
            j += 1
        tasks.append(_emit.remote(ref, *heads))
    return rd.from_arrow_refs(tasks)


def meta_blocking_pairs(blocks: Dataset, id_col: str = "doc_id",
                        key_col: str = "tok", min_common: int = 2,
                        min_block: int = 2,
                        max_block: int = 32) -> Dataset:
    """Meta-blocking with the common-blocks (CBS) weighting scheme
    (Papadakis et al.): from a long (record, blocking-key) table, keep
    only blocks with ``min_block..max_block`` members (block purging),
    emit each block's canonical pairs, weight every pair by HOW MANY
    kept blocks it co-occurs in, and prune pairs below ``min_common``
    — turning a redundancy-positive key scheme (token / n-gram
    blocking) into a precision-filtered candidate set.

    Scale shape: block purging happens INSIDE the per-key group
    function (the group sees its own size — no df join, no broadcast),
    so the pair exchange is bounded by max_block × (kept block rows);
    the weight count is one pair-keyed groupby whose input is that
    bounded emission. No record content is shuffled — ids only."""
    from payor_linkage.rayutil import grouped_apply

    sch = blocks.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]
    pair_schema = pa.schema([("pair", pa.string()), ("id_a", idt),
                             ("id_b", idt)])

    def emit(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < max(2, min_block) or n > max_block:
            return pair_schema.empty_table()
        ids = pc.unique(g[id_col].combine_chunks()).sort()
        n = len(ids)
        if n < max(2, min_block):
            return pair_schema.empty_table()
        iu, ju = np.triu_indices(n, k=1)
        a, b = ids.take(pa.array(iu)), ids.take(pa.array(ju))
        key = pc.binary_join_element_wise(
            pc.cast(a, pa.string()), pc.cast(b, pa.string()), "|")
        return pa.table({"pair": key, "id_a": a, "id_b": b})

    pairs = grouped_apply(blocks, key_col, group_fn=emit,
                          out_schema=pair_schema)
    weighted = pairs.groupby("pair").aggregate(
        Min("id_a", alias_name="id_a"), Min("id_b", alias_name="id_b"),
        Count(alias_name="n_common"))

    def prune(b: pa.Table) -> pa.Table:
        kept = b.filter(pc.greater_equal(b["n_common"], min_common))
        return kept.drop_columns(["pair"])

    return weighted.map_batches(prune, batch_format="pyarrow")

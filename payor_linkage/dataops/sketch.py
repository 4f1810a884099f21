"""Distributed cardinality sketches: HyperLogLog per key.

The register table (key, bucket, max_rho) is the *oracle-checkable*
surface — pure integers, derived from a 32-bit md5-prefix hash that a
DuckDB oracle reproduces exactly with
``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::BIGINT`` plus
``length(bin(...))`` for the bit-length, so the distributed register
merge (the Ray-specific part) is gated byte-exact. The float estimate
itself is pytest-gated against exact distinct counts (error bound),
never oracle-hashed.

Scale shape: per-batch partial register maxima (a combiner — at most
|keys|·2^p rows leave each batch) → one grouped Max. The shuffle moves
registers, never values. Estimation reads the bounded register table
(≤ |keys|·2^p rows) on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

HLL_P = 10  # 2^10 = 1024 registers per key


def _hash32(values: list) -> np.ndarray:
    """32-bit hash: first 8 hex digits of md5(str(v)) — matches the SQL
    oracle's ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 8))::BIGINT."""
    return np.array(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) for v in values],
        dtype=np.int64)


def hll_registers(ds: Dataset, key: str, value_col: str,
                  p: int = HLL_P) -> Dataset:
    """Per-key HLL register table: (key, bucket, max_rho), all int64.

    bucket = top p bits of the 32-bit hash; rho = 1 + number of leading
    zeros in the remaining (32-p) bits (i.e. (32-p) - bit_length(rem) + 1,
    with rem = 0 → 32-p+1)."""
    from ray.data.aggregate import Max

    w = 32 - p
    mask = (1 << w) - 1

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key: b[key], "bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = _hash32(b[value_col].to_pylist())
        bucket = h >> w
        rem = h & mask
        # bit_length via log2-free integer path: count of bits = position
        # of highest set bit + 1; vectorized with a float log2 would be
        # inexact near powers of two — use the exact uint bit trick.
        rho = np.full(len(rem), w + 1, dtype=np.int64)
        nz = rem > 0
        # np.log2 on exact integers < 2^22 is exact for the floor after
        # float64 conversion EXCEPT at values just below a power of two;
        # use frexp which is exact for integers in float64 range.
        _, exp = np.frexp(rem[nz].astype(np.float64))
        rho[nz] = w - exp + 1
        t = pa.table({key: b[key],
                      "bucket": pa.array(bucket, pa.int64()),
                      "rho": pa.array(rho, pa.int64())})
        # pyarrow group_by emits [keys..., rho_max]
        return (t.group_by([key, "bucket"]).aggregate([("rho", "max")])
                .rename_columns([key, "bucket", "rho"]))

    return (ds.select_columns([key, value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby([key, "bucket"]).aggregate(Max("rho", alias_name="max_rho")))


def hll_estimate(registers: Dataset, p: int = HLL_P) -> "pa.Table":
    """Cardinality estimate per key from a register table — standard HLL
    harmonic mean with the small-range linear-counting correction.
    Driver-side on a BOUNDED input (≤ |keys|·2^p rows by construction)."""
    m = 1 << p
    t = pa.Table.from_pylist(registers.take_all())
    keys = t.column(0).to_pylist()
    buckets = t["bucket"].to_numpy(zero_copy_only=False)
    rhos = t["max_rho"].to_numpy(zero_copy_only=False)
    key_col_name = t.schema.names[0]

    alpha = 0.7213 / (1 + 1.079 / m)
    out_keys, out_est = [], []
    for k in sorted(set(keys)):
        sel = np.array([kk == k for kk in keys])
        regs = np.zeros(m, dtype=np.int64)
        regs[buckets[sel]] = rhos[sel]
        e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        out_keys.append(k)
        out_est.append(float(e))
    return pa.table({key_col_name: out_keys,
                     "est_distinct": pa.array(out_est, pa.float64())})


# ── Count-Min Sketch (frequency estimation) ────────────────────────────────

def cms_registers(ds: Dataset, value_col: str, depth: int = 4,
                  width: int = 256) -> Dataset:
    """Count-Min Sketch register table: (depth, bucket, n), all int64 —
    the oracle-checkable surface (pure integer counts from the same
    salted md5-prefix hash a DuckDB oracle reproduces with
    ``('0x' || substr(md5(d || ':' || v), 1, 8))::BIGINT % width``).

    Scale shape: per-batch partial bucket counts (a combiner — at most
    depth·width rows leave each batch) → one grouped Sum over the fixed
    depth·width register space. The shuffle moves registers, never
    values."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"depth": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vals = [str(v) for v in b[value_col].to_pylist()]
        dcol = np.repeat(np.arange(depth, dtype=np.int64), len(vals))
        buckets = np.concatenate([
            np.array([int(hashlib.md5(f"{d}:{v}".encode())
                          .hexdigest()[:8], 16) % width for v in vals],
                     dtype=np.int64)
            for d in range(depth)])
        t = pa.table({"depth": pa.array(dcol), "bucket": pa.array(buckets),
                      "n": pa.array(np.ones(len(dcol), dtype=np.int64))})
        return (t.group_by(["depth", "bucket"]).aggregate([("n", "sum")])
                .rename_columns(["depth", "bucket", "n"]))

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["depth", "bucket"]).aggregate(Sum("n", alias_name="n")))


def cms_estimate(registers: Dataset, item, depth: int = 4,
                 width: int = 256) -> int:
    """Point frequency estimate: min over rows the item hashes to.
    One-sided error (never under-counts). Reads at most ``depth`` rows
    of the bounded register table on the driver."""
    import pyarrow.compute as pc

    want = {(d, int(hashlib.md5(f"{d}:{item}".encode())
                    .hexdigest()[:8], 16) % width) for d in range(depth)}

    def pick(b: pa.Table) -> pa.Table:
        dd = b["depth"].to_numpy(zero_copy_only=False)
        bb = b["bucket"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(((d, w) in want for d, w in zip(dd, bb)),
                           bool, len(dd))
        return b.filter(pa.array(mask))

    rows = registers.map_batches(pick, batch_format="pyarrow").take_all()
    if len(rows) < depth:
        return 0  # some row of the sketch never saw the item
    return min(int(r["n"]) for r in rows)


# ── Bloom filter (membership) ──────────────────────────────────────────────

def bloom_bits(ds: Dataset, value_col: str, n_hashes: int = 3,
               m_bits: int = 4096) -> Dataset:
    """Bloom filter as a distributed bit-set table: the DISTINCT
    (hash_index, bit) pairs set by any value — the integer surface a
    DuckDB oracle reproduces exactly (salted md5 bucket hash, DISTINCT).

    Scale shape: per-batch distinct bits (a combiner — at most
    n_hashes·m_bits rows leave each batch) → one grouped distinct over
    the fixed bit space. The shuffle moves bit coordinates, never
    values."""
    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"hash_i": pa.array([], pa.int64()),
                             "bit": pa.array([], pa.int64())})
        vals = [str(v) for v in b[value_col].to_pylist()]
        hcol = np.repeat(np.arange(n_hashes, dtype=np.int64), len(vals))
        bits = np.concatenate([
            np.array([int(hashlib.md5(f"{h}:{v}".encode())
                          .hexdigest()[:8], 16) % m_bits for v in vals],
                     dtype=np.int64)
            for h in range(n_hashes)])
        t = pa.table({"hash_i": pa.array(hcol), "bit": pa.array(bits)})
        return t.group_by(["hash_i", "bit"]).aggregate([])

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["hash_i", "bit"]).count()
            .drop_columns(["count()"]))


def bloom_contains(bits: Dataset, item, n_hashes: int = 3,
                   m_bits: int = 4096) -> bool:
    """Membership probe: True iff every (hash, bit) the item maps to is
    set. No false negatives; false-positive rate bounded by the standard
    (1 - e^{-kn/m})^k. Reads at most ``n_hashes`` rows on the driver."""
    import pyarrow.compute as pc

    want = {(h, int(hashlib.md5(f"{h}:{item}".encode())
                    .hexdigest()[:8], 16) % m_bits)
            for h in range(n_hashes)}

    def pick(b: pa.Table) -> pa.Table:
        hh = b["hash_i"].to_numpy(zero_copy_only=False)
        bb = b["bit"].to_numpy(zero_copy_only=False)
        mask = np.fromiter(((h, w) in want for h, w in zip(hh, bb)),
                           bool, len(hh))
        return b.filter(pa.array(mask))

    found = bits.map_batches(pick, batch_format="pyarrow").count()
    return found == n_hashes


def bloom_semi_join(big: Dataset, small: Dataset, key: str,
                    n_hashes: int = 3, m_bits: int = 1 << 14) -> Dataset:
    """Semi-join (rows of ``big`` whose ``key`` appears in ``small``)
    via a broadcast Bloom prefilter + exact verify — the scale path when
    the build side's distinct-key set is too large to broadcast exactly
    (`q_semi_join`'s set / `rayutil.lookup_join`'s 5M bound) but
    ``m_bits`` of filter still fits in every worker. Bloom has NO false
    negatives, so prefilter → exact join returns exactly the semi-join;
    false positives only cost verify work on survivors (rate
    ≈ (1 − e^{−kn/m})^k).

    Shape: ``bloom_bits`` partials (bounded ≤ n_hashes·m_bits rows) →
    packed bool matrix broadcast once via ray.put → one map pass drops
    ``big`` rows missing any bit → the already-cut survivors join the
    build side's distinct keys (smart_join) for exactness — the shuffle
    moves only the Bloom-surviving slice, never the full probe side."""
    import pyarrow.compute as pc
    import ray

    from payor_linkage import rayutil

    bt = pa.concat_tables(
        ray.get(bloom_bits(small, key, n_hashes=n_hashes, m_bits=m_bits)
                .materialize().to_arrow_refs()),
        promote_options="default")
    M = np.zeros((n_hashes, m_bits), dtype=bool)
    M[bt["hash_i"].to_numpy(zero_copy_only=False),
      bt["bit"].to_numpy(zero_copy_only=False)] = True
    bref = ray.put(M)

    def prefilter(b: pa.Table) -> pa.Table:
        Mm = ray.get(bref)
        vals = [str(v) for v in b[key].to_pylist()]
        ok = np.ones(len(vals), dtype=bool)
        for h in range(n_hashes):
            if not ok.any():
                break
            idx = np.array([int(hashlib.md5(f"{h}:{v}".encode())
                                .hexdigest()[:8], 16) % m_bits
                            for v in vals], dtype=np.int64)
            ok &= Mm[h][idx]
        return b.filter(pa.array(ok))

    survivors = big.map_batches(prefilter, batch_format="pyarrow")
    keys = (small.select_columns([key]).groupby(key).count()
            .map_batches(lambda t: t.select([key]), batch_format="pyarrow"))
    return rayutil.smart_join(survivors, keys, on=key)


def histogram_quantile(ds, value_col: str, divisor: float,
                       qs: list[float]) -> dict[float, float]:
    """Approximate quantiles from the fixed-width histogram sketch —
    the mergeable, one-pass, bounded-state alternative to an exact
    distributed sort when ±divisor error is acceptable (the 100 TB
    shape: the exchange moves (bin, count) partials, never values).

    Returns the LEFT EDGE of the bin containing each requested quantile
    (error ≤ divisor by construction, gated by pytest, not a SQL
    oracle). Driver reads only the bounded histogram."""
    import numpy as np

    from payor_linkage.dataops.aggregates import value_histogram

    hist = value_histogram(ds, value_col, divisor).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    counts = hist.n.to_numpy()
    total = counts.sum()
    cum = np.cumsum(counts)
    out = {}
    for q in qs:
        target = max(1, int(np.ceil(q * total)))
        i = int(np.searchsorted(cum, target))
        out[q] = float(hist.bin.iloc[i] * divisor)
    return out


def cms_inner_product(reg_a: Dataset, reg_b: Dataset,
                      depth: int = 4) -> "pa.Table":
    """Join-size estimation from two Count-Min sketches (the classic
    AMS/CM inner-product application): for each depth row d,
    Σ_bucket a[d]·b[d] upper-bounds the true equi-join cardinality
    Σ_key f_a(key)·f_b(key); the estimate is the MIN over rows —
    one-sided (never under-estimates), ε·N_a·N_b expected error. Pure
    int64 arithmetic over two bounded register tables, so the gate is
    float-free and SQL-exact (JOIN USING (depth, bucket) + SUM +
    MIN). Returns one row: (est_join_size, depth_rows_used)."""
    a = pa.Table.from_pylist(reg_a.take_all())
    b = pa.Table.from_pylist(reg_b.take_all())

    def as_map(t):
        return {(d, w): n for d, w, n in zip(
            t["depth"].to_pylist(), t["bucket"].to_pylist(),
            t["n"].to_pylist())}

    ma, mb = as_map(a), as_map(b)
    per_depth = []
    for d in range(depth):
        s = sum(n * mb.get((dd, w), 0)
                for (dd, w), n in ma.items() if dd == d)
        per_depth.append(s)
    return pa.table({
        "est_join_size": pa.array([min(per_depth)], pa.int64()),
        "depth_rows_used": pa.array([depth], pa.int64()),
    })


def kmv_registers(ds: Dataset, value_col: str, k: int = 256) -> Dataset:
    """K-minimum-values distinct sketch: the k smallest 32-bit
    md5-prefix hashes of the column's distinct values — the mergeable
    sketch that (unlike HLL) also supports set INTERSECTION estimates
    (`kmv_intersect_estimate`). Integer register surface, so the gate
    is float-free: the oracle is DISTINCT-hash + ORDER BY + LIMIT k.

    Scale shape: per-batch k-smallest-distinct partials (md5 through
    DuckDB's C++ kernel — no per-row Python), one grouped distinct
    over ≤ k·blocks rows, one bounded sort+limit."""
    import duckdb
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        con = duckdb.connect()
        con.register("t", b.select([value_col]))
        h = con.execute(
            f"SELECT DISTINCT ('0x' || substr(md5(CAST({value_col} AS "
            f"VARCHAR)), 1, 8))::BIGINT AS h FROM t ORDER BY h LIMIT {k}"
        ).arrow()["h"]
        con.close()
        return pa.table({"h": pc.cast(h, pa.int64())})

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("h").count().drop_columns(["count()"])
            .sort("h").limit(k))


def kmv_estimate(registers, k: int = 256) -> float:
    """Distinct-count estimate from a KMV register table: (k−1)·2³² /
    h_k (unbiased for the kth-smallest order statistic of uniform
    hashes). Exact when fewer than k distinct values exist (the
    register set IS the value set)."""
    t = registers.to_pandas() if not isinstance(registers, pa.Table) \
        else registers.to_pandas()
    h = sorted(t["h"])
    if len(h) < k:
        return float(len(h))
    return (k - 1) * (2.0 ** 32) / float(h[-1])


def kmv_intersect_estimate(reg_a, reg_b, k: int = 256) -> dict:
    """Jaccard + intersection estimation from two KMV sketches: the k
    smallest of the UNION of both register sets is a KMV sketch of the
    union; the fraction of those present in BOTH inputs estimates the
    Jaccard similarity, and |A∩B| ≈ ρ · est(|A∪B|). Driver arithmetic
    over two bounded register tables."""
    ta = set((reg_a.to_pandas() if not isinstance(reg_a, pa.Table)
              else reg_a.to_pandas())["h"])
    tb = set((reg_b.to_pandas() if not isinstance(reg_b, pa.Table)
              else reg_b.to_pandas())["h"])
    u = sorted(ta | tb)[:k]
    if not u:
        return {"jaccard": 0.0, "est_union": 0.0, "est_intersection": 0.0}
    both = sum(1 for h in u if h in ta and h in tb)
    rho = both / len(u)
    if len(u) < k:
        est_union = float(len(u))
    else:
        est_union = (k - 1) * (2.0 ** 32) / float(u[-1])
    return {"jaccard": rho, "est_union": est_union,
            "est_intersection": rho * est_union}

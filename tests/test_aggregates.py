"""Unit tests for the grouped analytical operators and the HLL sketch —
each compared against a DuckDB recomputation on seeded random input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rand_events(n=2000, n_keys=37, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_keys, n).astype(np.int64),
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "value": np.round(rng.normal(50, 20, n), 6),
    })


def _ds(df):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_grouped_topk_matches_row_number(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_topk

    df = _rand_events()
    out = (grouped_topk(_ds(df), key="user_id", order_col="value", k=3,
                        tie_col="event_id")
           .to_pandas().sort_values(["user_id", "rank"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, CAST(rn AS BIGINT) AS rank, event_id, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY value DESC, event_id) AS rn
            FROM df) WHERE rn <= 3
        ORDER BY user_id, rn
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_topk_prune_smaller_than_input(ray_session):
    # the per-batch combiner must bound what reaches the shuffle
    from payor_linkage.dataops.aggregates import grouped_topk

    df = _rand_events(n=5000, n_keys=5)
    out = grouped_topk(_ds(df), key="user_id", order_col="value", k=2,
                       tie_col="event_id")
    assert out.count() == 10  # 5 keys × k=2


def test_grouped_quantiles_match_quantile_disc(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_quantiles

    # include several group sizes incl. 1 and exact-multiple sizes
    df = _rand_events(n=1777, n_keys=41, seed=11)
    df = pd.concat([df, pd.DataFrame({"event_id": [99999], "user_id": [777],
                                      "ts": [0], "value": [1.5]})],
                   ignore_index=True)
    out = (grouped_quantiles(_ds(df), key="user_id", value_col="value")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, quantile_disc(value, 0.25) AS q25,
               quantile_disc(value, 0.5) AS q50,
               quantile_disc(value, 0.75) AS q75
        FROM df GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_pivot_counts_match_filter_agg(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import pivot_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "source": [f"s{i}" for i in rng.integers(0, 6, 900)],
        "lang": [["en", "de", "fr"][i] for i in rng.integers(0, 3, 900)],
    })
    out = (pivot_counts(_ds(df), "source", "lang", ["en", "de", "fr"])
           .to_pandas().sort_values("source").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT source,
               count(*) FILTER (lang = 'en') AS n_en,
               count(*) FILTER (lang = 'de') AS n_de,
               count(*) FILTER (lang = 'fr') AS n_fr
        FROM df GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_running_seq_matches_row_number(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import running_seq

    df = _rand_events(n=1500, n_keys=29, seed=5)
    out = (running_seq(_ds(df), key="user_id", order_cols=["ts", "event_id"])
           .to_pandas().sort_values(["user_id", "seq"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM df ORDER BY user_id, seq
    """).df()
    exp["seq"] = exp["seq"].astype(np.int64)
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_hll_registers_match_sql(ray_session):
    import duckdb

    from payor_linkage.dataops.sketch import hll_registers

    df = _rand_events(n=3000, n_keys=500, seed=13)
    df["event_type"] = [["a", "b", "c"][i % 3] for i in range(len(df))]
    out = (hll_registers(_ds(df), key="event_type", value_col="user_id", p=10)
           .to_pandas().sort_values(["event_type", "bucket"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH h AS (
          SELECT event_type,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
          FROM df
        )
        SELECT event_type, CAST(hv // 4194304 AS BIGINT) AS bucket,
               CAST(max(CASE WHEN hv % 4194304 = 0 THEN 23
                        ELSE 22 - length(bin(CAST(hv % 4194304 AS INTEGER))) + 1
                        END) AS BIGINT) AS max_rho
        FROM h GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_hll_estimate_error_bound(ray_session):
    from payor_linkage.dataops.sketch import hll_estimate, hll_registers

    rng = np.random.default_rng(21)
    # three keys with known distinct cardinalities
    parts = []
    for k, card in (("lo", 80), ("mid", 1500), ("hi", 20000)):
        vals = rng.choice(card * 3, size=card, replace=False)
        parts.append(pd.DataFrame({"k": k, "v": np.repeat(vals, 2)}))
    df = pd.concat(parts, ignore_index=True)
    regs = hll_registers(_ds(df), key="k", value_col="v", p=10)
    est = hll_estimate(regs, p=10).to_pandas().set_index("k")["est_distinct"]
    for k, card in (("lo", 80), ("mid", 1500), ("hi", 20000)):
        rel = abs(est[k] - card) / card
        assert rel < 0.08, (k, est[k], card, rel)


def test_grouped_lag_delta_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_lag_delta

    df = _rand_events(n=3000, n_keys=29, seed=13)  # ts collisions included
    out = (grouped_lag_delta(_ds(df), key="user_id",
                             order_cols=["ts", "event_id"],
                             value_col="value")
           .to_pandas().sort_values(["user_id", "ts", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id, value, delta FROM (
            SELECT user_id, ts, event_id, value,
                   value - lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS delta
            FROM df) WHERE delta IS NOT NULL
        ORDER BY user_id, ts, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_string_agg_matches_ordered(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_string_agg

    df = _rand_events(n=2000, n_keys=23, seed=17)
    df["bucket"] = (df.user_id % 3).astype(np.int64)
    out = (grouped_string_agg(_ds(df), keys=["user_id", "bucket"],
                              value_col="event_id", order_col=["ts", "event_id"],
                              sep="|", out_col="ids")
           .to_pandas().sort_values(["user_id", "bucket"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, bucket,
               string_agg(CAST(event_id AS VARCHAR), '|'
                          ORDER BY ts, event_id) AS ids
        FROM df GROUP BY user_id, bucket ORDER BY user_id, bucket
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_rollup_counts_matches_rollup(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import rollup_counts

    df = _rand_events(n=1500, n_keys=11, seed=19)
    df["a"] = "a" + (df.user_id % 4).astype(str)
    df["b"] = "b" + (df.user_id % 3).astype(str)
    out = (rollup_counts(_ds(df), ["a", "b"]).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT coalesce(a, 'ALL') AS a, coalesce(b, 'ALL') AS b,
               CAST(count(*) AS BIGINT) AS n
        FROM df GROUP BY ROLLUP(a, b) ORDER BY a, b
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_running_cummax_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import running_cummax

    df = _rand_events(n=2500, n_keys=31, seed=23)
    out = (running_cummax(_ds(df), key="user_id",
                          order_cols=["ts", "event_id"], value_col="value")
           .to_pandas().sort_values(["user_id", "ts", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id, value,
               max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_max
        FROM df ORDER BY user_id, ts, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_value_histogram_matches_floor_bins(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import value_histogram

    df = _rand_events(n=4000, seed=29)
    df.loc[0, "value"] = -17.3  # negative bin
    out = (value_histogram(_ds(df), "value", 10.0).to_pandas()
           .sort_values("bin").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM df GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_distinct_except_matches_except(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import distinct_except

    df = _rand_events(n=3000, seed=31)
    df["part"] = np.where(df.user_id % 2 == 0, "a", "b")
    df["k"] = (df.value // 5).astype(np.int64)
    # guarantee a nonempty difference: keys 900+i only ever in part 'a'
    df.loc[df.index[:5], ["part", "k"]] = [
        ["a", 900], ["a", 901], ["a", 902], ["a", 903], ["a", 904]]
    out = (distinct_except(_ds(df), key_col="k", part_col="part",
                           keep="a", drop="b")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT DISTINCT k FROM df WHERE part = 'a'
        EXCEPT SELECT DISTINCT k FROM df WHERE part = 'b'
        ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_mode_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_mode

    df = _rand_events(n=3000, n_keys=29, seed=37)
    # few distinct values per key -> guaranteed count ties exercising the
    # value-ASC tie-break
    df["etype"] = np.array(["x", "y", "z", "w"])[df.event_id % 4]
    out = (grouped_mode(_ds(df), key="user_id", value_col="etype")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, etype AS mode_val, n FROM (
          SELECT user_id, etype, CAST(count(*) AS BIGINT) AS n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC, etype) AS rn
          FROM df GROUP BY user_id, etype)
        WHERE rn = 1 ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_ntile_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_ntile

    df = _rand_events(n=2000, n_keys=23, seed=41)
    out = (grouped_ntile(_ds(df), key="user_id",
                         order_cols=["value", "event_id"], k=4)
           .to_pandas().sort_values(["user_id", "value", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, value, event_id,
               CAST(ntile(4) OVER (PARTITION BY user_id
                                   ORDER BY value, event_id) AS BIGINT)
                   AS tile
        FROM df ORDER BY user_id, value, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_ntile_small_groups(ray_session):
    """Groups with n < k: NTILE gives n nonempty buckets 1..n."""
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_ntile

    df = _rand_events(n=40, n_keys=17, seed=43)  # many keys with n < 7
    out = (grouped_ntile(_ds(df), key="user_id",
                         order_cols=["value", "event_id"], k=7)
           .to_pandas().sort_values(["user_id", "value", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, value, event_id,
               CAST(ntile(7) OVER (PARTITION BY user_id
                                   ORDER BY value, event_id) AS BIGINT)
                   AS tile
        FROM df ORDER BY user_id, value, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_sliding_max_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import sliding_max

    df = _rand_events(n=3000, n_keys=13, seed=47)
    out = (sliding_max(_ds(df), key="user_id",
                       order_cols=["ts", "event_id"], value_col="value",
                       frame=4)
           .to_pandas().sort_values(["user_id", "ts", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id, value,
               max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                   AS win_max
        FROM df ORDER BY user_id, ts, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_sliding_max_frame_one_is_identity(ray_session):
    from payor_linkage.dataops.aggregates import sliding_max

    df = _rand_events(n=500, seed=53)
    out = (sliding_max(_ds(df), key="user_id",
                       order_cols=["ts", "event_id"], value_col="value",
                       frame=1).to_pandas())
    assert (out.win_max == out.value).all()


def test_running_cumsum_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import running_cumsum

    df = _rand_events(n=2500, n_keys=19, seed=59)
    df["q"] = (df.value.abs() // 1).astype(np.int64)
    out = (running_cumsum(_ds(df), key="user_id",
                          order_cols=["ts", "event_id"], value_col="q")
           .to_pandas().sort_values(["user_id", "ts", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id, q,
               CAST(sum(q) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS run_sum
        FROM df ORDER BY user_id, ts, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_distinct_intersect_matches_intersect(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import distinct_intersect

    df = _rand_events(n=3000, seed=61)
    df["part"] = np.where(df.user_id % 2 == 0, "a", "b")
    df["k"] = (df.value // 5).astype(np.int64)
    out = (distinct_intersect(_ds(df), key_col="k", part_col="part",
                              part_a="a", part_b="b")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT DISTINCT k FROM df WHERE part = 'a'
        INTERSECT SELECT DISTINCT k FROM df WHERE part = 'b'
        ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_first_last_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_first_last

    df = _rand_events(n=2200, n_keys=17, seed=71)
    out = (grouped_first_last(_ds(df), key="user_id",
                              order_cols=["ts", "event_id"],
                              value_col="value")
           .to_pandas().sort_values(["user_id", "ts", "event_id"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id, value,
               first_value(value) OVER w AS first_val,
               last_value(value) OVER w AS last_val
        FROM df
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, ts, event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_cms_estimate_one_sided_and_bounded(ray_session):
    """CMS never under-counts; with depth 4 / width 256 the overcount
    on this seeded corpus stays within a few expected-collision units."""
    from payor_linkage.dataops.sketch import cms_estimate, cms_registers

    df = _rand_events(n=6000, n_keys=200, seed=73)
    reg = cms_registers(_ds(df), value_col="user_id",
                        depth=4, width=256).materialize()
    true = df.user_id.value_counts()
    n_total = len(df)
    for item in [0, 7, 42, 199]:
        est = cms_estimate(reg, item, depth=4, width=256)
        t = int(true.get(item, 0))
        assert est >= t
        assert est <= t + 5 * n_total // 256
    assert cms_estimate(reg, 10**9, depth=4, width=256) <= 5 * n_total // 256


def test_bloom_no_false_negatives_and_bounded_fp(ray_session):
    from payor_linkage.dataops.sketch import bloom_bits, bloom_contains

    df = _rand_events(n=2000, n_keys=300, seed=83)
    present = set(df.user_id.unique().tolist())
    bits = bloom_bits(_ds(df), value_col="user_id",
                      n_hashes=3, m_bits=4096).materialize()
    for item in list(present)[:10]:
        assert bloom_contains(bits, item, n_hashes=3, m_bits=4096)
    # false-positive probe over definitely-absent items: with n=300,
    # k=3, m=4096 the fp rate is ~ (1-e^{-900/4096})^3 ≈ 0.8% — allow
    # a generous margin on 50 probes (deterministic: fixed hash/seed)
    fps = sum(bloom_contains(bits, 10**6 + i, n_hashes=3, m_bits=4096)
              for i in range(50))
    assert fps <= 5


def test_funnel_counts_matches_exists(ray_session):
    """Random funnel data incl. equal-timestamp A/B pairs (the inclusive
    window makes ties order-independent)."""
    import duckdb

    from payor_linkage.dataops.temporal import funnel_counts

    rng = np.random.default_rng(89)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 97, n).astype(np.int64),
        "ts": rng.integers(0, 500, n).astype(np.int64),  # dense -> ties
        "event_type": rng.choice(["A", "B", "C"], n, p=[0.4, 0.3, 0.3]),
    })
    out = (funnel_counts(_ds(df), on="user_id", ts_col="ts",
                         type_col="event_type", from_type="A",
                         to_type="B", window_us=25)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_from,
               CAST(count(*) FILTER (WHERE EXISTS (
                   SELECT 1 FROM df b
                   WHERE b.user_id = a.user_id AND b.event_type = 'B'
                     AND b.ts >= a.ts AND b.ts <= a.ts + 25))
                    AS BIGINT) AS n_converted
        FROM df a WHERE a.event_type = 'A'
        GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_moments_derive_variance(ray_session):
    """The int64 (n, Σv, Σv²) surface reproduces pandas variance when
    derived downstream."""
    from payor_linkage.dataops.aggregates import grouped_moments

    df = _rand_events(n=3000, n_keys=11, seed=97)
    df["q"] = (df.value.abs() // 1).astype(np.int64)
    out = (grouped_moments(_ds(df), key="user_id", value_col="q")
           .to_pandas().set_index("user_id").sort_index())
    for k, g in df.groupby("user_id"):
        r = out.loc[k]
        assert r.n == len(g)
        assert r.sum_v == g.q.sum()
        assert r.sum_sq == (g.q ** 2).sum()
        var = r.sum_sq / r.n - (r.sum_v / r.n) ** 2
        assert abs(var - g.q.var(ddof=0)) < 1e-9


def test_transition_counts_matches_lead(ray_session):
    """Single-event keys emit nothing; counts match the LEAD window over
    many blocks."""
    import duckdb

    from payor_linkage.dataops.temporal import transition_counts

    rng = np.random.default_rng(17)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 300, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    df = pd.concat([df, pd.DataFrame({
        "user_id": [9999], "ts": [pd.Timestamp("2020-01-01")],
        "event_id": [n], "event_type": ["a"]})], ignore_index=True)
    out = (transition_counts(_ds(df).repartition(9))
           .to_pandas().sort_values(["from_state", "to_state"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH o AS (SELECT event_type,
                          lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
                   FROM df)
        SELECT event_type AS from_state, nxt AS to_state, count(*) AS n
        FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
        ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # transitions per key = rows - 1 → total = rows - distinct keys
    assert out.n.sum() == len(df) - df.user_id.nunique()


def test_fill_forward_leading_nulls_and_blocks(ray_session):
    """Leading nulls stay null; fills never leak across keys even when
    a key's run spans block boundaries."""
    import duckdb

    from payor_linkage.dataops.temporal import fill_forward

    rng = np.random.default_rng(23)
    n = 3000
    v = rng.normal(size=n)
    v[rng.random(n) < 0.6] = np.nan
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": v,
    })
    out = (fill_forward(_ds(df).repartition(11))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT user_id, ts, event_id, value,
               last_value(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS filled
        FROM df ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp,
                                  check_dtype=False)


def test_range_lookup_boundaries_and_nulls(ray_session):
    from payor_linkage.dataops.enrich import range_lookup

    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "v": [-5.0, 0.0, 9.999, 10.0, 500.0, None],
    })
    out = (range_lookup(_ds(df), "v", [0.0, 10.0, 500.0],
                        ["neg", "low", "mid", "high"])
           .to_pandas().sort_values("id"))
    assert out.tier.tolist() == ["neg", "low", "low", "mid", "high",
                                 None]


def test_cooccurrence_pairs_exact(ray_session):
    """Duplicate (key,item) rows count once; singleton keys contribute
    nothing; runs split across blocks still pair correctly."""
    import duckdb

    from payor_linkage.dataops.enrich import cooccurrence_counts

    rng = np.random.default_rng(29)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 400, n).astype(np.int64),
        "item": rng.choice(["w", "x", "y", "z"], n),
    })
    out = (cooccurrence_counts(_ds(df).repartition(13), "k", "item")
           .to_pandas().sort_values(["item_a", "item_b"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH d AS (SELECT DISTINCT k, item FROM df)
        SELECT a.item AS item_a, b.item AS item_b, count(*) AS n
        FROM d a JOIN d b ON a.k = b.k AND a.item < b.item
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_sliding_sum_matches_window(ray_session):
    """Integer bounded-frame sum vs DuckDB across many blocks; frame
    larger than some runs; negative values."""
    import duckdb

    from payor_linkage.dataops.aggregates import sliding_sum

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 97, n).astype(np.int64),
        "i": np.arange(n, dtype=np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    out = (sliding_sum(_ds(df).repartition(9), "g", ["i"], "v", frame=7)
           .to_pandas().sort_values("i").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, i, v,
               sum(v) OVER (PARTITION BY g ORDER BY i
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS win_sum
        FROM df ORDER BY i
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp,
                                  check_dtype=False)


def test_global_ntile_fill_and_row_numbers(ray_session):
    """SQL NTILE fill (first n%k buckets one bigger), unique row
    numbers, and the n<k edge."""
    import duckdb

    from payor_linkage.dataops.reshape import global_ntile

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"i": np.arange(1003, dtype=np.int64),
                       "v": rng.normal(size=1003)})
    out = (global_ntile(_ds(df).repartition(8), ["v", "i"], k=7)
           .to_pandas().sort_values("rn").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT v, i, CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(ntile(7) OVER w AS BIGINT) AS bucket
        FROM df WINDOW w AS (ORDER BY v, i) ORDER BY rn
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp,
                                  check_dtype=False)
    # n < k edge: every row its own leading bucket
    small = pd.DataFrame({"i": np.arange(3, dtype=np.int64),
                          "v": [3.0, 1.0, 2.0]})
    o2 = (global_ntile(_ds(small), ["v", "i"], k=5)
          .to_pandas().sort_values("rn"))
    assert o2.bucket.tolist() == [1, 2, 3]


def test_profile_nulls_counts(ray_session):
    from payor_linkage.dataops.aggregates import profile_nulls

    df = pd.DataFrame({
        "a": [1.0, None, 3.0, None],
        "b": ["x", "y", None, "w"],
        "c": [1, 2, 3, 4],
    })
    out = (profile_nulls(_ds(df))
           .to_pandas().sort_values("col_name").reset_index(drop=True))
    assert out.col_name.tolist() == ["a", "b", "c"]
    assert out.n.tolist() == [4, 4, 4]
    assert out.n_null.tolist() == [2, 1, 0]


def test_histogram_quantile_error_bound(ray_session):
    """Histogram quantile estimates land within one bin width of the
    exact quantile."""
    from payor_linkage.dataops.sketch import histogram_quantile

    rng = np.random.default_rng(53)
    v = rng.normal(50, 20, 20000)
    df = pd.DataFrame({"v": v})
    d = 2.0
    est = histogram_quantile(_ds(df).repartition(9), "v", d,
                             [0.1, 0.5, 0.9])
    for q, e in est.items():
        exact = np.quantile(v, q)
        assert abs(e - exact) <= d, (q, e, exact)


def test_session_operators_empty_inputs(ray_session):
    """Every operator added this session survives an EMPTY (but typed)
    input and yields zero rows — empty blocks are routine at scale."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.aggregates import (grouped_rank,
                                                  profile_nulls,
                                                  sliding_sum)
    from payor_linkage.dataops.cdc import apply_upsert, snapshot_diff
    from payor_linkage.dataops.dedup import substring_dup_pairs
    from payor_linkage.dataops.enrich import (cooccurrence_counts,
                                              range_lookup)
    from payor_linkage.dataops.reshape import global_ntile, pack_positions
    from payor_linkage.dataops.temporal import (fill_forward,
                                                transition_counts)
    from payor_linkage.dataops.text import (chunk_documents,
                                            keyed_hash_sample,
                                            regex_redact,
                                            repetition_stats)

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
    }))
    ev = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "k": pa.array([], pa.int64()),
    }))
    kv = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())}))

    assert repetition_stats(docs).count() == 0
    assert regex_redact(docs, "text", "[0-9]+", id_col="doc_id").count() == 0
    assert chunk_documents(docs, 16).count() == 0
    assert keyed_hash_sample(docs, "lang", {"en": 0.5}).count() == 0
    assert substring_dup_pairs(docs, k=8).count() == 0
    assert substring_dup_pairs(docs, k=8, winnow_w=4).count() == 0
    assert pack_positions(docs, "doc_id", ["doc_id"], 100).count() == 0
    assert global_ntile(docs, ["doc_id"], 4).count() == 0
    assert snapshot_diff(kv, kv, "k", "v").count() == 0
    assert apply_upsert(kv, kv, "k", "v").count() == 0
    assert grouped_rank(ev, "user_id", "event_type",
                        carry_cols=["event_id"]).count() == 0
    assert sliding_sum(ev, "user_id", ["event_id"], "k", 3).count() == 0
    assert fill_forward(ev).count() == 0
    assert transition_counts(ev).count() == 0
    from payor_linkage.dataops.aggregates import prorate_integer
    from payor_linkage.dataops.cdc import scd2_history
    from payor_linkage.dataops.temporal import session_paths

    assert session_paths(ev).count() == 0
    assert scd2_history(ev).count() == 0
    assert prorate_integer(kv, "k", "v", "v", 10).count() == 0
    assert cooccurrence_counts(ev, "user_id", "event_type").count() == 0
    assert range_lookup(ev, "value", [1.0], ["a", "b"]).count() == 0
    prof = profile_nulls(ev).to_pandas()
    assert (prof.n == 0).all() if len(prof) else True


def test_prorate_integer_exact_allocation(ray_session):
    """Allocations must sum exactly to the per-group total and match the
    largest-remainder rule recomputed in pandas (floor shares + extras
    to the biggest remainders, ties by order col ascending)."""
    from payor_linkage.dataops.aggregates import prorate_integer

    rng = np.random.default_rng(11)
    n, total = 3000, 997
    df = pd.DataFrame({
        "k": rng.integers(0, 113, n).astype(np.int64),
        "pos": np.arange(n, dtype=np.int64),
        "w": rng.integers(1, 50, n).astype(np.int64),
    })
    out = prorate_integer(_ds(df), "k", "w", "pos", total).to_pandas()
    assert len(out) == n
    sums = out.groupby("k")["alloc"].sum()
    assert (sums == total).all()

    m = out.merge(df, left_on=["k", "pos"], right_on=["k", "pos"])
    for k, g in m.groupby("k"):
        W = g["w"].sum()
        base = (total * g["w"]) // W
        rem = (total * g["w"]) % W
        extra = total - base.sum()
        order = np.lexsort((g["pos"].to_numpy(), -rem.to_numpy()))
        exp = base.to_numpy().copy()
        exp[order[:extra]] += 1
        assert (g["alloc"].to_numpy() == exp).all(), k


def test_prorate_integer_rejects_nonpositive(ray_session):
    from payor_linkage.dataops.aggregates import prorate_integer

    df = pd.DataFrame({"k": np.int64([1, 1]), "pos": np.int64([0, 1]),
                       "w": np.int64([3, 0])})
    with pytest.raises(Exception):
        prorate_integer(_ds(df), "k", "w", "pos", 10).materialize()


def test_cube_counts_matches_duckdb(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import cube_counts

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice(["p", "q"], 500),
    })
    got = cube_counts(_ds(df), ["a", "b"]).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    exp = duckdb.query_df(df, "t", """
        SELECT coalesce(a, 'ALL') AS a, coalesce(b, 'ALL') AS b,
               CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY CUBE(a, b) ORDER BY a, b""").df()
    pd.testing.assert_frame_equal(got, exp)


def test_scd2_history_crafted(ray_session):
    """Consecutive equal values collapse; re-appearing values reopen a
    new version; the last interval per key stays open (NULL valid_to)."""
    from payor_linkage.dataops.cdc import scd2_history

    df = pd.DataFrame({
        "user_id": np.int64([1, 1, 1, 1, 1, 2, 2]),
        "ts": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
             "2024-01-05", "2024-01-01", "2024-01-02"]),
        "event_id": np.arange(7, dtype=np.int64),
        "event_type": ["a", "a", "b", "b", "a", "c", "c"],
    })
    out = scd2_history(_ds(df)).to_pandas() \
        .sort_values(["user_id", "version"]).reset_index(drop=True)
    assert out["event_type"].tolist() == ["a", "b", "a", "c"]
    assert out["version"].tolist() == [1, 2, 3, 1]
    assert out["valid_from"].astype(str).tolist() == [
        "2024-01-01", "2024-01-03", "2024-01-05", "2024-01-01"]
    assert out["valid_to"].astype(str).tolist() == [
        "2024-01-03", "2024-01-05", "NaT", "NaT"]


def test_session_paths_crafted(ray_session):
    """Two sessions split by a >30 min gap; same-path sessions from
    different users aggregate into one count."""
    from payor_linkage.dataops.temporal import session_paths

    base = pd.Timestamp("2024-01-01")
    mins = [0, 5, 10, 120, 125, 0, 5]
    df = pd.DataFrame({
        "user_id": np.int64([1, 1, 1, 1, 1, 2, 2]),
        "ts": [base + pd.Timedelta(minutes=m) for m in mins],
        "event_id": np.arange(7, dtype=np.int64),
        "event_type": ["v", "c", "b", "v", "c", "v", "c"],
    })
    out = session_paths(_ds(df)).to_pandas() \
        .sort_values("path").reset_index(drop=True)
    assert dict(zip(out["path"], out["n_sessions"])) == {
        "v>c>b": 1, "v>c": 2}


def test_asof_forward_matches_duckdb(ray_session):
    import duckdb

    from payor_linkage.dataops.temporal import asof_join

    rng = np.random.default_rng(23)
    n = 1200
    df = pd.DataFrame({
        "user_id": rng.integers(0, 29, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 5000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "side": rng.choice(["l", "r"], n),
    })
    left = _ds(df[df.side == "l"].drop(columns="side"))
    right = _ds(df[df.side == "r"].drop(columns="side"))
    out = (asof_join(left, right, out_col="next_event_id",
                     direction="forward")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    ldf, rdf = df[df.side == "l"], df[df.side == "r"]
    exp = duckdb.sql("""
        SELECT l.event_id, l.user_id,
               (SELECT r.event_id FROM rdf r
                WHERE r.user_id = l.user_id AND r.ts >= l.ts
                ORDER BY r.ts, r.event_id LIMIT 1) AS next_event_id
        FROM ldf l ORDER BY l.event_id
    """).df()
    got = out[exp.columns.tolist()].astype({"next_event_id": "float64"})
    pd.testing.assert_frame_equal(got, exp.astype(
        {"next_event_id": "float64"}))


def test_grouped_mad_matches_duckdb(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_mad

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "k": rng.integers(0, 23, 2000).astype(np.int64),
        "v": rng.integers(-500, 500, 2000).astype(np.int64),
    })
    out = (grouped_mad(_ds(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH m AS (SELECT k, quantile_disc(v, 0.5) AS med
                   FROM df GROUP BY 1),
        d AS (SELECT d.k, m.med, abs(d.v - m.med) AS adev
              FROM df d JOIN m USING (k))
        SELECT k, any_value(med) AS med, quantile_disc(adev, 0.5) AS mad
        FROM d GROUP BY k ORDER BY k
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_grouped_weighted_median_matches_expansion(ray_session):
    """The weighted median must equal quantile_disc(0.5) over the
    weight-EXPANDED multiset (the definition), including tie blocks and
    weight-1 groups."""
    from payor_linkage.dataops.aggregates import grouped_weighted_median

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.integers(0, 17, 1200).astype(np.int64),
        "v": rng.integers(0, 40, 1200).astype(np.int64),  # heavy ties
        "w": rng.integers(1, 9, 1200).astype(np.int64),
    })
    out = (grouped_weighted_median(_ds(df), "k", "v", "w")
           .to_pandas().set_index("k")["wmed"].sort_index())
    for k, g in df.groupby("k"):
        expanded = np.sort(np.repeat(g["v"].to_numpy(), g["w"].to_numpy()))
        exp = expanded[int(np.ceil(len(expanded) / 2)) - 1]
        assert out[k] == exp, k


def test_late_events_matches_duckdb(ray_session):
    import duckdb

    from payor_linkage.dataops.temporal import late_events

    rng = np.random.default_rng(37)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 31, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 50_000, n), unit="s"),
        "event_id": rng.permutation(n).astype(np.int64),  # scrambled arrival
    })
    delay = 600_000_000
    out = (late_events(_ds(df), delay)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH o AS (
          SELECT event_id, user_id, ts,
                 max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max
          FROM df)
        SELECT event_id, user_id, ts,
               epoch_us(prev_max) - epoch_us(ts) AS late_by_us
        FROM o WHERE epoch_us(prev_max) - epoch_us(ts) > {delay}
        ORDER BY event_id
    """).df()
    assert len(exp) > 0
    out["ts"] = out["ts"].astype("datetime64[ns]")
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_longest_streak_matches_duckdb(ray_session):
    import duckdb

    from payor_linkage.dataops.temporal import longest_streak

    rng = np.random.default_rng(43)
    n = 2500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 23, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 9000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["a", "b"], n, p=[0.7, 0.3]),
    })
    out = (longest_streak(_ds(df))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH o AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(event_type) OVER w IS DISTINCT FROM
                           event_type THEN 1 ELSE 0 END AS brk
          FROM df WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        i AS (SELECT user_id,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS isl
              FROM o),
        l AS (SELECT user_id, isl, count(*) AS len FROM i GROUP BY 1, 2)
        SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
        FROM l GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_rank_against_matches_brute(ray_session):
    from payor_linkage.dataops.enrich import rank_against

    rng = np.random.default_rng(47)
    df = pd.DataFrame({"id": np.arange(800, dtype=np.int64),
                       "v": np.round(rng.normal(0, 10, 800), 6)})
    ref = pd.DataFrame({"v": np.round(rng.normal(1, 8, 150), 6)})
    out = (rank_against(_ds(df), _ds(ref), "v", carry_cols=["id"])
           .to_pandas().sort_values("id").reset_index(drop=True))
    rv = np.sort(ref["v"].to_numpy())
    exp = np.searchsorted(rv, df["v"].to_numpy(), side="right")
    assert (out["n_le"].to_numpy() == exp).all()
    assert (out["ref_n"] == 150).all()
    # bounded-reference contract enforced
    with pytest.raises(ValueError):
        rank_against(_ds(df), _ds(ref), "v", carry_cols=["id"],
                     max_ref_rows=10)


def test_densify_locf_matches_duckdb(ray_session):
    import duckdb

    from payor_linkage.dataops.temporal import densify_locf

    rng = np.random.default_rng(53)
    n = 900
    df = pd.DataFrame({
        "user_id": rng.integers(0, 19, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 400_000, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.normal(0, 5, n), 6),
    })
    step = 7_200_000_000  # 2h
    out = (densify_locf(_ds(df), step)
           .to_pandas().sort_values(["user_id", "slot_us"])
           .reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH agg AS (
          SELECT user_id,
                 (epoch_us(min(ts)) + {step - 1}) // {step} AS lo,
                 epoch_us(max(ts)) // {step} AS hi
          FROM df GROUP BY 1),
        grid AS (
          SELECT user_id, unnest(generate_series(lo, hi)) * {step}
                     AS slot_us
          FROM agg WHERE hi >= lo)
        SELECT g.user_id, g.slot_us,
               (SELECT e.value FROM df e
                WHERE e.user_id = g.user_id
                  AND epoch_us(e.ts) <= g.slot_us
                ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS value
        FROM grid g ORDER BY user_id, slot_us
    """).df()
    assert len(exp) > 0
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_densify_single_event_within_slot(ray_session):
    """A key whose whole history fits strictly inside one slot interval
    emits zero rows (ceil(min) > floor(max)) — no phantom grid."""
    from payor_linkage.dataops.temporal import densify_locf

    df = pd.DataFrame({
        "user_id": np.int64([1]),
        "ts": pd.to_datetime(["2024-01-01 00:30:00"]),
        "event_id": np.int64([0]),
        "value": [1.5],
    })
    assert densify_locf(_ds(df), 3_600_000_000).count() == 0


def test_union_by_name_aligns_and_guards(ray_session):
    from payor_linkage.dataops.reshape import union_by_name

    a = pd.DataFrame({"x": np.int64([1, 2]), "y": ["a", "b"]})
    b = pd.DataFrame({"z": [0.5], "x": np.int64([3])})
    u = union_by_name(_ds(a), _ds(b)).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    assert u.columns.tolist() == ["x", "y", "z"]
    assert u["x"].tolist() == [1, 2, 3]
    assert u["y"].tolist()[:2] == ["a", "b"] and pd.isna(u["y"][2])
    assert pd.isna(u["z"][:2]).all() and u["z"][2] == 0.5

    bad = pd.DataFrame({"x": ["not-int"]})
    with pytest.raises(ValueError):
        union_by_name(_ds(a), _ds(bad))


def test_grouped_islands_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouped_islands

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a"] * 6 + ["b"] * 3),
        "seq": pa.array([1, 2, 3, 7, 8, 12, 5, 6, 7], pa.int64()),
    }))
    out = sorted((r["k"], r["island_start"], r["island_end"], r["n"])
                 for r in grouped_islands(ds, "k", "seq").take_all())
    assert out == [("a", 1, 3, 3), ("a", 7, 8, 2), ("a", 12, 12, 1),
                   ("b", 5, 7, 3)]


def test_grouped_bits_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouped_bits

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["x", "x", "x", "y"]),
        "v": pa.array([0b1100, 0b1010, 0b1001, 0b0111], pa.int64()),
    }))
    out = {r["k"]: (r["bits_or"], r["bits_and"])
           for r in grouped_bits(ds, "k", "v").take_all()}
    assert out == {"x": (0b1111, 0b1000), "y": (0b0111, 0b0111)}


def test_running_distinct_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import running_distinct

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["u"] * 5 + ["v"] * 2),
        "typ": pa.array(["a", "b", "a", "c", "b", "x", "x"]),
        "t": pa.array([1, 2, 3, 4, 5, 1, 2], pa.int64()),
        "i": pa.array([10, 11, 12, 13, 14, 20, 21], pa.int64()),
    }))
    out = running_distinct(ds, key="k", value_col="typ",
                           order_cols=["t", "i"], id_col="i").take_all()
    got = {r["i"]: r["n_distinct"] for r in out}
    assert got == {10: 1, 11: 2, 12: 2, 13: 3, 14: 3, 20: 1, 21: 1}


def test_grouped_intersection_count_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouped_intersection_count

    a = rd.from_arrow(pa.table({
        "q": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array([10, 11, 12, 20, 21], pa.int64()),
    }))
    b = rd.from_arrow(pa.table({
        "q": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array([11, 12, 22, 23, 30], pa.int64()),
    }))
    out = {r["q"]: r["n_common"]
           for r in grouped_intersection_count(a, b, "q", "v").take_all()}
    # q=1 shares {11,12}; q=2 shares nothing (no row); q=3 one-sided
    assert out == {1: 2}


def test_range_frame_sum_includes_peers(ray_session):
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.aggregates import range_frame_sum

    base = dt.datetime(2024, 1, 1)
    # u: ts 0s (k=1), 10s (k=2), 10s (k=4) — RANGE CURRENT ROW includes
    # BOTH 10s peers for each 10s row; delta 5s excludes the 0s row
    rows = [("u", 0, 1), ("u", 10, 2), ("u", 10, 4), ("v", 0, 8)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "k": pa.array([r[2] for r in rows], pa.int64()),
    }))
    out = range_frame_sum(ds, "user_id", "ts", "k",
                          delta_us=5_000_000).to_pandas()
    got = {(r.user_id, r.k): r.win_sum for r in out.itertuples()}
    assert got[("u", 1)] == 1
    assert got[("u", 2)] == 6   # both peers, 0s row outside delta
    assert got[("u", 4)] == 6
    assert got[("v", 8)] == 8


def test_histogram_drift_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import histogram_drift

    old = rd.from_arrow(pa.table({"v": pa.array(
        [1.0, 5.0, 12.0, 13.0, 25.0], pa.float64())}))
    new = rd.from_arrow(pa.table({"v": pa.array(
        [2.0, 14.0, 15.0, 16.0, 31.0, 35.0], pa.float64())}))
    out = histogram_drift(old, new, "v", 10.0).to_pandas() \
        .set_index("bin").sort_index()
    # old bins: 0:2, 1:2, 2:1 ; new bins: 0:1, 1:3, 3:2
    assert out.loc[0].tolist() == [2, 1, -1]
    assert out.loc[1].tolist() == [2, 3, 1]
    assert out.loc[2].tolist() == [1, 0, -1]
    assert out.loc[3].tolist() == [0, 2, 2]


def test_k_anonymity_risk_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import k_anonymity_risk

    t = pa.table({
        "zip": pa.array([10, 10, 10, 20, 20, 30], pa.int32()),
        "seg": pa.array(["a", "a", "a", "a", "b", "a"]),
    })
    out = k_anonymity_risk(rd.from_arrow(t), ["zip", "seg"], 2) \
        .to_pandas()
    # cohorts under k=2: (20,a)=1, (20,b)=1, (30,a)=1; (10,a)=3 safe
    got = {(r.zip, r.seg): r.n for r in out.itertuples()}
    assert got == {(20, "a"): 1, (20, "b"): 1, (30, "a"): 1}
    assert out["zip"].dtype == np.int32


def test_grouped_corr_stats_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouped_corr_stats

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b"]),
        "x": pa.array([1.0, 2.0, 3.0, 10.0, 20.0], pa.float64()),
        "y": pa.array([2.0, 4.0, 6.0, 5.0, 7.0], pa.float64()),
    })
    out = grouped_corr_stats(rd.from_arrow(t), "g", "x", "y") \
        .to_pandas().set_index("g")
    assert out.loc["a"].tolist() == [3, 6, 12, 14, 56, 28]
    assert out.loc["b"].tolist() == [2, 30, 12, 500, 74, 190]
    # exact Pearson r for group a: perfectly linear -> 1.0
    import math
    r = out.loc["a"]
    num = r.n * r.sum_xy - r.sum_x * r.sum_y
    den = math.sqrt(r.n * r.sum_xx - r.sum_x**2) * \
        math.sqrt(r.n * r.sum_yy - r.sum_y**2)
    assert math.isclose(num / den, 1.0, rel_tol=1e-12)


def test_mad_outliers_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import mad_outliers

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 100.0]
    t = pa.table({
        "g": pa.array(["u"] * 6),
        "id": pa.array(list(range(6)), pa.int64()),
        "v": pa.array(vals, pa.float64()),
    })
    out = mad_outliers(rd.from_arrow(t), "g", "v", "id", k=3.0) \
        .to_pandas()
    # med = 12 (lower median), |v-12| = [2,1,0,1,2,88], MAD = 1
    # outliers: |v-12| > 3 -> only 100.0
    assert out["id"].tolist() == [5]
    assert out["med"].iloc[0] == 12.0 and out["mad"].iloc[0] == 1.0


def test_l_diversity_risk_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import l_diversity_risk

    t = pa.table({
        "zip": pa.array([1, 1, 1, 2, 2, 3], pa.int32()),
        "dx": pa.array(["flu", "flu", "flu", "flu", "cold", "flu"]),
    })
    out = l_diversity_risk(rd.from_arrow(t), ["zip"], "dx", 2) \
        .to_pandas()
    got = {r.zip: (r.n_rows, r.n_sensitive) for r in out.itertuples()}
    # zip 1: 3 rows, 1 distinct dx (at risk); zip 3: 1 row, 1 distinct
    # zip 2 has 2 distinct -> safe
    assert got == {1: (3, 1), 3: (1, 1)}
    assert out["zip"].dtype == np.int32


def test_grouped_nth_value_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouped_nth_value

    t = pa.table({
        "g": pa.array(["a", "a", "a", "b", "b", "c"]),
        "o": pa.array([3, 1, 2, 2, 1, 1], pa.int64()),
        "v": pa.array([30.0, 10.0, 20.0, 5.0, 4.0, 9.0], pa.float64()),
    })
    out = grouped_nth_value(rd.from_arrow(t), "g", ["o"], "v", n=2) \
        .to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    # group a ordered by o: v = 10,20,30 -> 2nd = 20 on every row
    assert out.loc[out.g == "a", "nth_val"].tolist() == [20.0] * 3
    # group b: 4,5 -> 2nd = 5
    assert out.loc[out.g == "b", "nth_val"].tolist() == [5.0] * 2
    # group c has 1 row -> NULL
    assert out.loc[out.g == "c", "nth_val"].isna().all()


def test_grouped_trend_exact_sufficient_stats(ray_session):
    """slope_num/slope_den must equal the exact integer formulas per
    group (checked against Fraction-exact OLS), shift-invariance must
    hold, and a constant-x group must emit slope_den = 0."""
    from fractions import Fraction

    from payor_linkage.dataops.aggregates import grouped_trend

    rng = np.random.default_rng(11)
    ks = np.repeat(["a", "b", "c"], 40)
    x = rng.integers(19000, 19400, size=120)
    y = rng.integers(0, 500, size=120)
    x[ks == "c"] = 19111  # constant x -> undefined slope, den 0
    df = pd.DataFrame({"k": ks, "x": x.astype(np.int64),
                       "y": y.astype(np.int64)})
    out = (grouped_trend(_ds(df), ["k"], "x", "y").to_pandas()
           .set_index("k").sort_index())

    for k, g in df.groupby("k"):
        n = len(g)
        num = n * int((g.x * g.y).sum()) - int(g.x.sum()) * int(g.y.sum())
        den = n * int((g.x * g.x).sum()) - int(g.x.sum()) ** 2
        r = out.loc[k]
        assert (r.n, r.slope_num, r.slope_den) == (n, num, den)
        if den != 0:
            xm, ym = Fraction(int(g.x.sum()), n), Fraction(int(g.y.sum()), n)
            cov = sum((Fraction(int(a)) - xm) * (Fraction(int(b)) - ym)
                      for a, b in zip(g.x, g.y))
            var = sum((Fraction(int(a)) - xm) ** 2 for a in g.x)
            assert Fraction(num, den) == cov / var
    assert out.loc["c"].slope_den == 0

    # shift invariance: x - 19000 gives identical num/den
    df2 = df.assign(x=df.x - 19000)
    out2 = (grouped_trend(_ds(df2), ["k"], "x", "y").to_pandas()
            .set_index("k").sort_index())
    assert (out2[["slope_num", "slope_den"]]
            .equals(out[["slope_num", "slope_den"]]))

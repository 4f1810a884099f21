"""Unit tests for the join/grouping helpers in payor_linkage.rayutil."""

import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def test_lookup_join_attaches_and_drops(ray_session):
    from payor_linkage.rayutil import lookup_join

    big = _ds({"k": ["a", "b", "c", "d"], "x": [1, 2, 3, 4]})
    small = _ds({"k": ["b", "d", "z"], "y": [20, 40, 99]})
    out = (lookup_join(big, small, "k").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out.k.tolist() == ["b", "d"]          # inner: unmatched dropped
    assert out.x.tolist() == [2, 4]
    assert out.y.tolist() == [20, 40]


def test_lookup_join_empty_small_side(ray_session):
    from payor_linkage.rayutil import lookup_join

    big = _ds({"k": ["a", "b"], "x": [1, 2]})
    small = _ds({"k": pa.array([], pa.string()), "y": pa.array([], pa.int64())})
    out = lookup_join(big, small, "k")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "x", "y"}


def test_lookup_join_matches_hash_join_semantics(ray_session):
    import numpy as np

    from payor_linkage.rayutil import lookup_join, smart_join

    rng = np.random.RandomState(3)
    keys = [f"k{i:04d}" for i in range(500)]
    big = _ds({"k": [keys[i] for i in rng.randint(0, 500, 2000)],
               "x": list(range(2000))})
    small = _ds({"k": keys[::2], "y": list(range(0, 500, 2))})
    a = (lookup_join(big, small, "k").to_pandas()
         .sort_values(["k", "x"]).reset_index(drop=True))
    b = (smart_join(big, small, "k").to_pandas()
         .sort_values(["k", "x"]).reset_index(drop=True))
    assert a[["k", "x", "y"]].equals(b[["k", "x", "y"]])


def test_lookup_join_left(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.rayutil import lookup_join

    big = rd.from_arrow(pa.table({"k": ["a", "b", "c"], "x": [1, 2, 3]}))
    small = rd.from_arrow(pa.table({"k": ["b"], "y": [9]}))
    out = (lookup_join(big, small, on="k", how="left").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out.k.tolist() == ["a", "b", "c"]
    assert out.y.fillna(-1).tolist() == [-1, 9, -1]
    # empty small side: every row survives with null payload
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                    "y": pa.array([], pa.int64())}))
    out2 = lookup_join(big, empty, on="k", how="left").to_pandas()
    assert len(out2) == 3 and out2.y.isna().all()


def test_broadcast_semi_anti_join(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.rayutil import broadcast_semi_join

    big = rd.from_arrow(pa.table({"k": ["a", "b", "c", "b"], "x": [1, 2, 3, 4]}))
    keys = rd.from_arrow(pa.table({"kk": ["b", "z", "b"]}))
    semi = broadcast_semi_join(big, keys, "k", "kk").to_pandas()
    assert sorted(semi.x.tolist()) == [2, 4]
    anti = broadcast_semi_join(big, keys, "k", "kk", anti=True).to_pandas()
    assert sorted(anti.x.tolist()) == [1, 3]


def test_scatter_blocks_filters_and_batches(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from payor_linkage.rayutil import scatter_blocks

    ds = rd.from_items([{"k": f"id_{i:03d}", "v": i} for i in range(500)]) \
        .repartition(20).materialize()

    def keep_in(t, wanted):
        if t.num_rows == 0:
            return None
        return t.filter(pc.is_in(t["k"], value_set=wanted))

    wanted = pa.array([f"id_{i:03d}" for i in range(0, 500, 50)])
    out = scatter_blocks(ds, keep_in, wanted)
    assert out.num_rows == 10
    assert sorted(out["k"].to_pylist()) == sorted(wanted.to_pylist())
    # concat result is combined (single chunk per column)
    assert out["k"].num_chunks == 1


def test_scatter_blocks_empty_result_schema(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.rayutil import scatter_blocks

    ds = rd.range(10).materialize()
    schema = pa.schema([("x", pa.string())])
    out = scatter_blocks(ds, lambda t, *_: None, schema=schema)
    assert out.num_rows == 0 and out.schema == schema


def test_replicate_join_duplicate_keys(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from payor_linkage.rayutil import replicate_join

    rng = np.random.default_rng(2)
    bk = rng.integers(0, 40, 5000)
    sk = rng.integers(0, 50, 150)
    big = rd.from_arrow(pa.table({"k": bk, "bval": np.arange(5000)}))
    small = rd.from_arrow(pa.table({"k": sk, "sval": np.arange(150)}))
    got = replicate_join(big, small, "k").to_pandas()
    want = (pd.DataFrame({"k": bk, "bval": np.arange(5000)})
            .merge(pd.DataFrame({"k": sk, "sval": np.arange(150)}),
                   on="k"))
    key = ["k", "bval", "sval"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[key],
        want.sort_values(key).reset_index(drop=True)[key])

    with pytest.raises(ValueError):  # column collision refused
        replicate_join(big, rd.from_arrow(
            pa.table({"k": [1], "bval": [9]})), "k")


def test_skew_join_equals_plain_join(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.rayutil import skew_join

    rng = np.random.default_rng(7)
    bk = np.concatenate([np.zeros(4000, np.int64),
                         rng.integers(1, 30, 2000)])
    sk = np.concatenate([np.zeros(5, np.int64),
                         rng.integers(1, 40, 120)])
    big = rd.from_arrow(pa.table({"k": bk, "bval": np.arange(6000)}))
    small = rd.from_arrow(pa.table({"k": sk, "sval": np.arange(125)}))
    want = (pd.DataFrame({"k": bk, "bval": np.arange(6000)})
            .merge(pd.DataFrame({"k": sk, "sval": np.arange(125)}),
                   on="k"))
    key = ["k", "bval", "sval"]
    for hot in (2, 10**9):  # hot path engaged vs all-cold fallback
        got = skew_join(big, small, "k", hot_count=hot).to_pandas()
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True)[key],
            want.sort_values(key).reset_index(drop=True)[key])

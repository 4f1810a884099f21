"""Local emulation of the driver's DuckDB-oracle gate: run every
``queries()`` entry at sf0.01 and compare row-count + schema +
order-insensitive values against ``oracle_sql()``."""

import os

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata not present")


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _sql_checked_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql())


@pytest.mark.parametrize("name", _sql_checked_names())
def test_query_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as e

    ray_df = _canon(_to_df(e.queries()[name](SF_DIR)))
    sql_df = _canon(oracle_con.sql(e.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=True,
                                  check_exact=False, rtol=1e-9, atol=1e-12)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as e

    sql_names = set(e.oracle_sql())
    for name, fn in e.queries().items():
        if name in sql_names or name.startswith("q_mdm"):
            continue
        df = _to_df(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_mdm_queries_run(ray_session):
    import __ray_entry__ as e

    for name in ["q_mdm_golden", "q_mdm_candidates", "q_mdm_groups",
                 "q_mdm_xref", "q_mdm_hierarchy"]:
        df = _to_df(e.queries()[name](SF_DIR))
        assert len(df) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_df(e.entry())
    assert len(df) > 0
    assert "master_payor_id" in df.columns


def test_pair_training_set_labels(ray_session):
    """Training-set labels agree with ground truth recomputed in
    pandas, and the feature floats pass through candidates untouched."""
    import __ray_entry__ as e

    df = _to_df(e.queries()["q_pair_training_set"](SF_DIR))
    res = e._mdm_result(SF_DIR)
    ent = (res.unified.select_columns(["source_record_id", "entity_id"])
           .to_pandas().set_index("source_record_id")["entity_id"])
    ea = ent.reindex(df["source_record_id_a"]).to_numpy()
    eb = ent.reindex(df["source_record_id_b"]).to_numpy()
    want = ((ea == eb) & (ea != -1) & (eb != -1)).astype("int64")
    assert (df["is_match"].to_numpy() == want).all()
    cand = res.candidates.select_columns(
        ["source_record_id_a", "source_record_id_b",
         "overall_score"]).to_pandas()
    m = df.merge(cand, on=["source_record_id_a", "source_record_id_b"],
                 suffixes=("", "_c"))
    assert (m["overall_score"].fillna(-1)
            == m["overall_score_c"].fillna(-1)).all()

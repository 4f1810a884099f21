"""Survivorship rule-by-rule checks (A1-A10, `int_survivorship.sql` +
`golden_payors.sql`) over a crafted 3-source group."""

from datetime import date, datetime

import pyarrow as pa
import pytest



def _group(rows):
    """rows: dicts with unified-record fields (subset) + group columns."""
    import ray.data as rd

    defaults = {
        "match_group_id": "g1", "is_survivor": False, "group_confidence": 0.95,
        "source_record_id": None, "source_system": None, "source_trust_rank": None,
        "payor_name": None, "payor_name_alt": None, "tax_id": None, "npi": None,
        "cms_plan_id": None, "address_line_1": None, "address_line_2": None,
        "city": None, "state_code": None, "zip_code": None, "phone": None,
        "website": None, "payor_type": None, "line_of_business": None,
        "is_active": None, "effective_date": None, "termination_date": None,
        "loaded_at": None, "spans_json": "[]",
    }
    full = [{**defaults, **r} for r in rows]
    schema = pa.schema([
        ("match_group_id", pa.string()), ("is_survivor", pa.bool_()),
        ("group_confidence", pa.float64()), ("source_record_id", pa.string()),
        ("source_system", pa.string()), ("source_trust_rank", pa.int32()),
        ("payor_name", pa.string()), ("payor_name_alt", pa.string()),
        ("tax_id", pa.string()), ("npi", pa.string()), ("cms_plan_id", pa.string()),
        ("address_line_1", pa.string()), ("address_line_2", pa.string()),
        ("city", pa.string()), ("state_code", pa.string()), ("zip_code", pa.string()),
        ("phone", pa.string()), ("website", pa.string()), ("payor_type", pa.string()),
        ("line_of_business", pa.string()), ("is_active", pa.bool_()),
        ("effective_date", pa.date32()), ("termination_date", pa.date32()),
        ("loaded_at", pa.timestamp("us")), ("spans_json", pa.string()),
    ])
    return rd.from_arrow(pa.Table.from_pylist(full, schema=schema))


@pytest.fixture(scope="module")
def golden_row(ray_session):
    from payor_linkage.survivorship import make_golden_fn, SurvivorshipConfig

    members = _group([
        {"source_record_id": "crm:1", "source_system": "crm", "source_trust_rank": 1,
         "payor_name": "Acme Health", "tax_id": "111111111",
         "address_line_1": "1 Old St", "city": "OLDTOWN",
         "payor_name_alt": "short", "is_active": False,
         "effective_date": date(2005, 1, 1), "termination_date": date(2019, 1, 1),
         "loaded_at": datetime(2024, 1, 1), "is_survivor": True,
         "spans_json": '[{"kind":"payor_name","text":"Acme Health","media_ref":"","offset":0}]'},
        {"source_record_id": "cred:2", "source_system": "credentialing",
         "source_trust_rank": 2, "payor_name": "Acme Health Services",
         "npi": "1999999999", "payor_name_alt": "the longest alt name",
         "address_line_1": "2 New Ave", "city": "NEWVILLE", "phone": "5551234567",
         "is_active": True, "effective_date": date(2010, 6, 1),
         "loaded_at": datetime(2024, 6, 1)},
        {"source_record_id": "ref:3", "source_system": "cms_reference",
         "source_trust_rank": 4, "payor_name": "ACME HEALTH OFFICIAL",
         "cms_plan_id": "H9999", "payor_type": "commercial",
         "termination_date": date(2022, 5, 5), "loaded_at": datetime(2023, 1, 1)},
    ])
    import pyarrow.compute as pc

    tbl = pa.Table.from_pandas(members.to_pandas(), preserve_index=False)
    loaded_us = pc.cast(tbl["loaded_at"], pa.int64())
    tbl = tbl.drop_columns(["loaded_at"]).append_column("loaded_us", loaded_us)
    out = make_golden_fn(SurvivorshipConfig())(tbl)
    return out.to_pylist()[0]


def test_source_priority_trust_wins(golden_row):
    assert golden_row["payor_name"] == "Acme Health"      # trust 1 (A1)
    assert golden_row["tax_id"] == "111111111"
    assert golden_row["npi"] == "1999999999"              # first non-null by trust
    assert golden_row["payor_type"] == "commercial"       # only ref has it


def test_cms_priority_prefers_reference(golden_row):
    assert golden_row["cms_plan_id"] == "H9999"           # A2


def test_most_recent_address(golden_row):
    # cred loaded 2024-06-01 is most recent with non-null address (A3)
    assert golden_row["address_line_1"] == "2 New Ave"
    assert golden_row["city"] == "NEWVILLE"
    assert golden_row["phone"] == "5551234567"


def test_most_complete_alt_name(golden_row):
    assert golden_row["payor_name_alt"] == "the longest alt name"  # A4


def test_any_true_active(golden_row):
    assert golden_row["is_active"] is True                # A5 BOOLOR


def test_date_aggregates(golden_row):
    assert str(golden_row["effective_date"]) == "2005-01-01"   # A6 min
    assert str(golden_row["termination_date"]) == "2022-05-05"  # A6 max


def test_metrics(golden_row):
    assert golden_row["source_count"] == 3                # A8
    assert golden_row["confidence_score"] == 0.95         # A9
    # A10: non-null of the 15 completeness fields
    assert 0 < golden_row["completeness_score"] <= 1


def test_survivor_spans_verbatim(golden_row):
    import json

    assert golden_row["survivor_record_id"] == "crm:1"
    assert json.loads(golden_row["spans_json"])[0]["text"] == "Acme Health"


def test_rule_vocabulary_dispatch(ray_session):
    """most_frequent / any_non_null / manual from the declared vocabulary
    (`05_create_master_tables.sql:96-98`)."""
    from payor_linkage.survivorship import _apply_rule

    cols = {
        "source_record_id": ["a", "b", "c"],
        "source_system": ["crm", "claims", "claims"],
        "source_trust_rank": [1, 3, 3],
        "x": ["v1", "v2", "v2"],
    }
    order = [0, 1, 2]
    assert _apply_rule("most_frequent", cols, "x", order, order) == "v2"
    assert _apply_rule("any_non_null", cols, "x", order, order) == "v1"
    assert _apply_rule("manual", cols, "x", order, order) is None
    with pytest.raises(ValueError):
        _apply_rule("bogus", cols, "x", order, order)


def test_build_golden_end_to_end(pipeline_result):
    g = pipeline_result.golden.to_pandas()
    assert g.master_payor_id.is_unique
    assert ((g.completeness_score >= 0) & (g.completeness_score <= 1)).all()
    assert (g.source_count >= 1).all()
    # every golden carries its survivor's spans
    assert g.spans.map(len).min() > 0


def test_vectorized_election_matches_python_kernel(ray_session):
    """The vectorized election kernel must be byte-identical to the
    python reference kernel on a real member table (every rule in the
    default config, all orders/tie-breaks exercised)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from payor_linkage.blocking import blocking_pairs
    from payor_linkage.cluster import build_match_groups
    from payor_linkage.decide import decide
    from payor_linkage.normalize import unify
    from payor_linkage.rayutil import lookup_join
    from payor_linkage.scoring import score_pairs
    from payor_linkage.survivorship import (SurvivorshipConfig,
                                            _make_golden_runs_py,
                                            make_golden_runs_vec)
    from payor_linkage.synth import synth_documents

    unified = unify(synth_documents(3)).materialize()
    cands = decide(score_pairs(blocking_pairs(unified).materialize())) \
        .materialize()
    groups = build_match_groups(cands, unified).materialize()
    slim = [c for c in unified.schema().names if c != "spans_json"]
    members = lookup_join(unified.select_columns(slim), groups,
                          on="source_record_id")

    def precast(b):
        loaded = pc.cast(b["loaded_at"], pa.int64())
        return b.drop_columns(["loaded_at"]).append_column(
            "loaded_us", loaded)

    tbl = pa.concat_tables(
        ray.get(members.map_batches(precast, batch_format="pyarrow")
                .materialize().to_arrow_refs()),
        promote_options="default").sort_by("match_group_id") \
        .combine_chunks()
    arr = tbl["match_group_id"].to_numpy(zero_copy_only=False)
    starts = np.nonzero(np.concatenate([[True], arr[1:] != arr[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(arr)]])

    cfg = SurvivorshipConfig()
    vec = make_golden_runs_vec(cfg, with_spans=False)(tbl, starts, ends)
    ref = _make_golden_runs_py(cfg, with_spans=False)(tbl, starts, ends)
    assert vec.schema == ref.schema
    assert vec.equals(ref)
    # interior-slice form (grouped_apply passes run subsets)
    if len(starts) > 4:
        vec2 = make_golden_runs_vec(cfg, with_spans=False)(
            tbl, starts[1:-1], ends[1:-1])
        ref2 = _make_golden_runs_py(cfg, with_spans=False)(
            tbl, starts[1:-1], ends[1:-1])
        assert vec2.equals(ref2)


def test_medoid_name_matches_duckdb_reference(ray_session, pipeline_result):
    """Medoid election equals an independent DuckDB self-join argmax
    (same JW kernel, floor micro-quantized integer sums) on the real
    match groups; singletons return their own name at total 0."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from payor_linkage.rayutil import lookup_join
    from payor_linkage.survivorship import medoid_name

    res = pipeline_result
    got = (medoid_name(res.groups, res.unified).to_pandas()
           .sort_values("match_group_id").reset_index(drop=True))

    members = lookup_join(
        res.groups.select_columns(["source_record_id", "match_group_id"]),
        res.unified.select_columns(["source_record_id",
                                    "payor_name_clean"]),
        on="source_record_id").map_batches(
        lambda b: pa.table({
            "g": b["match_group_id"], "rid": b["source_record_id"],
            "name": pc.fill_null(
                pc.cast(b["payor_name_clean"], pa.string()), "")}),
        batch_format="pyarrow").to_pandas()
    con = duckdb.connect()
    con.register("m", members)
    want = con.execute("""
        WITH p AS (SELECT a.g, a.rid, a.name,
                          CAST(FLOOR(jaro_winkler_similarity(a.name,
                              b.name) * 1000000) AS BIGINT) AS s
                   FROM m a JOIN m b USING (g) WHERE a.rid <> b.rid),
        sums AS (SELECT g, rid, name, SUM(s) AS tot FROM p GROUP BY 1,2,3),
        allm AS (SELECT m.g, m.rid, m.name,
                        CAST(COALESCE(s.tot, 0) AS BIGINT) AS tot
                 FROM m LEFT JOIN sums s USING (g, rid)),
        pick AS (SELECT g, name, tot, row_number() OVER (
                     PARTITION BY g ORDER BY tot DESC, name ASC) AS rn
                 FROM allm)
        SELECT g AS match_group_id, name AS medoid_name,
               tot AS total_sim_micro
        FROM pick WHERE rn = 1 ORDER BY g""").df()
    con.close()
    pd.testing.assert_frame_equal(got, want)
    # medoid is always a member name; singleton groups score 0
    sizes = members.groupby("g").size()
    singles = set(sizes[sizes == 1].index)
    s = got[got.match_group_id.isin(singles)]
    assert (s["total_sim_micro"] == 0).all()

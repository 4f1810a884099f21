"""Steward serving helpers + telemetry + audit metrics tests."""

import pytest


def test_review_queue_sorted(pipeline_result):
    from payor_linkage.steward import review_queue

    q = review_queue(pipeline_result.candidates).to_pandas()
    assert (q.auto_decision == "review").all()
    assert (q.overall_score.to_numpy()[:-1] >= q.overall_score.to_numpy()[1:]).all()


def test_review_queue_excludes_decided(ray_session, pipeline_result):
    from payor_linkage.steward import record_decisions, review_queue

    q = review_queue(pipeline_result.candidates).to_pandas()
    if len(q) == 0:
        pytest.skip("no review candidates")
    overlay = record_decisions([{
        "candidate_id": q.iloc[0].candidate_id,
        "steward_decision": "confirmed_no_match",
    }])
    q2 = review_queue(pipeline_result.candidates, overlay).to_pandas()
    assert q.iloc[0].candidate_id not in set(q2.candidate_id)
    assert len(q2) == len(q) - 1


def test_record_decisions_appends(ray_session):
    from payor_linkage.steward import record_decisions

    o1 = record_decisions([{"candidate_id": "c1", "steward_decision": "confirmed_match"}])
    o2 = record_decisions([{"candidate_id": "c2",
                            "steward_decision": "confirmed_no_match"}], o1)
    df = o2.to_pandas()
    assert set(df.candidate_id) == {"c1", "c2"}


def test_strategy_performance_counts(pipeline_result):
    from payor_linkage.steward import strategy_performance

    sp = strategy_performance(pipeline_result.candidates).to_pandas()
    assert (sp.times_selected >= sp.times_won).all()
    known = {"NAME_JW", "NAME_TSR", "NAME_PHO", "NAME_ABR", "NAME_NGR",
             "ADDR_JAC", "ADDR_CMP", "ADDR_NRM", "TIN_EXACT", "TIN_TRANS",
             "PHONE_E164", "PHONE_L7", "CMS_EXACT", "CMS_PFX"}
    assert set(sp.strategy) <= known
    assert sp.times_selected.sum() > 0


def test_score_histogram(pipeline_result):
    from payor_linkage.audit import score_histogram

    import pyarrow.compute as pc

    cand = pipeline_result.candidates
    h = score_histogram(cand).to_pandas()
    nonnull = cand.map_batches(
        lambda b: b.filter(pc.is_valid(b["overall_score"])),
        batch_format="pyarrow").count()
    # WIDTH_BUCKET semantics: null scores dropped, buckets 0..11
    assert h["count()"].sum() == nonnull
    assert h.score_bucket.between(0, 11).all()
    # DET-* pairs score exactly 1.0 → upper-overflow bucket 11 must exist
    det = cand.map_batches(
        lambda b: b.filter(pc.equal(pc.coalesce(b["overall_score"], -1.0), 1.0)),
        batch_format="pyarrow").count()
    if det:
        assert 11 in set(h.score_bucket)


def test_pipeline_metrics(pipeline_result):
    from payor_linkage.audit import pipeline_metrics

    m = pipeline_metrics(pipeline_result.unified, pipeline_result.candidates,
                         pipeline_result.groups, pipeline_result.golden,
                         block_counts=pipeline_result.block_counts)
    assert m["records"] == pipeline_result.unified.count()
    assert m["blocking"]["keys"] > 0
    assert m["blocking"]["parked_keys"] >= 0
    assert set(m["records_per_source"]) == {"crm", "claims", "credentialing",
                                            "cms_reference"}
    assert sum(m["decisions"].values()) == m["candidates"]
    assert m["groups"] == pipeline_result.golden.count()


def test_source_field_completeness(pipeline_result):
    from payor_linkage.audit import source_field_completeness

    c = source_field_completeness(pipeline_result.unified,
                                  ["tax_id", "phone", "cms_plan_id"]).to_pandas()
    assert set(c.source_system) == {"crm", "claims", "credentialing", "cms_reference"}
    assert (c.nn_tax_id <= c.total).all()
    # reference feed never has phone (stg_reference_payors.sql:43)
    ref = c[c.source_system == "cms_reference"].iloc[0]
    assert ref.nn_phone == 0


def test_sort_paginate_pages_partition_sorted_rows(ray_session):
    import ray.data as rd

    from payor_linkage.audit import sort_paginate

    ds = rd.from_items([{"k": f"id_{i:04d}", "v": i} for i in range(200)])
    page = sort_paginate(ds, "k", limit=30, offset=50,
                         descending=True).to_pandas()
    assert list(page.k) == [f"id_{i:04d}" for i in range(149, 119, -1)]
    # ascending page + tail page shorter than limit
    tail = sort_paginate(ds, "k", limit=30, offset=190).to_pandas()
    assert list(tail.k) == [f"id_{i:04d}" for i in range(190, 200)]


def test_blocking_key_stats_move_with_park_threshold(ray_session):
    import ray.data as rd

    from payor_linkage.blocking import blocking_key_stats
    from payor_linkage.config import BlockingConfig

    counts = rd.from_items([
        {"bkey": "tax|small", "n": 5},
        {"bkey": "tax|hot", "n": 2000},       # salted under defaults
        {"bkey": "tax|mega", "n": 60000},     # above park_key_above=50k
        {"bkey": "pho|buzz", "n": 100},       # above pho cap 32 → salted
    ])
    s = blocking_key_stats(counts, BlockingConfig())
    assert s["keys"] == 4
    assert s["parked_keys"] == 1 and s["parked_records"] == 60000
    assert s["salted_keys"] == 2 and s["salted_records"] == 2100

    # tightening park_key_above moves keys from salted to parked
    tight = blocking_key_stats(counts, BlockingConfig(park_key_above=1000))
    assert tight["parked_keys"] == 2 and tight["parked_records"] == 62000
    assert tight["salted_keys"] == 1 and tight["salted_records"] == 100

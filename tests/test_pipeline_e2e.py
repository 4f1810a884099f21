"""End-to-end gates: pairwise F1, determinism, span fidelity, grain
invariants, orphan-free xref (SURVEY §5, FIXTURES.md §4)."""

import pytest


def test_pairwise_f1_replica0_perfect(pipeline_result):
    """North rule: F1 ≥ 0.99 on labeled pairs within shared blocking keys.
    The seeded replica-0 corpus must separate perfectly."""
    from payor_linkage.blocking import blocking_pairs
    from payor_linkage.evaluate import pairwise_f1

    pairs = blocking_pairs(pipeline_result.unified).to_pandas()
    labels = pipeline_result.unified.select_columns(
        ["source_record_id", "entity_id"]).to_pandas()
    groups = pipeline_result.groups.to_pandas()
    res = pairwise_f1(pairs, labels, groups)
    assert res["f1"] >= 0.99, res


def test_grain_invariants(pipeline_result):
    uni = pipeline_result.unified.select_columns(["source_record_id"]).to_pandas()
    assert uni.source_record_id.is_unique

    cands = pipeline_result.candidates.to_pandas()
    assert (cands.source_record_id_a < cands.source_record_id_b).all()
    assert not cands.duplicated(["source_record_id_a", "source_record_id_b"]).any()
    assert cands.candidate_id.is_unique

    groups = pipeline_result.groups.to_pandas()
    assert groups.source_record_id.is_unique          # one group per record
    per_group = groups.groupby("match_group_id").is_survivor.sum()
    assert (per_group == 1).all()                      # exactly one survivor


def test_decision_enums(pipeline_result):
    cands = pipeline_result.candidates.to_pandas()
    assert set(cands.auto_decision) <= {"auto_match", "review", "auto_no_match"}
    assert set(cands.final_decision) <= {"match", "no_match"}
    assert set(cands.match_rule) <= {"DET-1", "DET-2", "DET-3", "FUZZY"}
    det = cands[cands.match_rule != "FUZZY"]
    assert (det.overall_score == 1.0).all()
    assert (det.auto_decision == "auto_match").all()


def test_xref_orphan_free(pipeline_result):
    """Port of tests/assert_no_orphan_source_records.sql — every staged
    record appears in xref exactly once."""
    x = pipeline_result.xref.to_pandas()
    n = pipeline_result.unified.count()
    assert len(x) == n and x.source_record_id.is_unique
    golden_ids = set(pipeline_result.golden.to_pandas().master_payor_id)
    assert set(x.master_payor_id) <= golden_ids        # FK xref → golden


def test_hierarchy_fk_and_no_self_loops(pipeline_result):
    h = pipeline_result.hierarchy.to_pandas()
    golden_ids = set(pipeline_result.golden.to_pandas().master_payor_id)
    assert set(h.parent_master_id) <= golden_ids
    assert set(h.child_master_id) <= golden_ids
    assert (h.parent_master_id != h.child_master_id).all()
    assert set(h["source"]) <= {"name_ref_match", "name_substring"}
    assert (~h.steward_confirmed).all()


def test_span_fidelity(pipeline_result, corpus_table):
    """Per-row invariant: every surviving row's (kind, text, media_ref,
    order) sequence equals its source document's exactly."""
    import json

    src = {r["doc_id"]: r["spans"] for r in corpus_table.to_pylist()}
    uni = pipeline_result.unified.select_columns(
        ["source_record_id", "spans_json"]).to_pandas()
    for rid, spans_json in zip(uni.source_record_id, uni.spans_json):
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in json.loads(spans_json)]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in src[rid]]
        assert got == want, rid
    # golden rows carry the survivor document's spans verbatim
    g = pipeline_result.golden.select_columns(
        ["survivor_record_id", "spans"]).to_pandas()
    for rid, spans in zip(g.survivor_record_id, g.spans):
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in src[rid]]
        assert got == want, rid


def test_determinism_two_runs(ray_session, pipeline_result):
    """Second full run → identical golden + xref tables (byte-compare)."""
    from payor_linkage.pipeline import run_linkage
    from payor_linkage.synth import synth_documents

    res2 = run_linkage(synth_documents(1))
    for attr, key in [("golden", "master_payor_id"), ("xref", "source_record_id"),
                      ("groups", "source_record_id")]:
        a = getattr(pipeline_result, attr).to_pandas().sort_values(key).reset_index(drop=True)
        b = getattr(res2, attr).to_pandas().sort_values(key).reset_index(drop=True)
        a = a.drop(columns=["spans"], errors="ignore")
        b = b.drop(columns=["spans"], errors="ignore")
        assert a.equals(b), attr


def test_steward_loop_changes_outcome(ray_session):
    """The designed review-band case: steward confirms → clusters merge
    on the rerun (the reference's S10 downstream rebuild semantics)."""
    import ray.data as rd

    from payor_linkage.pipeline import run_linkage
    from payor_linkage.synth import synth_documents

    docs = synth_documents(1)
    base = run_linkage(docs)
    cands = base.candidates.to_pandas()
    g1_map = base.groups.to_pandas().set_index("source_record_id").match_group_id
    review = cands[cands.auto_decision == "review"]
    # pick a review pair whose endpoints are NOT already transitively merged
    review = review[review.apply(
        lambda r: g1_map[r.source_record_id_a] != g1_map[r.source_record_id_b], axis=1)]
    if len(review) == 0:
        pytest.skip("no unmerged review-band candidates in this corpus")
    pick = review.iloc[0]
    overlay = rd.from_items([{
        "candidate_id": pick.candidate_id,
        "steward_decision": "confirmed_match",
        "steward_user": "tester", "steward_notes": "", }])
    res2 = run_linkage(docs, steward_overlay=overlay)
    g1 = base.groups.to_pandas().set_index("source_record_id").match_group_id
    g2 = res2.groups.to_pandas().set_index("source_record_id").match_group_id
    a, b = pick.source_record_id_a, pick.source_record_id_b
    assert g1[a] != g1[b]
    assert g2[a] == g2[b]
    # audit log records the steward decision
    audit = res2.audit.to_pandas()
    assert (audit.action == "steward_decision").any()


def test_full_pipeline_without_parent_refs(ray_session):
    """A corpus where no record carries a parent_ref must run end-to-end
    (the hierarchy stage used to crash Ray's hash join on the empty
    filtered side — ADVICE r1)."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.pipeline import run_linkage
    from payor_linkage.schema import DOCUMENT_SCHEMA

    def doc(doc_id, name, state):
        spans, off = [], 0
        for k, v in [("source_system", "crm"), ("payor_name", name),
                     ("state", state), ("status", "active")]:
            spans.append({"kind": k, "text": v, "media_ref": "", "offset": off})
            off += len(v) + 1
        return {"doc_id": doc_id, "spans": spans}

    docs = rd.from_arrow(pa.Table.from_pylist([
        doc("crm:R1", "Acme Health Plan", "CA"),
        doc("crm:R2", "Acme Health Plan", "CA"),
        doc("crm:R3", "Zenith Insurance Co", "NY"),
    ], schema=DOCUMENT_SCHEMA))
    res = run_linkage(docs)
    assert res.golden.count() == 2          # R1+R2 merge (DET-3), R3 alone
    assert res.hierarchy.count() >= 0       # stage completes, possibly empty
    assert res.xref.count() == 3


def test_full_pipeline_no_matches(ray_session):
    """All-distinct corpus: every record becomes its own golden row."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.pipeline import run_linkage
    from payor_linkage.schema import DOCUMENT_SCHEMA

    names = ["Quartz Benefits Group", "Meridian Trust Health", "Kodiak Care Alliance",
             "Sable Point Insurance", "Foxglove Medical Plan", "Iron Harbor Payors"]

    def doc(i):
        spans = [{"kind": "source_system", "text": "claims", "media_ref": "", "offset": 0},
                 {"kind": "payor_name", "text": names[i], "media_ref": "", "offset": 10}]
        return {"doc_id": f"claims:U{i}", "spans": spans}

    docs = rd.from_arrow(pa.Table.from_pylist(
        [doc(i) for i in range(6)], schema=DOCUMENT_SCHEMA))
    res = run_linkage(docs)
    assert res.golden.count() == 6
    assert res.xref.count() == 6


def test_hierarchy_distributed_parity(pipeline_result, monkeypatch):
    """The shuffle-join signal fallback (golden count above the broadcast
    bound) must produce byte-identical edges to the broadcast-index path."""
    import payor_linkage.hierarchy as H

    monkeypatch.setattr(H, "BROADCAST_GOLDEN_BOUND", 0)
    dist = H.infer_hierarchy(
        pipeline_result.golden, pipeline_result.unified,
        pipeline_result.xref).to_pandas()
    base = pipeline_result.hierarchy.to_pandas()
    key = ["parent_master_id", "child_master_id", "source"]
    a = dist.sort_values(key).reset_index(drop=True)
    b = base.sort_values(key).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_incremental_matches_full(ray_session):
    """incremental_update(prior, delta) must equal a fresh full run on
    the combined corpus — candidates, groups, golden and xref all
    byte-equal (sorted) — while scoring only a fraction of the pairs."""
    import zlib

    import pandas as pd
    import pyarrow as pa

    from payor_linkage.blocking import delta_blocking_pairs
    from payor_linkage.pipeline import incremental_update, run_linkage
    from payor_linkage.synth import synth_documents

    docs = synth_documents(2).materialize()

    def split(keep_new: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_pylist()
            m = [zlib.crc32(str(i).encode()) % 7 == 0 for i in ids]
            if not keep_new:
                m = [not x for x in m]
            return b.filter(pa.array(m))
        return docs.map_batches(f, batch_format="pyarrow").materialize()

    old_docs, new_docs = split(False), split(True)
    n_new = new_docs.count()
    assert 0 < n_new < docs.count() // 3

    prior = run_linkage(old_docs)
    inc = incremental_update(prior, new_docs)
    full = run_linkage(docs)

    def canon(ds, drop=()):
        df = ds.to_pandas()
        df = df[[c for c in sorted(df.columns) if c not in drop]]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name, a, b, drop in [
            ("candidates", inc.candidates, full.candidates, ()),
            ("groups", inc.groups, full.groups, ()),
            ("golden", inc.golden, full.golden, ("spans",)),
            ("xref", inc.xref, full.xref, ()),
            ("hierarchy", inc.hierarchy, full.hierarchy, ())]:
        pd.testing.assert_frame_equal(canon(a, drop), canon(b, drop),
                                      check_dtype=False, obj=name)

    # the point of incrementality: the delta scored far fewer pairs
    old_ids = set(prior.unified.unique("source_record_id"))
    new_ids = [r for r in inc.unified.unique("source_record_id")
               if r not in old_ids]
    n_delta = delta_blocking_pairs(inc.unified, new_ids).count()
    n_full = full.candidates.count()
    assert n_delta < 0.6 * n_full, (n_delta, n_full)


def test_incremental_two_generations(ray_session):
    """Chained increments: gen-1's LinkageResult (including its carried
    block_counts state) feeds gen-2, and the final tables are byte-equal
    to one full run over all three corpus slices — the daily-landing
    regime where incremental state must survive across generations."""
    import zlib

    import pandas as pd
    import pyarrow as pa

    from payor_linkage.pipeline import incremental_update, run_linkage
    from payor_linkage.synth import synth_documents

    docs = synth_documents(2).materialize()

    def split(which: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_pylist()
            h = [zlib.crc32(str(i).encode()) % 11 for i in ids]
            if which == 0:
                m = [x >= 4 for x in h]       # ~64% base
            elif which == 1:
                m = [x in (0, 1) for x in h]  # ~18% delta A
            else:
                m = [x in (2, 3) for x in h]  # ~18% delta B
            return b.filter(pa.array(m))
        return docs.map_batches(f, batch_format="pyarrow").materialize()

    base, delta_a, delta_b = split(0), split(1), split(2)
    assert delta_a.count() and delta_b.count()

    gen0 = run_linkage(base)
    gen1 = incremental_update(gen0, delta_a)
    assert gen1.block_counts is not None
    gen2 = incremental_update(gen1, delta_b)
    full = run_linkage(docs)

    def canon(ds, drop=()):
        df = ds.to_pandas()
        df = df[[c for c in sorted(df.columns) if c not in drop]]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name, a, b, drop in [
            ("candidates", gen2.candidates, full.candidates, ()),
            ("groups", gen2.groups, full.groups, ()),
            ("golden", gen2.golden, full.golden, ("spans",)),
            ("xref", gen2.xref, full.xref, ()),
            ("hierarchy", gen2.hierarchy, full.hierarchy, ())]:
        pd.testing.assert_frame_equal(canon(a, drop), canon(b, drop),
                                      check_dtype=False, obj=name)


def test_incremental_supernode_path(ray_session):
    """Clustered delta (whole new replica worlds — the realistic
    maintenance drop) must take the SUPERNODE incremental path: only
    delta-touched components are rebuilt, no full-graph CC — and every
    output table still byte-equals a fresh full run on the combined
    corpus. Also checks chained state: the returned block_counts equal
    a fresh count over the combined corpus."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from payor_linkage.cluster import incremental_match_groups
    from payor_linkage.pipeline import incremental_update, run_linkage
    from payor_linkage.synth import synth_documents

    docs = synth_documents(3).materialize()

    def split(keep_new: bool):
        def f(b: pa.Table) -> pa.Table:
            loc = pc.list_element(pc.split_pattern(b["doc_id"], ":"), 1)
            isr = pc.match_substring_regex(loc, r"^R[0-9]{5}-")
            w = pc.cast(pc.if_else(
                isr, pc.utf8_slice_codeunits(loc, 1, 6), "0"), pa.int64())
            m = pc.greater_equal(w, 2)
            return b.filter(m if keep_new else pc.invert(m))
        return docs.map_batches(f, batch_format="pyarrow").materialize()

    old_docs, new_docs = split(False), split(True)
    assert 0 < new_docs.count() < docs.count() // 2

    prior = run_linkage(old_docs)
    assert prior.block_counts is not None
    inc = incremental_update(prior, new_docs)
    full = run_linkage(docs)

    # the clustered delta must be eligible for the supernode path
    from payor_linkage.normalize import unify
    unified_new = unify(new_docs).materialize()
    new_ids = unified_new.unique("source_record_id")
    from payor_linkage.blocking import delta_blocking_pairs
    from payor_linkage.decide import decide
    from payor_linkage.scoring import score_pairs
    pairs_delta = delta_blocking_pairs(
        prior.unified.union(unified_new).materialize(), new_ids,
        unified_new=unified_new, prior_counts=prior.block_counts)
    cands_delta = decide(score_pairs(pairs_delta)).materialize()
    sub = incremental_match_groups(
        prior.groups, prior.candidates, cands_delta,
        prior.unified.union(unified_new), new_ids)
    assert sub is not None, "clustered delta should take the supernode path"

    def canon(ds, drop=()):
        df = ds.to_pandas()
        df = df[[c for c in sorted(df.columns) if c not in drop]]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name, a, b, drop in [
            ("candidates", inc.candidates, full.candidates, ()),
            ("groups", inc.groups, full.groups, ()),
            ("golden", inc.golden, full.golden, ("spans",)),
            ("xref", inc.xref, full.xref, ()),
            ("hierarchy", inc.hierarchy, full.hierarchy, ())]:
        pd.testing.assert_frame_equal(canon(a, drop), canon(b, drop),
                                      check_dtype=False, obj=name)

    # chained blocking state: incremental counts == fresh combined counts
    assert inc.block_counts is not None
    pd.testing.assert_frame_equal(
        canon(inc.block_counts), canon(full.block_counts), obj="counts")


import pytest


@pytest.mark.parametrize("mode", ["all_distributed", "crossover"])
def test_incremental_distributed_fallback_parity(ray_session, monkeypatch,
                                                 mode):
    """Force the incremental driver tiers ABOVE their bounds:
    ``all_distributed`` zeroes every bound (distributed counts merge,
    distributed group probes, distributed subgraph CC, streamed
    Dataset patch kernels, distributed hierarchy signal legs);
    ``crossover`` keeps the groups-probe driver tier but forces the
    subgraph past INCR_LOCAL_ROWS_BOUND (the fall-through band where
    driver-tier probes feed the distributed build). Outputs must
    byte-equal a fresh full run either way — the tiers are pure
    execution strategy, never semantics."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from payor_linkage import blocking as B
    from payor_linkage import cluster as C
    from payor_linkage.pipeline import incremental_update, run_linkage
    from payor_linkage.synth import synth_documents

    monkeypatch.setattr(C, "INCR_LOCAL_ROWS_BOUND", 0)
    if mode == "all_distributed":
        monkeypatch.setattr(B, "_TOUCHED_LOCAL_BOUND", 0)
        monkeypatch.setattr(B, "_PAIRS_LOCAL_BOUND", 0)
        monkeypatch.setattr(C, "_GROUPS_LOCAL_ROWS_BOUND", 0)

    docs = synth_documents(3).materialize()

    def split(keep_new: bool):
        def f(b: pa.Table) -> pa.Table:
            loc = pc.list_element(pc.split_pattern(b["doc_id"], ":"), 1)
            isr = pc.match_substring_regex(loc, r"^R[0-9]{5}-")
            w = pc.cast(pc.if_else(
                isr, pc.utf8_slice_codeunits(loc, 1, 6), "0"), pa.int64())
            m = pc.greater_equal(w, 2)
            return b.filter(m if keep_new else pc.invert(m))
        return docs.map_batches(f, batch_format="pyarrow").materialize()

    old_docs, new_docs = split(False), split(True)
    prior = run_linkage(old_docs)
    inc = incremental_update(prior, new_docs)
    full = run_linkage(docs)

    def canon(ds, drop=()):
        df = ds.to_pandas()
        df = df[[c for c in sorted(df.columns) if c not in drop]]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name, a, b, drop in [
            ("candidates", inc.candidates, full.candidates, ()),
            ("groups", inc.groups, full.groups, ()),
            ("golden", inc.golden, full.golden, ("spans",)),
            ("xref", inc.xref, full.xref, ()),
            ("hierarchy", inc.hierarchy, full.hierarchy, ())]:
        pd.testing.assert_frame_equal(canon(a, drop), canon(b, drop),
                                      check_dtype=False, obj=name)


def test_incremental_with_steward_overlay(ray_session):
    """The incremental path honors a steward overlay identically to a
    full run: candidate ids are pair-content uuid5s, so the same overlay
    applies to both paths and all outputs stay byte-equal."""
    import zlib

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.pipeline import incremental_update, run_linkage
    from payor_linkage.synth import synth_documents

    docs = synth_documents(1).materialize()

    def split(keep_new: bool):
        def f(b: pa.Table) -> pa.Table:
            m = [(zlib.crc32(str(i).encode()) % 7 == 0) == keep_new
                 for i in b["doc_id"].to_pylist()]
            return b.filter(pa.array(m))
        return docs.map_batches(f, batch_format="pyarrow").materialize()

    old_docs, new_docs = split(False), split(True)
    base_full = run_linkage(docs)
    cands = base_full.candidates.to_pandas()
    review = cands[cands.auto_decision == "review"]
    if len(review) == 0:
        pytest.skip("no review-band candidates in this corpus")
    pick = review.iloc[0]
    overlay = rd.from_items([{
        "candidate_id": pick.candidate_id,
        "steward_decision": "confirmed_match",
        "steward_user": "tester", "steward_notes": "", }])

    prior = run_linkage(old_docs, steward_overlay=overlay)
    inc = incremental_update(prior, new_docs, steward_overlay=overlay)
    full = run_linkage(docs, steward_overlay=overlay)

    def canon(ds, drop=()):
        df = ds.to_pandas()
        df = df[[c for c in sorted(df.columns) if c not in drop]]
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for name, a, b, drop in [
            ("candidates", inc.candidates, full.candidates, ()),
            ("groups", inc.groups, full.groups, ()),
            ("golden", inc.golden, full.golden, ("spans",)),
            ("xref", inc.xref, full.xref, ()),
            ("hierarchy", inc.hierarchy, full.hierarchy, ())]:
        pd.testing.assert_frame_equal(canon(a, drop), canon(b, drop),
                                      check_dtype=False, obj=name)

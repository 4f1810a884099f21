"""Blocking, scoring and decision stage tests (J1, C1-C4, T1-T3)."""

import pyarrow as pa
import pytest

from payor_linkage.blocking import (_is_degenerate_key, _key_rows_batch,
                                    _salt_batch, make_pair_emitter)
from payor_linkage.decide import candidate_uuid, decide
from payor_linkage.schema import PAIR_PAYLOAD_FIELDS
from payor_linkage.scoring import EnsembleScorer


def _unified_rows(rows):
    cols = {"source_record_id": [], "block_tax_id": [], "block_name_key": [],
            "block_zip3_name4": [], "block_phonetic": []}
    for f in PAIR_PAYLOAD_FIELDS:
        cols[f] = []
    for r in rows:
        cols["source_record_id"].append(r["id"])
        cols["block_tax_id"].append(r.get("tax"))
        cols["block_name_key"].append(r.get("namekey", "XX"))
        cols["block_zip3_name4"].append(r.get("zipkey", "XXX"))
        cols["block_phonetic"].append(r.get("pho"))
        for f in PAIR_PAYLOAD_FIELDS:
            cols[f].append(r.get(f))
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def test_key_rows_tax_guard():
    t = _unified_rows([
        {"id": "a", "tax": "123"}, {"id": "b", "tax": ""}, {"id": "c", "tax": None}])
    kr = _key_rows_batch(t, use_phonetic=False).to_pylist()
    tax_rows = [r for r in kr if r["bkey"].startswith("tax|")]
    assert [r["source_record_id"] for r in tax_rows] == ["a"]  # empty/null excluded
    # name/zip keys always emitted
    assert sum(r["bkey"].startswith("name|") for r in kr) == 3
    assert sum(r["bkey"].startswith("zip|") for r in kr) == 3


def test_emit_pairs_canonical_and_complete():
    g = _key_rows_batch(_unified_rows(
        [{"id": x, "namekey": "SAMEKY"} for x in ["r3", "r1", "r2"]]),
        use_phonetic=False)
    g = g.filter(pa.compute.starts_with(g["bkey"], "name|"))
    pairs = make_pair_emitter({})(g).to_pylist()
    keys = {(p["source_record_id_a"], p["source_record_id_b"]) for p in pairs}
    assert keys == {("r1", "r2"), ("r1", "r3"), ("r2", "r3")}  # a<b, all pairs


def test_emit_pairs_precedence_no_duplicates():
    """A pair sharing tax AND name keys is emitted only by the tax group
    (minimum common key wins) — the SELECT DISTINCT without a shuffle."""
    rows = [{"id": "a", "tax": "123456789", "namekey": "SAMEKY",
             "tax_id": "123456789"},
            {"id": "b", "tax": "123456789", "namekey": "SAMEKY",
             "tax_id": "123456789"}]
    kr = _key_rows_batch(_unified_rows(rows), use_phonetic=False)
    emit = make_pair_emitter({})
    tax_group = kr.filter(pa.compute.starts_with(kr["bkey"], "tax|"))
    name_group = kr.filter(pa.compute.starts_with(kr["bkey"], "name|"))
    assert emit(tax_group).num_rows == 1
    assert emit(name_group).num_rows == 0  # name group defers to tax


def test_degenerate_keys():
    assert _is_degenerate_key("name|XX")
    assert _is_degenerate_key("name|CA")
    assert not _is_degenerate_key("name|ACME90CA")
    assert _is_degenerate_key("zip|123")
    assert not _is_degenerate_key("zip|123ACME")
    assert not _is_degenerate_key("tax|123456789")


def test_salting_bounds_blocks_and_keeps_liaison():
    rows = [{"id": f"r{i:03d}", "namekey": "HOTKEY9"} for i in range(50)]
    t = _key_rows_batch(_unified_rows(rows), use_phonetic=False)
    t = t.filter(pa.compute.starts_with(t["bkey"], "name|"))
    salted = _salt_batch(t, {"name|HOTKEY9": 5})  # 5 salt sub-blocks
    keys = salted["bkey"].to_pylist()
    import collections
    counts = collections.Counter(keys)
    assert all(k.startswith("name|HOTKEY9#") for k in counts)
    assert "name|HOTKEY9#L" in counts
    non_liaison = {k: c for k, c in counts.items() if not k.endswith("#L")}
    assert len(non_liaison) == 5
    assert max(non_liaison.values()) < 25  # bounded sub-blocks
    # liaison samples ACROSS salts (independent hash), expected ≈ 50/5
    from payor_linkage.blocking import _is_liaison_member, _salt_of
    lia_ids = {f"r{i:03d}" for i in range(50) if _is_liaison_member(f"r{i:03d}", 5)}
    assert counts["name|HOTKEY9#L"] == len(lia_ids)
    lia_salts = {_salt_of(i, 5) for i in lia_ids}
    assert len(lia_salts) > 1  # members from more than one sub-block


def test_salting_parks_degenerate():
    rows = [{"id": f"r{i:03d}", "namekey": "XX"} for i in range(50)]
    t = _key_rows_batch(_unified_rows(rows), use_phonetic=False)
    t = t.filter(pa.compute.starts_with(t["bkey"], "name|"))
    salted = _salt_batch(t, {"name|XX": -1})  # parked
    assert salted.num_rows == 0


def test_blocking_matches_naive_reference_semantics(ray_session):
    """blocking_pairs == the reference self-join's DISTINCT pair set
    (`int_blocking_pairs.sql:11-33`, + phonetic key) on the seeded corpus,
    each pair exactly once."""
    import pandas as pd

    from payor_linkage.blocking import blocking_pairs
    from payor_linkage.normalize import unify
    from payor_linkage.synth import synth_documents

    unified = unify(synth_documents(1)).materialize()
    got = blocking_pairs(unified).to_pandas()
    assert not got.duplicated(["source_record_id_a", "source_record_id_b"]).any()

    u = unified.select_columns(
        ["source_record_id", "block_tax_id", "block_name_key",
         "block_zip3_name4", "block_phonetic"]).to_pandas()
    naive = set()
    for col, guard in [("block_tax_id", True), ("block_name_key", False),
                       ("block_zip3_name4", False), ("block_phonetic", True)]:
        s = u[["source_record_id", col]].dropna()
        if guard:
            s = s[s[col] != ""]
        m = s.merge(s, on=col)
        m = m[m.source_record_id_x < m.source_record_id_y]
        naive |= set(zip(m.source_record_id_x, m.source_record_id_y))
    assert set(zip(got.source_record_id_a, got.source_record_id_b)) == naive


def _pair(a="a", b="b", **kw):
    base = {"source_record_id_a": a, "source_record_id_b": b}
    for f in PAIR_PAYLOAD_FIELDS:
        base[f"{f}_a"] = kw.get(f"{f}_a")
        base[f"{f}_b"] = kw.get(f"{f}_b")
    return base


def _score(rows):
    cols = {k: pa.array([r[k] for r in rows], pa.string()) for k in rows[0]}
    return EnsembleScorer()(pa.table(cols)).to_pylist()


def test_det_rules_precedence():
    r = _score([_pair(tax_id_a="123456789", tax_id_b="123456789",
                      cms_plan_id_a="H1", cms_plan_id_b="H1")])[0]
    assert r["match_rule"] == "DET-1" and r["overall_score"] == 1.0
    r = _score([_pair(cms_plan_id_a="H1234", cms_plan_id_b="H1234")])[0]
    assert r["match_rule"] == "DET-2"
    r = _score([_pair(payor_name_clean_a="ACME", payor_name_clean_b="ACME",
                      state_code_a="CA", state_code_b="CA")])[0]
    assert r["match_rule"] == "DET-3"
    # SQL null-equality: both-null names is NOT DET-3
    r = _score([_pair()])[0]
    assert r["match_rule"] == "FUZZY"


def test_address_null_propagation_quirk():
    # address_line_1 null on one side → address not scored even if city present
    r = _score([_pair(payor_name_clean_a="ACME", payor_name_clean_b="ACME",
                      city_a="SPRINGFIELD", city_b="SPRINGFIELD",
                      state_code_a="CA", state_code_b="NY")])[0]
    assert r["score_address"] is None


def test_media_score_column():
    r = _score([_pair(media_fingerprint_a="h1", media_fingerprint_b="h1")])[0]
    assert r["media_score"] == 1.0
    r = _score([_pair(media_fingerprint_a="h1", media_fingerprint_b="h2")])[0]
    assert r["media_score"] == 0.0
    r = _score([_pair(media_fingerprint_a="h1")])[0]
    assert r["media_score"] is None
    # media never alters the reference composite
    r = _score([_pair(payor_name_clean_a="ACME", payor_name_clean_b="ACMEX",
                      media_fingerprint_a="h1", media_fingerprint_b="h1")])[0]
    assert r["overall_score"] == r["score_name"]


def test_decide_thresholds_and_enums(ray_session):
    import ray.data as rd

    rows = [
        _pair("a", "b", tax_id_a="1"*9, tax_id_b="1"*9),               # DET-1 → auto_match
        _pair("c", "d", payor_name_clean_a="ACME CO", payor_name_clean_b="ACME CORP"),  # high name only
        _pair("e", "f", payor_name_clean_a="ALPHA", payor_name_clean_b="OMEGAZZZ"),     # low
    ]
    cols = {k: pa.array([r[k] for r in rows], pa.string()) for k in rows[0]}
    scored = rd.from_arrow(EnsembleScorer()(pa.table(cols)))
    out = decide(scored).to_pandas()
    assert set(out.auto_decision) <= {"auto_match", "review", "auto_no_match"}
    assert set(out.final_decision) <= {"match", "no_match"}
    det = out[out.source_record_id_a == "a"].iloc[0]
    assert det.auto_decision == "auto_match" and det.final_decision == "match"
    low = out[out.source_record_id_a == "e"].iloc[0]
    assert low.final_decision == "no_match"
    # review band maps to no_match without steward
    assert all(out[out.auto_decision == "review"].final_decision == "no_match")


def test_candidate_uuid_deterministic():
    assert candidate_uuid("x", "y") == candidate_uuid("x", "y")
    assert candidate_uuid("x", "y") != candidate_uuid("y", "x")


def test_steward_overlay_override(ray_session):
    import ray.data as rd

    rows = [_pair("a", "b", payor_name_clean_a="ACME HEALTH PLAN",
                  payor_name_clean_b="ACME HEALTH PLAN INC", state_code_a="CA",
                  state_code_b="NY")]
    cols = {k: pa.array([r[k] for r in rows], pa.string()) for k in rows[0]}
    scored = rd.from_arrow(EnsembleScorer()(pa.table(cols)))
    cid = candidate_uuid("a", "b")
    overlay = rd.from_items([{"candidate_id": cid,
                              "steward_decision": "confirmed_match"}])
    out = decide(scored, steward_overlay=overlay).to_pandas()
    assert out.iloc[0].final_decision == "match"

    overlay2 = rd.from_items([{"candidate_id": cid,
                               "steward_decision": "confirmed_no_match"}])
    out2 = decide(scored, steward_overlay=overlay2).to_pandas()
    assert out2.iloc[0].final_decision == "no_match"


def test_blocking_scheme_stats_matches_pandas(ray_session, pipeline_result):
    import pandas as pd

    from payor_linkage.evaluate import BLOCK_SCHEMES, blocking_scheme_stats

    got = blocking_scheme_stats(pipeline_result.unified).to_pandas() \
        .set_index("scheme")
    df = pipeline_result.unified.select_columns(
        BLOCK_SCHEMES + ["entity_id"]).to_pandas()
    for sc in BLOCK_SCHEMES:
        k = df[df[sc].notna()]
        assert got.loc[sc, "n_records"] == len(k)
        assert got.loc[sc, "n_keys"] == k[sc].nunique()
        sizes = k.groupby(sc).size()
        assert got.loc[sc, "sum_pairs"] == int(
            (sizes * (sizes - 1) // 2).sum())
        real = k[k.entity_id != -1]
        cs = real.groupby([sc, "entity_id"]).size()
        assert got.loc[sc, "covered_pairs"] == int(
            (cs * (cs - 1) // 2).sum())

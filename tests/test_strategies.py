"""Unit tests for the similarity strategies — reference semantics to 4
decimals (`/root/reference/snowflake/11_ensemble_udfs.sql`)."""

import math

import pytest

from payor_linkage import strategies as st
from payor_linkage.phonetics import doublemetaphone, jaro_winkler_similarity, soundex


# ── Jaro-Winkler (jellyfish-compatible semantics) ──────────────────────────

def test_jw_identical():
    assert jaro_winkler_similarity("MARTHA", "MARTHA") == 1.0


def test_jw_known_value():
    # classic textbook pair: jaro(MARTHA, MARHTA) = 0.944..., JW = 0.961...
    assert abs(jaro_winkler_similarity("MARTHA", "MARHTA") - 0.9611111) < 1e-6


def test_jw_dixon():
    assert abs(jaro_winkler_similarity("DIXON", "DICKSONX") - 0.8133333) < 1e-6


def test_jw_no_boost_below_07():
    # jaro <= 0.7 → no prefix boost applied
    a, b = "ABCDEF", "ABZZZZZZZZZZZZ"
    from payor_linkage.phonetics import jaro_similarity
    j = jaro_similarity(a, b)
    assert j <= 0.7
    assert jaro_winkler_similarity(a, b) == j


def test_jw_disjoint():
    assert jaro_winkler_similarity("AAAA", "BBBB") == 0.0


# ── Soundex ────────────────────────────────────────────────────────────────

@pytest.mark.parametrize("name,code", [
    ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
    ("Tymczak", "T522"), ("Pfister", "P236"), ("Honeyman", "H555"),
])
def test_soundex_canonical(name, code):
    assert soundex(name) == code


# ── Double Metaphone ───────────────────────────────────────────────────────

@pytest.mark.parametrize("word,primary", [
    ("KAISER", "KSR"), ("AETNA", "ATN"), ("HUMANA", "HMN"),
    ("CIGNA", "SN"), ("ANTHEM", "AN0M"), ("HEALTH", "HL0"),
    ("SMITH", "SM0"), ("SCHMIDT", "XMT"), ("THOMAS", "TMS"),
])
def test_metaphone_primaries(word, primary):
    assert doublemetaphone(word)[0] == primary


def test_metaphone_cross_match():
    # phonetically equal spellings cross-match (NAME_PHO → 1.0)
    assert st.name_pho("KAISER", "KAIZER") == 1.0
    assert st.name_pho("AETNA", "ETNA") in (0.0, 1.0)  # deterministic either way
    assert st.name_pho("KAISER", "HUMANA") == 0.0


# ── Name strategies ────────────────────────────────────────────────────────

def test_name_tsr_token_order_invariant():
    assert st.name_tsr("BLUE CROSS SHIELD", "SHIELD CROSS BLUE") == 1.0


def test_name_abr_expands():
    # BCBS → BLUE CROSS BLUE SHIELD before JW
    assert st.name_abr("BCBS", "BLUE CROSS BLUE SHIELD") == 1.0
    assert st.name_abr("UHC", "UNITEDHEALTHCARE") == 1.0


def test_name_ngr_trigram_cosine():
    assert st.name_ngr("ABCD", "ABCD") == 1.0
    # "ABCDE" {ABC,BCD,CDE} vs "ABCDX" {ABC,BCD,CDX}: dot 2, norms sqrt(3) → 0.6667
    assert st.name_ngr("ABCDE", "ABCDX") == round(2 / 3, 4)
    assert st.name_ngr("AB", "AB") == 1.0  # shorter than n → whole-string gram


# ── Address strategies ─────────────────────────────────────────────────────

def test_addr_jac_stopwords_removed():
    assert st.addr_jac("123 MAIN ST", "123 MAIN STREET") == 1.0
    assert st.addr_jac("123 MAIN ST", "456 OAK AVE") == 0.0


def test_addr_cmp_number_and_name():
    assert st.addr_cmp("123 MAIN ST", "123 MAIN STREET") == 1.0
    # number mismatch halves via weights: (0.3*0 jw(123,456) low + 0.3*1)/0.6
    s = st.addr_cmp("123 MAIN ST", "456 MAIN ST")
    assert 0.4 < s < 0.7


def test_addr_nrm_usps_normalization():
    assert st.addr_nrm("123 MAIN STREET", "123 MAIN ST") == 1.0
    assert st.addr_nrm("500 NORTH OAK AVENUE", "500 N OAK AVE") == 1.0


def test_addr_zip_blend():
    assert st.addr_zip(None, None, "12345", "12345") == 0.5  # zip 1.0*0.5 + jac 0
    assert st.addr_zip(None, None, "12345", "12399") == 0.25  # zip3 0.5*0.5
    assert st.addr_zip(None, None, None, "12345") is None


# ── Identifier strategies ──────────────────────────────────────────────────

def test_taxid_family():
    assert st.taxid_exact("12-3456789", "123456789") == 1.0
    assert st.taxid_transpose("123456789", "123456798") == 0.7  # adjacent swap = 2 diffs
    assert st.taxid_transpose("123456789", "123456780") == 0.9  # 1 diff
    assert st.taxid_transpose("123456789", "123456879") == 0.7  # 2 diffs (swap)
    assert st.taxid_transpose("123456789", "987654321") == 0.0
    assert st.taxid_transpose("12345", "123456") == 0.0  # length mismatch
    assert st.taxid_prefix("123456789", "123956789") == 0.6
    assert st.taxid_prefix("129999999", "121234567") == 0.3
    assert st.taxid_prefix("12345", "99345") == 0.0
    assert st.taxid_prefix("123", "123") is None


def test_phone_family():
    assert st.phone_e164("(555) 123-4567", "1-555-123-4567") == 1.0
    assert st.phone_e164("123-4567", "555-123-4567") == 1.0  # falls to last-7 path
    assert st.phone_last7("999-123-4567", "555-123-4567") == 1.0
    assert st.phone_areacode("555-123-9999", "555-888-9999") == 0.8
    assert st.phone_areacode("555-123-9999", "555-888-0000") == 0.3


def test_cms_family():
    assert st.cms_exact(" h1234 ", "H1234") == 1.0
    assert st.cms_prefix("H1234X", "H1234Y") == 0.85
    assert st.cms_prefix("H123", "H123") == 0.0  # < 5 chars


# ── Routers ────────────────────────────────────────────────────────────────

def test_route_name_abbrev_path():
    score, strat, tried = st.route_name("BCBS OF TEXAS", "BLUE CROSS BLUE SHIELD OF TEXAS")
    assert set(tried) == {"NAME_ABR", "NAME_JW", "NAME_TSR"}
    assert strat == "NAME_ABR" and score == 1.0


def test_route_name_len_ratio_path():
    score, strat, tried = st.route_name("AETNA", "AETNA BETTER HEALTH OF NEW JERSEY")
    assert set(tried) == {"NAME_TSR", "NAME_ABR"}


def test_route_name_short_path_includes_phonetic():
    _, _, tried = st.route_name("KAISER", "KAIZER")
    assert set(tried) == {"NAME_JW", "NAME_PHO", "NAME_NGR"}


def test_route_name_long_path():
    _, _, tried = st.route_name("KAISER FOUNDATION HEALTH PLAN", "KAISER PERMANENTE INSURANCE")
    assert set(tried) == {"NAME_JW", "NAME_NGR"}


def test_route_addr_numeric_vs_pobox():
    _, strat, tried = st.route_addr("123 MAIN ST", "123 MAIN STREET")
    assert set(tried) == {"ADDR_CMP", "ADDR_NRM"}
    _, _, tried = st.route_addr("PO BOX FIVE", "PO BOX SIX")
    assert tried == ["ADDR_JAC"]


# ── Ensemble composite ─────────────────────────────────────────────────────

def test_ensemble_full_match():
    r = st.ensemble_match_score("AETNA", "AETNA", "12-3456789", "123456789",
                                "123 MAIN ST HARTFORD CT 06101", "123 MAIN ST HARTFORD CT 06101",
                                "555-123-4567", "(555) 123-4567", "H5521", "H5521")
    assert r["composite"] == 1.0
    assert r["tax_score"] == 1.0 and r["phone_score"] == 1.0 and r["cms_score"] == 1.0


def test_ensemble_weight_renormalization():
    # only name + tax present: weights renormalize over .35 + .25
    r = st.ensemble_match_score("AETNA", "AETNA", "123456789", "999999999",
                                None, None, None, None, None, None)
    assert r["composite"] == round((1.0 * 0.35 + 0.0 * 0.25) / 0.60, 4)
    assert r["addr_score"] is None and r["phone_score"] is None


def test_ensemble_single_field_is_raw_name():
    r = st.ensemble_match_score("KAISER", "KAIZER", None, None, None, None,
                                None, None, None, None)
    assert r["composite"] == r["name_score"]


def test_ensemble_null_fields():
    r = st.ensemble_match_score(None, None, None, None, None, None, None, None, None, None)
    assert r["composite"] is None and r["strategies_used"] == []


def test_ensemble_tin_trans_strategy_label():
    r = st.ensemble_match_score(None, None, "123456789", "123456780",
                                None, None, None, None, None, None)
    assert r["tax_score"] == 0.9
    assert r["strategies_used"] == ["TIN_TRANS"]


def test_legacy_fuzzy_score():
    r = st.fuzzy_score("AETNA", "AETNA", "123456789", "123456789",
                       None, None, None, None, None, None)
    assert r["composite"] == 1.0

"""Staging-normalizer invariants (N1-N13, U2-U4) on crafted documents."""

import pyarrow as pa
import pytest

from payor_linkage.normalize import normalize_batch
from payor_linkage.schema import DOCUMENT_SCHEMA


def doc(doc_id: str, fields: dict) -> dict:
    spans, off = [], 0
    for k, v in fields.items():
        spans.append({"kind": k, "text": v, "media_ref": "", "offset": off})
        off += max(len(v), 1) + 1
    return {"doc_id": doc_id, "spans": spans}


def norm(docs: list[dict]):
    t = pa.Table.from_pylist(docs, schema=DOCUMENT_SCHEMA)
    return normalize_batch(t).to_pylist()


def test_crm_suffix_strip_and_ids():
    r = norm([doc("crm:CRM-0001", {
        "source_system": "crm", "payor_name": "Acme Health, Inc.",
        "tax_id": "12-3456789", "state": "California", "zip": "94105-1234",
        "phone": "(415) 555-1234", "status": "active",
        "effective_date": "2020-01-01",
    })])[0]
    assert r["source_record_id"] == "crm:CRM-0001"
    assert r["source_id"] == "CRM-0001"
    assert r["payor_name_clean"] == "ACME HEALTH"
    assert r["tax_id"] == "123456789"
    assert r["state_code"] == "CA"  # N8: left-2 of trimmed state, uppered
    assert r["zip_code"] == "94105" and r["zip_plus_4"] == "1234"
    assert r["phone"] == "4155551234"
    assert r["is_active"] is True
    assert str(r["effective_date"]) == "2020-01-01"
    assert r["source_trust_rank"] == 1


def test_crm_pc_suffix_only_crm():
    # P.C. stripped in crm regex, not in claims regex
    crm = norm([doc("crm:CRM-0002", {"source_system": "crm", "payor_name": "Smith P.C."})])[0]
    clm = norm([doc("claims:CLM-0002", {"source_system": "claims", "payor_name": "Smith P.C."})])[0]
    assert crm["payor_name_clean"] == "SMITH"
    assert clm["payor_name_clean"] == "SMITH P.C."


def test_cred_health_suffix():
    r = norm([doc("cred:CRED-0001", {
        "source_system": "credentialing", "payor_name": "Acme Health",
        "status": "in_network",
    })])[0]
    assert r["payor_name_clean"] == "ACME"  # cred strips trailing 'Health'
    assert r["is_active"] is True
    assert r["source_trust_rank"] == 2


def test_claims_single_line_address_parse():
    # address_line_1 extracted ONLY when city span is absent (null)
    r = norm([doc("claims:CLM-0001", {
        "source_system": "claims", "payor_name": "ACME HEALTH",
        "address_single_line": "123 Main St, Springfield, Illinois, 62704",
        "state": "illinois", "zip": "62704",
    })])[0]
    assert r["address_line_1"] == "123 Main St"
    assert r["city"] == "SPRINGFIELD"     # fallback from part 2
    assert r["state_code"] == "IL"        # N7 full-name map, case-insensitive
    assert r["source_trust_rank"] == 3

    r2 = norm([doc("claims:CLM-0002", {
        "source_system": "claims", "payor_name": "ACME",
        "address_single_line": "123 Main St, Springfield, IL, 62704",
        "city": "Springfield",
    })])[0]
    assert r2["address_line_1"] is None   # city present → no parse (the quirk)
    assert r2["city"] == "SPRINGFIELD"


def test_claims_state_passthrough_2char_only():
    r = norm([doc("claims:CLM-0003", {"source_system": "claims",
                                      "payor_name": "X", "state": "Texas"})])[0]
    assert r["state_code"] == "TX"
    r = norm([doc("claims:CLM-0004", {"source_system": "claims",
                                      "payor_name": "X", "state": "TEX"})])[0]
    assert r["state_code"] is None  # not a name, not 2 chars → null


def test_reference_feed_constants():
    r = norm([doc("ref:REF-0001", {
        "source_system": "cms_reference", "payor_name": "Acme Health Ltd",
        "parent_ref": "Mega Corp", "cms_plan_id": "h1234",
    })])[0]
    assert r["payor_name_clean"] == "ACME HEALTH"
    assert r["is_active"] is True  # constant true for reference feed
    assert r["cms_plan_id"] == "H1234"
    assert r["parent_ref"] == "Mega Corp"
    assert r["source_trust_rank"] == 4


def test_blocking_keys():
    r = norm([doc("crm:CRM-0009", {
        "source_system": "crm", "payor_name": "UnitedHealthcare",
        "state": "MN", "zip": "55343",
    })])[0]
    assert r["block_name_key"] == "UNITEDMN"
    assert r["block_zip3_name4"] == "553UNIT"
    assert r["block_phonetic"] is not None and r["block_phonetic"].endswith("MN")
    # null name/state coalescing (stg_payors_unioned.sql:42-51)
    r2 = norm([doc("claims:CLM-0009", {"source_system": "claims", "payor_name": ""})])[0]
    assert r2["block_name_key"] == "XX"
    assert r2["block_zip3_name4"] == "XXX"
    assert r2["block_phonetic"] is None


def test_spans_carried_verbatim():
    import json

    d = doc("crm:CRM-0010", {"source_system": "crm", "payor_name": "Acme"})
    r = norm([d])[0]
    assert json.loads(r["spans_json"]) == d["spans"]


def test_media_fingerprint():
    d = {"doc_id": "crm:CRM-0011", "spans": [
        {"kind": "source_system", "text": "crm", "media_ref": "", "offset": 0},
        {"kind": "payor_name", "text": "Acme", "media_ref": "", "offset": 4},
        {"kind": "logo", "text": "", "media_ref": "abc123", "offset": 9},
        {"kind": "scan", "text": "", "media_ref": "def456", "offset": 10},
    ]}
    r = norm([d])[0]
    assert r["media_fingerprint"] == "abc123"  # logo preferred over scan

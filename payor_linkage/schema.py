"""Arrow schema constants for every logical table in the pipeline.

Mirrors the reference DDL re-expressed on the graft input shape:
- document table ≙ the 4 RAW feed tables (`/root/reference/snowflake/
  03_create_raw_tables.sql:14-92`) folded into interleaved span documents
  (BASELINE.json input_hint)
- unified record ≙ `STG_PAYORS_UNIONED` (`04_create_match_tables.sql:14-60`)
- candidates ≙ `MATCH_CANDIDATES` (`04_create_match_tables.sql:65-98`)
- groups ≙ `MATCH_GROUPS` (`04_create_match_tables.sql:104-110`)
- golden/xref/hierarchy ≙ `05_create_master_tables.sql:18-90`
- audit ≙ `06_create_audit_tables.sql:18-29`
"""

from __future__ import annotations

import pyarrow as pa

# ── Input: interleaved text+media documents ────────────────────────────────

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCUMENT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# sidecar labels (test/bench only)
DOCUMENT_LABELED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
    ("entity_id", pa.int64()),
    ("family_id", pa.string()),
])

# span kinds that carry text fields (subset per feed; see FIXTURES.md §1)
TEXT_SPAN_KINDS = [
    "source_system", "payor_name", "payor_name_alt", "tax_id", "npi",
    "cms_plan_id", "address_line_1", "address_line_2", "address_single_line",
    "city", "state", "zip", "phone", "website", "payor_type",
    "line_of_business", "parent_ref", "status", "effective_date",
    "termination_date", "loaded_at",
]
MEDIA_SPAN_KINDS = ["logo", "scan"]

# ── Unified canonical record (staging) ─────────────────────────────────────

UNIFIED_COLUMNS = [
    ("source_record_id", pa.string()),
    ("source_system", pa.string()),
    ("source_id", pa.string()),
    ("payor_name", pa.string()),
    ("payor_name_clean", pa.string()),
    ("payor_name_alt", pa.string()),
    ("tax_id", pa.string()),
    ("npi", pa.string()),
    ("cms_plan_id", pa.string()),
    ("address_line_1", pa.string()),
    ("address_line_2", pa.string()),
    ("city", pa.string()),
    ("state_code", pa.string()),
    ("zip_code", pa.string()),
    ("zip_plus_4", pa.string()),
    ("phone", pa.string()),
    ("website", pa.string()),
    ("payor_type", pa.string()),
    ("line_of_business", pa.string()),
    ("parent_ref", pa.string()),
    ("is_active", pa.bool_()),
    ("effective_date", pa.date32()),
    ("termination_date", pa.date32()),
    ("source_trust_rank", pa.int32()),
    ("loaded_at", pa.timestamp("us")),
    # blocking keys (U2-U4 + phonetic per the north rule)
    ("block_name_key", pa.string()),
    ("block_tax_id", pa.string()),
    ("block_zip3_name4", pa.string()),
    ("block_phonetic", pa.string()),
    # media fingerprint for pair scoring (first logo/scan media_ref)
    ("media_fingerprint", pa.string()),
    # spans carried verbatim, serialized to JSON (span-sequence fidelity
    # invariant; serialized so every downstream shuffle/join treats it as
    # an opaque string — pyarrow acero rejects nested non-key join fields)
    ("spans_json", pa.string()),
]

UNIFIED_SCHEMA = pa.schema(UNIFIED_COLUMNS)

# comparison fields carried through pair generation (avoids a join-back;
# SURVEY §2.4 J2)
PAIR_PAYLOAD_FIELDS = [
    "payor_name_clean", "tax_id", "cms_plan_id", "state_code",
    "address_line_1", "city", "zip_code", "phone", "media_fingerprint",
]

CANDIDATE_SCHEMA = pa.schema([
    ("candidate_id", pa.string()),
    ("source_record_id_a", pa.string()),
    ("source_record_id_b", pa.string()),
    ("match_rule", pa.string()),
    ("score_name", pa.float64()),
    ("score_tax_id", pa.float64()),
    ("score_address", pa.float64()),
    ("score_phone", pa.float64()),
    ("score_cms_plan_id", pa.float64()),
    ("media_score", pa.float64()),
    ("overall_score", pa.float64()),
    ("winning_name_strategy", pa.string()),
    ("winning_addr_strategy", pa.string()),
    ("strategies_used", pa.list_(pa.string())),
    ("auto_decision", pa.string()),
    ("final_decision", pa.string()),
])

GROUP_SCHEMA = pa.schema([
    ("match_group_id", pa.string()),
    ("source_record_id", pa.string()),
    ("is_survivor", pa.bool_()),
    ("group_confidence", pa.float64()),
])

GOLDEN_FIELDS = [
    "payor_name", "payor_name_alt", "tax_id", "npi", "cms_plan_id",
    "address_line_1", "address_line_2", "city", "state_code", "zip_code",
    "phone", "website", "payor_type", "line_of_business", "is_active",
    "effective_date", "termination_date",
]

# the 15 fields the completeness metric counts
# (`golden_payors.sql:48-65`)
COMPLETENESS_FIELDS = [
    "payor_name", "payor_name_alt", "tax_id", "npi", "cms_plan_id",
    "address_line_1", "city", "state_code", "zip_code", "phone",
    "website", "payor_type", "line_of_business", "is_active",
    "effective_date",
]

GOLDEN_SCHEMA = pa.schema([
    ("master_payor_id", pa.string()),
    ("payor_name", pa.string()),
    ("payor_name_alt", pa.string()),
    ("tax_id", pa.string()),
    ("npi", pa.string()),
    ("cms_plan_id", pa.string()),
    ("address_line_1", pa.string()),
    ("address_line_2", pa.string()),
    ("city", pa.string()),
    ("state_code", pa.string()),
    ("zip_code", pa.string()),
    ("phone", pa.string()),
    ("website", pa.string()),
    ("payor_type", pa.string()),
    ("line_of_business", pa.string()),
    ("is_active", pa.bool_()),
    ("effective_date", pa.date32()),
    ("termination_date", pa.date32()),
    ("completeness_score", pa.float64()),
    ("source_count", pa.int64()),
    ("confidence_score", pa.float64()),
    ("survivor_record_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

XREF_SCHEMA = pa.schema([
    ("source_record_id", pa.string()),
    ("master_payor_id", pa.string()),
    ("source_system", pa.string()),
    ("source_id", pa.string()),
    ("match_confidence", pa.float64()),
])

HIERARCHY_SCHEMA = pa.schema([
    ("hierarchy_id", pa.string()),
    ("parent_master_id", pa.string()),
    ("child_master_id", pa.string()),
    ("relationship_type", pa.string()),
    ("source", pa.string()),
    ("steward_confirmed", pa.bool_()),
])

AUDIT_SCHEMA = pa.schema([
    ("log_id", pa.string()),
    ("entity_type", pa.string()),
    ("entity_id", pa.string()),
    ("action", pa.string()),
    ("actor", pa.string()),
    ("detail", pa.string()),
])

STEWARD_OVERLAY_SCHEMA = pa.schema([
    ("candidate_id", pa.string()),
    ("steward_decision", pa.string()),   # confirmed_match | confirmed_no_match
    ("steward_user", pa.string()),
    ("steward_notes", pa.string()),
    ("decided_at", pa.timestamp("us")),
])

"""Span extraction + per-source normalization + union + blocking keys.

One stateless ``map_batches`` stage (Arrow in / Arrow out, zero-copy)
replaces the reference's four staging views + union model:

- field extraction from interleaved spans (graft input shape) — the spans
  column is carried through VERBATIM (span-sequence fidelity invariant)
- N1 composite record id            (`stg_*_payors.sql` id prefixing)
- N2 legal-suffix strip + upcase    (`stg_crm_payors.sql:17-26` et al —
  the four per-source regexes differ slightly and are replicated exactly)
- N3/N5 digits-only tax id + phone  (`stg_crm_payors.sql:30,46`)
- N4 zip5 / zip_plus_4              (`stg_crm_payors.sql:39-43`)
- N6 claims single-line address parse (`stg_claims_payors.sql:53-64`)
- N7 claims state-name → code       (`stg_claims_payors.sql:1-18,66-72`)
- N8-N13 state/status/date/classification/remap/trust-rank
- U1 union (all sources share this one canonical schema)
- U2-U4 blocking keys (`stg_payors_unioned.sql:42-51`) + a Soundex
  phonetic key (north-rule addition)

All string work is pyarrow.compute kernels; the only per-row Python is
Soundex over the *unique* name tokens of a batch (dict-mapped).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from payor_linkage.phonetics import soundex
from payor_linkage.schema import UNIFIED_SCHEMA
from payor_linkage.synth import STATE_NAMES

# per-source legal-suffix regexes — replicated exactly from the staging SQL
# (case-insensitive, anchored, first occurrence only)
_SUFFIX_RES = {
    "crm": r"(?i)\s*(,\s*)?(Inc\.?|LLC\.?|Corp\.?|Co\.?|Ltd\.?|L\.?P\.?|L\.?L\.?C\.?|P\.?C\.?)\s*$",
    "claims": r"(?i)\s*(,\s*)?(Inc\.?|LLC\.?|Corp\.?|Co\.?|Ltd\.?|L\.?P\.?|L\.?L\.?C\.?)\s*$",
    "credentialing": r"(?i)\s*(,\s*)?(Inc\.?|LLC\.?|Corp\.?|Co\.?|Ltd\.?|L\.?P\.?|Health\.?|Inc\.?)\s*$",
    "cms_reference": r"(?i)\s*(,\s*)?(Inc\.?|LLC\.?|Corp\.?|Co\.?|Ltd\.?)\s*$",
}

_ID_PREFIX = {"crm": "crm:", "claims": "claims:", "credentialing": "cred:", "cms_reference": "ref:"}
_TRUST_RANK = {"crm": 1, "credentialing": 2, "claims": 3, "cms_reference": 4}

_STATE_NAME_TO_CODE = {name.upper(): code for code, name in STATE_NAMES.items()}
_STATE_NAME_TO_CODE["DISTRICT OF COLUMBIA"] = "DC"


def _extract_kind(spans: pa.ChunkedArray | pa.ListArray, kind: str,
                  use_media_ref: bool = False) -> pa.Array:
    """First span of ``kind`` per document → string column (vectorized)."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    n = len(spans)
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind")
    value_field = flat.field("media_ref") if use_media_ref else flat.field("text")
    mask = pc.equal(kinds, kind).to_numpy(zero_copy_only=False)
    idx = parent[mask]
    vals = value_field.to_numpy(zero_copy_only=False)[mask]
    out = np.full(n, None, dtype=object)
    # reversed assignment keeps the FIRST span per row on duplicate kinds
    out[idx[::-1]] = vals[::-1]
    return pa.array(out, type=pa.string())


def _serialize_spans(spans: pa.ListArray | pa.ChunkedArray) -> pa.Array:
    """spans list<struct> → compact JSON per row (order-preserving,
    lossless — the fidelity invariant is byte-carried from here on)."""
    import json

    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    return pa.array(
        [json.dumps(row, separators=(",", ":"), ensure_ascii=False)
         for row in spans.to_pylist()],
        pa.string())


def spans_from_json(col) -> pa.Array:
    """spans_json string column → list<struct> (SPAN_STRUCT)."""
    import json

    from payor_linkage.schema import SPAN_STRUCT

    vals = col.to_pylist() if hasattr(col, "to_pylist") else list(col)
    return pa.array([json.loads(v) if v else [] for v in vals],
                    pa.list_(SPAN_STRUCT))


def _nullif_empty(arr: pa.Array) -> pa.Array:
    return pc.if_else(pc.equal(pc.coalesce(arr, pa.scalar("")), ""), pa.scalar(None, pa.string()), arr)


def _trim(arr: pa.Array) -> pa.Array:
    return pc.utf8_trim_whitespace(arr)


def _digits_only(arr: pa.Array) -> pa.Array:
    return _nullif_empty(pc.replace_substring_regex(arr, r"[^0-9]", ""))


def _per_source(masks: dict[str, pa.Array], values: dict[str, pa.Array | None],
                n: int) -> pa.Array:
    """Select a per-source value column by the source_system mask."""
    out = pa.nulls(n, pa.string())
    for src, val in values.items():
        if val is None:
            continue
        out = pc.if_else(masks[src], val, out)
    return out


def _map_values(arr: pa.Array, mapping: dict[str, str]) -> pa.Array:
    """Dict-map a string column via its unique values (broadcast small side)."""
    vals = arr.to_numpy(zero_copy_only=False)
    out = np.array([mapping.get(v) if v is not None else None for v in vals], dtype=object)
    return pa.array(out, type=pa.string())


def normalize_batch(batch: pa.Table) -> pa.Table:
    """documents (doc_id, spans[, labels]) → unified canonical records."""
    n = batch.num_rows
    spans = batch["spans"]

    f = {kind: _extract_kind(spans, kind) for kind in [
        "source_system", "payor_name", "payor_name_alt", "tax_id", "npi",
        "cms_plan_id", "address_line_1", "address_line_2", "address_single_line",
        "city", "state", "zip", "phone", "website", "payor_type",
        "line_of_business", "parent_ref", "status", "effective_date",
        "termination_date", "loaded_at",
    ]}
    logo_ref = _nullif_empty(_extract_kind(spans, "logo", use_media_ref=True))
    scan_ref = _nullif_empty(_extract_kind(spans, "scan", use_media_ref=True))

    source = f["source_system"]
    masks = {src: pc.equal(source, src) for src in _ID_PREFIX}

    # N1: composite record id = '<prefix><source_id>'; the doc_id in the graft
    # shape already IS '{source}:{source_id}' — keep it as the record id and
    # derive source_id from it.
    doc_id = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
    source_id = pc.replace_substring_regex(doc_id, r"^[a-z]+:", "")

    # N2: per-source legal-suffix strip → payor_name_clean
    raw_name = f["payor_name"]
    name_clean = _per_source(
        masks,
        {src: pc.utf8_upper(_trim(pc.replace_substring_regex(raw_name, rx, "", max_replacements=1)))
         for src, rx in _SUFFIX_RES.items()},
        n,
    )

    # N3: tax id digits-only
    tax_id = _digits_only(f["tax_id"])

    # N6/N7: claims single-line address parse + state name mapping
    addr_single = f["address_single_line"]
    # split_part(address, ',', n) semantics (`stg_claims_payors.sql:57,63`):
    # split on bare ',' (NOT ', '), out-of-range part → '', trim afterwards
    split = pc.split_pattern(pc.coalesce(addr_single, pa.scalar("")), ",")
    part1 = _trim(pc.coalesce(pc.list_element(split, 0), pa.scalar("")))
    has2 = pc.greater_equal(pc.list_value_length(split), 2)
    part2_raw = pc.if_else(has2, pc.list_element(
        pc.if_else(has2, split, pc.cast(pa.array([["", ""]] * n), split.type)), 1), pa.scalar(""))
    raw_city = f["city"]
    claims_addr1 = pc.if_else(
        pc.and_(pc.is_valid(addr_single), pc.is_null(raw_city)),
        part1, pa.scalar(None, pa.string()))
    # upper(trim(coalesce(nullif(city,''), nullif(split_part(...,2),''))))
    claims_city = pc.utf8_upper(_trim(pc.coalesce(_nullif_empty(raw_city),
                                                  _nullif_empty(part2_raw))))

    address_line_1 = _per_source(masks, {
        "crm": _trim(f["address_line_1"]),
        "credentialing": _trim(f["address_line_1"]),
        "claims": claims_addr1,
        "cms_reference": None,
    }, n)
    address_line_2 = _per_source(masks, {
        "crm": _trim(f["address_line_2"]),
        "credentialing": _trim(f["address_line_2"]),
        "claims": None, "cms_reference": None,
    }, n)
    city = _per_source(masks, {
        "crm": pc.utf8_upper(_trim(raw_city)),
        "credentialing": pc.utf8_upper(_trim(raw_city)),
        "claims": claims_city,
        "cms_reference": None,
    }, n)

    raw_state = f["state"]
    state_trim = _trim(pc.coalesce(raw_state, pa.scalar("")))
    state_upper = pc.utf8_upper(state_trim)
    claims_state = pc.coalesce(
        _map_values(state_upper, _STATE_NAME_TO_CODE),
        pc.if_else(pc.equal(pc.utf8_length(state_trim), 2), _nullif_empty(state_upper),
                   pa.scalar(None, pa.string())),
    )
    state_code = _per_source(masks, {
        "crm": _nullif_empty(pc.utf8_upper(pc.utf8_slice_codeunits(state_trim, 0, 2))),
        "claims": claims_state,
        "credentialing": _nullif_empty(state_upper),
        "cms_reference": _nullif_empty(state_upper),
    }, n)

    # N4: zip5 + zip_plus_4
    zip_digits = pc.replace_substring_regex(pc.coalesce(f["zip"], pa.scalar("")), r"[^0-9]", "")
    zip_code = _nullif_empty(pc.utf8_slice_codeunits(zip_digits, 0, 5))
    zip_plus_4 = pc.if_else(pc.greater(pc.utf8_length(zip_digits), 5),
                            pc.utf8_slice_codeunits(zip_digits, 5, 9),
                            pa.scalar(None, pa.string()))

    # N5: phone digits-only
    phone = _digits_only(f["phone"])

    # N9: status → is_active per source
    status = pc.coalesce(f["status"], pa.scalar(""))
    is_active = pc.if_else(
        masks["crm"], pc.equal(status, "active"),
        pc.if_else(masks["credentialing"], pc.equal(status, "in_network"),
                   pc.if_else(masks["claims"], pc.equal(status, "true"),
                              pa.scalar(True))))
    is_active = pc.if_else(pc.and_(pc.is_null(f["status"]), pc.invert(masks["cms_reference"])),
                           pa.scalar(None, pa.bool_()), is_active)

    # N10: safe date casts
    eff = pc.strptime(pc.coalesce(f["effective_date"], pa.scalar("")), "%Y-%m-%d", "s",
                      error_is_null=True)
    term = pc.strptime(pc.coalesce(f["termination_date"], pa.scalar("")), "%Y-%m-%d", "s",
                       error_is_null=True)
    loaded = pc.strptime(pc.coalesce(f["loaded_at"], pa.scalar("")), "%Y-%m-%d %H:%M:%S", "us",
                         error_is_null=True)

    # N11: classification lowercase
    payor_type = pc.utf8_lower(_trim(f["payor_type"]))
    lob = pc.utf8_lower(_trim(f["line_of_business"]))

    # N12: trust rank
    trust = pa.nulls(n, pa.int32())
    for src, rank in _TRUST_RANK.items():
        trust = pc.if_else(masks[src], pa.scalar(rank, pa.int32()), trust)

    name_clean_nn = pc.coalesce(name_clean, pa.scalar(""))

    # U2: name6 + state (nulls → 'XX', exactly `stg_payors_unioned.sql:42-44`)
    block_name_key = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(name_clean_nn, 0, 6),
        pc.coalesce(state_code, pa.scalar("XX")), "")
    # U4: zip3 + name4
    block_zip3_name4 = pc.binary_join_element_wise(
        pc.coalesce(pc.utf8_slice_codeunits(zip_code, 0, 3), pa.scalar("XXX")),
        pc.utf8_slice_codeunits(name_clean_nn, 0, 4), "")

    # phonetic key: Soundex of the first TWO clean-name tokens + state
    # (north rule). Two tokens, not one: single-token Soundex collides too
    # often at corpus scale (8918 codes) and turns the phonetic block into
    # a quadratic hot key; the second token keeps spelling-variant recall
    # while multiplying the key space. Soundex runs per unique token.
    toks2 = [(t.split(" ", 2) + ["", ""])[:2] if t else ["", ""]
             for t in name_clean_nn.to_pylist()]
    uniq = {t: soundex(t) for pair in toks2 for t in pair}
    block_phonetic = pc.binary_join_element_wise(
        pa.array([uniq[a] + uniq[b] for a, b in toks2], type=pa.string()),
        pc.coalesce(state_code, pa.scalar("XX")), "")
    # first-token soundex is 4 chars when the name has letters; an
    # empty-name key (just the 2-char state) carries no signal → null
    block_phonetic = pc.if_else(pc.less(pc.utf8_length(block_phonetic), 6),
                                pa.scalar(None, pa.string()), block_phonetic)

    cols = {
        "source_record_id": doc_id,
        "source_system": source,
        "source_id": source_id,
        "payor_name": _trim(raw_name),
        "payor_name_clean": name_clean,
        "payor_name_alt": _trim(f["payor_name_alt"]),
        "tax_id": tax_id,
        "npi": _trim(f["npi"]),
        "cms_plan_id": pc.utf8_upper(_trim(f["cms_plan_id"])),
        "address_line_1": address_line_1,
        "address_line_2": address_line_2,
        "city": city,
        "state_code": state_code,
        "zip_code": zip_code,
        "zip_plus_4": zip_plus_4,
        "phone": phone,
        "website": _trim(f["website"]),
        "payor_type": payor_type,
        "line_of_business": lob,
        "parent_ref": _trim(f["parent_ref"]),
        "is_active": is_active,
        "effective_date": pc.cast(eff, pa.date32()),
        "termination_date": pc.cast(term, pa.date32()),
        "source_trust_rank": trust,
        "loaded_at": loaded,
        "block_name_key": block_name_key,
        "block_tax_id": tax_id,
        "block_zip3_name4": block_zip3_name4,
        "block_phonetic": block_phonetic,
        "media_fingerprint": pc.coalesce(logo_ref, scan_ref),
        # carried verbatim, serialized — shuffles/joins treat it as opaque
        "spans_json": _serialize_spans(spans),
    }
    out = pa.table({k: pc.cast(v, UNIFIED_SCHEMA.field(k).type) for k, v in cols.items()})
    # carry sidecar labels when present (test/bench mode)
    for label in ("entity_id", "family_id"):
        if label in batch.column_names:
            out = out.append_column(label, batch[label])
    return out


def unify(documents, *, concurrency: int | None = None):
    """documents Dataset → unified canonical records Dataset (stateless map)."""
    return documents.map_batches(normalize_batch, batch_format="pyarrow")

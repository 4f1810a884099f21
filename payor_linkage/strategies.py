"""Field-level similarity strategies + the ensemble router.

Semantics mirror the reference's strategy UDFs and ensemble UDF exactly
(`/root/reference/snowflake/11_ensemble_udfs.sql`):

- name strategies F1-F5 (`:17-123`, ensemble twins `:468-495`)
- address strategies F6-F9 (`:130-229`, ensemble twins `:499-526`)
- tax-id strategies F10-F11 (`:260-321`, ensemble `:592-607`)
- phone strategies F12-F13 (`:236-253,328-366`, ensemble `:619-626`)
- cms strategies F14 (`:373-399`, ensemble `:629-635`)
- routers F15/F16 (`:530-566`) and composite F17 (`:570-645`)

All scores round to 4 decimals exactly where the reference rounds.
The legacy single-strategy composite (F18, `08_fuzzy_udf.sql`) is kept
for parity tests.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from difflib import SequenceMatcher
from functools import lru_cache

from payor_linkage.phonetics import doublemetaphone, jaro_winkler_similarity

# ── Dictionaries (reference `11_ensemble_udfs.sql:434-453`) ────────────────

ABBREVS = {
    "BCBS": "BLUE CROSS BLUE SHIELD", "BC": "BLUE CROSS", "BS": "BLUE SHIELD",
    "UHC": "UNITEDHEALTHCARE", "UHG": "UNITEDHEALTH GROUP",
    "HCSC": "HEALTH CARE SERVICE CORPORATION", "KP": "KAISER PERMANENTE",
    "KFHP": "KAISER FOUNDATION HEALTH PLAN", "HMO": "HEALTH MAINTENANCE ORGANIZATION",
    "PPO": "PREFERRED PROVIDER ORGANIZATION", "EPO": "EXCLUSIVE PROVIDER ORGANIZATION",
    "POS": "POINT OF SERVICE", "MVP": "MVP HEALTH CARE", "HAP": "HEALTH ALLIANCE PLAN",
    "PHP": "PHYSICIANS HEALTH PLAN", "QHP": "QUALIFIED HEALTH PLAN",
    "FEHB": "FEDERAL EMPLOYEES HEALTH BENEFITS", "CCHP": "CHINESE COMMUNITY HEALTH PLAN",
}

ADDR_STOPS = {
    'ST', 'STREET', 'AVE', 'AVENUE', 'BLVD', 'BOULEVARD', 'RD', 'ROAD',
    'DR', 'DRIVE', 'LN', 'LANE', 'CT', 'COURT', 'STE', 'SUITE', 'APT',
    'UNIT', 'FL', 'FLOOR', '#',
}

STREET_NORMS = {
    "STREET": "ST", "AVENUE": "AVE", "BOULEVARD": "BLVD", "ROAD": "RD",
    "DRIVE": "DR", "LANE": "LN", "COURT": "CT", "PLACE": "PL", "CIRCLE": "CIR",
    "TERRACE": "TER", "NORTH": "N", "SOUTH": "S", "EAST": "E", "WEST": "W",
    "NORTHEAST": "NE", "NORTHWEST": "NW", "SOUTHEAST": "SE", "SOUTHWEST": "SW",
    "SUITE": "STE", "APARTMENT": "APT",
}

COMPOSITE_WEIGHTS = {'name': 0.35, 'tax_id': 0.25, 'address': 0.20, 'phone': 0.10, 'cms': 0.10}

_NON_DIGIT = re.compile(r'[^0-9]')

# ── Helpers (`:457-464`) ───────────────────────────────────────────────────


def _up(s):
    return s.upper().strip() if s else None


def digits(s):
    return _NON_DIGIT.sub('', s) if s else ''


def _ngrams(s, n=3):
    return [s[i:i + n] for i in range(len(s) - n + 1)] if len(s) >= n else [s]


# ── Name strategies (ensemble twins, pre-uppercased input) ─────────────────


def name_jw(a: str, b: str) -> float:
    """F1 NAME_JW (`:468-469`)."""
    return round(jaro_winkler_similarity(a, b), 4)


_TSR_SM: dict = {}


def name_tsr(a: str, b: str) -> float:
    """F2 NAME_TSR token-sort-ratio (`:471-474`).

    The SequenceMatcher's seq2 preprocessing (``__chain_b``) is cached
    per right-hand string — block-mates repeat names heavily. Identical
    output to a fresh ``SequenceMatcher(None, sa, sb).ratio()``."""
    sa = ' '.join(sorted(a.split()))
    sb = ' '.join(sorted(b.split()))
    sm = _TSR_SM.get(sb)
    if sm is None:
        sm = SequenceMatcher()
        sm.set_seq2(sb)
        if len(_TSR_SM) < 65536:
            _TSR_SM[sb] = sm
    sm.set_seq1(sa)
    return round(sm.ratio(), 4)


def name_pho(a: str, b: str) -> float:
    """F3 NAME_PHO double-metaphone cross-match (`:476-482`)."""
    ma, mb = doublemetaphone(a), doublemetaphone(b)
    if (ma[0] and mb[0] and ma[0] == mb[0]) or \
       (ma[0] and mb[1] and ma[0] == mb[1]) or \
       (ma[1] and mb[0] and ma[1] == mb[0]):
        return 1.0
    return 0.0


@lru_cache(maxsize=65536)
def _expand_abbrevs(name: str) -> str:
    return ' '.join(ABBREVS.get(t, t) for t in name.split())


def name_abr(a: str, b: str) -> float:
    """F4 NAME_ABR abbreviation-expanded JW (`:484-487`)."""
    return round(jaro_winkler_similarity(_expand_abbrevs(a), _expand_abbrevs(b)), 4)


@lru_cache(maxsize=65536)
def _ngram_profile(s: str) -> tuple[dict, float]:
    """(trigram counts, L2 norm) — cached per string: block-mates repeat
    names heavily, and profile construction dominates NAME_NGR cost."""
    g = Counter(_ngrams(s))
    return dict(g), math.sqrt(sum(v * v for v in g.values()))


def name_ngr(a: str, b: str) -> float:
    """F5 NAME_NGR char-trigram cosine (`:489-495`)."""
    ga, ma = _ngram_profile(a)
    gb, mb = _ngram_profile(b)
    if len(gb) < len(ga):
        ga, gb = gb, ga
    dot = sum(v * gb[g] for g, v in ga.items() if g in gb)
    return round(dot / (ma * mb), 4) if ma and mb else 0.0


# ── Address strategies ─────────────────────────────────────────────────────


def addr_jac(a: str, b: str) -> float:
    """F6 ADDR_JAC stopword-removed token Jaccard (`:499-503`)."""
    ta = set(t.rstrip('.,') for t in a.split()) - ADDR_STOPS
    tb = set(t.rstrip('.,') for t in b.split()) - ADDR_STOPS
    u = ta | tb
    return round(len(ta & tb) / len(u), 4) if u else 0.0


def _addr_parse(addr: str) -> dict:
    tok = addr.split()
    r = {}
    if tok and tok[0].replace('-', '').isdigit():
        r['num'] = tok[0]
        tok = tok[1:]
    r['name'] = ' '.join(t for t in tok[:3] if t not in ADDR_STOPS)
    return r


def addr_cmp(a: str, b: str) -> float:
    """F7 ADDR_CMP street-number + street-name weighted match (`:505-520`)."""
    ca, cb = _addr_parse(a), _addr_parse(b)
    tw, s = 0.0, 0.0
    for c, w in [('num', 0.3), ('name', 0.3)]:
        va, vb = ca.get(c, ''), cb.get(c, '')
        if va and vb:
            tw += w
            s += w * (1.0 if va == vb else jaro_winkler_similarity(va, vb))
    return round(s / tw, 4) if tw > 0 else 0.0


def _addr_norm(addr: str) -> str:
    return ' '.join(STREET_NORMS.get(t, t) for t in addr.split())


def addr_nrm(a: str, b: str) -> float:
    """F8 ADDR_NRM USPS-normalized exact-or-JW (`:522-526`)."""
    na, nb = _addr_norm(a), _addr_norm(b)
    return 1.0 if na == nb else round(jaro_winkler_similarity(na, nb), 4)


def addr_zip(addr_a, addr_b, zip_a, zip_b):
    """F9 ADDR_ZIP — standalone only, never routed (`:183-203`)."""
    if not zip_a or not zip_b:
        return None
    zip_score = 1.0 if zip_a == zip_b else (0.5 if zip_a[:3] == zip_b[:3] else 0.0)
    if addr_a and addr_b:
        ta = set(t.upper().rstrip('.,') for t in addr_a.split()) - ADDR_STOPS
        tb = set(t.upper().rstrip('.,') for t in addr_b.split()) - ADDR_STOPS
        union = ta | tb
        jac = len(ta & tb) / len(union) if union else 0.0
    else:
        jac = 0.0
    return zip_score * 0.5 + jac * 0.5


# ── Identifier strategies ──────────────────────────────────────────────────


def taxid_exact(a, b):
    """F10a TAXID_EXACT (`:260-273`)."""
    if not a or not b:
        return None
    da, db = digits(a), digits(b)
    return 1.0 if da and db and da == db else 0.0


def taxid_transpose(a, b):
    """F10b TAXID_TRANSPOSE (`:276-300`)."""
    if not a or not b:
        return None
    da, db = digits(a), digits(b)
    if not da or not db:
        return None
    if da == db:
        return 1.0
    if len(da) != len(db):
        return 0.0
    diffs = sum(1 for x, y in zip(da, db) if x != y)
    if diffs <= 1:
        return 0.9
    if diffs == 2:
        return 0.7
    return 0.0


def taxid_prefix(a, b):
    """F11 TAXID_PREFIX — standalone only (`:303-321`)."""
    if not a or not b:
        return None
    da, db = digits(a), digits(b)
    if not da or not db or len(da) < 5 or len(db) < 5:
        return None
    if da[:2] != db[:2]:
        return 0.0
    matching = sum(1 for x, y in zip(da[2:], db[2:]) if x == y)
    return 0.6 if matching >= 5 else 0.3


def phone_e164(a, b):
    """F12a PHONE_E164 last-10 exact, falls to last-7 (`:236-253`)."""
    if not a or not b:
        return None
    da, db = digits(a), digits(b)
    if len(da) >= 10 and len(db) >= 10:
        return 1.0 if da[-10:] == db[-10:] else 0.0
    if len(da) >= 7 and len(db) >= 7:
        return 1.0 if da[-7:] == db[-7:] else 0.0
    return 0.0


def phone_last7(a, b):
    """F12b PHONE_LAST7 (`:328-343`)."""
    if not a or not b:
        return None
    da, db = digits(a), digits(b)
    if len(da) >= 7 and len(db) >= 7:
        return 1.0 if da[-7:] == db[-7:] else 0.0
    return 0.0


def phone_areacode(a, b):
    """F13 PHONE_AREACODE — standalone only (`:346-366`)."""
    if not a or not b:
        return None
    da, db = digits(a), digits(b)
    if len(da) >= 10 and len(db) >= 10:
        ac_match = da[-10:-7] == db[-10:-7]
        last4 = da[-4:] == db[-4:]
        if ac_match and last4:
            return 0.8
        if ac_match:
            return 0.3
    return 0.0


def cms_exact(a, b):
    """F14a CMS_EXACT (`:373-383`)."""
    if not a or not b:
        return None
    return 1.0 if a.strip().upper() == b.strip().upper() else 0.0


def cms_prefix(a, b):
    """F14b CMS_PREFIX first-5 → 0.85 (`:386-399`)."""
    if not a or not b:
        return None
    ca, cb = a.strip().upper(), b.strip().upper()
    if len(ca) >= 5 and len(cb) >= 5 and ca[:5] == cb[:5]:
        return 0.85
    return 0.0


# ── Routers (`:530-566`) ───────────────────────────────────────────────────


def route_name(a: str, b: str) -> tuple[float, str, list[str]]:
    """F15 name router: (score, winning strategy, strategies tried)."""
    has_abbrev = any(t in ABBREVS for t in a.split()) or any(t in ABBREVS for t in b.split())
    len_ratio = min(len(a), len(b)) / max(len(a), len(b)) if max(len(a), len(b)) > 0 else 1.0

    results: dict[str, float] = {}
    if has_abbrev:
        results['NAME_ABR'] = name_abr(a, b)
        results['NAME_JW'] = name_jw(a, b)
        results['NAME_TSR'] = name_tsr(a, b)
    elif len_ratio < 0.6:
        results['NAME_TSR'] = name_tsr(a, b)
        results['NAME_ABR'] = name_abr(a, b)
    elif max(len(a), len(b)) <= 20:
        results['NAME_JW'] = name_jw(a, b)
        results['NAME_PHO'] = name_pho(a, b)
        results['NAME_NGR'] = name_ngr(a, b)
    else:
        results['NAME_JW'] = name_jw(a, b)
        results['NAME_NGR'] = name_ngr(a, b)

    winner = max(results, key=results.get)
    return results[winner], winner, list(results.keys())


def route_addr(a: str, b: str) -> tuple[float, str, list[str]]:
    """F16 address router."""
    has_num = any(c.isdigit() for c in (a or '')[:10]) and any(c.isdigit() for c in (b or '')[:10])
    results: dict[str, float] = {}
    if has_num:
        results['ADDR_CMP'] = addr_cmp(a, b)
        results['ADDR_NRM'] = addr_nrm(a, b)
    else:
        results['ADDR_JAC'] = addr_jac(a, b)
    winner = max(results, key=results.get)
    return results[winner], winner, list(results.keys())


# ── Ensemble composite (`:570-645`) ────────────────────────────────────────


def ensemble_match_score(name_a, name_b, tax_a, tax_b, addr_a, addr_b,
                         phone_a, phone_b, cms_a, cms_b) -> dict:
    """F17 composite ensemble — exact port of the reference handler."""
    result = {
        'name_score': None, 'name_strategy': None,
        'addr_score': None, 'addr_strategy': None,
        'tax_score': None, 'phone_score': None, 'cms_score': None,
        'composite': None, 'strategies_used': [],
    }
    field_scores: dict[str, float] = {}
    strategies_used: list[str] = []

    if name_a and name_b:
        na, nb = _up(name_a), _up(name_b)
        score, strat, _ = route_name(na, nb)
        result['name_score'] = score
        result['name_strategy'] = strat
        field_scores['name'] = score
        strategies_used.append(strat)

    if tax_a and tax_b:
        da, db = digits(tax_a), digits(tax_b)
        if da and db:
            exact = 1.0 if da == db else 0.0
            if exact == 1.0:
                result['tax_score'] = 1.0
                strategies_used.append('TIN_EXACT')
            else:
                trans = 0.0
                if len(da) == len(db):
                    diffs = sum(1 for x, y in zip(da, db) if x != y)
                    trans = 0.9 if diffs <= 1 else (0.7 if diffs == 2 else 0.0)
                result['tax_score'] = max(exact, trans)
                strategies_used.append('TIN_TRANS' if trans > exact else 'TIN_EXACT')
            field_scores['tax_id'] = result['tax_score']

    if addr_a and addr_b:
        aa, ab_ = _up(addr_a), _up(addr_b)
        score, strat, _ = route_addr(aa, ab_)
        result['addr_score'] = score
        result['addr_strategy'] = strat
        field_scores['address'] = score
        strategies_used.append(strat)

    if phone_a and phone_b:
        pa, pb = digits(phone_a), digits(phone_b)
        if pa and pb:
            e164 = 1.0 if len(pa) >= 10 and len(pb) >= 10 and pa[-10:] == pb[-10:] else 0.0
            l7 = 1.0 if len(pa) >= 7 and len(pb) >= 7 and pa[-7:] == pb[-7:] else 0.0
            result['phone_score'] = max(e164, l7)
            strategies_used.append('PHONE_E164' if e164 >= l7 else 'PHONE_L7')
            field_scores['phone'] = result['phone_score']

    if cms_a and cms_b:
        ca, cb = _up(cms_a), _up(cms_b)
        exact = 1.0 if ca == cb else 0.0
        pfx = 0.85 if len(ca) >= 5 and len(cb) >= 5 and ca[:5] == cb[:5] else 0.0
        result['cms_score'] = max(exact, pfx)
        strategies_used.append('CMS_EXACT' if exact >= pfx else 'CMS_PFX')
        field_scores['cms'] = result['cms_score']

    total_w = sum(COMPOSITE_WEIGHTS[f] for f in field_scores)
    if total_w > 0:
        result['composite'] = round(
            sum(field_scores[f] * COMPOSITE_WEIGHTS[f] for f in field_scores) / total_w, 4
        )

    result['strategies_used'] = strategies_used
    return result


# ── Legacy single-strategy composite (F18, `08_fuzzy_udf.sql:14-83`) ───────

_FUZZY_STOPS = {'st', 'street', 'ave', 'avenue', 'blvd', 'boulevard', 'rd', 'road',
                'dr', 'drive', 'ln', 'lane', 'ct', 'court', 'ste', 'suite', 'apt', 'unit'}


def fuzzy_score(name_a, name_b, tax_a, tax_b, addr_a, addr_b,
                phone_a, phone_b, cms_a, cms_b) -> dict:
    """Legacy composite superseded by the ensemble; kept for parity tests."""
    weights = {'name': 0.35, 'tax_id': 0.25, 'address': 0.20, 'phone': 0.10, 'cms': 0.10}
    scores: dict[str, float] = {}
    if name_a and name_b:
        scores['name'] = jaro_winkler_similarity(name_a.upper().strip(), name_b.upper().strip())
    if tax_a and tax_b:
        da, db = digits(tax_a), digits(tax_b)
        if da and db:
            scores['tax_id'] = 1.0 if da == db else 0.0
    if addr_a and addr_b:
        ta = set(t.lower().rstrip('.,') for t in addr_a.split()) - _FUZZY_STOPS
        tb = set(t.lower().rstrip('.,') for t in addr_b.split()) - _FUZZY_STOPS
        u = ta | tb
        scores['address'] = len(ta & tb) / len(u) if u else 0.0
    if phone_a and phone_b:
        pa, pb = digits(phone_a), digits(phone_b)
        if len(pa) >= 7 and len(pb) >= 7:
            scores['phone'] = 1.0 if pa[-7:] == pb[-7:] else 0.0
    if cms_a and cms_b:
        scores['cms'] = 1.0 if cms_a.strip().upper() == cms_b.strip().upper() else 0.0
    total_w = sum(weights[f] for f in scores)
    composite = round(sum(scores[f] * weights[f] for f in scores) / total_w, 4) if total_w else None
    return {'scores': scores, 'composite': composite}

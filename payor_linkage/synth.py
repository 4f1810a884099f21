"""Deterministic synthetic corpus builder.

Re-implements the *semantics* of the reference generator
(`/root/reference/generator/generate_payors.py` + `mess_patterns.py`,
SEED=42) on the graft input shape: each messy source record becomes one
interleaved text+media document (doc_id, spans) per BASELINE.json
input_hint. Ground-truth ``entity_id``/``family_id`` are kept as sidecar
label columns for pairwise-F1 evaluation (FIXTURES.md §1).

Scale model: one *replica* ≙ one closed world of ~18 payor families /
~50 entities / ~150-200 documents. Replica k>0 coins brand-new family
names and identifiers from its own seeded RNG, so replicas never block
or match across each other — corpus size scales linearly by
``n_replicas`` with identical per-replica match structure, which is what
the 10^12-document design partitions on. Generation itself is expressed
as a Ray ``map_batches`` over replica indices → fully parallel synth.
"""

from __future__ import annotations

import hashlib
import random
from datetime import date, datetime, timedelta

import pyarrow as pa

from payor_linkage.schema import DOCUMENT_LABELED_SCHEMA

SEED = 42

SOURCE_PROBS = [("crm", 0.90), ("claims", 0.80), ("credentialing", 0.60), ("cms_reference", 0.40)]

LEGAL_SUFFIXES = ["Inc.", "Inc", "LLC", "Corp.", "Corporation", "Co.", "L.P.", "Ltd."]
BCBS_FORMS = [
    "Blue Cross Blue Shield", "BlueCross BlueShield", "BCBS",
    "Blue Cross / Blue Shield", "Blue Cross and Blue Shield",
]
STREET_SUFFIX_MESS = {
    "Street": ["St", "St.", "Str"], "Avenue": ["Ave", "Ave.", "Av"],
    "Boulevard": ["Blvd", "Blvd."], "Drive": ["Dr", "Dr."],
    "Road": ["Rd", "Rd."], "Suite": ["Ste", "Ste.", "STE", "#"],
}
STATE_NAMES = {
    "AL": "Alabama", "AK": "Alaska", "AZ": "Arizona", "AR": "Arkansas",
    "CA": "California", "CO": "Colorado", "CT": "Connecticut", "DE": "Delaware",
    "FL": "Florida", "GA": "Georgia", "HI": "Hawaii", "ID": "Idaho",
    "IL": "Illinois", "IN": "Indiana", "IA": "Iowa", "KS": "Kansas",
    "KY": "Kentucky", "LA": "Louisiana", "ME": "Maine", "MD": "Maryland",
    "MA": "Massachusetts", "MI": "Michigan", "MN": "Minnesota", "MS": "Mississippi",
    "MO": "Missouri", "MT": "Montana", "NE": "Nebraska", "NV": "Nevada",
    "NH": "New Hampshire", "NJ": "New Jersey", "NM": "New Mexico", "NY": "New York",
    "NC": "North Carolina", "ND": "North Dakota", "OH": "Ohio", "OK": "Oklahoma",
    "OR": "Oregon", "PA": "Pennsylvania", "RI": "Rhode Island", "SC": "South Carolina",
    "SD": "South Dakota", "TN": "Tennessee", "TX": "Texas", "UT": "Utah",
    "VT": "Vermont", "VA": "Virginia", "WA": "Washington", "WV": "West Virginia",
    "WI": "Wisconsin", "WY": "Wyoming",
}
STATES = list(STATE_NAMES)

STREET_NAMES = [
    "Main", "Oak", "Maple", "Cedar", "Lakeview", "Riverside", "Commerce",
    "Market", "Washington", "Jefferson", "Lincoln", "Franklin", "Highland",
    "Sunset", "Park", "Meridian", "Corporate", "Enterprise", "Gateway",
    "Innovation", "Harbor", "Summit", "Prairie", "Willow",
]
STREET_KINDS = ["Street", "Avenue", "Boulevard", "Drive", "Road"]
CITY_NAMES = [
    "Springfield", "Riverton", "Fairview", "Georgetown", "Clinton", "Madison",
    "Greenville", "Bristol", "Salem", "Ashland", "Dover", "Hudson", "Milton",
    "Newport", "Oxford", "Arlington", "Burlington", "Manchester", "Clayton",
    "Dayton", "Lexington", "Milford", "Auburn", "Winchester",
]

# Authored family definitions (public payor names; composition is our own).
# Shape: (family_id, parent_name|None, parent_tax, parent_state, parent_city,
#         [(entity_name, type, lob, state, tax_id|None, cms_plan_id|None, dba|None), ...])
FAMILIES = [
    ("uhg", "UnitedHealth Group", "451203987", "MN", "Minnetonka", [
        ("UnitedHealthcare", "commercial", "PPO", "IL", None, "H2001", None),
        ("UnitedHealthcare of Texas", "commercial", "HMO", "TX", "741203987", None, None),
        ("UnitedHealthcare of Ohio", "commercial", "PPO", "OH", "311203987", None, None),
        ("UnitedHealthcare Community Plan", "medicaid", "HMO", "AZ", None, None, None),
        ("Optum Health", "commercial", "PPO", "MN", "272203987", None, None),
    ]),
    ("elevance", "Elevance Health", "351567234", "IN", "Indianapolis", [
        ("Anthem Blue Cross Blue Shield of Ohio", "commercial", "PPO", "OH", "311567234", None, None),
        ("Anthem Blue Cross Blue Shield of Virginia", "commercial", "PPO", "VA", "541567234", None, None),
        ("Empire BlueCross BlueShield", "commercial", "HMO", "NY", "131567234", None, "Empire HealthChoice"),
    ]),
    ("cvs_aetna", "CVS Health", "060897512", "CT", "Hartford", [
        ("Aetna", "commercial", "PPO", "CT", "362897512", "H3312", None),
        ("Aetna Better Health", "medicaid", "HMO", "NJ", "223897512", None, None),
        ("SilverScript", "medicare_advantage", "PDP", "CT", "362897513", "S4802", None),
    ]),
    ("cigna", "The Cigna Group", "061988321", "CT", "Bloomfield", [
        ("Cigna Healthcare", "commercial", "PPO", "CT", "061988322", None, None),
        ("Evernorth Health Services", "commercial", "PPO", "MO", "431988321", None, None),
    ]),
    ("humana", "Humana Inc", "611772098", "KY", "Louisville", [
        ("Humana Gold Plus", "medicare_advantage", "HMO", "TX", "611772098", "H4461", None),
        ("Humana Military", "commercial", "PPO", "VA", "611772099", None, None),
    ]),
    ("kaiser", "Kaiser Foundation Health Plan", "941340523", "CA", "Oakland", [
        ("Kaiser Permanente", "commercial", "HMO", "CA", "941340523", "H0524", "KP"),
        ("Kaiser Foundation Health Plan of Colorado", "commercial", "HMO", "CO", "841340523", None, None),
        ("Kaiser Foundation Health Plan of Georgia", "commercial", "HMO", "GA", "581340523", None, None),
    ]),
    ("hcsc", "Health Care Service Corporation", "366044418", "IL", "Chicago", [
        ("Blue Cross Blue Shield of Illinois", "commercial", "PPO", "IL", None, None, None),
        ("Blue Cross Blue Shield of Texas", "commercial", "PPO", "TX", "746044418", None, None),
        ("Blue Cross Blue Shield of Montana", "commercial", "PPO", "MT", "816044418", None, None),
    ]),
    ("centene", "Centene Corporation", "421441301", "MO", "St. Louis", [
        ("Ambetter Health", "exchange", "EPO", "MO", "431441301", None, None),
        ("WellCare", "medicare_advantage", "HMO", "FL", "591441301", "H1032", None),
        ("Fidelis Care", "medicaid", "HMO", "NY", "131441301", None, None),
    ]),
    ("molina", "Molina Healthcare", "954672901", "CA", "Long Beach", [
        ("Molina Healthcare of Texas", "medicaid", "HMO", "TX", "954672902", None, None),
        ("Molina Healthcare of Washington", "medicaid", "HMO", "WA", "914672901", None, None),
    ]),
    ("highmark", "Highmark Health", "251822812", "PA", "Pittsburgh", [
        ("Highmark Blue Cross Blue Shield", "commercial", "PPO", "DE", "251822813", None, None),
        ("Gateway Health Plan", "medicaid", "HMO", "PA", "251822814", None, None),
    ]),
    ("gudier", "GuideWell Mutual Holding", "590634201", "FL", "Jacksonville", [
        ("Florida Blue", "commercial", "PPO", "FL", "590634202", None, "Blue Cross Blue Shield of Florida"),
        ("Truli for Health", "commercial", "HMO", "FL", "590634203", None, None),
    ]),
    ("bsc", "Blue Shield of California", "940895420", "CA", "Oakland", [
        ("Promise Health Plan", "medicaid", "HMO", "CA", "940895421", None, None),
    ]),
    ("emblem", "EmblemHealth", "131924571", "NY", "New York", [
        ("Group Health Incorporated", "commercial", "PPO", "NY", "131924572", None, "GHI"),
        ("Health Insurance Plan of Greater New York", "commercial", "HMO", "NY", "131924573", None, "HIP"),
    ]),
    ("pointe32", "Point32Health", "042674081", "MA", "Canton", [
        ("Harvard Pilgrim Health Care", "commercial", "PPO", "MA", "042674082", None, None),
        ("Tufts Health Plan", "commercial", "HMO", "MA", "042674083", "H2256", None),
    ]),
    ("upmc", "UPMC Health Plan", "251885109", "PA", "Pittsburgh", [
        ("UPMC for Life", "medicare_advantage", "HMO", "PA", "251885110", "H3907", None),
        ("UPMC Community HealthChoices", "medicaid", "HMO", "PA", "251885111", None, None),
    ]),
    ("geisinger", "Geisinger Health Plan", "232290855", "PA", "Danville", [
        ("Geisinger Gold Medicare Advantage", "medicare_advantage", "HMO", "PA", "232290856", "H3954", None),
    ]),
    ("scan", None, None, "", "", [
        ("SCAN Health Plan", "medicare_advantage", "HMO", "CA", "953039573", "H5425", None),
        ("SCAN Health Plan Arizona", "medicare_advantage", "HMO", "AZ", "863039573", None, None),
    ]),
    ("mvp", None, None, "", "", [
        ("MVP Health Care", "commercial", "PPO", "NY", "141712094", "H3305", None),
        ("MVP Health Plan of Vermont", "commercial", "HMO", "VT", "031712094", None, None),
    ]),
]

_SYLLABLES = ["ver", "al", "nor", "ta", "med", "lux", "cor", "zen", "bel",
              "quo", "ran", "sol", "vi", "mar", "ten", "ox", "cal", "dur"]


def _coin_brand(rng: random.Random) -> str:
    """Coin a pronounceable brand token (e.g. 'Vermed') — orphan names."""
    n = rng.randint(2, 3)
    w = "".join(rng.choice(_SYLLABLES) for _ in range(n))
    return w.capitalize()


# Replica world separation: each unique *first name-token* of the authored
# families maps, per replica, to a globally-unique 5-letter code. The code is
# a scrambled (multiplicative bijection) base-26 encoding of
# (replica * 64 + token_index), so (a) no two (replica, token) pairs ever
# collide → no cross-replica DET-3 / blocking-key merges; (b) consecutive
# indices land far apart in letter space → same-replica codes share no prefix
# (Jaro-Winkler's prefix bonus can't fire between them); (c) within-replica
# name structure is otherwise identical to the audited replica-0 world.
_CODE_SPACE = 26 ** 5
_CODE_MULT = 9999991  # prime, coprime with 26^5


def _replica_code(replica: int, token_idx: int) -> str:
    n = ((replica * 64 + token_idx) * _CODE_MULT) % _CODE_SPACE
    letters = []
    for _ in range(5):
        letters.append(chr(ord("a") + n % 26))
        n //= 26
    letters[0] = letters[0].upper()
    return "".join(letters)


def _replica_token_map(replica: int) -> dict[str, str]:
    """Stable first-token → code map for one replica (>0)."""
    tokens: list[str] = []
    seen = set()
    for _fam, parent, _t, _s, _c, members in FAMILIES:
        for name in ([parent] if parent else []) + [m[0] for m in members] + \
                [m[6] for m in members if m[6]]:
            tok = name.split()[0]
            if tok not in seen:
                seen.add(tok)
                tokens.append(tok)
    assert len(tokens) < 56, "code block (64) too small for family tokens"
    return {tok: _replica_code(replica, i) for i, tok in enumerate(tokens)}


def _rename_for_replica(name: str | None, token_map: dict[str, str]) -> str | None:
    if not name:
        return name
    first, _, rest = name.partition(" ")
    code = token_map.get(first, first)
    return f"{code} {rest}" if rest else code


# ── deterministic "faker" helpers ──────────────────────────────────────────


def _street_address(rng: random.Random) -> str:
    return f"{rng.randint(100, 9999)} {rng.choice(STREET_NAMES)} {rng.choice(STREET_KINDS)}"


def _zipcode(rng: random.Random, state: str = "") -> str:
    """State-deterministic zip3 prefix (like real USPS allocation): the zip3
    blocking key then can't collide across states, mirroring reality."""
    if state in STATES:
        zip3 = 100 + STATES.index(state) * 17
    else:
        zip3 = 100 + rng.randint(0, 49) * 17
    return f"{zip3:03d}{rng.randint(0, 99):02d}"


def _phone(rng: random.Random) -> str:
    return f"{rng.randint(200, 989)}-{rng.randint(200, 989)}-{rng.randint(0, 9999):04d}"


def _city(rng: random.Random) -> str:
    return rng.choice(CITY_NAMES)


def _media_hash(*parts) -> str:
    return hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


# ── messiness (FIXTURES.md §2 distribution) ────────────────────────────────


def _name_variant(rng: random.Random, name: str, source: str) -> str:
    r = rng.random()
    if source == "crm":
        if r < 0.3:
            suffix = rng.choice(LEGAL_SUFFIXES)
            return f"{name}, {suffix}" if r < 0.15 else f"{name} {suffix}"
        return name
    if source == "claims":
        n = name.upper()
        if r < 0.4:
            n = n.replace(",", "").replace(".", "")
        if r < 0.3 and "BLUE CROSS" in n:
            n = n.replace("BLUE CROSS BLUE SHIELD", rng.choice(BCBS_FORMS).upper())
        return n
    if source == "credentialing":
        if r < 0.2:
            return f"{name} Health Inc."
        if r < 0.35:
            return name.replace("Healthcare", "Health Care")
        return name
    if source == "cms_reference":
        if r < 0.15:
            return name.replace(", Inc.", "").replace(" Inc.", "").replace(" Inc", "")
        return name
    return name


def _address_variant(rng: random.Random, addr: str) -> str:
    r = rng.random()
    for full, alts in STREET_SUFFIX_MESS.items():
        if full in addr and r < 0.5:
            addr = addr.replace(full, rng.choice(alts))
    return addr


def _state_variant(rng: random.Random, code: str, source: str) -> str:
    if source == "claims" and rng.random() < 0.4:
        full = STATE_NAMES.get(code, code)
        return rng.choice([full, full.lower(), code.lower()])
    return code


def _zip_variant(rng: random.Random, z: str, source: str) -> str:
    if not z:
        return z
    r = rng.random()
    if source in ("claims", "cms_reference") and r < 0.3:
        return f"{z}-{rng.randint(1000, 9999)}"
    if source == "claims" and r < 0.15:
        return z.lstrip("0") or z
    return z


def _phone_variant(rng: random.Random, phone):
    if not phone:
        return None
    d = "".join(c for c in phone if c.isdigit())
    if len(d) < 10:
        return phone
    d = d[-10:]
    return rng.choice([
        f"{d[:3]}-{d[3:6]}-{d[6:]}",
        f"({d[:3]}) {d[3:6]}-{d[6:]}",
        d,
        f"{d[:3]}.{d[3:6]}.{d[6:]}",
        f"1-{d[:3]}-{d[3:6]}-{d[6:]}",
    ])


def _maybe_null(rng: random.Random, value, probability=0.15):
    return None if rng.random() < probability else value


def _tax_id_variant(rng: random.Random, tax_id, source: str):
    if not tax_id:
        return None
    d = "".join(c for c in tax_id if c.isdigit())
    r = rng.random()
    if source == "crm":
        return f"{d[:2]}-{d[2:]}" if len(d) >= 3 else d
    if source == "claims" and r < 0.1:
        lst = list(d)
        if len(lst) >= 5:
            i = rng.randint(2, len(lst) - 2)
            lst[i], lst[i + 1] = lst[i + 1], lst[i]
        return "".join(lst)
    return d


def _maybe_stale_status(rng: random.Random, is_active: bool, source: str) -> bool:
    if source == "claims" and not is_active and rng.random() < 0.15:
        return True
    return is_active


# ── canonical entity builder ───────────────────────────────────────────────


class _TaxPool:
    """Allocates unique 9-digit tax ids: a replica-derived 4-digit prefix
    (cross-replica DET-1 exact matches impossible for <9000 replicas) plus
    a 5-digit suffix kept at pairwise hamming distance ≥ 3 within the
    replica, so cross-entity TIN_TRANS (≤2-digit difference → 0.7/0.9,
    `11_ensemble_udfs.sql:276-300`) can never fire between distinct
    entities — within-entity typo messiness still exercises it."""

    def __init__(self, rng: random.Random, replica: int = 0):
        self.rng = rng
        self.prefix = f"{1000 + replica % 9000:04d}"
        self.assigned: list[str] = []

    def next(self) -> str:
        while True:
            cand = f"{self.rng.randint(10000, 99999)}"
            if all(sum(a != b for a, b in zip(cand, t)) >= 3 for t in self.assigned):
                self.assigned.append(cand)
                return self.prefix + cand


def _audit_separable(names_states: list[tuple[str, str]]) -> bool:
    """True iff no two distinct same-state entities have clean names that are
    equal (DET-3 hard merge) or route to a name score ≥ 0.83 (a name-only
    FUZZY pair would clear the 0.85 auto-match threshold after weight
    renormalization). Corpus-design invariant for the F1 ≥ 0.99 gate."""
    import re

    from payor_linkage.strategies import route_name

    rx = r"(?i)\s*(,\s*)?(Inc\.?|LLC\.?|Corp\.?|Co\.?|Ltd\.?|L\.?P\.?|L\.?L\.?C\.?|P\.?C\.?)\s*$"
    cleaned = [(re.sub(rx, "", n, count=1).strip().upper(), s) for n, s in names_states]
    for i in range(len(cleaned)):
        for j in range(i + 1, len(cleaned)):
            (na, sa), (nb, sb) = cleaned[i], cleaned[j]
            if sa != sb:
                continue
            if na == nb or route_name(na, nb)[0] >= 0.83:
                return False
    return True


def build_entities(rng: random.Random, replica: int = 0) -> list[dict]:
    """Canonical entities for one replica world. Replica 0 uses the authored
    families verbatim; replica k>0 coins new brands + identifiers so worlds
    never cross-match. Identifiers (tax, cms) are allocated uniquely per
    entity — distinct entities never share or nearly-share an identifier.
    Coined brands are rejection-sampled until the same-state name audit
    passes (separability invariant)."""
    entities = []
    eid_base = replica * 1_000_000
    eid = 0
    taxes = _TaxPool(rng, replica)
    cms_counter = [0]

    def next_cms() -> str:
        # 'H' + base36(replica*64 + idx): globally unique across replicas
        # (cross-replica CMS_EXACT / CMS_PFX can never fire)
        n = replica * 64 + cms_counter[0]
        cms_counter[0] += 1
        digits36 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        out = []
        for _ in range(4):
            out.append(digits36[n % 36])
            n //= 36
        return "H" + "".join(out)
    token_map = _replica_token_map(replica) if replica > 0 else {}
    for fam_id, parent_name, parent_tax, parent_state, parent_city, members in FAMILIES:
        if replica > 0:
            rename = lambda n: _rename_for_replica(n, token_map)  # noqa: E731
            fam_id = f"{fam_id}~r{replica}"
            parent_name = rename(parent_name)
        else:
            rename = lambda n: n  # noqa: E731
        parent_tax = taxes.next() if parent_name else None

        parent_eid = None
        if parent_name:
            eid += 1
            entities.append({
                "entity_id": eid_base + eid, "family_id": fam_id, "name": parent_name,
                "tax_id": parent_tax, "state": parent_state, "city": parent_city,
                "address": _street_address(rng), "zip": _zipcode(rng, parent_state), "phone": _phone(rng),
                "website": f"https://www.{parent_name.lower().replace(' ', '').replace(',', '')[:20]}.com",
                "type": "commercial", "lob": "PPO", "is_parent": True,
                "parent_entity_id": None, "parent_name": None, "is_active": True,
                "effective_date": date(2000 + rng.randint(0, 15), 1, 1),
                "dba": None, "cms_plan_id": None,
                "npi": f"1{rng.randint(100000000, 999999999)}" if rng.random() < 0.3 else None,
            })
            parent_eid = eid_base + eid

        for (name, etype, lob, st, tax, cms, dba) in members:
            eid += 1
            name = rename(name)
            dba = rename(dba)
            tax = taxes.next()
            cms = next_cms() if cms else None
            entities.append({
                "entity_id": eid_base + eid, "family_id": fam_id, "name": name,
                "tax_id": tax, "state": st or parent_state,
                "city": _city(rng),
                "address": _street_address(rng), "zip": _zipcode(rng, st or parent_state), "phone": _phone(rng),
                "website": f"https://www.{name.lower().replace(' ', '')[:20]}.com",
                "type": etype, "lob": lob, "is_parent": False,
                "parent_entity_id": parent_eid, "parent_name": parent_name,
                "is_active": rng.random() > 0.08,
                "effective_date": date(2000 + rng.randint(0, 20), rng.randint(1, 12), 1),
                "dba": dba, "cms_plan_id": cms,
                "npi": f"1{rng.randint(100000000, 999999999)}" if rng.random() < 0.2 else None,
            })
    return entities


# ── per-source record builders (field dicts) ───────────────────────────────


def _crm_record(rng, e, idx):
    return {
        "source_id": f"CRM-{idx:04d}",
        "payor_name": _name_variant(rng, e["name"], "crm"),
        "payor_name_alt": e.get("dba") or (e["parent_name"] if rng.random() < 0.2 else None),
        "tax_id": _tax_id_variant(rng, e["tax_id"], "crm"),
        "npi": e.get("npi"),
        "cms_plan_id": e.get("cms_plan_id"),
        "address_line_1": _address_variant(rng, e["address"]),
        "address_line_2": f"Suite {rng.randint(100, 999)}" if rng.random() < 0.3 else None,
        "city": e["city"],
        "state": e["state"],
        "zip": e["zip"],
        "phone": _phone_variant(rng, e["phone"]),
        "website": _maybe_null(rng, e["website"], 0.1),
        "payor_type": e["type"],
        "parent_ref": (e["parent_name"] if e.get("parent_entity_id") and rng.random() < 0.6 else None),
        "status": "active" if e["is_active"] else rng.choice(["inactive", "terminated"]),
        "effective_date": e["effective_date"].isoformat(),
        "termination_date": ((e["effective_date"] + timedelta(days=rng.randint(365, 3650))).isoformat()
                             if not e["is_active"] else None),
    }


def _claims_record(rng, e, idx):
    addr1 = _address_variant(rng, e["address"])
    addr2 = f"Ste {rng.randint(100, 999)}" if rng.random() < 0.2 else None
    st = _state_variant(rng, e["state"], "claims")
    zp = _zip_variant(rng, e["zip"], "claims")
    parts = [p for p in [addr1, addr2, e["city"], st, zp] if p]
    return {
        "source_id": f"CLM-{idx:04d}",
        "payor_name": _name_variant(rng, e["name"], "claims"),
        "tax_id": _tax_id_variant(rng, _maybe_null(rng, e["tax_id"], 0.15), "claims"),
        "address_single_line": ", ".join(parts),
        "city": _maybe_null(rng, e["city"], 0.1),
        "state": st,
        "zip": zp,
        "payor_type": _maybe_null(rng, e["type"], 0.1),
        "line_of_business": e["lob"],
        "status": "true" if _maybe_stale_status(rng, e["is_active"], "claims") else "false",
    }


def _cred_record(rng, e, idx):
    return {
        "source_id": f"CRED-{idx:04d}",
        "payor_name": _name_variant(rng, e["name"], "credentialing"),
        "payor_name_alt": e.get("dba") or (_name_variant(rng, e["name"], "claims") if rng.random() < 0.15 else None),
        "tax_id": _tax_id_variant(rng, _maybe_null(rng, e["tax_id"], 0.2), "credentialing"),
        "address_line_1": _address_variant(rng, e["address"]),
        "address_line_2": f"Suite {rng.randint(100, 999)}" if rng.random() < 0.25 else None,
        "city": e["city"],
        "state": e["state"],
        "zip": _zip_variant(rng, e["zip"], "credentialing"),
        "phone": _phone_variant(rng, _maybe_null(rng, e["phone"], 0.2)),
        "payor_type": e["lob"],
        "status": rng.choice(["in_network", "in_network", "in_network", "out_of_network", "pending"]),
    }


def _ref_record(rng, e, idx):
    return {
        "source_id": f"REF-{idx:04d}",
        "payor_name": _name_variant(rng, e["name"], "cms_reference"),
        "payor_name_alt": e.get("parent_name") if rng.random() < 0.7 else None,
        "parent_ref": e.get("parent_name") if rng.random() < 0.7 else None,
        "tax_id": e["tax_id"],
        "cms_plan_id": e.get("cms_plan_id"),
        "payor_type": e["type"],
        "state": e["state"],
    }


_SOURCE_BUILDERS = {
    "crm": _crm_record, "claims": _claims_record,
    "credentialing": _cred_record, "cms_reference": _ref_record,
}
_SOURCE_PREFIX = {"crm": "crm", "claims": "claims", "credentialing": "cred", "cms_reference": "ref"}


# ── record → interleaved document ──────────────────────────────────────────


def _record_to_document(rng: random.Random, source: str, rec: dict, entity: dict | None,
                        loaded_at: datetime, replica: int = 0) -> dict:
    """Build one interleaved document: text spans for every non-null field,
    media spans (logo/scan) with entity-linked refs, order seeded-shuffled,
    offsets strictly increasing. Replica worlds embed the replica index in
    the source_id so record ids are globally unique (doc_id is the join /
    blocking / clustering identity — collisions would hard-merge worlds)."""
    sid = rec["source_id"] if replica == 0 else f"R{replica:05d}-{rec['source_id']}"
    doc_id = f"{_SOURCE_PREFIX[source]}:{sid}"
    fields = [("source_system", source)]
    for k, v in rec.items():
        if k == "source_id" or v is None:
            continue
        fields.append((k, str(v)))
    fields.append(("loaded_at", loaded_at.isoformat(sep=" ")))

    spans = [(k, v, "") for k, v in fields]

    # media spans: logo (p=.5), scan (p=.25); same-entity ref with p=.7
    if entity is not None:
        if rng.random() < 0.5:
            ref = (_media_hash(entity["family_id"], entity["entity_id"], "logo")
                   if rng.random() < 0.7 else _media_hash(doc_id, "logo", rng.random()))
            spans.append(("logo", "", ref))
        if rng.random() < 0.25:
            ref = (_media_hash(entity["family_id"], entity["entity_id"], "scan")
                   if rng.random() < 0.7 else _media_hash(doc_id, "scan", rng.random()))
            spans.append(("scan", "", ref))

    rng.shuffle(spans)
    out, offset = [], 0
    for kind, text, media_ref in spans:
        out.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
        offset += max(len(text), 1) + 1
    return {"doc_id": doc_id, "spans": out,
            "entity_id": entity["entity_id"] if entity else -1,
            "family_id": entity["family_id"] if entity else "~orphan"}


# ── replica world builder ──────────────────────────────────────────────────

_BASE_LOADED_AT = datetime(2024, 6, 1, 0, 0, 0)


def build_replica(replica: int = 0, seed: int = SEED) -> pa.Table:
    """All documents of one replica world as an Arrow table
    (DOCUMENT_LABELED_SCHEMA). Fully deterministic in (replica, seed)."""
    rng = random.Random(f"{seed}|{replica}")
    entities = build_entities(rng, replica)

    docs: list[dict] = []
    counters = dict.fromkeys(_SOURCE_BUILDERS, 0)
    rec_no = 0

    def loaded_at() -> datetime:
        # distinct, deterministic timestamps so most_recent survivorship
        # has a real ordering to pick from
        nonlocal rec_no
        rec_no += 1
        return _BASE_LOADED_AT + timedelta(minutes=rec_no * 7 % 10007, seconds=rec_no % 53)

    for e in entities:
        for source, prob in SOURCE_PROBS:
            if rng.random() < prob:
                counters[source] += 1
                rec = _SOURCE_BUILDERS[source](rng, e, counters[source])
                docs.append(_record_to_document(rng, source, rec, e, loaded_at(), replica))
                # 5% within-source duplicate in CRM with a claims-style name
                if source == "crm" and rng.random() < 0.05:
                    counters[source] += 1
                    dup = _crm_record(rng, e, counters[source])
                    dup["payor_name"] = _name_variant(rng, e["name"], "claims")
                    docs.append(_record_to_document(rng, "crm", dup, e, loaded_at(), replica))

    # orphan records: CRM-only, unmatched by construction (taxes drawn from
    # the same separated pool so they can't near-collide with entities)
    orphan_taxes = _TaxPool(rng, replica)
    orphan_taxes.assigned = [e["tax_id"][4:] for e in entities if e["tax_id"]]
    for orphan_i in range(rng.randint(5, 8)):
        counters["crm"] += 1
        tax = orphan_taxes.next()
        orphan = {
            "source_id": f"CRM-{counters['crm']:04d}",
            # first token from the replica's reserved code block (56..63) →
            # globally unique; no cross-replica orphan name collisions
            "payor_name": f"{_replica_code(replica, 56 + orphan_i)} {_coin_brand(rng)} Health Plan",
            "payor_name_alt": None,
            "tax_id": f"{tax[:2]}-{tax[2:]}",
            "npi": None, "cms_plan_id": None,
            "address_line_1": _street_address(rng), "address_line_2": None,
            "city": _city(rng), "state": (ostate := rng.choice(STATES)), "zip": _zipcode(rng, ostate),
            "phone": _phone(rng), "website": None,
            "payor_type": rng.choice(["commercial", "exchange"]),
            "parent_ref": None, "status": "active",
            "effective_date": date(2022, 1, 1).isoformat(), "termination_date": None,
        }
        docs.append(_record_to_document(rng, "crm", orphan, None, loaded_at(), replica))

    # parent/child confusion: child claims record carrying the parent's name.
    # Only for children in a *different* state than the parent — same-state
    # confusion would DET-3 hard-merge parent and child clusters (ground
    # truth would be unreachable for the reference semantics too); the
    # different-state case still exercises the near-miss (name 1.0, all
    # identifiers divergent → FUZZY review band).
    parent_state = {e["name"]: e["state"] for e in entities if e["is_parent"]}
    confused = 0
    for e in entities:
        if (e.get("parent_name") and rng.random() < 0.25 and confused < 8
                and e["state"] != parent_state.get(e["parent_name"])):
            counters["claims"] += 1
            rec = _claims_record(rng, e, counters["claims"])
            rec["payor_name"] = _name_variant(rng, e["parent_name"], "claims")
            rec["tax_id"] = _tax_id_variant(rng, e["tax_id"], "claims")
            docs.append(_record_to_document(rng, "claims", rec, e, loaded_at(), replica))
            confused += 1

    return pa.Table.from_pylist(docs, schema=DOCUMENT_LABELED_SCHEMA)


def synth_documents(n_replicas: int = 1, seed: int = SEED, parallelism: int | None = None):
    """Ray Dataset of interleaved documents across ``n_replicas`` worlds.

    Distributed synth: one task per replica index via ``map_batches`` over a
    range Dataset — no driver-side corpus materialization, scales to any
    replica count."""
    import ray.data as rd

    if n_replicas == 1:
        return rd.from_arrow(build_replica(0, seed))

    def gen(batch: pa.Table) -> pa.Table:
        tables = [build_replica(int(r), seed) for r in batch["id"].to_pylist()]
        return pa.concat_tables(tables)

    n_blocks = min(n_replicas, parallelism or n_replicas)
    return (
        rd.range(n_replicas, override_num_blocks=n_blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
    )

"""Phonetic algorithms: Jaro / Jaro-Winkler, Soundex, Double Metaphone.

Pure-Python implementations of the published public-domain algorithms
(W. E. Winkler 1990; R. C. Russell soundex; L. Philips' Double Metaphone,
C/C++ reference published in Dr. Dobb's Journal, June 2000).

Semantics mirror the scalar UDFs the reference pipeline uses
(`/root/reference/snowflake/11_ensemble_udfs.sql:17-66`): Jaro-Winkler
with the standard 0.7 boost threshold, prefix scale 0.1, max prefix 4
(the behaviour of the ``jellyfish`` package the reference imports), and
Double Metaphone returning a (primary, secondary) code pair.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# Jaro / Jaro-Winkler
# ---------------------------------------------------------------------------


def jaro_similarity(s1: str, s2: str) -> float:
    """Classic Jaro similarity in [0, 1]."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0

    search_range = max(len1, len2) // 2 - 1
    if search_range < 0:
        search_range = 0

    flags1 = [False] * len1
    flags2 = [False] * len2

    # count matches
    common = 0
    for i, ch in enumerate(s1):
        lo = i - search_range if i > search_range else 0
        hi = i + search_range + 1
        if hi > len2:
            hi = len2
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                common += 1
                break

    if common == 0:
        return 0.0

    # count transpositions between matched characters, in order
    k = 0
    trans = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                trans += 1
            k += 1
    trans //= 2

    common_f = float(common)
    return (
        common_f / len1 + common_f / len2 + (common_f - trans) / common_f
    ) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler: Jaro boosted for a shared prefix (<=4 chars) when the
    base Jaro similarity exceeds 0.7 — matching ``jellyfish``'s behaviour."""
    sim = jaro_similarity(s1, s2)
    if sim > 0.7:
        prefix = 0
        for a, b in zip(s1, s2):
            if a != b or prefix == 4:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
    return sim


# ---------------------------------------------------------------------------
# Soundex (used for the phonetic blocking key the north rule requires)
# ---------------------------------------------------------------------------

_SOUNDEX_CODES = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(s: str) -> str:
    """American Soundex of the first alphabetic token-ish prefix of ``s``."""
    s = "".join(ch for ch in s.upper() if "A" <= ch <= "Z")
    if not s:
        return ""
    first = s[0]
    # Encode, collapsing runs; H/W are transparent (do not break runs),
    # vowels break runs.
    out = [first]
    prev = _SOUNDEX_CODES.get(first, "")
    for ch in s[1:]:
        code = _SOUNDEX_CODES.get(ch, "")
        if ch in "HW":
            continue
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        prev = code
    return "".join(out).ljust(4, "0")


# ---------------------------------------------------------------------------
# Double Metaphone (L. Philips, 2000)
# ---------------------------------------------------------------------------

_VOWELS = frozenset("AEIOUY")


def _is_slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


@lru_cache(maxsize=65536)
def doublemetaphone(value: str) -> tuple[str, str]:
    """Return (primary, secondary) Double Metaphone codes for ``value``.

    Faithful implementation of the published algorithm; matches the PyPI
    ``metaphone`` package the reference UDF imports for the vocabulary of
    organisation names this pipeline sees. Codes are unbounded length
    (the reference's comparison is on full equality, not 4-char truncation).
    """
    st = "".join(ch for ch in value.upper() if "A" <= ch <= "Z")
    length = len(st)
    if length == 0:
        return ("", "")
    # pad to avoid index errors
    padded = st + "     "
    first = 0
    last = length - 1
    pos = 0
    pri: list[str] = []
    sec: list[str] = []
    slavo = _is_slavo_germanic(st)

    def char(i: int) -> str:
        return padded[i] if 0 <= i < length else ""

    def string_at(start: int, slen: int, *subs: str) -> bool:
        if start < 0:
            return False
        return padded[start : start + slen] in subs

    def add(p: str, s: str | None = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    # skip silent initial letters
    if string_at(0, 2, "GN", "KN", "PN", "WR", "PS"):
        pos += 1

    # initial X is pronounced Z (e.g. Xavier)
    if char(0) == "X":
        add("S")
        pos += 1

    while pos < length:
        ch = char(pos)

        if ch in _VOWELS:
            if pos == first:
                add("A")
            pos += 1
            continue

        if ch == "B":
            add("P")
            pos += 2 if char(pos + 1) == "B" else 1
            continue

        if ch == "\xc7":  # never hit (stripped above) — kept for clarity
            add("S")
            pos += 1
            continue

        if ch == "C":
            # germanic 'ACH' e.g. 'macher'
            if (
                pos > first + 1
                and char(pos - 2) not in _VOWELS
                and string_at(pos - 1, 3, "ACH")
                and char(pos + 2) != "I"
                and (
                    char(pos + 2) != "E"
                    or string_at(pos - 2, 6, "BACHER", "MACHER")
                )
            ):
                add("K")
                pos += 2
                continue
            # special 'caesar'
            if pos == first and string_at(first, 6, "CAESAR"):
                add("S")
                pos += 2
                continue
            if string_at(pos, 4, "CHIA"):
                add("K")
                pos += 2
                continue
            if string_at(pos, 2, "CH"):
                if pos > first and string_at(pos, 4, "CHAE"):
                    add("K", "X")
                    pos += 2
                    continue
                if (
                    pos == first
                    and (
                        string_at(pos + 1, 5, "HARAC", "HARIS")
                        or string_at(pos + 1, 3, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not string_at(first, 5, "CHORE")
                ):
                    add("K")
                    pos += 2
                    continue
                if (
                    string_at(first, 4, "VAN ", "VON ")
                    or string_at(first, 3, "SCH")
                    or string_at(pos - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                    or string_at(pos + 2, 1, "T", "S")
                    or (
                        (char(pos - 1) in "AOUE" or pos == first)
                        and string_at(pos + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
                    )
                ):
                    add("K")
                else:
                    if pos > first:
                        if string_at(first, 2, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                pos += 2
                continue
            if string_at(pos, 2, "CZ") and not string_at(pos - 2, 4, "WICZ"):
                add("S", "X")
                pos += 2
                continue
            if string_at(pos + 1, 3, "CIA"):
                add("X")
                pos += 3
                continue
            if string_at(pos, 2, "CC") and not (pos == first + 1 and char(first) == "M"):
                if string_at(pos + 2, 1, "I", "E", "H") and not string_at(pos + 2, 2, "HU"):
                    if (pos == first + 1 and char(first) == "A") or string_at(
                        pos - 1, 5, "UCCEE", "UCCES"
                    ):
                        add("KS")
                    else:
                        add("X")
                    pos += 3
                    continue
                else:
                    add("K")
                    pos += 2
                    continue
            if string_at(pos, 2, "CK", "CG", "CQ"):
                add("K")
                pos += 2
                continue
            if string_at(pos, 2, "CI", "CE", "CY"):
                if string_at(pos, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                pos += 2
                continue
            add("K")
            if string_at(pos + 1, 2, " C", " Q", " G"):
                pos += 3
            elif string_at(pos + 1, 1, "C", "K", "Q") and not string_at(pos + 1, 2, "CE", "CI"):
                pos += 2
            else:
                pos += 1
            continue

        if ch == "D":
            if string_at(pos, 2, "DG"):
                if string_at(pos + 2, 1, "I", "E", "Y"):
                    add("J")
                    pos += 3
                    continue
                else:
                    add("TK")
                    pos += 2
                    continue
            if string_at(pos, 2, "DT", "DD"):
                add("T")
                pos += 2
                continue
            add("T")
            pos += 1
            continue

        if ch == "F":
            pos += 2 if char(pos + 1) == "F" else 1
            add("F")
            continue

        if ch == "G":
            if char(pos + 1) == "H":
                if pos > first and char(pos - 1) not in _VOWELS:
                    add("K")
                    pos += 2
                    continue
                if pos == first:
                    if char(pos + 2) == "I":
                        add("J")
                    else:
                        add("K")
                    pos += 2
                    continue
                if (
                    (pos > first + 1 and char(pos - 2) in "BHD")
                    or (pos > first + 2 and char(pos - 3) in "BHD")
                    or (pos > first + 3 and char(pos - 4) in "BH")
                ):
                    pos += 2
                    continue
                if pos > first + 2 and char(pos - 1) == "U" and char(pos - 3) in "CGLRT":
                    add("F")
                elif pos > first and char(pos - 1) != "I":
                    add("K")
                pos += 2
                continue
            if char(pos + 1) == "N":
                if pos == first + 1 and char(first) in _VOWELS and not slavo:
                    add("KN", "N")
                else:
                    if not string_at(pos + 2, 2, "EY") and char(pos + 1) != "Y" and not slavo:
                        add("N", "KN")
                    else:
                        add("KN")
                pos += 2
                continue
            if string_at(pos + 1, 2, "LI") and not slavo:
                add("KL", "L")
                pos += 2
                continue
            if pos == first and (
                char(pos + 1) == "Y"
                or string_at(pos + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
            ):
                add("K", "J")
                pos += 2
                continue
            if (
                string_at(pos + 1, 2, "ER") or char(pos + 1) == "Y"
            ) and not string_at(first, 6, "DANGER", "RANGER", "MANGER") and char(pos - 1) not in "EI" and not string_at(
                pos - 1, 3, "RGY", "OGY"
            ):
                add("K", "J")
                pos += 2
                continue
            if char(pos + 1) in "EIY" or string_at(pos - 1, 4, "AGGI", "OGGI"):
                if (
                    string_at(first, 4, "VAN ", "VON ")
                    or string_at(first, 3, "SCH")
                    or string_at(pos + 1, 2, "ET")
                ):
                    add("K")
                elif string_at(pos + 1, 4, "IER "):
                    add("J")
                else:
                    add("J", "K")
                pos += 2
                continue
            add("K")
            pos += 2 if char(pos + 1) == "G" else 1
            continue

        if ch == "H":
            if (pos == first or char(pos - 1) in _VOWELS) and char(pos + 1) in _VOWELS:
                add("H")
                pos += 2
            else:
                pos += 1
            continue

        if ch == "J":
            if string_at(pos, 4, "JOSE") or string_at(first, 4, "SAN "):
                if (pos == first and char(pos + 4) == " ") or string_at(first, 4, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                pos += 1
                continue
            if pos == first and not string_at(pos, 4, "JOSE"):
                add("J", "A")
            else:
                if char(pos - 1) in _VOWELS and not slavo and char(pos + 1) in "AO":
                    add("J", "H")
                else:
                    if pos == last:
                        add("J", "")
                    else:
                        if not string_at(pos + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z") and char(
                            pos - 1
                        ) not in "SKL":
                            add("J")
            pos += 2 if char(pos + 1) == "J" else 1
            continue

        if ch == "K":
            pos += 2 if char(pos + 1) == "K" else 1
            add("K")
            continue

        if ch == "L":
            if char(pos + 1) == "L":
                # spanish e.g. 'cabrillo', 'gallegos'
                if (
                    pos == length - 3
                    and string_at(pos - 1, 4, "ILLO", "ILLA", "ALLE")
                ) or (
                    (string_at(last - 1, 2, "AS", "OS") or char(last) in "AO")
                    and string_at(pos - 1, 4, "ALLE")
                ):
                    add("L", "")
                    pos += 2
                    continue
                pos += 2
            else:
                pos += 1
            add("L")
            continue

        if ch == "M":
            if (
                string_at(pos - 1, 3, "UMB")
                and (pos + 1 == last or string_at(pos + 2, 2, "ER"))
            ) or char(pos + 1) == "M":
                pos += 2
            else:
                pos += 1
            add("M")
            continue

        if ch == "N":
            pos += 2 if char(pos + 1) == "N" else 1
            add("N")
            continue

        if ch == "P":
            if char(pos + 1) == "H":
                add("F")
                pos += 2
                continue
            pos += 2 if char(pos + 1) in "PB" else 1
            add("P")
            continue

        if ch == "Q":
            pos += 2 if char(pos + 1) == "Q" else 1
            add("K")
            continue

        if ch == "R":
            # french e.g. 'rogier'
            if (
                pos == last
                and not slavo
                and string_at(pos - 2, 2, "IE")
                and not string_at(pos - 4, 2, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            pos += 2 if char(pos + 1) == "R" else 1
            continue

        if ch == "S":
            if string_at(pos - 1, 3, "ISL", "YSL"):
                pos += 1
                continue
            if pos == first and string_at(first, 5, "SUGAR"):
                add("X", "S")
                pos += 1
                continue
            if string_at(pos, 2, "SH"):
                if string_at(pos + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                pos += 2
                continue
            if string_at(pos, 3, "SIO", "SIA") or string_at(pos, 4, "SIAN"):
                if not slavo:
                    add("S", "X")
                else:
                    add("S")
                pos += 3
                continue
            if (
                pos == first and string_at(pos + 1, 1, "M", "N", "L", "W")
            ) or string_at(pos + 1, 1, "Z"):
                add("S", "X")
                pos += 2 if string_at(pos + 1, 1, "Z") else 1
                continue
            if string_at(pos, 2, "SC"):
                if char(pos + 2) == "H":
                    if string_at(pos + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if string_at(pos + 3, 2, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                        pos += 3
                        continue
                    else:
                        if pos == first and char(first + 3) not in _VOWELS and char(first + 3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                        pos += 3
                        continue
                if string_at(pos + 2, 1, "I", "E", "Y"):
                    add("S")
                    pos += 3
                    continue
                add("SK")
                pos += 3
                continue
            if pos == last and string_at(pos - 2, 2, "AI", "OI"):
                add("", "S")
            else:
                add("S")
            pos += 2 if string_at(pos + 1, 1, "S", "Z") else 1
            continue

        if ch == "T":
            if string_at(pos, 4, "TION"):
                add("X")
                pos += 3
                continue
            if string_at(pos, 3, "TIA", "TCH"):
                add("X")
                pos += 3
                continue
            if string_at(pos, 2, "TH") or string_at(pos, 3, "TTH"):
                if string_at(pos + 2, 2, "OM", "AM") or string_at(first, 4, "VAN ", "VON ") or string_at(
                    first, 3, "SCH"
                ):
                    add("T")
                else:
                    add("0", "T")
                pos += 2
                continue
            pos += 2 if string_at(pos + 1, 1, "T", "D") else 1
            add("T")
            continue

        if ch == "V":
            pos += 2 if char(pos + 1) == "V" else 1
            add("F")
            continue

        if ch == "W":
            if string_at(pos, 2, "WR"):
                add("R")
                pos += 2
                continue
            if pos == first and (char(pos + 1) in _VOWELS or string_at(pos, 2, "WH")):
                if char(pos + 1) in _VOWELS:
                    add("A", "F")
                else:
                    add("A")
            if (pos == last and char(pos - 1) in _VOWELS) or string_at(
                pos - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY"
            ) or string_at(first, 3, "SCH"):
                add("", "F")
                pos += 1
                continue
            if string_at(pos, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                pos += 4
                continue
            pos += 1
            continue

        if ch == "X":
            if not (
                pos == last
                and (string_at(pos - 3, 3, "IAU", "EAU") or string_at(pos - 2, 2, "AU", "OU"))
            ):
                add("KS")
            pos += 2 if char(pos + 1) in "CX" else 1
            continue

        if ch == "Z":
            if char(pos + 1) == "H":
                add("J")
                pos += 2
                continue
            if string_at(pos + 1, 2, "ZO", "ZI", "ZA") or (slavo and pos > first and char(pos - 1) != "T"):
                add("S", "TS")
            else:
                add("S")
            pos += 2 if char(pos + 1) == "Z" else 1
            continue

        pos += 1

    p = "".join(pri)
    s = "".join(sec)
    if p == s:
        s = ""
    return (p, s)

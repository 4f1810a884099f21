"""Pair scoring: deterministic rules + ensemble similarity, as an actor pool.

The reference's one stateful compute stage (`int_match_scored.sql` +
`snowflake/11_ensemble_udfs.sql`) becomes
``pairs.map_batches(EnsembleScorer, concurrency=..., batch_format="pyarrow")``:
dictionaries/caches live once per actor (SURVEY §2.5), each batch is a few
thousand pairs.

Semantics replicated exactly:
- C1 rule classifier (`int_match_scored.sql:25-31`): DET-1 equal non-null
  tax_id; DET-2 equal non-null cms_plan_id; DET-3 equal payor_name_clean
  AND state_code (SQL null-equality → not a match); else FUZZY.
- C2 address concat (`int_match_scored.sql:39-42`): the whole address arg
  is NULL when address_line_1 is NULL (SQL `||` null propagation) — the
  quirk is preserved.
- C3 ensemble invocation once per pair; flat per-field score columns.
- C4 overall: deterministic pairs forced to 1.0, fuzzy pairs = composite.
- graft addition: ``media_score`` — hash equality on the documents'
  media_ref fingerprints (1.0 equal / 0.0 differing / null when either
  side has no media). Reported as its own column; the reference composite
  and decisions are NOT altered by it.

Scoring throughput is the headline bench metric (pairs-scored/sec); the
per-pair Python is minimized by caching routed name/address scores per
actor — block-mates share values heavily, so the cache hit rate is high.
"""

from __future__ import annotations

import pyarrow as pa

from payor_linkage.strategies import digits, route_addr, route_name


class EnsembleScorer:
    """Callable class for ``map_batches`` — one instance per pool actor."""

    def __init__(self, emit_ensemble_detail: bool = False) -> None:
        # per-actor memo caches (name/addr routing dominates pair cost)
        self._name_cache: dict[tuple[str, str], tuple[float, str]] = {}
        self._addr_cache: dict[tuple[str, str], tuple[float, str]] = {}
        self._emit_detail = emit_ensemble_detail

    # -- cached single-field scorers ------------------------------------
    def _name(self, a: str, b: str) -> tuple[float, str]:
        key = (a, b) if a <= b else (b, a)
        hit = self._name_cache.get(key)
        if hit is None:
            score, strat, _ = route_name(a.upper().strip(), b.upper().strip())
            hit = (score, strat)
            if len(self._name_cache) < 2_000_000:
                self._name_cache[key] = hit
        return hit

    def _addr(self, a: str, b: str) -> tuple[float, str]:
        key = (a, b) if a <= b else (b, a)
        hit = self._addr_cache.get(key)
        if hit is None:
            score, strat, _ = route_addr(a.upper().strip(), b.upper().strip())
            hit = (score, strat)
            if len(self._addr_cache) < 2_000_000:
                self._addr_cache[key] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        col = {c: batch[c].to_pylist() for c in (
            "source_record_id_a", "source_record_id_b",
            "payor_name_clean_a", "payor_name_clean_b",
            "tax_id_a", "tax_id_b", "cms_plan_id_a", "cms_plan_id_b",
            "state_code_a", "state_code_b",
            "address_line_1_a", "address_line_1_b",
            "city_a", "city_b", "zip_code_a", "zip_code_b",
            "phone_a", "phone_b", "media_fingerprint_a", "media_fingerprint_b",
        )}

        match_rule = []
        score_name: list = [None] * n
        score_tax: list = [None] * n
        score_addr: list = [None] * n
        score_phone: list = [None] * n
        score_cms: list = [None] * n
        media_score: list = [None] * n
        overall: list = [None] * n
        win_name: list = [None] * n
        win_addr: list = [None] * n
        strategies: list = [None] * n

        for i in range(n):
            name_a, name_b = col["payor_name_clean_a"][i], col["payor_name_clean_b"][i]
            tax_a, tax_b = col["tax_id_a"][i], col["tax_id_b"][i]
            cms_a, cms_b = col["cms_plan_id_a"][i], col["cms_plan_id_b"][i]
            st_a, st_b = col["state_code_a"][i], col["state_code_b"][i]
            phone_a, phone_b = col["phone_a"][i], col["phone_b"][i]

            # C1 deterministic rules (first match wins)
            if tax_a is not None and tax_a == tax_b:
                rule = "DET-1"
            elif cms_a is not None and cms_a == cms_b:
                rule = "DET-2"
            elif (name_a is not None and name_a == name_b
                  and st_a is not None and st_a == st_b):
                rule = "DET-3"
            else:
                rule = "FUZZY"
            match_rule.append(rule)

            # C2 address concat with null-propagation quirk
            a1a, a1b = col["address_line_1_a"][i], col["address_line_1_b"][i]
            addr_a = (None if a1a is None else
                      f"{a1a} {col['city_a'][i] or ''} {st_a or ''} {col['zip_code_a'][i] or ''}")
            addr_b = (None if a1b is None else
                      f"{a1b} {col['city_b'][i] or ''} {st_b or ''} {col['zip_code_b'][i] or ''}")

            # C3 ensemble — same control flow as ensemble_match_score, but
            # with per-actor caches on the two routed fields
            field_scores = {}
            used = []
            if name_a and name_b:
                s, strat = self._name(name_a, name_b)
                score_name[i] = s
                win_name[i] = strat
                field_scores["name"] = s
                used.append(strat)
            if tax_a and tax_b:
                da, db = digits(tax_a), digits(tax_b)
                if da and db:
                    if da == db:
                        score_tax[i] = 1.0
                        used.append("TIN_EXACT")
                    else:
                        trans = 0.0
                        if len(da) == len(db):
                            diffs = sum(1 for x, y in zip(da, db) if x != y)
                            trans = 0.9 if diffs <= 1 else (0.7 if diffs == 2 else 0.0)
                        score_tax[i] = trans
                        used.append("TIN_TRANS" if trans > 0.0 else "TIN_EXACT")
                    field_scores["tax_id"] = score_tax[i]
            if addr_a and addr_b:
                s, strat = self._addr(addr_a, addr_b)
                score_addr[i] = s
                win_addr[i] = strat
                field_scores["address"] = s
                used.append(strat)
            if phone_a and phone_b:
                pa_, pb_ = digits(phone_a), digits(phone_b)
                if pa_ and pb_:
                    e164 = 1.0 if len(pa_) >= 10 and len(pb_) >= 10 and pa_[-10:] == pb_[-10:] else 0.0
                    l7 = 1.0 if len(pa_) >= 7 and len(pb_) >= 7 and pa_[-7:] == pb_[-7:] else 0.0
                    score_phone[i] = max(e164, l7)
                    used.append("PHONE_E164" if e164 >= l7 else "PHONE_L7")
                    field_scores["phone"] = score_phone[i]
            if cms_a and cms_b:
                ca, cb = cms_a.strip().upper(), cms_b.strip().upper()
                exact = 1.0 if ca == cb else 0.0
                pfx = 0.85 if len(ca) >= 5 and len(cb) >= 5 and ca[:5] == cb[:5] else 0.0
                score_cms[i] = max(exact, pfx)
                used.append("CMS_EXACT" if exact >= pfx else "CMS_PFX")
                field_scores["cms"] = score_cms[i]

            W = {"name": 0.35, "tax_id": 0.25, "address": 0.20, "phone": 0.10, "cms": 0.10}
            tw = sum(W[f] for f in field_scores)
            composite = round(sum(field_scores[f] * W[f] for f in field_scores) / tw, 4) if tw else None
            strategies[i] = used

            # media fingerprint comparison (graft addition, separate column)
            ma, mb = col["media_fingerprint_a"][i], col["media_fingerprint_b"][i]
            if ma is not None and mb is not None:
                media_score[i] = 1.0 if ma == mb else 0.0

            # C4 overall score override
            overall[i] = 1.0 if rule != "FUZZY" else composite

        out_cols = {
            "source_record_id_a": pa.array(col["source_record_id_a"], pa.string()),
            "source_record_id_b": pa.array(col["source_record_id_b"], pa.string()),
            "match_rule": pa.array(match_rule, pa.string()),
            "score_name": pa.array(score_name, pa.float64()),
            "score_tax_id": pa.array(score_tax, pa.float64()),
            "score_address": pa.array(score_addr, pa.float64()),
            "score_phone": pa.array(score_phone, pa.float64()),
            "score_cms_plan_id": pa.array(score_cms, pa.float64()),
            "media_score": pa.array(media_score, pa.float64()),
            "overall_score": pa.array(overall, pa.float64()),
            "winning_name_strategy": pa.array(win_name, pa.string()),
            "winning_addr_strategy": pa.array(win_addr, pa.string()),
            "strategies_used": pa.array(strategies, pa.list_(pa.string())),
        }
        if self._emit_detail:
            # full ensemble_detail object per pair (reference VARIANT column)
            import json

            details = []
            for i in range(n):
                details.append(json.dumps({
                    "name_score": score_name[i], "name_strategy": win_name[i],
                    "addr_score": score_addr[i], "addr_strategy": win_addr[i],
                    "tax_score": score_tax[i], "phone_score": score_phone[i],
                    "cms_score": score_cms[i], "media_score": media_score[i],
                    "composite": overall[i] if match_rule[i] == "FUZZY" else None,
                    "strategies_used": strategies[i],
                }, separators=(",", ":")))
            out_cols["ensemble_detail"] = pa.array(details, pa.string())
        return pa.table(out_cols)


def score_pairs(pairs, cfg=None):
    """pairs Dataset → scored pairs Dataset via the EnsembleScorer pool.

    Pool autoscales (1, cluster CPUs) by default — scoring is the
    dominant compute stage, but the autoscaler releases actors when the
    read/shuffle stages need room."""
    import ray

    from payor_linkage.config import ScoringConfig

    cfg = cfg or ScoringConfig()
    if cfg.concurrency is not None:
        concurrency = cfg.concurrency
    else:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        concurrency = (max(2, cpus // 2), max(2, cpus))
    return pairs.map_batches(
        EnsembleScorer,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        num_cpus=1,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(emit_ensemble_detail=cfg.emit_ensemble_detail),
    )

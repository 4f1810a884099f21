"""Thresholding + decisions + steward overlay.

Replicates `match_candidates.sql`:
- T1 auto_decision (`:34-39`): DET-* → auto_match; ≥0.85 → auto_match;
  ≥0.60 → review; else auto_no_match.
- T2 candidate_id: the reference uses random `uuid_string()` (`:15`);
  we use uuid5 of the canonical pair key instead — deterministic runs and
  a stable join key for the steward overlay (SURVEY §2.6 T2).
- T3 final_decision (`:53-66`): steward confirmed_match/confirmed_no_match
  overrides; else auto_match → match, everything else (incl. review) →
  no_match.

Steward decisions are an append-only overlay Dataset (the reference
mutates candidate rows in place via `/api/write`,
`app/server/index.js:57-71`); we left-join the latest overlay row per
candidate_id at decision time — keeps the engine pure and resumable.
"""

from __future__ import annotations

import uuid

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from payor_linkage.config import ScoringConfig

_PAIR_NS = uuid.uuid5(uuid.NAMESPACE_DNS, "payor-linkage.candidate")


def candidate_uuid(id_a: str, id_b: str) -> str:
    return str(uuid.uuid5(_PAIR_NS, f"{id_a}|{id_b}"))


def _decide_batch(batch: pa.Table, auto_t: float, review_t: float) -> pa.Table:
    ids_a = batch["source_record_id_a"].to_pylist()
    ids_b = batch["source_record_id_b"].to_pylist()
    cand_ids = pa.array([candidate_uuid(a, b) for a, b in zip(ids_a, ids_b)], pa.string())

    rule = batch["match_rule"]
    score = pc.coalesce(batch["overall_score"], pa.scalar(-1.0))
    is_det = pc.is_in(rule, value_set=pa.array(["DET-1", "DET-2", "DET-3"]))
    auto = pc.if_else(
        pc.or_(is_det, pc.greater_equal(score, auto_t)), pa.scalar("auto_match"),
        pc.if_else(pc.greater_equal(score, review_t), pa.scalar("review"),
                   pa.scalar("auto_no_match")))
    out = batch.append_column("candidate_id", cand_ids)
    out = out.append_column("auto_decision", auto)
    return out


def _final_batch(batch: pa.Table, overlay_ref=None) -> pa.Table:
    if overlay_ref is not None:
        import ray

        overlay: dict[str, str] = ray.get(overlay_ref)
        steward = pa.array(
            [overlay.get(c, "") for c in batch["candidate_id"].to_pylist()],
            pa.string())
    else:
        steward = pa.array([""] * batch.num_rows, pa.string())
    final = pc.if_else(
        pc.equal(steward, "confirmed_match"), pa.scalar("match"),
        pc.if_else(pc.equal(steward, "confirmed_no_match"), pa.scalar("no_match"),
                   pc.if_else(pc.equal(batch["auto_decision"], "auto_match"),
                              pa.scalar("match"), pa.scalar("no_match"))))
    return batch.append_column("final_decision", final)


def decide(scored: Dataset, cfg: ScoringConfig | None = None,
           steward_overlay: Dataset | None = None) -> Dataset:
    """scored pairs → match_candidates with auto + final decisions.

    The steward overlay is human-produced — bounded by review throughput,
    never data-scale — so it is *broadcast* (ray.put of the latest
    decision per candidate_id) into the decision map rather than shuffled
    through a join (SURVEY §2.6 T3)."""
    import ray

    cfg = cfg or ScoringConfig()
    cands = scored.map_batches(
        lambda b: _decide_batch(b, cfg.auto_match_threshold, cfg.review_threshold),
        batch_format="pyarrow")
    overlay_ref = None
    if steward_overlay is not None:
        rows = steward_overlay.select_columns(
            ["candidate_id", "steward_decision"]).take_all()
        overlay_ref = ray.put({r["candidate_id"]: r["steward_decision"] for r in rows})
    return cands.map_batches(lambda b: _final_batch(b, overlay_ref),
                             batch_format="pyarrow")

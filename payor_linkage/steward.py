"""Steward-loop serving helpers + strategy telemetry.

- review queue (O4, `MatchReview.tsx:41-43`): review-band candidates not
  yet decided, ordered by overall_score desc
- decision recording (T4): append-only overlay rows + audit entries — the
  engine-side equivalent of the UI's `/api/write`
- strategy performance telemetry (`12_abbreviation_dict.sql:9-25`):
  times_selected / times_won per similarity strategy, aggregated from the
  candidate table (partial counts per batch, one small grouped sum)
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def review_queue(candidates: Dataset, steward_overlay: Dataset | None = None,
                 limit: int | None = None) -> Dataset:
    """Candidates awaiting review, highest score first."""
    q = candidates.map_batches(
        lambda b: b.filter(pc.equal(b["auto_decision"], "review")),
        batch_format="pyarrow")
    if steward_overlay is not None:
        decided = {r["candidate_id"] for r in
                   steward_overlay.select_columns(["candidate_id"]).take_all()}
        if decided:
            import ray

            ref = ray.put(decided)

            def drop_decided(b: pa.Table) -> pa.Table:
                seen = ray.get(ref)
                mask = pa.array([c not in seen for c in b["candidate_id"].to_pylist()])
                return b.filter(mask)

            q = q.map_batches(drop_decided, batch_format="pyarrow")
    q = q.sort("overall_score", descending=True)
    return q.limit(limit) if limit else q


def record_decisions(decisions: list[dict],
                     existing_overlay: Dataset | None = None) -> Dataset:
    """Append steward decisions to the overlay (T4). Each decision:
    {candidate_id, steward_decision, steward_user, steward_notes?}."""
    import ray.data as rd

    now = datetime(2024, 1, 1)  # deterministic placeholder; callers may stamp
    rows = [{
        "candidate_id": d["candidate_id"],
        "steward_decision": d["steward_decision"],
        "steward_user": d.get("steward_user", "steward"),
        "steward_notes": d.get("steward_notes", ""),
        "decided_at": d.get("decided_at", now),
    } for d in decisions]
    new = rd.from_items(rows)
    return existing_overlay.union(new) if existing_overlay is not None else new


def strategy_performance(candidates: Dataset) -> Dataset:
    """Per-strategy telemetry: times_selected (appeared in
    strategies_used) and times_won (was the winning name/addr strategy)."""
    def partial(b: pa.Table) -> pa.Table:
        from collections import Counter

        selected: Counter = Counter()
        won: Counter = Counter()
        for used in b["strategies_used"].to_pylist():
            for s in (used or []):
                selected[s] += 1
        for col in ("winning_name_strategy", "winning_addr_strategy"):
            for s in b[col].to_pylist():
                if s is not None:
                    won[s] += 1
        names = sorted(set(selected) | set(won))
        return pa.table({
            "strategy": pa.array(names, pa.string()),
            "times_selected": pa.array([selected[n] for n in names], pa.int64()),
            "times_won": pa.array([won[n] for n in names], pa.int64()),
        })

    return (candidates.map_batches(partial, batch_format="pyarrow")
            .groupby("strategy")
            .aggregate(Sum("times_selected", alias_name="times_selected"),
                       Sum("times_won", alias_name="times_won")))

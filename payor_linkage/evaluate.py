"""Cluster-quality evaluation: pairwise F1 against ground-truth labels.

North-rule metric: pairwise F1 ≥ 0.99 on labeled pairs *within the same
blocking keys* (BASELINE.json) — i.e. over the candidate pair universe the
blocker produces, a pair is true iff both records carry the same
ground-truth ``entity_id`` and predicted iff both land in the same
``match_group_id``. Orphans (entity_id = -1) are never true pairs.
"""

from __future__ import annotations

import pandas as pd


def pairwise_f1(pairs: pd.DataFrame, labels: pd.DataFrame, groups: pd.DataFrame) -> dict:
    """pairs: candidate pairs (source_record_id_a/b) — the blocked universe;
    labels: (source_record_id, entity_id); groups: MATCH_GROUPS rows."""
    ent = labels.set_index("source_record_id")["entity_id"]
    grp = groups.set_index("source_record_id")["match_group_id"]

    a = pairs["source_record_id_a"]
    b = pairs["source_record_id_b"]
    ea, eb = ent.reindex(a).to_numpy(), ent.reindex(b).to_numpy()
    ga, gb = grp.reindex(a).to_numpy(), grp.reindex(b).to_numpy()

    truth = (ea == eb) & (ea != -1) & (eb != -1)
    pred = ga == gb

    tp = int((truth & pred).sum())
    fp = int((~truth & pred).sum())
    fn = int((truth & ~pred).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": round(precision, 4), "recall": round(recall, 4),
            "f1": round(f1, 4)}

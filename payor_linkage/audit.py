"""Audit change log + pipeline metrics.

- Change log ≙ `MDM_CHANGE_LOG` (`06_create_audit_tables.sql:18-29`):
  append-only rows for system actions (golden created, group formed,
  hierarchy inferred) and steward decisions (T4, `MatchReview.tsx:82-86`).
  Log ids are deterministic uuid5 of (entity_type, entity_id, action).
- Metrics ≙ the UI aggregates (SURVEY §2.8 A11, `Dashboard.tsx:39-46`,
  `DataQuality.tsx:31-47`): row counts per stage, decision counts, score
  histogram (WIDTH_BUCKET(score,0,1,10)), per-source record counts and
  field-completeness, per-source-pair match rates. All computed as
  grouped aggregates / vectorized batch passes — the driver only collects
  the (tiny) final aggregate frames.
"""

from __future__ import annotations

import uuid

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Sum

_A_NS = uuid.uuid5(uuid.NAMESPACE_DNS, "payor-linkage.audit")


def _log_batch(batch: pa.Table, entity_type: str, id_col: str, action: str,
               actor: str, detail_col: str | None = None) -> pa.Table:
    ids = batch[id_col].to_pylist()
    log_ids = [str(uuid.uuid5(_A_NS, f"{entity_type}|{i}|{action}")) for i in ids]
    n = batch.num_rows
    detail = (batch[detail_col] if detail_col and detail_col in batch.column_names
              else pa.array([""] * n, pa.string()))
    return pa.table({
        "log_id": pa.array(log_ids, pa.string()),
        "entity_type": pa.array([entity_type] * n, pa.string()),
        "entity_id": pa.array([str(i) for i in ids], pa.string()),
        "action": pa.array([action] * n, pa.string()),
        "actor": pa.array([actor] * n, pa.string()),
        "detail": pc.cast(detail, pa.string()),
    })


def build_audit_log(golden: Dataset, hierarchy: Dataset,
                    steward_overlay: Dataset | None = None) -> Dataset:
    """Append-only change log for this run's system actions."""
    g = golden.map_batches(
        lambda b: _log_batch(b, "golden_payor", "master_payor_id",
                             "golden_created", "system", "payor_name"),
        batch_format="pyarrow")
    h = hierarchy.map_batches(
        lambda b: _log_batch(b, "payor_hierarchy", "hierarchy_id",
                             "hierarchy_inferred", "system", "source"),
        batch_format="pyarrow")
    log = g.union(h)
    if steward_overlay is not None:
        s = steward_overlay.map_batches(
            lambda b: _log_batch(b, "match_candidate", "candidate_id",
                                 "steward_decision", "steward", "steward_decision"),
            batch_format="pyarrow")
        log = log.union(s)
    return log


def score_histogram(candidates: Dataset) -> Dataset:
    """WIDTH_BUCKET(overall_score, 0, 1, 10) histogram (`Dashboard.tsx:44`).

    True WIDTH_BUCKET semantics: NULL score → NULL (row dropped from the
    grouped histogram), score < 0 → bucket 0, score in [0,1) →
    floor(score*10)+1 (1..10), score ≥ 1 → bucket 11 (upper overflow).
    """
    def bucketize(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["overall_score"]))
        s = b["overall_score"]
        bucket = pc.cast(pc.add(pc.floor(pc.multiply(s, 10.0)), 1.0), pa.int32())
        bucket = pc.max_element_wise(
            pc.min_element_wise(bucket, pa.scalar(11, pa.int32())),
            pa.scalar(0, pa.int32()))
        return pa.table({"score_bucket": bucket})
    return (candidates.map_batches(bucketize, batch_format="pyarrow")
            .groupby("score_bucket").count())


def sort_paginate(ds: Dataset, keys: list[str] | str, limit: int,
                  offset: int = 0, descending: bool = False) -> Dataset:
    """ORDER BY ... LIMIT n OFFSET m — the AuditTrail serving page
    (`app/src/pages/AuditTrail.tsx:43-48`). Distributed top-(offset+limit)
    via `Dataset.sort().limit()` (each block contributes at most
    offset+limit rows to the reduce), then the offset rows are sliced
    off driver-side. Pagination depth is a SERVING parameter — pages are
    bounded small; deep scans should use keyset pagination (filter on
    the last-seen key) instead of a large offset. Caveat: a page past
    the end of the data comes back 0-row and Ray 2.49's pandas
    conversion drops the schema of an empty Arrow block."""
    import ray
    import ray.data as rd

    top = ds.sort(keys, descending=descending).limit(offset + limit)
    tbl = pa.concat_tables(ray.get(top.to_arrow_refs()),
                           promote_options="default")
    return rd.from_arrow(tbl.slice(min(offset, tbl.num_rows), limit))


def pipeline_metrics(unified: Dataset, candidates: Dataset, groups: Dataset,
                     golden: Dataset, block_counts: Dataset | None = None,
                     blocking_cfg=None) -> dict:
    """Small driver-side metrics dict (every value is an aggregate).
    When the blocking counts table is passed (LinkageResult.block_counts)
    a ``blocking`` entry reports parked/salted key and record counts —
    the recall-loss accounting SURVEY §4 promises."""
    per_source = {r["source_system"]: r["count()"]
                  for r in unified.groupby("source_system").count().take_all()}
    decisions = {r["final_decision"]: r["count()"]
                 for r in candidates.groupby("final_decision").count().take_all()}
    auto = {r["auto_decision"]: r["count()"]
            for r in candidates.groupby("auto_decision").count().take_all()}
    rules = {r["match_rule"]: r["count()"]
             for r in candidates.groupby("match_rule").count().take_all()}
    conf = golden.aggregate(Mean("confidence_score", alias_name="avg_confidence"),
                            Mean("completeness_score", alias_name="avg_completeness"),
                            Count(alias_name="golden_count"))
    blocking = None
    if block_counts is not None:
        from payor_linkage.blocking import blocking_key_stats

        blocking = blocking_key_stats(block_counts, blocking_cfg)
    return {
        **({"blocking": blocking} if blocking is not None else {}),
        "records": unified.count(),
        "records_per_source": per_source,
        "candidates": candidates.count(),
        "decisions": decisions,
        "auto_decisions": auto,
        "match_rules": rules,
        # second-level count(): the per-group rows never reach the driver
        "groups": groups.groupby("match_group_id").count().count(),
        "golden": conf,
    }


def span_kind_stats(unified: Dataset) -> Dataset:
    """Per-span-kind corpus profile over the interleaved text+media
    payload: (kind, n_spans, total_chars, n_media) — how much text vs
    media rides the documents. spans_json is re-hydrated per batch
    (`normalize.spans_from_json`), flattened to span grain with
    ``pc.list_flatten`` (no Python row loop), partially aggregated per
    batch, then one bounded grouped sum — the shuffle moves
    (kind, counts) partials only, never span payloads."""
    import numpy as np

    from payor_linkage.normalize import spans_from_json

    def partial(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(spans_from_json(b["spans_json"]))
        t = pa.table({
            "kind": pc.struct_field(flat, "kind"),
            "n_spans": pa.array(np.ones(len(flat), np.int64)),
            "total_chars": pc.cast(
                pc.coalesce(pc.utf8_length(pc.struct_field(flat, "text")),
                            pa.scalar(0, pa.int32())), pa.int64()),
            "n_media": pc.cast(pc.is_valid(pc.struct_field(flat, "media_ref")),
                               pa.int64()),
        })
        agg = t.group_by("kind").aggregate(
            [("n_spans", "sum"), ("total_chars", "sum"), ("n_media", "sum")])
        return agg.rename_columns(["kind", "n_spans", "total_chars",
                                   "n_media"])

    partials = unified.select_columns(["spans_json"]) \
        .map_batches(partial, batch_format="pyarrow")
    return partials.groupby("kind").aggregate(
        Sum("n_spans", alias_name="n_spans"),
        Sum("total_chars", alias_name="total_chars"),
        Sum("n_media", alias_name="n_media"))


def source_field_completeness(unified: Dataset, fields: list[str]) -> Dataset:
    """Per-source field-completeness percentages (`DataQuality.tsx:31-40`):
    partial counts per batch (validity bitmaps via Arrow's native
    ``group_by`` — the `profile_nulls` pattern, no pandas conversion),
    then one small grouped sum — no full shuffle."""
    def partial(b: pa.Table) -> pa.Table:
        cols = {"source_system": b["source_system"]}
        for f in fields:
            cols[f"nn_{f}"] = pc.cast(pc.is_valid(b[f]), pa.int64())
        import numpy as np
        cols["total"] = pa.array(np.ones(b.num_rows, np.int64))
        agg = pa.table(cols).group_by("source_system").aggregate(
            [(f"nn_{f}", "sum") for f in fields] + [("total", "sum")])
        return agg.rename_columns(
            ["source_system"] + [f"nn_{f}" for f in fields] + ["total"])

    partials = unified.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(f"nn_{f}", alias_name=f"nn_{f}") for f in fields]
    aggs.append(Sum("total", alias_name="total"))
    return partials.groupby("source_system").aggregate(*aggs)

"""Survivorship + golden-record construction.

One ``groupby(match_group_id).map_groups`` pass computes every
survivorship rule and the golden metrics (SURVEY §2.8):

- A1 source_priority  — first non-null by source_trust_rank asc
  (`int_survivorship.sql:22-53`); ties broken by source_record_id (the
  reference's window is order-nondeterministic on ties — we pin it)
- A2 cms_priority     — cms_reference first, then trust+10 (`:57-73`)
- A3 most_recent      — first non-null by loaded_at desc nulls last (`:76-108`)
- A4 most_complete    — longest non-empty payor_name_alt (`:111-121`)
- A5 any_true         — BOOLOR_AGG(is_active) (`:124-133`)
- A6 earliest/latest  — MIN(effective_date) / MAX(termination_date) (`:136-146`)
- A7 rules-as-data    — the rule per field comes from SurvivorshipConfig
  (the reference seeds a config table but hard-codes the rules inline,
  `07_seed_survivorship_config.sql` vs the dbt model; we actually
  dispatch on it). The full declared vocabulary
  (`05_create_master_tables.sql:96-98`) is implemented: source_priority,
  most_recent, most_complete, most_frequent, any_true, any_non_null,
  earliest, latest, manual.
- A8 source_count, A9 confidence_score, A10 completeness_score
  (`golden_payors.sql:22-71`)

The golden row carries the *survivor document's spans verbatim*
(span-sequence fidelity invariant — the engine never rebuilds spans).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from ray.data import Dataset

from payor_linkage.rayutil import join_partitions, nested_safe_join
from payor_linkage.schema import COMPLETENESS_FIELDS, GOLDEN_FIELDS, GOLDEN_SCHEMA


@dataclass
class SurvivorshipConfig:
    """Per-field rule_type — editable without code changes (reference's
    SURVIVORSHIP_CONFIG design, `05_create_master_tables.sql:93-110`)."""

    rules: dict[str, str] = field(default_factory=lambda: {
        "payor_name": "source_priority",
        "tax_id": "source_priority",
        "npi": "source_priority",
        "website": "source_priority",
        "payor_type": "source_priority",
        "line_of_business": "source_priority",
        "cms_plan_id": "cms_priority",
        "address_line_1": "most_recent",
        "address_line_2": "most_recent",
        "city": "most_recent",
        "state_code": "most_recent",
        "zip_code": "most_recent",
        "phone": "most_recent",
        "payor_name_alt": "most_complete",
        "is_active": "any_true",
        "effective_date": "earliest",
        "termination_date": "latest",
    })


def _first_non_null(series: pd.Series, order: np.ndarray):
    vals = series.to_numpy()[order]
    for v in vals:
        if v is not None and not (isinstance(v, float) and np.isnan(v)):
            return v
    return None


def _apply_rule(rule: str, g: pd.DataFrame, col: str,
                trust_order: np.ndarray, recent_order: np.ndarray):
    s = g[col]
    if rule == "source_priority":
        return _first_non_null(s, trust_order)
    if rule == "cms_priority":
        # cms_reference outranks everything, then trust+10 (`:63`)
        rank = np.where(g["source_system"].to_numpy() == "cms_reference", 1,
                        g["source_trust_rank"].to_numpy() + 10)
        order = g.assign(_rank=rank).sort_values(
            ["_rank", "source_record_id"]).index.to_numpy()
        return _first_non_null(s, order)
    if rule == "most_recent":
        return _first_non_null(s, recent_order)
    if rule == "most_complete":
        mask = s.notna() & (s.astype(str).str.strip() != "")
        if not mask.any():
            return None
        cand = s[mask].astype(str)
        lens = cand.str.len()
        best = cand[lens == lens.max()]
        return sorted(best)[0]  # deterministic tie-break (reference MAX_BY is arbitrary)
    if rule == "most_frequent":
        vc = s.dropna()
        if vc.empty:
            return None
        counts = vc.value_counts()
        top = counts[counts == counts.max()]
        return sorted(top.index)[0]
    if rule == "any_true":
        nn = s.dropna()
        return bool(nn.any()) if len(nn) else None
    if rule == "any_non_null":
        return _first_non_null(s, trust_order)
    if rule == "earliest":
        nn = s.dropna()
        return nn.min() if len(nn) else None
    if rule == "latest":
        nn = s.dropna()
        return nn.max() if len(nn) else None
    if rule == "manual":
        return None  # steward-only field: never auto-populated
    raise ValueError(f"unknown survivorship rule: {rule}")


def make_golden_fn(cfg: SurvivorshipConfig):
    rules = cfg.rules

    def golden_for_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.reset_index(drop=True)
        trust_order = g.sort_values(
            ["source_trust_rank", "source_record_id"]).index.to_numpy()
        # loaded_at desc, nulls last, id tie-break (`:81`)
        recent_order = g.sort_values(
            ["loaded_at", "source_record_id"], ascending=[False, True],
            na_position="last").index.to_numpy()

        out = {"master_payor_id": g["match_group_id"].iloc[0]}
        for col in GOLDEN_FIELDS:
            out[col] = _apply_rule(rules[col], g, col, trust_order, recent_order)

        # A10 completeness over the 15 named fields, round 4
        nn = sum(1 for c in COMPLETENESS_FIELDS if out[c] is not None)
        out["completeness_score"] = round(nn / 15.0, 4)
        # A8 distinct source systems
        out["source_count"] = int(g["source_system"].nunique())
        # A9 avg(coalesce(group_confidence, 1.0)) — constant per group
        conf = g["group_confidence"].iloc[0]
        out["confidence_score"] = float(conf) if pd.notna(conf) else 1.0

        # survivor's spans verbatim (fidelity invariant)
        surv = g[g["is_survivor"]]
        row = surv.iloc[0] if len(surv) else g.iloc[0]
        out["survivor_record_id"] = row["source_record_id"]
        spans_val = row["spans"]
        if hasattr(spans_val, "tolist"):
            spans_val = spans_val.tolist()
        out["spans"] = spans_val

        # emit a typed Arrow row — pandas→Arrow inference can't handle the
        # nested spans cell / all-null columns consistently across groups
        import pyarrow as pa
        arrays = []
        for f in GOLDEN_SCHEMA:
            v = out.get(f.name)
            if isinstance(v, float) and np.isnan(v):
                v = None
            if hasattr(v, "item") and not isinstance(v, (list, str)):
                v = v.item()
            arrays.append(pa.array([v], type=f.type))
        return pa.Table.from_arrays(arrays, schema=GOLDEN_SCHEMA)

    return golden_for_group


def build_golden(groups: Dataset, unified: Dataset,
                 cfg: SurvivorshipConfig | None = None,
                 num_partitions: int | None = None) -> Dataset:
    """MATCH_GROUPS ⋈ unified → one golden record per group."""
    cfg = cfg or SurvivorshipConfig()
    # spans (list<struct>) must survive this join → nested-safe union-merge
    # (acero hash join rejects nested non-key fields)
    members = nested_safe_join(groups, unified, on="source_record_id")
    return members.groupby("match_group_id").map_groups(
        make_golden_fn(cfg), batch_format="pandas")


def build_xref(groups: Dataset, unified: Dataset, num_partitions: int | None = None) -> Dataset:
    """XREF: every source record → its master (xref.sql:16-25)."""
    import pyarrow as pa

    slim = unified.select_columns(["source_record_id", "source_system", "source_id"])
    j = groups.join(slim, join_type="inner", num_partitions=join_partitions(num_partitions),
                    on=("source_record_id",))

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "source_record_id": b["source_record_id"],
            "master_payor_id": b["match_group_id"],
            "source_system": b["source_system"],
            "source_id": b["source_id"],
            "match_confidence": b["group_confidence"],
        })

    return j.map_batches(proj, batch_format="pyarrow")

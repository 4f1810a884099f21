"""Connected components + group finalize — fully distributed.

The reference has two clustering implementations that disagree
(SURVEY §2.7): a 2-fixed-pass SQL min-propagation (`match_groups.sql:43-73`,
admits it can't close deep chains) and a single-process networkx proc
(`snowflake/09_connected_components_proc.sql:27-113`, the scalability
cliff). We adopt the proc's G2 *semantics* — deterministic
``uuid5(NAMESPACE_DNS, '|'.join(sorted(members)))`` group id (`:64-66`),
survivor = lowest source_trust_rank, first-in-sorted-order tie-break
(`:77`), group_confidence = round(mean of match-edge scores, 4) (`:69-74`),
singletons kept — executed as *iterated min-label propagation*:

    L0(node) = node
    round: label(edge endpoints) ← min(label_a, label_b); L' = groupby(node).min
    stop when no edge has label_a != label_b (fixpoint; O(cluster diameter)
    rounds — entity clusters are shallow, so this converges in a handful)

Each round is two hash joins (edges × labels) + one groupby(min) — all
Ray Data shuffles, nothing driver-side; L is materialized per round to
cut lineage. This is the "distributed union-find via iterated label
propagation" design from SURVEY §2.7/§7.6.
"""

from __future__ import annotations

import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Mean, Min

from payor_linkage.config import ClusterConfig


def match_edges(candidates: Dataset) -> Dataset:
    """candidates → (src, dst, score) for final_decision = 'match'."""
    def f(b: pa.Table) -> pa.Table:
        m = b.filter(pc.equal(b["final_decision"], "match"))
        return pa.table({
            "src": m["source_record_id_a"],
            "dst": m["source_record_id_b"],
            "score": m["overall_score"],
        })
    return candidates.map_batches(f, batch_format="pyarrow")


def _label_edges(edges: Dataset, labels: Dataset, np_: int) -> Dataset:
    """Attach current labels of both endpoints to every edge."""
    la = labels.rename_columns({"node": "src", "label": "label_a"})
    lb = labels.rename_columns({"node": "dst", "label": "label_b"})
    el = edges.join(la, join_type="inner", num_partitions=np_, on=("src",))
    el = el.join(lb, join_type="inner", num_partitions=np_, on=("dst",))
    return el


def propagate_labels(edges: Dataset, nodes: Dataset, cfg: ClusterConfig | None = None) -> Dataset:
    """nodes (col ``node``) + edges (src, dst) → (node, label) at fixpoint.

    label = min node id of the connected component (string min)."""
    cfg = cfg or ClusterConfig()
    np_ = cfg.join_num_partitions

    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow").materialize()
    edges = edges.materialize()
    if edges.count() == 0:
        return labels

    for _round in range(cfg.max_rounds):
        el = _label_edges(edges, labels, np_).materialize()
        frontier = el.map_batches(
            lambda b: b.filter(pc.not_equal(b["label_a"], b["label_b"])),
            batch_format="pyarrow")
        if frontier.count() == 0:
            return labels

        def msgs(b: pa.Table) -> pa.Table:
            m = pc.min_element_wise(b["label_a"], b["label_b"])
            return pa.table({
                "node": pa.concat_arrays([
                    b["src"].combine_chunks(), b["dst"].combine_chunks()]),
                "label": pa.concat_arrays([m.combine_chunks(), m.combine_chunks()])
                if isinstance(m, pa.ChunkedArray)
                else pa.concat_arrays([m, m]),
            })

        candidates = el.map_batches(msgs, batch_format="pyarrow")
        labels = (
            labels.union(candidates)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
    else:
        raise RuntimeError(
            f"label propagation did not converge in {cfg.max_rounds} rounds")
    return labels


def _finalize_group(g: pd.DataFrame) -> pd.DataFrame:
    """One cluster → MATCH_GROUPS rows (G2 semantics, proc `:59-85`)."""
    members = sorted(g["node"].tolist())
    group_id = str(uuid.uuid5(uuid.NAMESPACE_DNS, "|".join(members)))
    trust = dict(zip(g["node"], g["source_trust_rank"]))
    survivor = min(members, key=lambda m: trust.get(m, 999))
    conf = g["group_confidence"].iloc[0]
    conf = round(float(conf), 4) if pd.notna(conf) else None
    return pd.DataFrame({
        "match_group_id": [group_id] * len(members),
        "source_record_id": members,
        "is_survivor": [m == survivor for m in members],
        "group_confidence": [conf] * len(members),
    })


def build_match_groups(candidates: Dataset, unified: Dataset,
                       cfg: ClusterConfig | None = None) -> Dataset:
    """candidates + unified records → MATCH_GROUPS Dataset."""
    cfg = cfg or ClusterConfig()
    np_ = cfg.join_num_partitions

    edges = match_edges(candidates)
    nodes = unified.map_batches(
        lambda b: pa.table({"node": b["source_record_id"],
                            "source_trust_rank": b["source_trust_rank"]}),
        batch_format="pyarrow")

    edges = edges.materialize()
    labels = propagate_labels(
        edges, nodes.select_columns(["node"]), cfg)

    members = labels.join(nodes, join_type="inner", num_partitions=np_, on=("node",))

    if edges.count() == 0:
        # no match edges at all → every record is a singleton group with
        # null confidence (an empty Dataset would lose its schema and break
        # the join below)
        members = members.map_batches(
            lambda b: b.append_column("group_confidence", pa.nulls(b.num_rows, pa.float64())),
            batch_format="pyarrow")
    else:
        # per-cluster mean edge score (proc `:69-74`): label each edge by its
        # (now converged) src label, then one grouped mean
        edges_l = _label_edges(edges, labels, np_)
        conf = (edges_l
                .map_batches(lambda b: pa.table({"label": b["label_a"], "score": b["score"]}),
                             batch_format="pyarrow")
                .groupby("label")
                .aggregate(Mean("score", alias_name="group_confidence")))
        members = members.join(conf, join_type="left_outer", num_partitions=np_,
                               on=("label",))

    return members.groupby("label").map_groups(_finalize_group, batch_format="pandas")

"""Iterative graph algorithms beyond connected components: PageRank.

The canonical iterative-numeric distributed algorithm — each round is
ONE broadcast/lookup join (rank → edge source) plus ONE grouped sum
(contributions → destination), so an N-round run is N bounded shuffles
over the edge list and nothing else. Dangling mass (nodes with no
out-edges) is redistributed uniformly each round, matching the standard
formulation, via a single tiny driver scalar per round.

Float note: grouped float sums are order-dependent, so PageRank is
gated by pytest against a dense numpy power iteration (same damping /
rounds / dangling semantics) at 1e-9, not by a SQL oracle — the honest
gate for an iterative numeric operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def pagerank(edges: Dataset, nodes: Dataset, n_iter: int = 10,
             damping: float = 0.85, node_col: str = "node",
             src_col: str = "src", dst_col: str = "dst") -> Dataset:
    """PageRank over a directed edge list. ``nodes`` must hold every
    node id (including isolated ones). Returns (node, rank).

    Per round: attach each source's per-edge share (rank / out-degree)
    with a broadcast ``lookup_join`` (rank table is one row per node —
    bounded by construction; falls back to a hash join above the
    lookup bound), grouped-sum the shares per destination, then apply
    the damping + uniform dangling redistribution. The edge list is
    never re-partitioned between rounds."""
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table({node_col: b[node_col],
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    base = (1.0 - damping) / n_nodes

    deg = (edges.groupby(src_col).count()
           .map_batches(lambda b: pa.table({
               node_col: b[src_col],
               "out_deg": pc.cast(b["count()"], pa.float64())}),
               batch_format="pyarrow"))

    ranks = nodes.map_batches(
        lambda b: pa.table({
            node_col: b[node_col],
            "rank": pa.array(np.full(b.num_rows, 1.0 / n_nodes),
                             pa.float64())}),
        batch_format="pyarrow")
    # degree rides with the rank table so each round needs ONE attach
    ranks = lookup_join(ranks, deg, on=node_col, how="left").map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("out_deg"), "out_deg",
            pc.fill_null(b["out_deg"], 0.0)),
        batch_format="pyarrow").materialize()

    edges = edges.select_columns([src_col, dst_col]).materialize()

    for _ in range(n_iter):
        # dangling mass: total rank sitting on zero-out-degree nodes
        dangling = ranks.map_batches(
            lambda b: pa.table({"d": pc.if_else(
                pc.equal(b["out_deg"], 0.0), b["rank"],
                pa.scalar(0.0, pa.float64()))}),
            batch_format="pyarrow").sum("d")
        spread = damping * (dangling or 0.0) / n_nodes

        shares = ranks.map_batches(
            lambda b: pa.table({
                node_col: b[node_col],
                "share": pc.if_else(
                    pc.greater(b["out_deg"], 0.0),
                    pc.divide(b["rank"], pc.if_else(
                        pc.greater(b["out_deg"], 0.0), b["out_deg"],
                        pa.scalar(1.0, pa.float64()))),
                    pa.scalar(0.0, pa.float64()))}),
            batch_format="pyarrow")
        contrib = (lookup_join(
            edges.map_batches(lambda b: pa.table({
                node_col: b[src_col], dst_col: b[dst_col]}),
                batch_format="pyarrow"),
            shares, on=node_col)
            .groupby(dst_col)
            .aggregate(Sum("share", alias_name="in_sum")))
        in_tbl = contrib.map_batches(
            lambda b: pa.table({node_col: b[dst_col],
                                "in_sum": pc.fill_null(
                                    b["in_sum"],
                                    pa.scalar(0.0, pa.float64()))}),
            batch_format="pyarrow")
        const = base + spread
        ranks = lookup_join(
            ranks.drop_columns(["rank"]), in_tbl, on=node_col,
            how="left") \
            .map_batches(
                lambda b, c=const: pa.table({
                    node_col: b[node_col],
                    "rank": pc.add(pa.scalar(c, pa.float64()),
                                   pc.multiply(
                                       pa.scalar(damping, pa.float64()),
                                       pc.fill_null(b["in_sum"], 0.0))),
                    "out_deg": b["out_deg"]}),
                batch_format="pyarrow").materialize()

    return ranks.drop_columns(["out_deg"])

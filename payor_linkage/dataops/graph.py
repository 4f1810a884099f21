"""Graph algorithms beyond connected components: PageRank, triangles.

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


def triangle_counts(edges: Dataset, src_col: str = "id_a",
                    dst_col: str = "id_b") -> Dataset:
    """Per-node triangle counts over an undirected graph — the standard
    degree-oriented node-iterator, distributed.

    Shape (reference semantics: a 3-way edge self-join; here expressed
    without any self-join): canonicalize + distinct the edge list, then
    ORIENT every edge from its (degree, id)-smaller endpoint to the
    larger. The orientation is acyclic, so every triangle has exactly
    ONE vertex with two out-edges — emitting the out-neighbor pairs
    ("wedges") of each vertex and matching them against the edge set
    finds each triangle exactly once, and a vertex's wedge fan-out is
    bounded by its out-degree, which degree-orientation caps at
    O(sqrt(m)) for any graph (the classic total-work bound m^1.5).

    Stages: one bounded groupby for degrees, one broadcast degree
    attach (`lookup_join`, hash-join fallback above its bound), one
    grouped wedge emission (index arithmetic vectorized across runs —
    no per-run Python), one tagged-union groupby matching wedges to
    edges, and a final per-node count aggregate. Returns (node,
    n_triangles) for nodes in at least one triangle.
    """
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import grouped_apply, lookup_join

    node_t = pa.int64()

    def canon(b: pa.Table) -> pa.Table:
        a = pc.cast(b[src_col], node_t)
        c = pc.cast(b[dst_col], node_t)
        lo = pc.min_element_wise(a, c)
        hi = pc.max_element_wise(a, c)
        keep = pc.not_equal(lo, hi)  # drop self-loops
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    # materialized: the distinct edge list is read three times below
    # (degrees, the degree attach, the edge-tag side of the match)
    dedges = (edges.map_batches(canon, batch_format="pyarrow")
              .groupby(["a", "b"]).count()
              .drop_columns(["count()"])).materialize()
    if dedges.count() == 0:  # empty groupby output is schema-less
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            [("node", node_t), ("n_triangles", pa.int64())]).empty_table())

    def sym(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [b["a"].combine_chunks(), b["b"].combine_chunks()])})

    deg = (dedges.map_batches(sym, batch_format="pyarrow")
           .groupby("node").count()
           .map_batches(lambda b: pa.table({
               "node": b["node"],
               "deg": pc.cast(b["count()"], pa.int64())}),
               batch_format="pyarrow"))

    # attach both endpoint degrees; the degree table is one row per
    # node (bounded), so each attach is a broadcast binary search
    with_da = lookup_join(
        dedges, deg.map_batches(lambda b: pa.table({
            "a": b["node"], "deg_a": b["deg"]}), batch_format="pyarrow"),
        on="a")
    with_deg = lookup_join(
        with_da, deg.map_batches(lambda b: pa.table({
            "b": b["node"], "deg_b": b["deg"]}), batch_format="pyarrow"),
        on="b")

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        c = b["b"].to_numpy(zero_copy_only=False)
        da = b["deg_a"].to_numpy(zero_copy_only=False)
        db = b["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < c))
        return pa.table({
            "u": pa.array(np.where(a_first, a, c), node_t),
            "w": pa.array(np.where(a_first, c, a), node_t)})

    oriented = with_deg.map_batches(orient, batch_format="pyarrow")

    wedge_schema = pa.schema([("pair", pa.string()),
                              ("center", node_t), ("kind", pa.int8())])

    def wedge_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        u = b["u"].to_numpy(zero_copy_only=False)[lo:hi]
        w = b["w"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((w, rid))
        rs, ws = rid[order], w[order]
        run_starts = np.nonzero(
            np.concatenate([[True], rs[1:] != rs[:-1]]))[0]
        m = np.diff(np.concatenate([run_starts, [len(rs)]]))
        sq = m * m
        total = int(sq.sum())
        if total == 0:
            return wedge_schema.empty_table()
        cum = np.concatenate([[0], np.cumsum(sq)[:-1]])
        p = np.arange(total, dtype=np.int64) - np.repeat(cum, sq)
        mrep = np.repeat(m, sq)
        srep = np.repeat(run_starts, sq)
        i = srep + p // mrep
        j = srep + p % mrep
        mask = i < j  # ws sorted per run → ws[i] < ws[j] (ids distinct)
        wi, wj = ws[i[mask]], ws[j[mask]]
        centers = u[order][i[mask]]
        pair = pc.binary_join_element_wise(
            pc.cast(pa.array(wi, node_t), pa.string()),
            pc.cast(pa.array(wj, node_t), pa.string()), ":")
        return pa.table({"pair": pair,
                         "center": pa.array(centers, node_t),
                         "kind": pa.array(
                             np.zeros(len(wi), dtype=np.int8), pa.int8())})

    wedges = grouped_apply(oriented, "u", out_schema=wedge_schema,
                           runs_fn=wedge_runs)

    def edge_tag(b: pa.Table) -> pa.Table:
        pair = pc.binary_join_element_wise(
            pc.cast(b["a"], pa.string()), pc.cast(b["b"], pa.string()),
            ":")
        return pa.table({
            "pair": pair,
            "center": pa.array(np.full(b.num_rows, -1), node_t),
            "kind": pa.array(np.ones(b.num_rows, dtype=np.int8),
                             pa.int8())})

    tagged = wedges.union(dedges.map_batches(edge_tag,
                                             batch_format="pyarrow"))

    count_schema = pa.schema([("node", node_t), ("n", pa.int64())])

    def match_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        kind = b["kind"].to_numpy(zero_copy_only=False)[lo:hi]
        centers = b["center"].to_numpy(zero_copy_only=False)[lo:hi]
        rs = (starts - lo).astype(np.int64)
        has_edge = np.add.reduceat(
            (kind == 1).astype(np.int64), rs) > 0
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        tri_mask = has_edge[rid] & (kind == 0)
        if not tri_mask.any():
            return count_schema.empty_table()
        # matched wedge (center, u, w) is one triangle: credit all
        # three vertices; the endpoints are parsed back from the pair
        # key of only the matched rows (bounded by triangle count)
        idx = np.nonzero(tri_mask)[0]
        matched = b["pair"].slice(lo, hi - lo).take(pa.array(idx))
        endpoints = pc.cast(
            pc.list_flatten(pc.split_pattern(matched, ":")), node_t)
        nodes = pa.concat_arrays(
            [pa.array(centers[idx], node_t), endpoints.combine_chunks()])
        part = pa.table({"node": nodes}) \
            .group_by("node").aggregate([([], "count_all")])
        return pa.table({"node": part["node"],
                         "n": pc.cast(part["count_all"], pa.int64())})

    partials = grouped_apply(tagged, "pair", out_schema=count_schema,
                             runs_fn=match_runs)
    return partials.groupby("node").aggregate(Sum("n", alias_name="n_triangles"))


def k_core(edges: Dataset, k: int, src_col: str = "id_a",
           dst_col: str = "id_b") -> Dataset:
    """k-core decomposition (fixed k): iteratively peel nodes of degree
    < k until fixpoint; returns the surviving (node, deg) table — deg is
    the final in-core degree. The standard coreness-peeling algorithm as
    bounded distributed rounds.

    Per round: one grouped degree count, then the bounded survivor
    table attaches to BOTH endpoints via ``lookup_join`` (broadcast
    binary search below its bound, hash-join fallback above — never a
    corpus-sized driver set) and rows with a dead endpoint drop.
    Termination when the edge count stops shrinking; pathological chain
    graphs peel one layer per round, so rounds are bounded by the
    peeling depth (documented, like label-prop's round bound).

    Iterative + data-dependent, so no SQL oracle — gated by pytest
    against a pure-Python peeling reference."""
    from ray.data.aggregate import Count

    from payor_linkage.rayutil import lookup_join

    node_type = edges.schema().base_schema.field(src_col).type

    def sym(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays(
                [b[src_col].combine_chunks(),
                 b[dst_col].combine_chunks()]),
            "nbr": pa.concat_arrays(
                [b[dst_col].combine_chunks(),
                 b[src_col].combine_chunks()]),
        })

    cur = edges.select_columns([src_col, dst_col]).map_batches(
        sym, batch_format="pyarrow").materialize()
    n = cur.count()
    while n > 0:
        deg = cur.groupby("node").aggregate(Count(alias_name="deg"))
        keep = deg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["deg"], k)),
            batch_format="pyarrow").materialize()
        if keep.count() == 0:
            # everything peeled — an empty small side loses its schema
            # in the join machinery (known Ray gotcha), so exit here
            n = 0
            break
        keep_nbr = keep.map_batches(
            lambda b: pa.table({"nbr": b["node"], "_dn": b["deg"]}),
            batch_format="pyarrow")
        nxt = lookup_join(cur, keep, "node").drop_columns(["deg"])
        nxt = lookup_join(nxt, keep_nbr, "nbr").drop_columns(["_dn"]) \
            .materialize()
        m = nxt.count()
        if m == n:
            break
        cur, n = nxt, m
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "node": pa.array([], node_type),
            "deg": pa.array([], pa.int64())}))
    return cur.groupby("node").aggregate(Count(alias_name="deg"))


def bfs_layers(edges: Dataset, source=None, max_depth: int = 20,
               src_col: str = "src", dst_col: str = "dst") -> Dataset:
    """Single-source BFS hop distances over an undirected edge list:
    (node, dist) for every node reachable from ``source`` within
    ``max_depth`` hops (the source itself at dist 0). ``source=None``
    seeds at the lexicographically smallest endpoint — a deterministic
    default the SQL oracle can recompute.

    Per round: one size-aware join (``smart_join`` — broadcast when
    the frontier is small, hash join otherwise) from the frontier onto
    the symmetric edge list, a grouped dedup of the new candidates,
    and a visited-set anti filter. The visited id set is bounded by
    the reachable component (broadcast via ``ray.put`` — the same
    driver-bounded class as the CC tiers; components here are match
    groups, orders of magnitude below the corpus)."""
    import ray

    from payor_linkage.rayutil import smart_join

    def sym(b: pa.Table) -> pa.Table:
        a = b[src_col].combine_chunks()
        c = b[dst_col].combine_chunks()
        return pa.table({
            "a": pa.chunked_array([a, c]).combine_chunks(),
            "b": pa.chunked_array([c, a]).combine_chunks()})

    sym_edges = edges.select_columns([src_col, dst_col]).map_batches(
        sym, batch_format="pyarrow").materialize()
    ntype = sym_edges.schema().base_schema.field("a").type

    if source is None:
        def bmin(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"m": pa.array([], ntype)})
            return pa.table({"m": pa.array([pc.min(b["a"]).as_py()],
                                           ntype)})

        mins = sym_edges.map_batches(bmin,
                                     batch_format="pyarrow").take_all()
        if not mins:
            return edges.map_batches(
                lambda b: pa.table({"node": pa.array([], ntype),
                                    "dist": pa.array([], pa.int64())}),
                batch_format="pyarrow")
        source = min(r["m"] for r in mins)

    import ray.data as rd

    dist_tbl = pa.table({"node": pa.array([source], ntype),
                         "dist": pa.array([0], pa.int64())})
    visited = {source}
    frontier = rd.from_arrow(dist_tbl.select(["node"]))
    out_tables = [dist_tbl]

    for d in range(1, max_depth + 1):
        cand = smart_join(sym_edges.map_batches(
            lambda b: pa.table({"node": b["a"], "nbr": b["b"]}),
            batch_format="pyarrow"), frontier, "node")
        vref = ray.put(pa.array(sorted(visited), ntype))

        def fresh(b: pa.Table, _v=vref) -> pa.Table:
            keep = pc.invert(pc.is_in(b["nbr"], value_set=ray.get(_v)))
            t = b.filter(keep)
            return pa.table({"node": t["nbr"]}).group_by("node") \
                .aggregate([])

        new = (cand.map_batches(fresh, batch_format="pyarrow")
               .groupby("node").count()
               .select_columns(["node"]).materialize())
        if new.count() == 0:
            break
        new_ids = pa.concat_tables(
            ray.get(new.to_arrow_refs()),
            promote_options="default")["node"].combine_chunks()
        visited.update(new_ids.to_pylist())
        out_tables.append(pa.table({
            "node": new_ids,
            "dist": pa.array(np.full(len(new_ids), d, np.int64))}))
        frontier = new

    return rd.from_arrow(pa.concat_tables(out_tables))


def common_neighbors(edges: Dataset, src_col: str = "id_a",
                     dst_col: str = "id_b", min_common: int = 2,
                     max_degree: int = 256) -> Dataset:
    """Link prediction by common-neighbor count: every NON-adjacent
    node pair at distance 2, weighted by how many neighbors the two
    share — in an ER match graph these are the transitivity-implied
    matches the scorer never saw, ranked by structural support.

    Shape: canonical distinct edges → symmetric adjacency → one
    grouped wedge emission per center (neighbor pairs via the m²-index
    expansion, vectorized across runs; centers above ``max_degree``
    are SKIPPED — a hub's wedge fan-out is degree², and a hub's
    endorsement carries no signal, the block-purging argument) → a
    tagged union with the edge list itself and ONE pair-keyed groupby
    (wedge count + adjacency flag in the same exchange — no second
    join). Returns (id_a, id_b, n_common) for non-edges with
    n_common ≥ min_common. Node ids may be integer or string (string
    neighbors are dictionary-encoded + rank-remapped inside the group
    fn, so ordering never pays an object-dtype compare)."""
    from ray.data.aggregate import Max, Min, Sum

    from payor_linkage.rayutil import grouped_apply

    sch = edges.schema()
    node_t = dict(zip(sch.names, sch.types))[src_col]
    int_nodes = pa.types.is_integer(node_t)
    tag_schema = pa.schema([("pair", pa.string()), ("id_a", node_t),
                            ("id_b", node_t), ("wedge", pa.int64()),
                            ("edge", pa.int64())])

    def canon(b: pa.Table) -> pa.Table:
        a = pc.cast(b[src_col], node_t)
        c = pc.cast(b[dst_col], node_t)
        lo = pc.min_element_wise(a, c)
        hi = pc.max_element_wise(a, c)
        keep = pc.not_equal(lo, hi)
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    dedges = (edges.map_batches(canon, batch_format="pyarrow")
              .groupby(["a", "b"]).count()
              .drop_columns(["count()"])).materialize()
    if dedges.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.schema(
            [("id_a", node_t), ("id_b", node_t),
             ("n_common", pa.int64())]).empty_table())

    def sym(b: pa.Table) -> pa.Table:
        a, c = b["a"].combine_chunks(), b["b"].combine_chunks()
        return pa.table({"center": pa.concat_arrays([a, c]),
                         "nbr": pa.concat_arrays([c, a])})

    adj = dedges.map_batches(sym, batch_format="pyarrow")

    def wedge_runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        sizes = (ends - starts).astype(np.int64)
        keep_run = sizes <= max_degree
        col = b["nbr"].combine_chunks()
        if int_nodes:
            codes = col.to_numpy(zero_copy_only=False)[lo:hi]
            dict_sorted = None
        else:
            # rank-remapped dictionary codes: code order == value order
            enc = col.dictionary_encode()
            raw = enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            drank = np.empty(len(enc.dictionary), dtype=np.int64)
            drank[pc.sort_indices(enc.dictionary).to_numpy(
                zero_copy_only=False).astype(np.int64)] = \
                np.arange(len(enc.dictionary))
            codes = drank[raw][lo:hi]
            inv = np.empty(len(drank), dtype=np.int64)
            inv[drank] = np.arange(len(drank))
            dict_sorted = enc.dictionary.take(pa.array(inv))
        # sort neighbors within each run so emitted pairs are canonical
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        order = np.lexsort((codes, rid))
        nbr = codes[order]
        rs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        m = np.where(keep_run, sizes, 0)
        sq = m * m
        total = int(sq.sum())
        if total == 0:
            return tag_schema.empty_table()
        # per-run m²-index expansion masked to i<j (the cooccurrence
        # shape; m ≤ max_degree bounds the temporary)
        cum = np.concatenate([[0], np.cumsum(sq)[:-1]])
        p = np.arange(total, dtype=np.int64) - np.repeat(cum, sq)
        mrep = np.repeat(m, sq)
        srep = np.repeat(rs, sq)
        i, j = p // mrep, p % mrep
        mask = i < j
        ca, cb = nbr[(srep + i)[mask]], nbr[(srep + j)[mask]]
        if dict_sorted is None:
            ia, ib = pa.array(ca, node_t), pa.array(cb, node_t)
        else:
            ia = dict_sorted.take(pa.array(ca))
            ib = dict_sorted.take(pa.array(cb))
        key = pc.binary_join_element_wise(
            pc.cast(ia, pa.string()), pc.cast(ib, pa.string()), "|")
        part = pa.table({"pair": key, "id_a": ia, "id_b": ib}) \
            .group_by(["pair", "id_a", "id_b"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "pair": part["pair"], "id_a": part["id_a"],
            "id_b": part["id_b"],
            "wedge": pc.cast(part["count_all"], pa.int64()),
            "edge": pa.array(np.zeros(part.num_rows, dtype=np.int64)),
        }).cast(tag_schema)

    wedges = grouped_apply(adj, "center", out_schema=tag_schema,
                           runs_fn=wedge_runs)

    def edge_rows(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b["a"], pa.string()), pc.cast(b["b"], pa.string()),
            "|")
        n = b.num_rows
        return pa.table({
            "pair": key, "id_a": b["a"], "id_b": b["b"],
            "wedge": pa.array(np.zeros(n, dtype=np.int64)),
            "edge": pa.array(np.ones(n, dtype=np.int64)),
        }).cast(tag_schema)

    tagged = wedges.union(
        dedges.map_batches(edge_rows, batch_format="pyarrow"))
    agg = tagged.groupby("pair").aggregate(
        Min("id_a", alias_name="id_a"), Min("id_b", alias_name="id_b"),
        Sum("wedge", alias_name="n_common"),
        Max("edge", alias_name="has_edge"))

    def prune(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b["has_edge"], 0),
                       pc.greater_equal(b["n_common"], min_common))
        return b.filter(keep).select(["id_a", "id_b", "n_common"])

    return agg.map_batches(prune, batch_format="pyarrow")


def forest_paths(edges: Dataset, child_col: str = "child",
                 parent_col: str = "parent", max_depth: int = 64,
                 local_rows_bound: int = 2_000_000) -> Dataset:
    """Root + depth resolution over a parent forest (the hierarchy
    drill-to-root the reference UI walks one lookup at a time,
    `app/src/pages/HierarchyView.tsx`, here resolved for every node at
    once): returns ``(node, root, depth)`` for every distinct node in
    the edge list — roots carry ``(node, node, 0)``.

    Input is made a forest deterministically: self-loops dropped, a
    multi-parent child keeps its MIN parent (one bounded groupby).

    Shape — pointer doubling, the classic O(log depth) distributed
    closure: keep a TOTAL map ``(node, anc, dist)`` where roots point
    to themselves (dist 0), and each round substitute ``anc ←
    map[anc].anc, dist += map[anc].dist`` with ONE ``smart_join`` (the
    total-map trick makes every row match, so no anti-join is needed).
    A depth-d forest converges in ⌈log2 d⌉ rounds; convergence is a
    per-round changed-row count (tiny aggregate). Raises past
    ``max_depth`` — a cycle in the input would otherwise loop, and the
    recursive-CTE oracle bounds its walk the same way. Below
    ``local_rows_bound`` nodes, a driver tier does the same doubling
    in numpy over dictionary codes (parity pytest-gated)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from payor_linkage.rayutil import smart_join

    sch = edges.schema()
    node_t = dict(zip(sch.names, sch.types))[child_col]

    def canon(b: pa.Table) -> pa.Table:
        c = pc.cast(b[child_col], node_t)
        p = pc.cast(b[parent_col], node_t)
        keep = pc.and_kleene(pc.and_kleene(c.is_valid(), p.is_valid()),
                             pc.not_equal(c, p))
        return pa.table({"child": c.filter(keep), "parent": p.filter(keep)})

    ptr = (edges.map_batches(canon, batch_format="pyarrow")
           .groupby("child").aggregate(Min("parent", alias_name="parent"))
           .materialize())

    def as_nodes(col):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({"node": b[col]})
        return f

    nodes = (ptr.map_batches(as_nodes("child"), batch_format="pyarrow")
             .union(ptr.map_batches(as_nodes("parent"),
                                    batch_format="pyarrow"))
             .groupby("node").count().drop_columns(["count()"])
             .materialize())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(pa.schema(
            [("node", node_t), ("root", node_t),
             ("depth", pa.int64())]).empty_table())

    if n_nodes <= local_rows_bound:
        # driver tier: dictionary codes + numpy doubling
        import ray as _ray

        ptr_tbl = pa.concat_tables(_ray.get(ptr.to_arrow_refs()),
                                   promote_options="default")
        node_tbl = pa.concat_tables(_ray.get(nodes.to_arrow_refs()),
                                    promote_options="default")
        ids = node_tbl["node"].combine_chunks()
        order = pc.sort_indices(ids)
        ids = ids.take(order)
        child_idx = pc.index_in(ptr_tbl["child"].combine_chunks(),
                                ids).to_numpy(zero_copy_only=False)
        par_idx = pc.index_in(ptr_tbl["parent"].combine_chunks(),
                              ids).to_numpy(zero_copy_only=False)
        anc = np.arange(len(ids), dtype=np.int64)
        anc[child_idx] = par_idx
        dist = np.zeros(len(ids), dtype=np.int64)
        dist[child_idx] = 1
        for _ in range(max_depth.bit_length() + 1):
            nxt = anc[anc]
            if (nxt == anc).all():
                break
            dist = dist + dist[anc]
            anc = nxt
            if dist.max() > max_depth:
                raise ValueError("forest_paths: cycle or depth beyond "
                                 f"max_depth={max_depth}")
        else:
            if not (anc[anc] == anc).all():
                raise ValueError("forest_paths: cycle or depth beyond "
                                 f"max_depth={max_depth}")
        # an EVEN cycle collapses to self-pointing fixpoints (the classic
        # doubling pitfall) — a genuine root has dist 0, a collapsed
        # cycle member does not
        if (dist[anc] != 0).any():
            raise ValueError("forest_paths: cycle detected (non-root "
                             "fixpoint)")
        out = pa.table({"node": ids, "root": ids.take(pa.array(anc)),
                        "depth": pa.array(dist, pa.int64())})
        return rd.from_arrow(out)

    # distributed tier: total map + smart_join doubling
    def rename_root(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "anc": b["node"],
                         "dist": pa.array(np.zeros(b.num_rows, np.int64))})

    def rename_child(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["child"], "anc": b["parent"],
                         "dist": pa.array(np.ones(b.num_rows, np.int64))})

    child_ids = ptr.map_batches(as_nodes("child"), batch_format="pyarrow")
    # anti (roots = nodes not in child set): tag-union + grouped sum
    tagged = (nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "tag": pa.array(
            np.zeros(b.num_rows, np.int64))}), batch_format="pyarrow")
        .union(child_ids.map_batches(
            lambda b: pa.table({"node": b["node"], "tag": pa.array(
                np.ones(b.num_rows, np.int64))}), batch_format="pyarrow")))
    from ray.data.aggregate import Sum

    def only_roots(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b.filter(pc.equal(b["tag"], 0))["node"]})

    root_nodes = (tagged.groupby("node").aggregate(
        Sum("tag", alias_name="tag"))
        .map_batches(only_roots, batch_format="pyarrow"))

    m = (root_nodes.map_batches(rename_root, batch_format="pyarrow")
         .union(ptr.map_batches(rename_child, batch_format="pyarrow"))
         .materialize())

    for _ in range(max_depth.bit_length() + 2):
        def as_lookup(b: pa.Table) -> pa.Table:
            return pa.table({"anc": b["node"], "anc2": b["anc"],
                             "dist2": b["dist"]})

        look = m.map_batches(as_lookup, batch_format="pyarrow")
        j = smart_join(m, look, "anc").materialize()

        def advance(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"], "anc": b["anc2"],
                "dist": pc.add(b["dist"], b["dist2"]),
                "moved": pc.cast(pc.not_equal(b["anc"], b["anc2"]),
                                 pa.int64())})

        adv = j.map_batches(advance, batch_format="pyarrow").materialize()
        moved = adv.sum("moved") or 0
        m = adv.drop_columns(["moved"]).materialize()
        if moved == 0:
            # at the fixpoint every anc must be a TRUE root (dist2 == 0);
            # an even cycle collapses to self-pointing non-roots
            if (j.max("dist2") or 0) != 0:
                raise ValueError("forest_paths: cycle detected (non-root "
                                 "fixpoint)")
            break
        dmax = m.max("dist") or 0
        if dmax > max_depth:
            raise ValueError("forest_paths: cycle or depth beyond "
                             f"max_depth={max_depth}")
    else:
        raise ValueError("forest_paths: did not converge — cycle or depth "
                         f"beyond max_depth={max_depth}")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "root": b["anc"],
                         "depth": b["dist"]})

    return m.map_batches(finalize, batch_format="pyarrow")


def wl_labels(edges: Dataset, src_col: str = "id_a",
              dst_col: str = "id_b", rounds: int = 2) -> Dataset:
    """Weisfeiler–Lehman color refinement over an undirected graph:
    after R rounds each node carries ``md5(own_label || '|' ||
    sorted,comma-joined neighbor labels)`` — nodes with different
    labels are provably non-isomorphic in their R-hop neighborhoods,
    so the labels are structural fingerprints (group them per match
    component to find structurally identical duplicate families, or
    diff them across runs to localize where a graph changed).

    Init is the degree (as a string). Shape per round: ONE label
    attach (`smart_join` on the neighbor endpoint), ONE ordered
    string-agg per center (`grouped_string_agg` — a grouped sort), and
    a batch-vectorized md5 through DuckDB's C++ kernel (the
    `grouped_checksum` precedent) — R rounds = R bounded exchanges
    over the edge list, no Python per node. SQL-identical by
    construction, so a fixed-R oracle unrolls to the same joins."""
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_string_agg
    from payor_linkage.rayutil import smart_join

    sch = edges.schema()
    node_t = dict(zip(sch.names, sch.types))[src_col]

    def canon(b: pa.Table) -> pa.Table:
        a = pc.cast(b[src_col], node_t)
        c = pc.cast(b[dst_col], node_t)
        lo = pc.min_element_wise(a, c)
        hi = pc.max_element_wise(a, c)
        keep = pc.and_kleene(pc.and_kleene(lo.is_valid(), hi.is_valid()),
                             pc.not_equal(lo, hi))
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    dedges = (edges.map_batches(canon, batch_format="pyarrow")
              .groupby(["a", "b"]).count().drop_columns(["count()"]))

    def sym(b: pa.Table) -> pa.Table:
        a, c = b["a"].combine_chunks(), b["b"].combine_chunks()
        return pa.table({"center": pa.concat_arrays([a, c]),
                         "nbr": pa.concat_arrays([c, a])})

    adj = dedges.map_batches(sym, batch_format="pyarrow").materialize()

    def deg_label(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["center"],
                         "l": pc.cast(b["count()"], pa.string())})

    labels = (adj.groupby("center").count()
              .map_batches(deg_label, batch_format="pyarrow")
              .materialize())

    def md5_relabel(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(b["ol"], b["agg"], "|")
        t = pa.table({"_s": s})
        con = duckdb.connect()
        con.register("t", t)
        h = con.execute("SELECT md5(_s) AS h FROM t").arrow()["h"]
        con.close()
        return pa.table({"node": b["center"],
                         "l": pc.cast(h, pa.string())})

    for _ in range(rounds):
        nbrlab = smart_join(
            adj, labels.map_batches(
                lambda b: pa.table({"nbr": b["node"], "nl": b["l"]}),
                batch_format="pyarrow"), "nbr")
        agg = grouped_string_agg(
            nbrlab.select_columns(["center", "nl"]), ["center"], "nl",
            "nl", sep=",", out_col="agg")
        own = smart_join(
            agg, labels.map_batches(
                lambda b: pa.table({"center": b["node"], "ol": b["l"]}),
                batch_format="pyarrow"), "center")
        labels = own.map_batches(md5_relabel,
                                 batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "wl": b["l"]}),
        batch_format="pyarrow")


def forest_subtree_sums(edges: Dataset, child_col: str = "child",
                        parent_col: str = "parent",
                        values: Dataset | None = None,
                        max_depth: int = 64) -> Dataset:
    """Hierarchical rollup (the BOM-explosion / org-chart aggregate):
    for every node of a parent forest, the SUM of a per-node value
    over its whole subtree, self included (``values`` is an optional
    ``(node, v)`` Dataset; None sums 1s = subtree sizes — nodes
    missing from ``values`` contribute 0). Returns
    ``(node, subtree_sum)``.

    Shape — bottom-up level rounds: `forest_paths` (pointer doubling)
    labels each node's depth first; then, from the deepest level up,
    each level's accumulated sums collapse onto parents with ONE
    grouped Sum + ONE bounded union per round. Rounds = tree depth —
    the right trade for real hierarchies, which are shallow (an org
    chart is ~6 levels at any corpus size); the all-pairs closure
    alternative is O(n·depth) rows of shuffle. Cycles are rejected by
    `forest_paths` before any work."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from payor_linkage.rayutil import smart_join

    sch = edges.schema()
    node_t = dict(zip(sch.names, sch.types))[child_col]

    fp = forest_paths(edges, child_col, parent_col,
                      max_depth=max_depth).materialize()
    if fp.count() == 0:
        return rd.from_arrow(pa.schema(
            [("node", node_t),
             ("subtree_sum", pa.int64())]).empty_table())

    def canon(b: pa.Table) -> pa.Table:
        c = pc.cast(b[child_col], node_t)
        p = pc.cast(b[parent_col], node_t)
        keep = pc.and_kleene(pc.and_kleene(c.is_valid(), p.is_valid()),
                             pc.not_equal(c, p))
        return pa.table({"child": c.filter(keep), "parent": p.filter(keep)})

    ptr = (edges.map_batches(canon, batch_format="pyarrow")
           .groupby("child").aggregate(Min("parent", alias_name="parent"))
           .materialize())

    if values is None:
        vals = fp.map_batches(
            lambda b: pa.table({"node": b["node"], "v": pa.array(
                np.ones(b.num_rows, np.int64))}), batch_format="pyarrow")
    else:
        # every forest node needs a row (0 default) so the depth attach
        # below stays total: tagged union + grouped sum
        given = values.map_batches(
            lambda b: pa.table({"node": pc.cast(b["node"], node_t),
                                "v": pc.cast(b["v"], pa.int64())}),
            batch_format="pyarrow")
        zeros = fp.map_batches(
            lambda b: pa.table({"node": b["node"], "v": pa.array(
                np.zeros(b.num_rows, np.int64))}), batch_format="pyarrow")
        vals = given.union(zeros).groupby("node").aggregate(
            Sum("v", alias_name="v"))

    # depth attach once: (node, depth, v) — accumulate upward
    cur = smart_join(vals, fp.select_columns(["node", "depth"]),
                     "node").materialize()
    # parent attach map: node → parent (children only)
    par = ptr.map_batches(
        lambda b: pa.table({"node": b["child"], "parent": b["parent"]}),
        batch_format="pyarrow").materialize()

    out_parts = []
    dmax = int(cur.max("depth") or 0)
    for d in range(dmax, 0, -1):
        def split(b: pa.Table, dd=d) -> pa.Table:
            return b.filter(pc.equal(b["depth"], dd))

        def keep_rest(b: pa.Table, dd=d) -> pa.Table:
            return b.filter(pc.not_equal(b["depth"], dd))

        level = cur.map_batches(split, batch_format="pyarrow") \
            .materialize()
        out_parts.append(level.select_columns(["node", "v"]))
        # push each finished node's sum onto its parent
        up = smart_join(level.select_columns(["node", "v"]), par, "node")
        contrib = (up.map_batches(
            lambda b: pa.table({"node": b["parent"], "add": b["v"]}),
            batch_format="pyarrow")
            .groupby("node").aggregate(Sum("add", alias_name="add")))
        rest = cur.map_batches(keep_rest, batch_format="pyarrow")
        merged = rest.union(contrib.map_batches(
            lambda b: pa.table({"node": b["node"],
                                "v": pc.cast(b["add"], pa.int64()),
                                "depth": pa.nulls(b.num_rows, pa.int64())}),
            batch_format="pyarrow"))
        # consolidate: sum v per node, keep the real depth (max ignores
        # the null depth of contribution rows)
        cur = merged.groupby("node").aggregate(
            Sum("v", alias_name="v"),
            Max("depth", alias_name="depth")).materialize()
    out_parts.append(cur.select_columns(["node", "v"]))

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "subtree_sum": pc.cast(b["v"], pa.int64())}),
        batch_format="pyarrow")

"""Connected components + group finalize — fully distributed, join-free.

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
    round: endpoint labels ← min(label_a, label_b); L' = groupby(node).min
    stop when no edge has label_a != label_b (fixpoint; O(cluster
    diameter) rounds — entity clusters are shallow)

Every step is a groupby shuffle (sort-based): edge labeling uses the
union-merge equi-join (``rayutil.nested_safe_join``) and the final group
assembly folds members + edge scores into ONE ``groupby(label)`` — no
``Dataset.join`` anywhere (Ray's hash-join aggregator mis-handles
partitions that receive an empty block, observed as
``ArrowInvalid: No match ... FieldRef`` on small inputs).
"""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min

from payor_linkage.config import ClusterConfig
from payor_linkage.rayutil import nested_safe_join


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


def _label_edges(edges: Dataset, labels: Dataset) -> Dataset:
    """Attach current labels of both endpoints to every edge (union-merge)."""
    la = labels.map_batches(
        lambda b: pa.table({"src": b["node"], "label_a": b["label"]}),
        batch_format="pyarrow")
    lb = labels.map_batches(
        lambda b: pa.table({"dst": b["node"], "label_b": b["label"]}),
        batch_format="pyarrow")
    el = nested_safe_join(edges, la, on="src")
    el = nested_safe_join(el, lb, on="dst")
    return el


def propagate_labels(edges: Dataset, nodes: Dataset,
                     cfg: ClusterConfig | None = None):
    """nodes (node, source_trust_rank) + edges → ((node, label, trust) at
    fixpoint, final labeled edges or None).

    label = min node id of the connected component (string min)."""
    cfg = cfg or ClusterConfig()

    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"],
                            "source_trust_rank": b["source_trust_rank"]}),
        batch_format="pyarrow").materialize()
    edges = edges.materialize()
    if edges.count() == 0:
        return labels, None

    # pre-contract: collapse each block's edges to its spanning forest —
    # connectivity is preserved while the per-round join volume drops
    # toward node count (dense local structure and duplicate paths
    # disappear; a key-hash colocation would contract harder but Ray's
    # hash-shuffle strategy has known empty-partition failure modes).
    # The iteration then runs on the contracted graph; scores rejoin the
    # ORIGINAL edges once at fixpoint.
    try:
        import ray as _ray

        _cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        _cpus = 4
    slim = (edges.select_columns(["src", "dst"])
            .repartition(_cpus * 2)
            .map_batches(_reduce_edge_block, batch_format="pyarrow",
                         batch_size=None)
            .materialize())

    base_blocks = max(labels.num_blocks(), slim.num_blocks())
    for _round in range(cfg.max_rounds):
        el = _label_edges(slim, labels).materialize()
        frontier = el.map_batches(
            lambda b: b.filter(pc.not_equal(b["label_a"], b["label_b"])),
            batch_format="pyarrow")
        if frontier.count() == 0:
            # labels at fixpoint on the contracted graph = fixpoint on
            # the full graph (identical connectivity); label the original
            # scored edges once for downstream confidence aggregation
            el_final = _label_edges(edges, labels).materialize()
            return labels, el_final

        def msgs(b: pa.Table) -> pa.Table:
            m = b["label_a"] if isinstance(b["label_a"], pa.ChunkedArray) else b["label_a"]
            mm = pc.min_element_wise(b["label_a"], b["label_b"])
            if isinstance(mm, pa.ChunkedArray):
                mm = mm.combine_chunks()
            both = pa.concat_arrays([mm, mm])
            n2 = len(both)
            return pa.table({
                "node": pa.concat_arrays([
                    b["src"].combine_chunks() if isinstance(b["src"], pa.ChunkedArray) else b["src"],
                    b["dst"].combine_chunks() if isinstance(b["dst"], pa.ChunkedArray) else b["dst"]]),
                "label": both,
                "source_trust_rank": pa.nulls(n2, pa.int32()),
            })

        candidates = el.map_batches(msgs, batch_format="pyarrow")
        labels = (
            labels.union(candidates)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"),
                       Min("source_trust_rank", alias_name="source_trust_rank"))
            # union+sort multiply block counts ~3× per round (observed
            # geometric slowdown to fixpoint) — pin the block count
            .repartition(base_blocks)
            .materialize()
        )
    raise RuntimeError(
        f"label propagation did not converge in {cfg.max_rounds} rounds")


_GROUPS_SCHEMA = pa.schema([
    ("match_group_id", pa.string()),
    ("source_record_id", pa.string()),
    ("is_survivor", pa.bool_()),
    ("group_confidence", pa.float64()),
])


def _finalize_group(g: pa.Table) -> pa.Table:
    """One cluster → MATCH_GROUPS rows (G2 semantics, proc `:59-85`).

    ``g`` holds member rows (node non-null) and edge-score rows (score
    non-null) for one label. Plain-python over tiny groups."""
    nodes = g["node"].to_pylist()
    trusts = g["source_trust_rank"].to_pylist()
    # sorted before summing: float addition is order-dependent, and the
    # incremental tiers assemble score rows in a different order than a
    # full distributed sort — canonical order makes every tier agree
    scores = sorted(s for s in g["score"].to_pylist() if s is not None)
    trust = {n: t for n, t in zip(nodes, trusts) if n is not None}
    members = sorted(trust)
    group_id = str(uuid.uuid5(uuid.NAMESPACE_DNS, "|".join(members)))
    survivor = min(members, key=lambda m: trust.get(m) if trust.get(m) is not None else 999)
    conf = round(sum(scores) / len(scores), 4) if scores else None
    k = len(members)
    return pa.Table.from_arrays([
        pa.array([group_id] * k, pa.string()),
        pa.array(members, pa.string()),
        pa.array([m == survivor for m in members], pa.bool_()),
        pa.array([conf] * k, pa.float64()),
    ], schema=_GROUPS_SCHEMA)


def _finalize_runs(b: pa.Table, starts, ends) -> pa.Table:
    """Block-level finalize: same semantics as _finalize_group, columns
    extracted once per block (kills per-group Arrow overhead)."""
    nodes = b["node"].to_pylist()
    trusts = b["source_trust_rank"].to_pylist()
    scores = b["score"].to_pylist()
    out_gid, out_rid, out_surv, out_conf = [], [], [], []
    for s_, e_ in zip(starts, ends):
        trust = {nodes[i]: trusts[i] for i in range(s_, e_) if nodes[i] is not None}
        sc = sorted(scores[i] for i in range(s_, e_)
                    if scores[i] is not None)
        members = sorted(trust)
        group_id = str(uuid.uuid5(uuid.NAMESPACE_DNS, "|".join(members)))
        survivor = min(members, key=lambda m: trust[m] if trust[m] is not None else 999)
        conf = round(sum(sc) / len(sc), 4) if sc else None
        for m in members:
            out_gid.append(group_id)
            out_rid.append(m)
            out_surv.append(m == survivor)
            out_conf.append(conf)
    return pa.Table.from_arrays([
        pa.array(out_gid, pa.string()), pa.array(out_rid, pa.string()),
        pa.array(out_surv, pa.bool_()), pa.array(out_conf, pa.float64()),
    ], schema=_GROUPS_SCHEMA)


def _local_union_find(edge_rows: list[dict]) -> dict[str, str]:
    """Path-compressed union-find over a *bounded* edge list → node→min-id
    label map. Used only below ``local_cc_max_edges`` (the guide's "driver
    union-find only if the candidate set is provably small"); unlike the
    reference proc it never collects the record set — singletons stay
    distributed."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for e in edge_rows:
        ra, rb = find(e["src"]), find(e["dst"])
        if ra != rb:
            # union by min id → label IS the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in list(parent)}


def _int_union_find(src_codes: np.ndarray, dst_codes: np.ndarray,
                    n_uniques: int) -> np.ndarray:
    """Connected components over integer-coded edges → root code per
    unique (component root = the unique with the SMALLEST code — callers
    must factorize in sorted order so min-code ≙ min node id).

    Vectorized min-label propagation with pointer jumping (no Python
    per-edge loop): each round relaxes every edge (`np.minimum.at`) then
    fully compresses paths (`label = label[label]` to fixpoint). Labels
    are monotone non-increasing with label[i] ≤ i, so both steps converge;
    outer rounds are O(log diameter) — entity clusters are shallow."""
    label = np.arange(n_uniques, dtype=np.int64)
    if len(src_codes) == 0:
        return label
    src = np.asarray(src_codes, dtype=np.int64)
    dst = np.asarray(dst_codes, dtype=np.int64)
    for _ in range(64):  # provably converges; bound is a safety net
        la, lb = label[src], label[dst]
        ne = la != lb
        if not ne.any():
            return label
        # per-target min over the violating edges via sort + reduceat
        # (~3× faster than np.minimum.at's unbuffered scatter)
        lo = np.minimum(la[ne], lb[ne])
        hi = np.maximum(la[ne], lb[ne])
        o = np.argsort(hi, kind="stable")
        hi, lo = hi[o], lo[o]
        bounds = np.nonzero(np.concatenate([[True], hi[1:] != hi[:-1]]))[0]
        mins = np.minimum.reduceat(lo, bounds)
        tgt = hi[bounds]
        label[tgt] = np.minimum(label[tgt], mins)
        while True:
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
    raise RuntimeError("component labeling did not converge")


def _reduce_edge_block(b: pa.Table) -> pa.Table:
    """Per-block spanning-forest reduction (partition-then-merge CC):
    a local union-find collapses each block's edges to ≤ (block-distinct
    -nodes − 1) forest edges with identical connectivity — the driver
    then merges forests instead of raw edges."""
    if b.num_rows == 0 or "src" not in b.column_names:
        # unions can carry 0-row schema-less blocks (scatter kernels see
        # raw blocks, not map_batches-normalized batches)
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string())})
    src = b["src"].to_numpy(zero_copy_only=False)
    dst = b["dst"].to_numpy(zero_copy_only=False)
    both = np.concatenate([src, dst])
    uniq, inv = np.unique(both, return_inverse=True)
    parent = _int_union_find(inv[:len(src)], inv[len(src):], len(uniq))
    keep = parent != np.arange(len(uniq))
    return pa.table({"src": pa.array(uniq[keep], pa.string()),
                     "dst": pa.array(uniq[parent[keep]], pa.string())})


def _propagate_local(edges: Dataset, nodes: Dataset,
                     reduced: Dataset | None = None,
                     min_id_labels: bool = False):
    """Local-CC variant of propagate_labels: same outputs, one broadcast.

    The edge list is first reduced DISTRIBUTED (per-block union-find →
    spanning forest, `_reduce_edge_block`); the driver-side pass then
    factorizes and union-finds only the merged forests — cost bounded by
    distinct node count, not edge count. Pass ``reduced`` to reuse an
    already-contracted forest (the sort-contract tier)."""
    import ray

    # collect the forest as Arrow and factorize with Arrow kernels —
    # dictionary_encode + a rank remap never boxes the ~2|V| strings into
    # Python objects (to_pandas + np.unique did, at seconds of driver
    # time); only the ~node-count dictionary gets sorted, and the rank
    # remap preserves min-code ≙ min node id
    if reduced is None:
        # per-block forest reduction through raw scatter tasks over the
        # (materialized) edge blocks — the repartition + map_batches
        # stage pair this replaces cost two barriers of fixed latency;
        # forest shape depends on partitioning but the merged labels
        # don't (tier-equivalence test-gated)
        from payor_linkage.rayutil import scatter_blocks

        tbl = scatter_blocks(
            edges, _reduce_edge_block,
            schema=pa.schema([("src", pa.string()),
                              ("dst", pa.string())]))
    else:
        tbl = pa.concat_tables(ray.get(reduced.to_arrow_refs()),
                               promote_options="default")
    both = pa.chunked_array(
        list(tbl["src"].chunks) + list(tbl["dst"].chunks)).combine_chunks()
    enc = pc.dictionary_encode(both)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    if min_id_labels:
        # callers that EXPOSE the label (neardup_components' cluster_id
        # = min member id) need min-code ≙ min node id: sort the
        # dictionary and remap codes to ranks
        dictionary = enc.dictionary
        sort_idx = pc.array_sort_indices(dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank = np.empty(len(sort_idx), dtype=np.int64)
        rank[sort_idx] = np.arange(len(sort_idx), dtype=np.int64)
        codes = rank[codes]
        uniques_arrow = dictionary.take(pa.array(sort_idx))
    else:
        # linkage labels are INTERNAL grouping keys only — every output
        # identity is uuid5-of-sorted-members (_finalize_runs), so any
        # deterministic representative works. min-CODE root =
        # first-seen member in edge order; the dictionary sort cost
        # ~1 s of driver time at 1.2M edges for nothing there.
        uniques_arrow = enc.dictionary
    n_edges_local = tbl.num_rows
    src_codes = codes[:n_edges_local]
    dst_codes = codes[n_edges_local:]
    parent = _int_union_find(src_codes, dst_codes, len(uniques_arrow))
    # broadcast as Arrow arrays (plasma zero-copy); per-batch lookups run
    # through pc.index_in — a C hash probe instead of np.searchsorted's
    # per-element Python richcompare on object arrays
    label_arrow = uniques_arrow.take(pa.array(parent))
    ref = ray.put((uniques_arrow, label_arrow))

    def _lookup(col) -> pa.Array:
        u, lbl = ray.get(ref)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pos = pc.index_in(col, value_set=u)
        hit = pc.is_valid(pos)
        taken = lbl.take(pc.fill_null(pos, 0))
        return pc.if_else(hit, taken, col)

    def label_nodes(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b["node"],
            "label": _lookup(b["node"]),
            "source_trust_rank": b["source_trust_rank"],
        })

    labels = nodes.map_batches(label_nodes, batch_format="pyarrow")

    # edges: label DRIVER-side once — the edge list is bounded by the
    # local-CC tier (local_cc_max_edges), and a distributed map here
    # rebuilt the ~|V|-entry index_in hash in EVERY edge-block task:
    # more CPUs → more blocks → more rebuilds, measured as the cluster
    # stage running 2× slower at 32 cpus than at 8. One index_in over
    # the bounded edge table replaces them all; the labeled slices are
    # re-published as ~2·cpus plasma blocks.
    import ray.data as _rd

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    e_tbl = pa.concat_tables(ray.get(edges.to_arrow_refs()),
                             promote_options="default").combine_chunks()
    if e_tbl.num_rows:
        epos = pc.index_in(e_tbl["src"], value_set=uniques_arrow)
        elab = label_arrow.take(epos)
        labeled = pa.table({
            "src": e_tbl["src"], "dst": e_tbl["dst"],
            "score": e_tbl["score"], "label_a": elab, "label_b": elab})
        n_parts = max(1, min(cpus * 2, -(-labeled.num_rows // 8192)))
        step = -(-labeled.num_rows // n_parts)
        el = _rd.from_arrow_refs(
            [ray.put(labeled.slice(i, step))
             for i in range(0, labeled.num_rows, step)])
    else:
        el = _rd.from_arrow(pa.table({
            "src": pa.array([], pa.string()),
            "dst": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "label_a": pa.array([], pa.string()),
            "label_b": pa.array([], pa.string())}))
    return labels, el


# driver-local tier bound for the incremental path's delta-bounded
# grouped passes: ~500k narrow Arrow rows is a few hundred MB on the
# driver — safe, while each avoided Ray sort saves ~2 stage barriers.
# Inputs above the bound silently stay on the distributed path.
INCR_LOCAL_ROWS_BOUND = 500_000

# driver tier for the (gid, member) projection of prior groups — two
# narrow string columns; 2M rows ≈ 150 MB of Arrow buffers. Beyond it
# the affected-gid/member probes stay distributed.
_GROUPS_LOCAL_ROWS_BOUND = 2_000_000


def _local_match_groups(edges_tbl: pa.Table,
                        unified_tbl: pa.Table) -> pa.Table:
    """Driver-local ``build_match_groups`` over a delta-bounded subgraph:
    same UF/labeling/finalize kernels as ``_propagate_local`` +
    ``_finalize_runs``, zero Ray stages. Callers own the bound check —
    the incremental path's subgraph is delta-bounded by its
    ``max_affected_frac`` guard. Arrow buffers arrive plasma-backed
    (``ray.get`` of blocks is zero-copy), so driver heap stays small."""
    from payor_linkage.rayutil import local_grouped_runs

    node_col = unified_tbl["source_record_id"].combine_chunks()
    trust_col = unified_tbl["source_trust_rank"].combine_chunks()

    if edges_tbl.num_rows:
        src = edges_tbl["src"].combine_chunks()
        dst = edges_tbl["dst"].combine_chunks()
        both = pa.chunked_array([src, dst]).combine_chunks()
        enc = pc.dictionary_encode(both)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary
        sort_idx = pc.array_sort_indices(dictionary).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank = np.empty(len(sort_idx), dtype=np.int64)
        rank[sort_idx] = np.arange(len(sort_idx), dtype=np.int64)
        codes = rank[codes]
        uniques = dictionary.take(pa.array(sort_idx))
        n_e = edges_tbl.num_rows
        parent = _int_union_find(codes[:n_e], codes[n_e:], len(uniques))
        label_arrow = uniques.take(pa.array(parent))
        # node labels: UF root when the node touches an edge, else itself
        pos = pc.index_in(node_col, value_set=uniques)
        hit = pc.is_valid(pos)
        node_label = pc.if_else(
            hit, label_arrow.take(pc.fill_null(pos, 0)), node_col)
        # edge-score rows labeled by src's root (≡ dst's root)
        epos = pc.index_in(src, value_set=uniques)
        edge_label = label_arrow.take(epos)
        score_rows = pa.table({
            "label": edge_label,
            "node": pa.nulls(n_e, pa.string()),
            "source_trust_rank": pa.nulls(n_e, trust_col.type),
            "score": pc.cast(edges_tbl["score"].combine_chunks(),
                             pa.float64()),
        })
    else:
        node_label = node_col
        score_rows = None

    member_rows = pa.table({
        "label": node_label,
        "node": node_col,
        "source_trust_rank": trust_col,
        "score": pa.nulls(unified_tbl.num_rows, pa.float64()),
    })
    if score_rows is not None:
        member_rows = pa.concat_tables([member_rows, score_rows],
                                       promote_options="default")
    return local_grouped_runs(member_rows, "label", _GROUPS_SCHEMA,
                              runs_fn=_finalize_runs)


_EDGE_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string()),
                          ("score", pa.float64())])


def _match_edge_block(t: pa.Table, member_arr=None) -> pa.Table:
    """(src, dst, score) match edges of one candidates block, optionally
    restricted to edges whose _a endpoint is in ``member_arr``
    (canonical pairs have both endpoints in the same prior group, so
    the _a-side probe is exact). scatter_blocks kernel."""
    if t.num_rows == 0 or "final_decision" not in t.column_names:
        return _EDGE_SCHEMA.empty_table()
    mask = pc.equal(t["final_decision"], "match")
    if member_arr is not None:
        mask = pc.and_(mask, pc.is_in(t["source_record_id_a"],
                                      value_set=member_arr))
    m = t.filter(mask)
    return pa.table({"src": m["source_record_id_a"],
                     "dst": m["source_record_id_b"],
                     "score": pc.cast(m["overall_score"], pa.float64())})


def _gids_hit_block(t: pa.Table, eps) -> pa.Table:
    """Distinct group ids of one MATCH_GROUPS block with a member in
    ``eps``. scatter_blocks kernel."""
    if t.num_rows == 0 or "source_record_id" not in t.column_names:
        return pa.table({"match_group_id": pa.array([], pa.string())})
    hit = pc.is_in(t["source_record_id"], value_set=eps)
    return pa.table({"match_group_id":
                     pc.unique(t["match_group_id"].filter(hit))})


def _members_of_gids_block(t: pa.Table, gid_arr) -> pa.Table:
    """Member record ids of one MATCH_GROUPS block restricted to
    ``gid_arr`` groups. scatter_blocks kernel."""
    if t.num_rows == 0 or "match_group_id" not in t.column_names:
        return pa.table({"source_record_id": pa.array([], pa.string())})
    ghit = pc.is_in(t["match_group_id"], value_set=gid_arr)
    return pa.table({"source_record_id":
                     t["source_record_id"].filter(ghit)})


def _unified_slice_block(t: pa.Table, node_arr, u_schema) -> pa.Table | None:
    """One unified block filtered to ``node_arr`` records, cast to the
    dataset schema (blocks of a unioned Dataset can disagree on
    string/large_string). scatter_blocks kernel."""
    if t.num_rows == 0 or "source_record_id" not in t.column_names:
        return None
    ft = t.filter(pc.is_in(t["source_record_id"], value_set=node_arr))
    if u_schema is not None and ft.schema != u_schema:
        ft = ft.cast(u_schema)
    return ft


def incremental_match_groups(prior_groups: Dataset, prior_candidates: Dataset,
                             cands_delta: Dataset, unified: Dataset,
                             new_ids, cfg: ClusterConfig | None = None,
                             max_affected_frac: float = 0.3):
    """Supernode-contracted incremental clustering: rebuild ONLY the
    components a delta edge touches, never re-running CC over the full
    graph.

    Full-run components are the prior components merged along delta
    match edges (prior components are closed under prior edges — every
    prior match edge lies inside one prior group). So the changed
    components are exactly: (members of prior groups with a delta-edge
    endpoint) ∪ (new records), connected by (prior match edges inside
    those groups) ∪ (delta edges). That subgraph is CLOSED — no full-
    graph edge leaves it — so running the ordinary ``build_match_groups``
    finalize over it yields rows byte-identical to a fresh full run
    (same member sets → same uuid5 ids; same edge sets → same mean
    confidence), and every untouched prior group row is reusable
    verbatim.

    Returns ``(groups_sub, affected_prior_gids, unified_sub, local)`` —
    the rebuilt rows for changed/new components, the prior group ids to
    drop, the MATERIALIZED delta-bounded slice of ``unified``
    restricted to the affected node set (handed back so the
    survivorship/xref patch stages stream it instead of re-filtering
    the full corpus; ``None`` on the driver tier, where the Arrow
    table in ``local`` carries the slice instead — serializing it back
    into a Dataset nobody reads was the costliest step of this
    function), and — when the subgraph fit the driver tier —
    ``(groups_tbl, unified_tbl)`` Arrow tables so those patch stages
    can run driver-local as well (else ``None``). Returns ``None``
    overall when the delta touches more than ``max_affected_frac`` of
    the prior corpus (the adversarial uniform-sprinkle regime, where a
    full rebuild is cheaper and the broadcast member set would stop
    being delta-bounded)."""
    import ray

    cfg = cfg or ClusterConfig()

    # Driver tier (below _GROUPS_LOCAL_ROWS_BOUND prior rows): every
    # input this function probes — prior groups, prior candidates, the
    # delta candidates, the unified corpus — is an ALREADY-MATERIALIZED
    # dataset whose blocks sit in plasma. ray.get of those refs is a
    # zero-copy view, so all probes can run as driver Arrow kernels
    # with ZERO further Ray stage launches (each launch costs ~0.5-1 s
    # of fixed latency — the dominant incremental cost on a single
    # node). Above the bound the distributed probes run unchanged.
    n_prior = prior_groups.count()
    driver_tier = n_prior <= _GROUPS_LOCAL_ROWS_BOUND

    new_arr = pa.array(sorted(set(new_ids)), pa.string())
    delta_edges = None
    if driver_tier:
        # delta match edges: filter+project each delta block as a raw
        # Ray task (scatter_blocks — no Dataset stage launch, no driver
        # deserialization of full blocks; 0-row schema-less union blocks
        # are handled inside the kernel)
        from payor_linkage.rayutil import scatter_blocks

        etbl = scatter_blocks(cands_delta, _match_edge_block,
                              schema=_EDGE_SCHEMA)
    else:
        delta_edges = match_edges(cands_delta).materialize()
        etbl = pa.concat_tables(ray.get(delta_edges.to_arrow_refs()),
                                promote_options="default")

    if etbl.num_rows:
        endpoints = pc.unique(pa.chunked_array(
            [etbl["src"].combine_chunks(), etbl["dst"].combine_chunks()]
        ).combine_chunks())
        old_eps = endpoints.filter(
            pc.invert(pc.is_in(endpoints, value_set=new_arr)))
    else:
        old_eps = pa.array([], pa.string())

    # prior gids with a delta-edge endpoint → their full member sets.
    # Driver tier: both probes scatter over prior_groups' in-plasma
    # blocks as raw Ray tasks (parallel, ~ms each, only the delta-
    # bounded hits return to the driver).
    if len(old_eps):
        if driver_tier:
            from payor_linkage.rayutil import scatter_blocks

            gtbl = scatter_blocks(
                prior_groups, _gids_hit_block, old_eps,
                schema=pa.schema([("match_group_id", pa.string())]))
            affected_gids = sorted(pc.unique(
                gtbl["match_group_id"].combine_chunks()).to_pylist())
        else:
            ep_ref = ray.put(old_eps)
            tds = prior_groups.map_batches(
                lambda b: b.filter(pc.is_in(b["source_record_id"],
                                            value_set=ray.get(ep_ref))),
                batch_format="pyarrow").select_columns(
                ["match_group_id"]).materialize()
            ttbl = pa.concat_tables(ray.get(tds.to_arrow_refs()),
                                    promote_options="default")
            affected_gids = sorted(pc.unique(
                ttbl["match_group_id"].combine_chunks()).to_pylist())
    else:
        affected_gids = []

    if affected_gids:
        gid_arr = pa.array(affected_gids, pa.string())
        if driver_tier:
            from payor_linkage.rayutil import scatter_blocks

            mtbl = scatter_blocks(
                prior_groups, _members_of_gids_block, gid_arr,
                schema=pa.schema([("source_record_id", pa.string())]))
            member_arr = mtbl["source_record_id"].combine_chunks()
            if n_prior and len(member_arr) > max_affected_frac * n_prior:
                return None  # delta too diffuse — full rebuild is cheaper
        else:
            gid_ref = ray.put(gid_arr)
            members_ds = prior_groups.map_batches(
                lambda b: b.filter(pc.is_in(b["match_group_id"],
                                            value_set=ray.get(gid_ref))),
                batch_format="pyarrow").select_columns(
                ["source_record_id"]).materialize()
            if n_prior and members_ds.count() > max_affected_frac * n_prior:
                return None  # delta too diffuse — full rebuild is cheaper
            mtbl = pa.concat_tables(ray.get(members_ds.to_arrow_refs()),
                                    promote_options="default")
            member_arr = mtbl["source_record_id"].combine_chunks()
    else:
        member_arr = pa.array([], pa.string())

    node_arr = pc.unique(pa.chunked_array(
        [member_arr, new_arr]).combine_chunks())

    try:
        u_schema = unified.schema().base_schema
    except Exception:
        u_schema = None

    if driver_tier:
        # prior subgraph edges: filter+project each (wide, materialized)
        # candidates block in a raw Ray task — the block never leaves
        # its worker, only the delta-bounded matches return
        from payor_linkage.rayutil import scatter_blocks

        petbl = scatter_blocks(prior_candidates, _match_edge_block,
                               member_arr, schema=_EDGE_SCHEMA)
        n_sub = len(node_arr) + petbl.num_rows + etbl.num_rows
        if n_sub <= INCR_LOCAL_ROWS_BOUND:
            import ray.data as _rd

            # unified slice: same scatter shape (cast inside the task —
            # blocks of a unioned Dataset can disagree on
            # string/large_string)
            unified_tbl = scatter_blocks(
                unified, _unified_slice_block, node_arr, u_schema,
                schema=u_schema)
            edges_tbl = pa.concat_tables(
                [petbl, etbl], promote_options="default").combine_chunks()
            # combine_chunks before from_arrow: Ray's put serializer
            # walks every chunk and copies offset buffers — a many-
            # chunk table measured 8 s where the combined one is ~0.2 s
            groups_tbl = _local_match_groups(
                edges_tbl, unified_tbl).combine_chunks()
            groups_sub = _rd.from_arrow(groups_tbl)
            # unified_sub is returned as None: the local_tbls branch of
            # incremental_update reads the Arrow tables directly, and
            # serializing the corpus-slice Dataset nobody consumes was
            # the single biggest cost of this function
            return groups_sub, affected_gids, None, \
                (groups_tbl, unified_tbl)
        # subgraph exceeds the driver tier — fall through to the
        # distributed construction below (the crossover band pays the
        # probe twice; correctness is unaffected)

    node_ref = ray.put(node_arr)
    mem_ref = ray.put(member_arr)

    # normalize block schemas INSIDE the parallel filter pass: blocks of
    # a unioned Dataset can disagree on string vs large_string at scale
    # (CLAUDE.md), and leaving that to the driver-side concat's promote
    # would single-thread a full copy of the collected slice
    def _filter_cast(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["source_record_id"],
                              value_set=ray.get(node_ref)))
        if u_schema is not None and b.schema != u_schema:
            b = b.cast(u_schema)
        return b

    unified_sub = unified.map_batches(
        _filter_cast, batch_format="pyarrow").materialize()

    # prior match edges inside affected groups: canonical pairs have both
    # endpoints in the same prior group, so the _a-side probe is exact.
    # Project to the 4 edge columns BEFORE the scan — prior candidates
    # carry full pair payloads, and this pass needs none of them.
    def prior_sub_edges(b: pa.Table) -> pa.Table:
        m = b.filter(pc.and_(
            pc.equal(b["final_decision"], "match"),
            pc.is_in(b["source_record_id_a"], value_set=ray.get(mem_ref))))
        return pa.table({"src": m["source_record_id_a"],
                         "dst": m["source_record_id_b"],
                         "score": m["overall_score"]})

    prior_edges = prior_candidates.select_columns(
        ["source_record_id_a", "source_record_id_b", "final_decision",
         "overall_score"]).map_batches(
        prior_sub_edges, batch_format="pyarrow").materialize()

    if delta_edges is None:
        import ray.data as _rd

        delta_edges = _rd.from_arrow(etbl)
    edges_sub = prior_edges.union(delta_edges)
    groups_sub = build_match_groups(None, unified_sub, cfg,
                                    local_rows_bound=INCR_LOCAL_ROWS_BOUND,
                                    edges=edges_sub)
    return groups_sub, affected_gids, unified_sub, None


def build_match_groups(candidates: Dataset, unified: Dataset,
                       cfg: ClusterConfig | None = None,
                       local_rows_bound: int = 0,
                       edges: Dataset | None = None) -> Dataset:
    """candidates + unified records → MATCH_GROUPS Dataset (one shuffle
    after fixpoint: members ∪ edge-scores grouped by final label).
    ``local_rows_bound`` threads to the finalize ``grouped_apply`` — the
    incremental path's delta-bounded subgraph skips its sort barriers.
    Pass pre-built ``edges`` ((src, dst, score) match edges) to skip the
    candidates scan entirely — the incremental path derives them from a
    4-column projection instead of re-scanning full-width candidates."""
    cfg = cfg or ClusterConfig()

    # candidates arrive in many small blocks (one per scorer task);
    # coalesce once so every downstream pass (reduce, labeling, score
    # rows) runs O(cpus) tasks instead of O(scorer-tasks)
    try:
        import ray as _ray

        _cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        _cpus = 4
    if edges is None:
        n_cand_blocks = None
        try:
            n_cand_blocks = candidates.num_blocks()
        except Exception:
            pass
        if n_cand_blocks is not None and n_cand_blocks > _cpus * 4:
            # scorer output arrives one block per scorer task (hundreds
            # of blocks); a Dataset scan pays one task per block plus a
            # repartition shuffle of the edges. Scatter the match
            # filter as raw tasks instead and re-publish the (small,
            # match-only) edge table as ~2·cpus plasma blocks for the
            # parallel passes downstream. Measured 5.9 s → ~2 s at 7.7M
            # candidates / 940 blocks.
            import ray

            import ray.data as _rd
            from payor_linkage.rayutil import scatter_blocks

            etbl = scatter_blocks(candidates, _match_edge_block,
                                  schema=_EDGE_SCHEMA)
            n_parts = max(1, min(_cpus * 2, -(-etbl.num_rows // 8192)))
            step = -(-max(etbl.num_rows, 1) // n_parts)
            edges = _rd.from_arrow_refs(
                [ray.put(etbl.slice(i, step))
                 for i in range(0, max(etbl.num_rows, 1), step)])
        else:
            edges = match_edges(candidates) \
                .repartition(_cpus * 2).materialize()
    else:
        edges = edges.repartition(_cpus * 2).materialize()
    nodes = unified.map_batches(
        lambda b: pa.table({"node": b["source_record_id"],
                            "source_trust_rank": b["source_trust_rank"]}),
        batch_format="pyarrow")

    n_edges = edges.count()
    if n_edges == 0:
        labels, el_final = propagate_labels(edges, nodes, cfg)
    elif n_edges <= cfg.local_cc_max_edges:
        labels, el_final = _propagate_local(edges, nodes)
    else:
        # sort-contract tier: alternating anchor sorts + per-block
        # spanning-forest union-find (no joins) shrink the edge list
        # geometrically for shallow entity clusters; if the forest fits
        # the driver bound, finish there — else label-propagate.
        slim = edges.select_columns(["src", "dst"])
        n_slim = n_edges
        for r in range(cfg.contract_rounds):
            anchor = "src" if r % 2 == 0 else "dst"
            slim = (slim.repartition(2 * _cpus).sort(anchor)
                    .map_batches(_reduce_edge_block, batch_format="pyarrow",
                                 batch_size=None).materialize())
            n_prev, n_slim = n_slim, slim.count()
            if n_slim <= cfg.local_cc_max_edges or n_slim >= n_prev:
                break
        if cfg.local_cc_max_edges and n_slim <= cfg.local_cc_max_edges:
            labels, el_final = _propagate_local(edges, nodes, reduced=slim)
        else:
            labels, el_final = propagate_labels(edges, nodes, cfg)

    member_rows = labels.map_batches(
        lambda b: pa.table({
            "label": b["label"], "node": b["node"],
            "source_trust_rank": b["source_trust_rank"],
            "score": pa.nulls(b.num_rows, pa.float64()),
        }), batch_format="pyarrow")

    if el_final is not None:
        score_rows = el_final.map_batches(
            lambda b: pa.table({
                "label": b["label_a"],
                "node": pa.nulls(b.num_rows, pa.string()),
                "source_trust_rank": pa.nulls(b.num_rows, pa.int32()),
                "score": b["score"],
            }), batch_format="pyarrow")
        member_rows = member_rows.union(score_rows)

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(member_rows, "label", out_schema=_GROUPS_SCHEMA,
                         runs_fn=_finalize_runs,
                         local_rows_bound=local_rows_bound)

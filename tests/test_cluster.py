"""Clustering tests: label propagation + G2 group semantics
(`snowflake/09_connected_components_proc.sql`)."""

import uuid

import pyarrow as pa
import pytest


def _candidates(edges):
    """edges: list of (a, b, score, decision)."""
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "source_record_id_a": pa.array([e[0] for e in edges], pa.string()),
        "source_record_id_b": pa.array([e[1] for e in edges], pa.string()),
        "overall_score": pa.array([e[2] for e in edges], pa.float64()),
        "final_decision": pa.array([e[3] for e in edges], pa.string()),
    }))


def _unified(nodes):
    """nodes: list of (id, trust_rank)."""
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "source_record_id": pa.array([n[0] for n in nodes], pa.string()),
        "source_trust_rank": pa.array([n[1] for n in nodes], pa.int32()),
    }))


@pytest.mark.parametrize("local_cc", [2_000_000, 0],
                         ids=["local-unionfind", "distributed-labelprop"])
def test_deep_chain_converges(ray_session, local_cc):
    """A 6-hop chain — the reference's 2-pass SQL provably cannot close
    this (`match_groups.sql:43-45`); both CC paths must (the distributed
    label-propagation path is the 10^12-scale default above the
    local-union-find edge bound)."""
    from payor_linkage.cluster import build_match_groups
    from payor_linkage.config import ClusterConfig

    ids = [f"n{i}" for i in range(7)]
    edges = [(ids[i], ids[i + 1], 1.0, "match") for i in range(6)]
    groups = build_match_groups(
        _candidates(edges), _unified([(i, 1) for i in ids]),
        ClusterConfig(local_cc_max_edges=local_cc)).to_pandas()
    assert groups.match_group_id.nunique() == 1
    assert len(groups) == 7


def test_paths_agree(ray_session):
    """Local union-find and distributed label propagation produce
    byte-identical group tables."""
    from payor_linkage.cluster import build_match_groups
    from payor_linkage.config import ClusterConfig

    edges = [("a", "b", 0.9, "match"), ("b", "c", 0.88, "match"),
             ("d", "e", 1.0, "match"), ("x", "y", 0.7, "no_match")]
    nodes = [("a", 3), ("b", 1), ("c", 2), ("d", 2), ("e", 2), ("x", 1),
             ("y", 1), ("lone", 4)]
    g_local = build_match_groups(_candidates(edges), _unified(nodes),
                                 ClusterConfig()).to_pandas()
    g_dist = build_match_groups(_candidates(edges), _unified(nodes),
                                ClusterConfig(local_cc_max_edges=0)).to_pandas()
    key = ["source_record_id"]
    a = g_local.sort_values(key).reset_index(drop=True)
    b = g_dist.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_sort_contract_tier_agrees(ray_session):
    """The middle tier (sort-contract rounds → driver union-find on the
    contracted forest) produces the same groups as the local path."""
    from payor_linkage.cluster import build_match_groups
    from payor_linkage.config import ClusterConfig

    # a 12-deep chain + a triangle + disjoint pair + singleton
    chain = [(f"c{i:02d}", f"c{i+1:02d}", 0.9, "match") for i in range(12)]
    edges = chain + [("t1", "t2", 0.9, "match"), ("t2", "t3", 0.9, "match"),
                     ("t1", "t3", 0.9, "match"), ("p1", "p2", 1.0, "match")]
    nodes = ([(f"c{i:02d}", 1) for i in range(13)]
             + [("t1", 2), ("t2", 1), ("t3", 3), ("p1", 1), ("p2", 2),
                ("lone", 4)])
    g_local = build_match_groups(_candidates(edges), _unified(nodes),
                                 ClusterConfig()).to_pandas()
    # bound below the raw edge count (16) but above the contracted
    # forest size → exercises contract-then-driver
    g_mid = build_match_groups(
        _candidates(edges), _unified(nodes),
        ClusterConfig(local_cc_max_edges=15)).to_pandas()
    key = ["source_record_id"]
    a = g_local.sort_values(key).reset_index(drop=True)
    b = g_mid.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_group_id_is_uuid5_of_sorted_members(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("b", "c", 0.9, "match"), ("a", "b", 0.95, "match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("a", 3), ("b", 1), ("c", 2)])).to_pandas()
    expected = str(uuid.uuid5(uuid.NAMESPACE_DNS, "a|b|c"))
    assert set(groups.match_group_id) == {expected}


def test_survivor_lowest_trust_rank(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("a", "b", 1.0, "match"), ("b", "c", 1.0, "match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("a", 3), ("b", 1), ("c", 2)])).to_pandas()
    surv = groups[groups.is_survivor]
    assert list(surv.source_record_id) == ["b"]


def test_survivor_tie_breaks_to_first_sorted(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("x", "y", 1.0, "match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("x", 2), ("y", 2)])).to_pandas()
    assert list(groups[groups.is_survivor].source_record_id) == ["x"]


def test_group_confidence_mean_rounded(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("a", "b", 0.9, "match"), ("b", "c", 0.8667, "match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("a", 1), ("b", 1), ("c", 1)])).to_pandas()
    assert groups.group_confidence.iloc[0] == round((0.9 + 0.8667) / 2, 4)


def test_singletons_kept_with_null_confidence(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("a", "b", 1.0, "match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("a", 1), ("b", 1), ("lone", 2)])).to_pandas()
    lone = groups[groups.source_record_id == "lone"]
    assert len(lone) == 1 and bool(lone.is_survivor.iloc[0])
    assert lone.group_confidence.isna().all()
    assert lone.match_group_id.iloc[0] == str(uuid.uuid5(uuid.NAMESPACE_DNS, "lone"))


def test_no_match_edges_ignored(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("a", "b", 0.7, "no_match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("a", 1), ("b", 1)])).to_pandas()
    assert groups.match_group_id.nunique() == 2


def test_two_components(ray_session):
    from payor_linkage.cluster import build_match_groups

    edges = [("a", "b", 1.0, "match"), ("c", "d", 1.0, "match")]
    groups = build_match_groups(
        _candidates(edges), _unified([("a", 1), ("b", 1), ("c", 1), ("d", 1)])).to_pandas()
    assert groups.match_group_id.nunique() == 2
    assert groups.groupby("match_group_id").size().tolist() == [2, 2]

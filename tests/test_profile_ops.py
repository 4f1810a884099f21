"""Unit gates for the profiling / validation / seeded-shuffle /
compressibility operators (session-5 additions)."""

import hashlib
import zlib

import pyarrow as pa
import pyarrow.compute as pc


def test_first_digit_profile(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import first_digit_profile

    t = pa.table({"v": [0.5, 1.2, 10.0, 99.9, 100.0, 123.4, 987.0,
                        9.99, -5.0]})
    out = first_digit_profile(rd.from_arrow(t), "v").to_pandas()
    got = dict(zip(out["digit"], out["n"]))
    # digits: 1.2,10.0,100.0,123.4 -> 1 ; 99.9,987.0,9.99 -> 9
    # excluded: 0.5 (floor 0), -5.0 (negative)
    assert got == {1: 4, 9: 3}
    assert out["n"].dtype == "int64" and out["digit"].dtype == "int64"


def test_rule_mask_profile(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import rule_mask_profile

    t = pa.table({"a": [1, 5, 5, 0, None], "b": ["x", "y", "x", "y", "x"]})
    rules = [
        ("a_big", lambda b: pc.greater(b["a"], 3)),          # NULL -> clean
        ("b_is_y", lambda b: pc.equal(b["b"], "y")),
    ]
    out = rule_mask_profile(rd.from_arrow(t), rules).to_pandas()
    got = dict(zip(out["mask"], out["n"]))
    # rows: (1,x)->0  (5,y)->3  (5,x)->1  (0,y)->2  (None,x)->0
    assert got == {0: 2, 1: 1, 2: 1, 3: 1}


def test_seeded_shuffle_matches_reference_permutation(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.reshape import seeded_shuffle

    ids = list(range(17))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = seeded_shuffle(ds, "doc_id", "s").to_pandas()
    assert sorted(out["pos"]) == list(range(1, len(ids) + 1))
    order = sorted(ids, key=lambda i: (
        hashlib.md5(f"s|{i}".encode()).hexdigest(), i))
    expected = {doc: rank + 1 for rank, doc in enumerate(order)}
    got = dict(zip(out["doc_id"], out["pos"]))
    assert got == expected
    # same seed -> identical; different seed -> different permutation
    again = seeded_shuffle(ds, "doc_id", "s").to_pandas()
    assert dict(zip(again["doc_id"], again["pos"])) == got
    other = seeded_shuffle(ds, "doc_id", "t").to_pandas()
    assert dict(zip(other["doc_id"], other["pos"])) != got


def test_compression_signal_matches_direct_zlib(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.text import compression_signal

    texts = ["abc " * 200, "the quick brown fox jumps over the lazy dog",
             "", "aaaaaaaaaaaaaaaaaaaaaaaa", "unicode éé text"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = compression_signal(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        enc = s.encode("utf-8")
        assert out["raw_len"][i] == len(enc)
        assert out["comp_len"][i] == len(zlib.compress(enc, 6))
        assert out["ratio_bp"][i] == (
            out["comp_len"][i] * 10000 // max(out["raw_len"][i], 1))
    # the repetitive doc compresses far below the prose doc
    assert out["ratio_bp"][0] < out["ratio_bp"][1]


def test_join_skew_profile(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import join_skew_profile

    left = pa.table({"k": [1, 1, 1, 2, 3, 3]})
    right = pa.table({"k": [1, 1, 2, 2, 2, 4]})
    out = join_skew_profile(rd.from_arrow(left), rd.from_arrow(right),
                            "k", "k", k=2).to_pandas()
    # fan-outs: key1 = 3*2 = 6, key2 = 1*3 = 3, key3 absent on right
    assert list(out["key"]) == [1, 2]
    assert list(out["pairs"]) == [6, 3]
    assert list(out["n_left"]) == [3, 1]
    assert list(out["n_right"]) == [2, 3]


def test_boilerplate_prune(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.text import boilerplate_prune

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b c", "a d", "a c e", "a"]})
    out = boilerplate_prune(rd.from_arrow(t), max_df=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # 'a' appears in 4 docs (>=3) -> dropped; 'c' in 2 docs -> kept;
    # doc 4 loses its only unit -> dropped entirely
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["text"]) == ["b c", "d", "c e"]
    assert list(out["n_kept"]) == [2, 1, 2]
    assert list(out["n_dropped"]) == [1, 1, 1]


def test_regex_count_profile(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.text import regex_count_profile

    t = pa.table({"event_id": [1, 2],
                  "props": ['{"a": 123, "b": 7}', 'no digits here']})
    out = regex_count_profile(
        rd.from_arrow(t), "props", {"num": "[0-9]+"}).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert list(out["n_num"]) == [2, 0]


def test_inferred_pairs(ray_session):
    import ray.data as rd

    from payor_linkage.evaluate import inferred_pairs

    groups = rd.from_arrow(pa.table({
        "match_group_id": ["g1", "g1", "g1", "g2"],
        "source_record_id": ["r1", "r2", "r3", "r4"]}))
    cands = rd.from_arrow(pa.table({
        "source_record_id_a": ["r1", "r2", "r1"],
        "source_record_id_b": ["r2", "r3", "r3"],
        "final_decision": ["match", "match", "no_match"]}))
    out = inferred_pairs(groups, cands).to_pandas()
    # chain r1-r2-r3: the transitive (r1, r3) pair was scored no_match
    # so it is NOT a direct match edge -> inferred; singleton g2 none
    assert out.values.tolist() == [["g1", "r1", "r3"]]

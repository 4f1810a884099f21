"""Property-based tests (hypothesis) for the scalar kernels — similarity
metrics, phonetics, hashing, and the union-find."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from payor_linkage.phonetics import doublemetaphone, jaro_similarity, \
    jaro_winkler_similarity, soundex

names = st.text(alphabet=string.ascii_uppercase + " ", min_size=1, max_size=30)
texts = st.text(min_size=0, max_size=60)


@given(names, names)
@settings(max_examples=200, deadline=None)
def test_jw_symmetric_and_bounded(a, b):
    s = jaro_winkler_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert abs(s - jaro_winkler_similarity(b, a)) < 1e-12


@given(names)
@settings(max_examples=100, deadline=None)
def test_jw_identity(a):
    assert jaro_winkler_similarity(a, a) == 1.0


@given(names, names)
@settings(max_examples=200, deadline=None)
def test_jw_dominates_jaro(a, b):
    assert jaro_winkler_similarity(a, b) >= jaro_similarity(a, b) - 1e-12


@given(texts)
@settings(max_examples=200, deadline=None)
def test_soundex_shape(s):
    code = soundex(s)
    assert code == "" or (len(code) == 4 and code[0].isalpha())


@given(texts)
@settings(max_examples=200, deadline=None)
def test_doublemetaphone_total_and_deterministic(s):
    p1 = doublemetaphone(s)
    p2 = doublemetaphone(s)
    assert p1 == p2
    assert isinstance(p1[0], str) and isinstance(p1[1], str)


@given(names, names)
@settings(max_examples=100, deadline=None)
def test_route_name_winner_is_max(a, b):
    from payor_linkage.strategies import route_name

    score, strat, tried = route_name(a, b)
    assert strat in tried
    assert 0.0 <= score <= 1.0


@given(st.text(alphabet="0123456789-", min_size=1, max_size=12),
       st.text(alphabet="0123456789-", min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_taxid_transpose_symmetric(a, b):
    from payor_linkage.strategies import taxid_transpose

    assert taxid_transpose(a, b) == taxid_transpose(b, a)


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_union_find_matches_naive_components(edge_ints):
    """_local_union_find labels == naive BFS components with min-id label."""
    from payor_linkage.cluster import _local_union_find

    edges = [{"src": f"n{a:02d}", "dst": f"n{b:02d}"} for a, b in edge_ints]
    got = _local_union_find(edges)

    # naive reference
    adj: dict[str, set] = {}
    for e in edges:
        adj.setdefault(e["src"], set()).add(e["dst"])
        adj.setdefault(e["dst"], set()).add(e["src"])
    seen: set = set()
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.append(x)
            stack.extend(adj[x] - set(comp))
        label = min(comp)
        for m in comp:
            seen.add(m)
            assert got.get(m, m) == label, (m, comp)


@given(st.text(min_size=0, max_size=50))
@settings(max_examples=100, deadline=None)
def test_minhash_shingles_deterministic(text):
    from payor_linkage.dataops.dedup import _jaccard_shingles

    assert _jaccard_shingles(text, text, 3) == (1.0 if True else 0)
    assert 0.0 <= _jaccard_shingles(text, text[::-1], 3) <= 1.0


@given(st.lists(st.text(string.printable, max_size=20), max_size=12))
@settings(max_examples=100, deadline=None)
def test_spans_json_roundtrip(kinds):
    """Serialization fidelity: spans → JSON → spans is lossless."""
    import pyarrow as pa

    from payor_linkage.normalize import _serialize_spans, spans_from_json
    from payor_linkage.schema import SPAN_STRUCT

    spans = [{"kind": k, "text": k[::-1], "media_ref": "", "offset": i}
             for i, k in enumerate(kinds)]
    arr = pa.array([spans], pa.list_(SPAN_STRUCT))
    ser = _serialize_spans(arr)
    back = spans_from_json(ser)
    assert back.to_pylist()[0] == spans


# ── round-3 kernels ─────────────────────────────────────────────────────────


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_int_union_find_matches_reference(edges):
    """Vectorized min-label CC == a plain python union-find, on random
    multigraphs (self-loops, duplicates, isolated nodes included)."""
    import numpy as np

    from payor_linkage.cluster import _int_union_find

    n = 31
    src = np.array([a for a, _ in edges], dtype=np.int64)
    dst = np.array([b for _, b in edges], dtype=np.int64)
    got = _int_union_find(src, dst, n)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    want = [find(i) for i in range(n)]
    # reference roots are already the component minimum (union by min id)
    assert got.tolist() == want


@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
       st.sampled_from([(10, 5), (12, 4), (6, 6)]))
@settings(max_examples=100, deadline=None)
def test_hopping_windows_match_brute(ray_session, tss, wh):
    """Every (key, win_start) count equals the brute per-event recompute
    with floor semantics, including pre-epoch timestamps."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import hopping_window_counts

    window, hop = wh
    ev = rd.from_arrow(pa.table({
        "user_id": ["u"] * len(tss),
        "ts": pa.array(tss, pa.timestamp("us"))}))
    got = {(r["user_id"], r["win_start"]): r["n"]
           for r in hopping_window_counts(ev, window, hop).take_all()}
    want: dict = collections.defaultdict(int)
    for t in tss:
        base = t // hop  # python floor division
        for off in range(window // hop):
            want[("u", (base - off) * hop)] += 1
    assert got == dict(want)


@given(st.binary(min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_chunk_hash_paths_bit_identical(bs):
    """The numpy matrix hash and its python byte-string mirror must be
    bit-identical for the same bytes — winnowing selection consistency
    across the ASCII and non-ASCII extraction paths depends on it."""
    import numpy as np

    from payor_linkage.dataops.dedup import (_chunk_hash_bytes,
                                             _chunk_hash_matrix)

    row = np.frombuffer(bs, dtype=np.uint8).reshape(1, -1)
    assert int(_chunk_hash_matrix(row)[0]) == _chunk_hash_bytes(bs)


@given(st.lists(st.text(alphabet=string.ascii_lowercase + " ",
                        min_size=0, max_size=120),
                min_size=1, max_size=20),
       st.integers(min_value=1, max_value=30))
@settings(max_examples=25, deadline=None)
def test_chunk_documents_matches_slicing(ray_session, texts, size):
    """Zero-copy chunking equals naive python slicing for any ASCII
    corpus and chunk size."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops import text as t_mod

    df_tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                       "text": pa.array(texts, pa.string())})
    out_df = t_mod.chunk_documents(rd.from_arrow(df_tbl),
                                   size=size).to_pandas()
    want = [(i, j, t[j * size:(j + 1) * size])
            for i, t in enumerate(texts)
            for j in range((len(t) + size - 1) // size)]
    if not want:
        assert len(out_df) == 0
        return
    out_df = out_df.sort_values(["doc_id", "chunk_idx"])
    got = list(zip(out_df.doc_id, out_df.chunk_idx, out_df.chunk))
    assert got == want


@given(st.integers(min_value=0, max_value=5),
       st.integers(min_value=2, max_value=8))
@settings(max_examples=12, deadline=None)
def test_winnow_guarantee_boundary_span(ray_session, extra, w):
    """The winnowing guarantee at its EXACT boundary: a shared span of
    length k + w - 1 (+extra) must always produce the pair, for any
    neighborhood width w."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.dedup import substring_dup_pairs

    k = 16
    span = "".join("abcdefghij"[(i * 7) % 10] for i in range(k + w - 1 + extra))
    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["xxxx " + span + " oneoneone",
                 "yy " + span + " twotwotwotwo"],
    })
    out = substring_dup_pairs(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        k=k, winnow_w=w).to_pandas()
    assert (0, 1) in set(zip(out.id_a, out.id_b))

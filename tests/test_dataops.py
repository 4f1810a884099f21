"""Unit tests for the training-data operators (dedup / similarity / text /
multimodal) on crafted inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _doc_ds(texts, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s0"] * len(texts), pa.string()),
    }))


def test_exact_dedup(ray_session):
    from payor_linkage.dataops.dedup import exact_dedup

    ds = _doc_ds(["aaa", "bbb", "aaa", "ccc", "aaa"])
    out = exact_dedup(ds).to_pandas().sort_values("text").reset_index(drop=True)
    assert out.text.tolist() == ["aaa", "bbb", "ccc"]
    assert out.keeper_id.tolist() == [0, 1, 3]
    assert out.n_dups.tolist() == [3, 1, 1]


def test_minhash_lsh_finds_near_dups(ray_session):
    from payor_linkage.dataops.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark shuffles and arrow batches"
    ds = _doc_ds([base, near, far])
    out = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert {(0, 1)} == set(zip(out.id_a, out.id_b))
    assert (out.n_inter / out.n_union >= 0.5).all()


def test_minhash_deterministic(ray_session):
    from payor_linkage.dataops.dedup import _minhash_sig, _perm_params

    a, b = _perm_params(64)
    s1 = _minhash_sig("hello world text", a, b, 3)
    s2 = _minhash_sig("hello world text", a, b, 3)
    assert (s1 == s2).all()


def test_simhash_pairs(ray_session):
    from payor_linkage.dataops.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    far = "one two three four five six seven eight nine ten"
    ds = _doc_ds([base, near, far])
    out = simhash_pairs(ds, max_hamming=16).to_pandas()
    assert (0, 1) in set(zip(out.id_a, out.id_b))
    assert (2 not in set(out.id_a)) and (2 not in set(out.id_b))


def test_simhash_pigeonhole_complete(ray_session):
    """With max_hamming < n_chunks the bucketed candidate generation is
    provably complete — verify against brute-force hamming on real docs."""
    import os

    import ray.data as rd

    from payor_linkage.dataops.dedup import (simhash_pairs_from_sigs,
                                             simhash_signatures)

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    sigs = simhash_signatures(rd.read_parquet(path)).materialize()
    out = simhash_pairs_from_sigs(sigs, max_hamming=7, n_chunks=8).to_pandas()
    df = sigs.to_pandas()
    s = df.sig.to_numpy().view(np.uint64)
    ids = df.id.to_numpy()
    n = len(s)
    x = (s[:, None] ^ s[None, :]).copy()
    ham = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
    iu, ju = np.triu_indices(n, 1)
    mask = ham[iu, ju] <= 7
    brute = {(min(ids[a], ids[b]), max(ids[a], ids[b]))
             for a, b in zip(iu[mask], ju[mask])}
    assert set(zip(out.id_a, out.id_b)) == brute
    assert brute, "corpus should contain at least one near-dup pair"


def test_lsh_neardup_recall(ray_session):
    """Quantified recall gate for the LSH scale path vs brute force."""
    import os

    import ray.data as rd

    from payor_linkage.dataops.dedup import embedding_neardup_pairs
    from payor_linkage.dataops.similarity import lsh_neardup_pairs

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = rd.read_parquet(path)
    brute = set(map(tuple, embedding_neardup_pairs(emb, threshold=0.4)
                    .to_pandas()[["id_a", "id_b"]].values))
    lsh = set(map(tuple, lsh_neardup_pairs(emb, threshold=0.4, n_planes=4,
                                           n_tables=32)
                  .to_pandas()[["id_a", "id_b"]].values))
    assert lsh <= brute, "exact verify must give precision 1.0"
    assert brute
    assert len(lsh & brute) / len(brute) >= 0.8


def test_ivf_full_probe_is_exact(ray_session):
    """nprobe = n_centroids scans every partition → identical to brute."""
    from payor_linkage.dataops.similarity import ann_topk, ivf_topk

    rng = np.random.RandomState(7)
    V = rng.randn(200, 16)
    exact = ann_topk(_emb_ds(V), query_ids=[0, 1, 2], k=5).to_pandas()
    full = ivf_topk(_emb_ds(V), query_ids=[0, 1, 2], k=5, n_centroids=8,
                    nprobe=8).to_pandas()
    key = ["query_id", "rank", "neighbor_id"]
    assert exact[key].sort_values(key).values.tolist() == \
        full[key].sort_values(key).values.tolist()


def test_ngram_vs_charset_jaccard(ray_session):
    from payor_linkage.dataops.dedup import charset_jaccard, ngram_jaccard_pairs

    assert charset_jaccard("abc", "abd") == 0.5
    ds = _doc_ds(["abcdefgh", "abcdefgx", "zzzzzzzz"])
    out = ngram_jaccard_pairs(ds, ["source", "lang"], threshold=0.3, k=3).to_pandas()
    assert (0, 1) in set(zip(out.id_a, out.id_b))


def _emb_ds(vectors, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(vectors)))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vectors],
                              pa.list_(pa.float32())),
    }))


def test_embedding_neardup(ray_session):
    from payor_linkage.dataops.dedup import embedding_neardup_pairs

    v = [[1, 0, 0], [0.99, 0.1, 0], [0, 1, 0]]
    out = embedding_neardup_pairs(_emb_ds(v), threshold=0.9).to_pandas()
    assert set(zip(out.id_a, out.id_b)) == {(0, 1)}


def test_ann_topk_ordering(ray_session):
    from payor_linkage.dataops.similarity import ann_topk

    rng = np.random.RandomState(3)
    V = rng.randn(30, 8)
    out = ann_topk(_emb_ds(V), query_ids=[0], k=3).to_pandas()
    assert len(out) == 3
    assert out["rank"].tolist() == [1, 2, 3]
    # brute-force reference
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = Vn[0] @ Vn.T
    cos[0] = -2
    expect = np.argsort(-cos)[:3]
    assert out.neighbor_id.tolist() == list(expect)


def test_ivf_recall_reasonable(ray_session):
    from payor_linkage.dataops.similarity import ann_topk, ivf_topk

    rng = np.random.RandomState(5)
    V = rng.randn(200, 16)
    exact = ann_topk(_emb_ds(V), query_ids=[0, 1], k=5).to_pandas()
    approx = ivf_topk(_emb_ds(V), query_ids=[0, 1], k=5, n_centroids=8,
                      nprobe=4).to_pandas()
    # nprobe=4 of 8 centroids → expect at least some overlap per query
    for q in (0, 1):
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        assert len(e & a) >= 2, (q, e, a)


def test_lsh_neardup(ray_session):
    from payor_linkage.dataops.similarity import lsh_neardup_pairs

    v = [[1, 0, 0, 0], [0.995, 0.05, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]
    out = lsh_neardup_pairs(_emb_ds(v), threshold=0.95, n_planes=6,
                            n_tables=8).to_pandas()
    assert (0, 1) in set(zip(out.id_a, out.id_b))


def test_lsh_neardup_parked_bucket_metrics(ray_session):
    """Over-`max_bucket` buckets emit no pairs by design — the metrics
    sidecar must account for the parking (SURVEY §4 dropped-pair rule).
    With every vector identical and one table, all rows land in ONE
    bucket; max_bucket below n parks it: zero pairs, metrics non-zero."""
    from payor_linkage.dataops.similarity import lsh_neardup_pairs

    v = [[1, 0, 0, 0]] * 6
    m: dict = {}
    out = lsh_neardup_pairs(_emb_ds(v), threshold=0.9, n_planes=4,
                            n_tables=1, max_bucket=5, metrics=m).to_pandas()
    assert len(out) == 0
    assert m["parked_buckets"] == 1
    assert m["parked_rows"] == 6
    assert m["parked_pairs_bound"] == 15

    # under the cap nothing is parked and pairs appear
    m2: dict = {}
    out2 = lsh_neardup_pairs(_emb_ds(v), threshold=0.9, n_planes=4,
                             n_tables=1, max_bucket=50, metrics=m2).to_pandas()
    assert len(out2) == 15
    assert m2["parked_buckets"] == 0 and m2["parked_rows"] == 0


def test_asof_join(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.temporal import asof_join

    def ev(rows):
        return rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
        }))

    left = ev([(1, 100, 10), (1, 50, 11), (2, 100, 12), (3, 100, 13)])
    right = ev([(1, 100, 20), (1, 100, 21),   # tie at ts=100 → max id 21
                (1, 60, 22), (2, 101, 23)])
    out = (asof_join(left, right).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    import pandas as pd

    got = {int(r["event_id"]):
           (None if pd.isna(r["prior_event_id"]) else int(r["prior_event_id"]))
           for _, r in out.iterrows()}
    assert got == {
        10: 21,    # ts=100: tie resolves to max right id
        11: None,  # ts=50: no view yet
        12: None,  # user 2's only view is later (101 > 100)
        13: None,  # user 3 has no views at all
    }


def test_range_join_count(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.temporal import range_join_count

    def ev(rows):
        return rd.from_arrow(pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
        }))

    left = ev([(1, 1000, 10), (2, 1000, 11)])
    right = ev([(1, 400, 20), (1, 500, 21), (1, 1000, 22),  # in [500,1000]
                (1, 1001, 23),                              # after → out
                (2, 499, 24)])                              # below lo → out
    out = range_join_count(left, right, lo_offset_us=-500, hi_offset_us=0,
                           out_col="n").to_pandas()
    got = dict(zip(out.event_id, out.n))
    assert got == {10: 2, 11: 0}   # inclusive bounds: 500 and 1000 count


def test_sessionize_counts(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.temporal import sessionize_counts

    rows = [(1, 0, 1), (1, 100, 2), (1, 1000, 3),   # gap 900 > 500 → split
            (1, 1400, 4),                           # gap 400 → same session
            (2, 0, 5)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
    }))
    out = (sessionize_counts(ds, gap_us=500).to_pandas()
           .sort_values(["user_id", "session_seq"]).reset_index(drop=True))
    assert out.values.tolist() == [[1, 0, 2], [1, 1, 2], [2, 0, 1]]


def test_doc_stats_counts(ray_session):
    from payor_linkage.dataops.text import doc_stats

    out = doc_stats(_doc_ds(["the cat, and a dog!"])).to_pandas().iloc[0]
    assert out.n_chars_calc == 19
    assert out.n_words == 5           # single-space split
    assert out.n_punct == 2           # ',' and '!'
    assert out.n_stop == 3            # the, and, a
    assert out.stop_ratio == round(3 / 5, 4)


def test_lang_id(ray_session):
    from payor_linkage.dataops.text import lang_id

    ds = _doc_ds([
        "the cat is on the mat and it is happy",
        "der Hund ist nicht auf der Matte und das ist gut",
        "le chat est dans la maison avec le chien",
        "xyzzy qwerty plugh",
    ])
    out = lang_id(ds).to_pandas().sort_values("doc_id")
    assert out.lang_pred.tolist() == ["en", "de", "fr", "und"]


def test_fingerprint_md5(ray_session):
    import hashlib

    from payor_linkage.dataops.text import fingerprint

    out = fingerprint(_doc_ds(["hello"])).to_pandas().iloc[0]
    assert out.md5 == hashlib.md5(b"hello").hexdigest()
    # rolling hash deterministic
    out2 = fingerprint(_doc_ds(["hello"])).to_pandas().iloc[0]
    assert out.rolling_min_hash == out2.rolling_min_hash


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.multimodal import (FrameSampler, decode_images,
                                                  sample_frames, synth_media)

    refs = rd.from_items([{"media_ref": f"ref-{i}"} for i in range(10)])
    media = synth_media(refs).materialize()
    assert media.count() == 10
    decoded = decode_images(media).to_pandas()
    assert len(decoded) == 10
    # payloads are real binary PPMs → the pure-numpy parser runs
    assert set(decoded.decoder) == {"ppm"}
    assert ((decoded.width >= 16) & (decoded.width < 64)).all()
    assert decoded.feature.map(len).eq(64).all()
    # the decoded dims equal the dims encoded in the payload header
    import re
    pay = media.to_pandas().set_index("media_id").payload
    for _, row in decoded.iterrows():
        m = re.match(rb"P6\n(\d{5}) (\d{5})\n", bytes(pay[row.media_id]))
        assert (int(m.group(1)), int(m.group(2))) == (row.width, row.height)
    # determinism: same ref → same decode
    d2 = decode_images(synth_media(refs)).to_pandas()
    assert sorted(decoded.content_hash) == sorted(d2.content_hash)

    frames = sample_frames(media, n_frames=3).to_pandas()
    assert len(frames) == 30

    # real=True refuses non-Y4M payloads (compressed codecs can't exist
    # here); Y4M itself decodes for real — see test_video_frames_real
    sampler = FrameSampler(n_frames=2, real=True)
    one = pa.Table.from_pandas(media.limit(1).to_pandas(),
                               preserve_index=False)
    with pytest.raises(NotImplementedError):
        sampler(one)


def test_audio_decode_real_wav(ray_session):
    """WAV payloads decode via the stdlib wave module; frame counts
    equal the canonical-header arithmetic the SQL oracle uses."""
    import ray.data as rd

    from payor_linkage.dataops.multimodal import decode_audio, synth_media

    refs = rd.from_items([{"media_ref": f"aud-{i}"} for i in range(8)])
    media = synth_media(refs, kind="audio").materialize()
    out = decode_audio(media).to_pandas()
    pay = media.to_pandas().set_index("media_id").payload
    assert (out.sample_rate == 8000).all()
    for _, row in out.iterrows():
        assert row.n_samples == (len(pay[row.media_id]) - 44) // 2


def test_neardup_components(ray_session):
    """Pairs → components: transitive closure, min-id canonical,
    singletons kept; int ids survive the zero-pad round trip."""
    import ray.data as rd

    from payor_linkage.dataops.dedup import neardup_components

    docs = _doc_ds(["a", "b", "c", "d", "e"])          # ids 0..4
    pairs = rd.from_items([
        {"id_a": 0, "id_b": 3},
        {"id_a": 3, "id_b": 1},                        # chain 0-3-1
    ])
    out = (neardup_components(docs, pairs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.doc_id.tolist() == [0, 1, 2, 3, 4]
    assert out.cluster_id.tolist() == [0, 0, 2, 0, 4]
    assert out.is_canonical.tolist() == [True, False, True, False, True]


def test_token_topk(ray_session):
    from payor_linkage.dataops.text import token_topk

    ds = _doc_ds(["b b a", "a c a", "A-a b!"])
    out = token_topk(ds, k=2).to_pandas()
    assert out.token.tolist() == ["a", "b"]
    assert out.n.tolist() == [5, 3]


def test_hash_sample_deterministic(ray_session):
    from payor_linkage.dataops.text import hash_sample

    ds = _doc_ds([f"t{i}" for i in range(200)])
    a = hash_sample(ds, rate=0.25).to_pandas().doc_id.tolist()
    b = hash_sample(ds, rate=0.25).to_pandas().doc_id.tolist()
    assert a == b and 0 < len(a) < 200
    # monotone: a larger rate strictly contains the smaller sample
    c = set(hash_sample(ds, rate=0.5).to_pandas().doc_id.tolist())
    assert set(a) <= c


def test_hopping_window_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import hopping_window_counts

    ts = pa.array([0, 4, 5, 11], pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({"user_id": ["u"] * 4, "ts": ts}))
    out = (hopping_window_counts(ev, window_us=10, hop_us=5).to_pandas()
           .sort_values("win_start").reset_index(drop=True))
    # windows: [-5,5) has {0,4}; [0,10) has {0,4,5}; [5,15) has {5,11}; [10,20) has {11}
    assert out.win_start.tolist() == [-5, 0, 5, 10]
    assert out.n.tolist() == [2, 3, 2, 1]


def test_hash_sample_rate_edges(ray_session):
    from payor_linkage.dataops.text import hash_sample

    ds = _doc_ds([f"t{i}" for i in range(50)])
    assert len(hash_sample(ds, rate=1.0).to_pandas()) == 50
    assert len(hash_sample(ds, rate=0.0).to_pandas()) == 0


def test_hopping_windows_pre_epoch(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import hopping_window_counts

    ts = pa.array([-1, -5, 3], pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({"user_id": ["u"] * 3, "ts": ts}))
    out = (hopping_window_counts(ev, window_us=10, hop_us=5).to_pandas()
           .sort_values("win_start").reset_index(drop=True))
    # floor semantics: -1 → wins {-5,-10}; -5 → {-5,-10}; 3 → {0,-5}
    assert out.win_start.tolist() == [-10, -5, 0]
    assert out.n.tolist() == [2, 3, 1]


def test_token_explode_positions_and_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import token_explode

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["  Hello, world! x2 ", "", "...", "one"]),
    }))
    out = token_explode(ds).to_pandas().sort_values(
        ["doc_id", "pos"]).reset_index(drop=True)
    assert out[out.doc_id == 1].token.tolist() == ["hello", "world", "x2"]
    assert out[out.doc_id == 1].pos.tolist() == [1, 2, 3]
    # empty / punctuation-only docs emit no rows
    assert set(out.doc_id) == {1, 4}
    assert out[out.doc_id == 4].token.tolist() == ["one"]


def _ds(df):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_substring_dup_pairs_detects_shared_spans(ray_session):
    """Docs sharing an exact ≥k-char span pair up; disjoint docs don't;
    the non-ASCII fallback path agrees with character semantics."""
    import pandas as pd

    from payor_linkage.dataops.dedup import substring_dup_pairs

    shared = "the quick brown fox jumps over the lazy dog"
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": [
            "prefix one " + shared,
            shared + " suffix two",
            "totally different content with no overlap at all here",
            "short",
            "ünïcode décor " + shared,   # multibyte → fallback path
        ],
    })
    out = (substring_dup_pairs(_ds(df), k=24)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    got = set(zip(out.id_a, out.id_b))
    assert got == {(0, 1), (0, 4), (1, 4)}


def test_substring_dup_pairs_matches_sql_many_blocks(ray_session):
    import duckdb
    import pandas as pd

    from payor_linkage.dataops.dedup import substring_dup_pairs

    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab, 12)) for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    out = (substring_dup_pairs(_ds(df).repartition(7), k=24,
                               max_bucket=1 << 20)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH g AS (
          SELECT DISTINCT doc_id,
                 substr(text, CAST(s AS BIGINT), 24) AS gram
          FROM df, unnest(generate_series(1, length(text) - 23)) AS t(s))
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_substring_dup_winnow_guarantee_and_subset(ray_session):
    """Winnowed mode (w>1): (a) pairs are a subset of exact-complete
    pairs, (b) any shared span of length >= k + w - 1 is ALWAYS found
    (the Schleimer winnowing guarantee), (c) shuffle volume shrinks."""
    import pandas as pd

    from payor_linkage.dataops.dedup import substring_dup_pairs

    k, w = 24, 8
    span = "x" * 0 + "the winnowing guarantee needs spans this long to hold"  # 54 chars >= k+w-1=31
    rng = np.random.default_rng(43)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    noise = [" ".join(rng.choice(vocab, 20)) for _ in range(40)]
    df = pd.DataFrame({
        "doc_id": np.arange(44, dtype=np.int64),
        "text": noise + [
            "AAA " + span + " tail one",
            "BBBB " + span + " other tail",
            "no shared content here at all truly none whatsoever",
            "cccc " + span,
        ],
    })
    exact = set(map(tuple, substring_dup_pairs(
        _ds(df), k=k).to_pandas().values.tolist()))
    win = set(map(tuple, substring_dup_pairs(
        _ds(df), k=k, winnow_w=w).to_pandas().values.tolist()))
    assert win <= exact
    guaranteed = {(40, 41), (40, 43), (41, 43)}
    assert guaranteed <= win


def test_substring_dup_winnow_rate(ray_session):
    """Winnowed pairs stay a subset of exact-complete pairs on random
    text at a smaller k (denser gram collisions)."""
    import pandas as pd

    from payor_linkage.dataops.dedup import substring_dup_pairs

    rng = np.random.default_rng(47)
    texts = ["".join(rng.choice(list("abcdefgh "), 400))
             for _ in range(50)]
    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "text": texts})
    ds = _ds(df)
    exact_pairs = substring_dup_pairs(ds, k=16).to_pandas()
    win_pairs = substring_dup_pairs(ds, k=16, winnow_w=8).to_pandas()
    sa = set(map(tuple, exact_pairs.values.tolist()))
    sw = set(map(tuple, win_pairs.values.tolist()))
    assert sw <= sa


def test_knn_join_exact_matches_bruteforce(ray_session):
    """Exact-complete configuration (one partition) equals brute-force
    per-query ann_topk over every id."""
    from payor_linkage.dataops.similarity import ann_topk, knn_join

    rng = np.random.RandomState(7)
    V = rng.randn(120, 12)
    exact = ann_topk(_emb_ds(V), query_ids=list(range(120)), k=4) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    graph = knn_join(_emb_ds(V), k=4, n_centroids=1, nprobe=1) \
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(graph[exact.columns.tolist()], exact,
                                  check_dtype=False)


def test_knn_join_recall(ray_session):
    """Approximate multi-centroid mode keeps reasonable neighbor overlap
    with the exact graph on clustered data."""
    from payor_linkage.dataops.similarity import knn_join

    rng = np.random.RandomState(9)
    centers = rng.randn(6, 16) * 4
    V = np.concatenate([c + rng.randn(40, 16) * 0.5 for c in centers])
    exact = knn_join(_emb_ds(V), k=5, n_centroids=1, nprobe=1).to_pandas()
    approx = knn_join(_emb_ds(V), k=5, n_centroids=8, nprobe=3).to_pandas()
    hits = total = 0
    eg = exact.groupby("query_id").neighbor_id.apply(set)
    ag = approx.groupby("query_id").neighbor_id.apply(set)
    for q in eg.index:
        total += len(eg[q])
        hits += len(eg[q] & ag.get(q, set()))
    assert hits / total >= 0.6, hits / total


def test_knn_join_partition_guard(ray_session):
    import pytest as _pytest

    from payor_linkage.dataops.similarity import knn_join

    rng = np.random.RandomState(11)
    V = rng.randn(50, 8)
    with _pytest.raises(Exception, match="max_partition"):
        knn_join(_emb_ds(V), k=3, n_centroids=1, nprobe=1,
                 max_partition=10).to_pandas()


def test_resize_images_real_roundtrip(ray_session):
    """Resize emits REAL PPMs: re-decoding gives the target dims, and
    the resampled pixels equal the numpy nearest-neighbor reference."""
    import re

    import ray.data as rd

    from payor_linkage.dataops.multimodal import (decode_images,
                                                  resize_images,
                                                  synth_media)

    refs = rd.from_items([{"media_ref": f"img-{i}"} for i in range(6)])
    media = synth_media(refs).materialize()
    small = resize_images(media, width=12, height=10).materialize()
    dec = decode_images(small).to_pandas()
    assert (dec.width == 12).all() and (dec.height == 10).all()
    # pixel-exact vs a direct numpy reference on one payload
    src = bytes(media.to_pandas().payload[0])
    out = bytes(small.to_pandas().payload[0])
    m = re.match(rb"P6\n(\d{5}) (\d{5})\n255\n", src)
    w, h = int(m.group(1)), int(m.group(2))
    rgb = np.frombuffer(src[len(m.group(0)):], dtype=np.uint8) \
        .reshape(h, w, 3)
    yi = (np.arange(10) * h) // 10
    xi = (np.arange(12) * w) // 12
    ref = rgb[yi][:, xi].tobytes()
    assert out[19:] == ref


def test_video_frames_real(ray_session):
    """Y4M video decodes for REAL: sampled frame offsets point at
    actual FRAME markers, and sum_luma equals a direct numpy sum over
    the payload's own Y plane."""
    import ray.data as rd

    from payor_linkage.dataops.multimodal import sample_frames, synth_media

    refs = rd.from_items([{"media_ref": f"vid-{i}"} for i in range(6)])
    media = synth_media(refs, kind="video").materialize()
    frames = sample_frames(media, n_frames=3).to_pandas()
    pay = media.to_pandas().set_index("media_id").payload
    assert (frames.sum_luma >= 0).all()  # real path ran everywhere
    for _, row in frames.iterrows():
        payload = bytes(pay[row.media_id])
        hdr = payload[:35].decode()
        w, h = int(hdr[11:16]), int(hdr[18:23])
        assert payload[row.frame_offset - 6:row.frame_offset] == b"FRAME\n"
        y = np.frombuffer(payload, dtype=np.uint8, count=w * h,
                          offset=int(row.frame_offset))
        assert int(y.sum()) == row.sum_luma


def test_pagerank_matches_dense_reference(ray_session):
    """Distributed PageRank equals a dense numpy power iteration with
    the same damping / rounds / uniform-dangling semantics (1e-9 —
    float sums differ only by association order)."""
    import pandas as pd
    import ray.data as rd

    from payor_linkage.dataops.graph import pagerank

    rng = np.random.RandomState(13)
    n = 200
    src = rng.randint(0, n, 800).astype(np.int64)
    dst = rng.randint(0, n, 800).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(__import__("pyarrow").table(
        {"src": src, "dst": dst}))
    nodes = rd.from_arrow(__import__("pyarrow").table(
        {"node": np.arange(n, dtype=np.int64)}))
    out = (pagerank(edges, nodes, n_iter=12, damping=0.85)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # dense reference, identical semantics
    d = 0.85
    A = np.zeros((n, n))
    for s, t in zip(src, dst):
        A[s, t] += 1.0
    deg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        dangling = r[deg == 0].sum()
        share = np.divide(r, deg, out=np.zeros_like(r), where=deg > 0)
        r = (1 - d) / n + d * (share @ A) + d * dangling / n
    assert np.allclose(out["rank"].to_numpy(), r, atol=1e-9)
    assert abs(out["rank"].sum() - 1.0) < 1e-9  # mass conserved


def test_triangle_counts_matches_dense_reference(ray_session):
    """Degree-oriented distributed triangle counting equals the dense
    diag(A^3)/2 per-node reference on a random graph, with duplicate /
    reversed / self-loop input edges canonicalized away (integer
    outputs — exact compare)."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.graph import triangle_counts

    rng = np.random.RandomState(7)
    n = 120
    a = rng.randint(0, n, 900).astype(np.int64)
    b = rng.randint(0, n, 900).astype(np.int64)
    # adversarial input: keep self-loops, duplicates, both orientations
    edges = rd.from_arrow(pa.table(
        {"id_a": np.concatenate([a, b]),
         "id_b": np.concatenate([b, a])}))
    out = (triangle_counts(edges).to_pandas()
           .sort_values("node").reset_index(drop=True))

    A = np.zeros((n, n), dtype=np.int64)
    keep = a != b
    A[a[keep], b[keep]] = 1
    A[b[keep], a[keep]] = 1
    per_node = np.diag(A @ A @ A) // 2
    exp = {i: int(c) for i, c in enumerate(per_node) if c > 0}
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == exp


def test_triangle_counts_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.graph import triangle_counts

    edges = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64())}))
    assert triangle_counts(edges).count() == 0


def test_interval_coverage_matches_brute(ray_session):
    """Vectorized gaps-and-islands equals a per-key brute-force sweep
    (integer outputs, exact compare), including negative-duration
    clamping and duplicate timestamps."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import interval_coverage

    rng = np.random.RandomState(11)
    n = 3000
    key = rng.randint(0, 40, n).astype(np.int64)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.randint(0, 5_000_000_000, n).astype(np.int64)
    ts[::17] = ts[0]  # force duplicate timestamps
    dur = rng.uniform(-100.0, 900.0, n)  # seconds, some negative
    events = rd.from_arrow(pa.table({
        "user_id": key,
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": dur}))
    out = interval_coverage(events).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    import collections
    per = collections.defaultdict(list)
    for k, t, d in zip(key, ts, dur):
        e = t + max(int(np.floor(d * 1e6)), 0)
        per[k].append((int(t), int(e)))
    for k, iv in sorted(per.items()):
        iv.sort()
        islands = []
        for s, e in iv:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        row = out[out.user_id == k].iloc[0]
        assert row.n_intervals == len(iv)
        assert row.n_islands == len(islands)
        assert row.covered_us == sum(e - s for s, e in islands)
    assert len(out) == len(per)


def test_interval_coverage_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import interval_coverage

    events = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64())}))
    assert interval_coverage(events).count() == 0


def test_edit_distance_join_exact_complete(ray_session):
    """Deletion-neighborhood join equals brute-force all-pairs lev<=1
    on a corpus with substitutions, insertions, deletions, exact dups
    and unicode strings."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.dedup import edit_distance_join

    words = ["alpha", "alpho", "alpa", "alphas", "beta", "betta", "bta",
             "gamma", "gamma", "gámma", "delta", "delt", "deltaa",
             "epsilon", "", "a", "b", "ab"]
    ds = rd.from_arrow(pa.table({
        "wid": pa.array(range(len(words)), pa.int64()),
        "w": pa.array(words, pa.string())}))
    out = edit_distance_join(ds, "w", "wid").to_pandas()
    got = {(r.id_a, r.id_b): r.lev for r in out.itertuples()}

    def lev(x, y):
        import numpy as _np
        d = _np.arange(len(y) + 1)
        for i, cx in enumerate(x, 1):
            prev, d[0] = d[0], i
            for j, cy in enumerate(y, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (cx != cy))
        return d[len(y)]

    exp = {}
    for i, j in itertools.combinations(range(len(words)), 2):
        l = lev(words[i], words[j])
        if l <= 1:
            exp[(i, j)] = l
    assert got == exp


def test_prefix_jaccard_exact_complete(ray_session):
    """Prefix-filtered global token-Jaccard join equals brute-force
    all-pairs at the threshold — completeness of the prefix filter on a
    corpus with heavy shared (frequent) tokens."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.dedup import prefix_jaccard_pairs

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(80):
        base = ["the", "and"] + [vocab[j] for j in
                                 rng.choice(30, rng.randint(3, 9),
                                            replace=False)]
        texts.append(" ".join(base))
        if i % 4 == 0:  # near-dup: drop one word
            texts.append(" ".join(base[:-1]))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    t = 0.5
    out = prefix_jaccard_pairs(ds, threshold=t).to_pandas()
    got = {(r.id_a, r.id_b): (r.n_inter, r.n_union)
           for r in out.itertuples()}

    exp = {}
    sets = [set(x.lower().split()) for x in texts]
    for i, j in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if union > 0 and inter / union >= t:
            exp[(i, j)] = (inter, union)
    assert got == exp
    assert len(exp) > 10  # the fixture actually exercises the filter


def test_bm25_topk_matches_dense_reference(ray_session):
    """Distributed BM25 equals a dense numpy computation (same idf
    formulation, k1/b, length normalization) at 1e-12 — per-doc scores
    are fixed-order sums over query terms, so only the partial-top-k
    plumbing is under test."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import bm25_topk

    rng = np.random.RandomState(3)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(vocab, rng.randint(2, 30)))
             for _ in range(150)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    terms = ["alpha", "gamma"]
    k1, b = 1.5, 0.75
    out = bm25_topk(ds, terms, k=10, k1=k1, b=b).to_pandas()

    split = [t.split() for t in texts]
    n = len(texts)
    avg = sum(len(s) for s in split) / n
    scores = []
    for i, s in enumerate(split):
        sc = 0.0
        for t in sorted(set(terms)):
            tf = s.count(t)
            df = sum(1 for x in split if t in x)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            sc += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(s) / avg))
        scores.append((i, sc))
    exp = sorted([(i, s) for i, s in scores if s > 0],
                 key=lambda x: (-x[1], x[0]))[:10]
    assert list(out.doc_id) == [i for i, _ in exp]
    assert np.allclose(out.score.to_numpy(),
                       np.array([s for _, s in exp]), atol=1e-12)


def test_pareto_frontier_matches_brute(ray_session):
    """Partial-frontier combiner equals the n² dominance definition,
    including duplicate points (kept) and shared coordinates."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.aggregates import pareto_frontier

    rng = np.random.RandomState(2)
    x = rng.randint(0, 50, 400).astype(np.int64)
    y = rng.randint(0, 50, 400).astype(np.int64)
    x[10], y[10] = x[5], y[5]  # exact duplicate point
    ds = rd.from_arrow(pa.table({
        "pid": pa.array(range(400), pa.int64()), "x": x, "y": y}))
    out = pareto_frontier(ds, "x", "y", carry=["pid"]).to_pandas()
    got = sorted(out.pid)

    exp = []
    for i in range(400):
        dominated = any(
            (x[j] >= x[i] and y[j] >= y[i]
             and (x[j] > x[i] or y[j] > y[i]))
            for j in range(400))
        if not dominated:
            exp.append(i)
    assert got == sorted(exp)


def test_interval_overlap_join_matches_brute(ray_session):
    """Coverage-sweep overlap join equals the n² per-pair clip sum,
    with overlapping rights (multiplicity counts), negative durations
    clamped, and keys that only exist on one side."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import interval_overlap_join

    rng = np.random.RandomState(9)

    def mk(n, seed_off):
        r = np.random.RandomState(9 + seed_off)
        key = r.randint(0, 12, n).astype(np.int64)
        base = np.int64(1_600_000_000_000_000)
        ts = base + r.randint(0, 2_000_000_000, n).astype(np.int64)
        dur = r.uniform(-50.0, 400.0, n)
        return key, ts, dur

    lk, lt, ld = mk(400, 0)
    rk, rt, rdur = mk(500, 1)
    rk[rk == 11] = 10  # key 11 left-only
    left = rd.from_arrow(pa.table({
        "user_id": lk, "ts": pa.array(lt, pa.timestamp("us")),
        "value": ld, "event_id": pa.array(range(400), pa.int64())}))
    right = rd.from_arrow(pa.table({
        "user_id": rk, "ts": pa.array(rt, pa.timestamp("us")),
        "value": rdur, "event_id": pa.array(range(500), pa.int64())}))
    out = interval_overlap_join(left, right).to_pandas() \
        .set_index("event_id")

    li = [(k, t, t + max(int(np.floor(d * 1e6)), 0))
          for k, t, d in zip(lk, lt, ld)]
    ri = [(k, t, t + max(int(np.floor(d * 1e6)), 0))
          for k, t, d in zip(rk, rt, rdur)]
    assert len(out) == 400
    for i, (k, s, e) in enumerate(li):
        n_ov = sum(1 for rk_, rs, re in ri
                   if rk_ == k and min(e, re) > max(s, rs))
        tot = sum(max(0, min(e, re) - max(s, rs))
                  for rk_, rs, re in ri if rk_ == k)
        row = out.loc[i]
        assert row.n_overlap == n_ov, (i, row.n_overlap, n_ov)
        assert row.overlap_us == tot, (i, row.overlap_us, tot)


def test_zorder_code_matches_per_row_interleave(ray_session):
    """Magic-number dilation equals the definitional per-bit
    interleave."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.reshape import zorder_code

    rng = np.random.RandomState(4)
    x = rng.randint(0, 1 << 16, 500).astype(np.int64)
    y = rng.randint(0, 1 << 16, 500).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "i": pa.array(range(500), pa.int64()), "x": x, "y": y}))
    out = zorder_code(ds, "x", "y").to_pandas().sort_values("i")

    def brute(a, b):
        z = 0
        for bit in range(16):
            z |= ((a >> bit) & 1) << (2 * bit)
            z |= ((b >> bit) & 1) << (2 * bit + 1)
        return z

    exp = [brute(int(a), int(c)) for a, c in zip(x, y)]
    assert list(out.z) == exp
    # locality sanity: sorting by z keeps both dims piecewise-close
    zs = np.sort(out.z.to_numpy())
    assert len(np.unique(zs)) > 400


def test_cohort_retention_matches_pandas_brute(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import cohort_retention

    rng = np.random.RandomState(11)
    n = 4000
    users = rng.randint(0, 300, n)
    ts = rng.randint(0, 90 * 86400, n).astype("int64") * 1_000_000
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))}))
    out = cohort_retention(ds).to_pandas().sort_values(
        ["cohort_period", "period_offset"]).reset_index(drop=True)

    df = pd.DataFrame({"user_id": users, "w": ts // (7 * 86400 * 10**6)})
    cw = df.groupby("user_id").w.min().rename("cw")
    j = df.join(cw, on="user_id").drop_duplicates(["user_id", "w"])
    exp = (j.assign(off=j.w - j.cw).groupby(["cw", "off"]).user_id
           .nunique().reset_index())
    exp.columns = ["cohort_period", "period_offset", "n_users"]
    exp = exp.sort_values(["cohort_period", "period_offset"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_vocab_encode_roundtrip(ray_session):
    """Decoding encode_tokens ids through the vocab reproduces the
    exploded token stream exactly; ids are dense 1..|V| ranked
    (df desc, token asc)."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import (build_vocab, encode_tokens,
                                            token_explode)

    texts = ["the cat sat", "the dog sat down", "cat! cat? DOG",
             "", "a b a b c", "THE the the"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    vocab = build_vocab(ds).to_pandas().sort_values("token_id") \
        .reset_index(drop=True)
    # dense ids, df ordering
    assert list(vocab.token_id) == list(range(1, len(vocab) + 1))
    assert (vocab.df.values[:-1] >= vocab.df.values[1:]).all() or True
    dfs = list(zip(-vocab.df.values, vocab.token.values))
    assert dfs == sorted(dfs)

    enc = encode_tokens(ds, build_vocab(ds)).to_pandas()
    id2tok = dict(zip(vocab.token_id, vocab.token))
    enc["token"] = enc.token_id.map(id2tok)
    exp = token_explode(ds).to_pandas()
    a = enc[["doc_id", "pos", "token"]].sort_values(["doc_id", "pos"]) \
        .reset_index(drop=True)
    b = exp[["doc_id", "pos", "token"]].sort_values(["doc_id", "pos"]) \
        .reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_prune_rare_tokens_crafted(ray_session):
    """Hand-computed corpus pruning: counts over 4 docs — 'the' (4×)
    and 'cat' (3×) survive min_count=3; 'dog' (2×), 'sat' (1×),
    'x9' (1×) become <unk>. Order preserved, empty doc dropped,
    tokenization contract (lowercase, non-[a-z0-9] splits) applied."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import prune_rare_tokens

    texts = ["The cat sat", "the DOG, the dog", "cat cat the x9!", "", "?!"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = prune_rare_tokens(ds, min_count=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = pd.DataFrame({
        "doc_id": pa.array([0, 1, 2], pa.int64()).to_pandas(),
        "text": ["the cat <unk>", "the <unk> the <unk>",
                 "cat cat the <unk>"],
        "n_tokens": pa.array([3, 4, 4], pa.int64()).to_pandas(),
        "n_unk": pa.array([1, 2, 1], pa.int64()).to_pandas()})
    pd.testing.assert_frame_equal(out, exp)


def test_source_token_overlap_crafted(ray_session):
    """Hand-computed feed-vocabulary overlap: A={the,cat,sat,dog},
    B={the,cat,fox}, C={zz} — (A,B) inter 2 / union 5; C shares
    nothing so no (·,C) rows."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import source_token_overlap

    ds = rd.from_arrow(pa.table({
        "source": pa.array(["A", "A", "B", "C"], pa.string()),
        "text": pa.array(["the cat sat", "the dog", "The cat, fox",
                          "zz"], pa.string())}))
    out = source_token_overlap(ds).to_pandas()
    exp = pd.DataFrame({
        "source_a": ["A"], "source_b": ["B"],
        "n_a": pa.array([4], pa.int64()).to_pandas(),
        "n_b": pa.array([3], pa.int64()).to_pandas(),
        "n_inter": pa.array([2], pa.int64()).to_pandas(),
        "n_union": pa.array([5], pa.int64()).to_pandas()})
    pd.testing.assert_frame_equal(out, exp)


def test_minhash_lsh_incremental_two_generations(ray_session, tmp_path):
    """Incremental LSH equals the full run restricted to delta-touching
    pairs, across TWO chained deltas (state appended between them) —
    same signatures (shared seed) ⇒ same buckets ⇒ identical candidate
    sets, so parity holds at any LSH recall."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.dedup import (minhash_lsh_incremental,
                                             minhash_lsh_pairs,
                                             write_lsh_state)

    base = "the quick brown fox jumps over the lazy dog again and again "
    texts = [base, base.replace("lazy", "idle"),
             base.replace("quick", "swift"), base + "extra tail words",
             "completely different text about ray data pipelines",
             "another unrelated document with its own words entirely",
             base.replace("dog", "cat"), base.replace("fox", "wolf"),
             "yet another distinct filler document goes right here",
             base.replace("jumps", "leaps"), base[:-10],
             "final noise document with nothing shared at all ok"]
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})

    def part(mod):
        return rd.from_arrow(tbl.filter(pa.array(
            [i % 3 == mod for i in ids])))

    cfg = dict(threshold=0.5, num_perm=64, bands=16, shingle_k=3)
    state = str(tmp_path / "lsh_state")

    def canon(df):
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def full_restricted(docs_ds, delta_mod):
        f = minhash_lsh_pairs(docs_ds, **cfg).to_pandas()
        m = (f.id_a % 3 == delta_mod) | (f.id_b % 3 == delta_mod)
        return canon(f[m])

    prior = part(2)
    write_lsh_state(prior, state, num_perm=64, bands=16, shingle_k=3)

    gen1 = part(0)
    inc1, touched1 = minhash_lsh_incremental(gen1, prior, state, **cfg)
    exp1 = full_restricted(prior.union(gen1), 0)
    pd.testing.assert_frame_equal(canon(inc1.to_pandas()), exp1)
    assert touched1

    gen2 = part(1)
    inc2, _ = minhash_lsh_incremental(gen2, prior.union(gen1), state,
                                      **cfg)
    exp2 = full_restricted(rd.from_arrow(tbl), 1)
    pd.testing.assert_frame_equal(canon(inc2.to_pandas()), exp2)


def test_simhash_incremental_two_generations(ray_session, tmp_path):
    """Incremental SimHash equals the full run restricted to
    delta-touching pairs across TWO chained deltas — deterministic
    signatures ⇒ identical buckets, and the persisted sigs make the
    hamming verify content-free."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.dedup import (simhash_incremental,
                                             simhash_pairs,
                                             write_simhash_state)

    base = "the quick brown fox jumps over the lazy dog again and again "
    texts = [base, base.replace("lazy", "idle"),
             base.replace("quick", "swift"), base + "extra tail words",
             "completely different text about ray data pipelines",
             "another unrelated document with its own words entirely",
             base.replace("dog", "cat"), base.replace("fox", "wolf"),
             "yet another distinct filler document goes right here",
             base.replace("jumps", "leaps"), base[:-10],
             "final noise document with nothing shared at all ok"]
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})

    def part(mod):
        return rd.from_arrow(tbl.filter(pa.array(
            [i % 3 == mod for i in ids])))

    cfg = dict(max_hamming=7, n_chunks=8)
    state = str(tmp_path / "simhash_state")

    def canon(df):
        df = df.copy()
        df["hamming"] = df["hamming"].astype("int64")
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def full_restricted(docs_ds, delta_mod):
        f = simhash_pairs(docs_ds, **cfg).to_pandas()
        m = (f.id_a % 3 == delta_mod) | (f.id_b % 3 == delta_mod)
        return canon(f[m])

    prior = part(2)
    write_simhash_state(prior, state, n_chunks=8)

    gen1 = part(0)
    inc1, touched1 = simhash_incremental(gen1, state, **cfg)
    pd.testing.assert_frame_equal(canon(inc1.to_pandas()),
                                  full_restricted(prior.union(gen1), 0))
    assert touched1

    gen2 = part(1)
    inc2, _ = simhash_incremental(gen2, state, **cfg)
    pd.testing.assert_frame_equal(canon(inc2.to_pandas()),
                                  full_restricted(rd.from_arrow(tbl), 1))


def test_kmeans_matches_numpy_reference(ray_session):
    """Distributed Lloyd's equals a pure-numpy reference running the
    SAME algorithm (same deterministic sample init, same float64
    blockwise accumulation — single input block, so partials are the
    full sums) on 3 well-separated clusters; and is run-to-run
    deterministic."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.similarity import (_mini_kmeans,
                                                  _normalize, kmeans)

    rng = np.random.RandomState(3)
    centers = np.eye(3, 8) * 5.0
    X = np.vstack([centers[i] + rng.randn(40, 8) * 0.2
                   for i in range(3)])
    ids = np.arange(len(X), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([r.tolist() for r in X],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    out = kmeans(ds, k=3, iters=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    # reference: identical algorithm, float64, same init
    Xf = np.stack([np.asarray(r, dtype=np.float64)
                   for r in tbl["embedding"].to_pylist()])
    C = _mini_kmeans(Xf, 3, seed=11)
    B = _normalize(Xf)
    for _ in range(5):
        assign = np.argmax(B @ C.T, axis=1)
        newC = C.copy()
        for c in range(3):
            members = B[assign == c]
            if len(members):
                newC[c] = members.sum(axis=0) / len(members)
        C = _normalize(newC)
    exp_assign = np.argmax(B @ C.T, axis=1)
    assert list(out.cluster) == list(exp_assign)
    # cluster sizes are the crafted 40/40/40
    assert sorted(out.cluster.value_counts().tolist()) == [40, 40, 40]
    out2 = kmeans(ds, k=3, iters=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_bcubed_and_blocking_quality_crafted(ray_session):
    """Hand-computed B-cubed + blocking metrics on a 6-record corpus:
    cluster X = {r0,r1,r2} with entities (1,1,2), cluster Y = {r3,r4}
    entity 3, singleton Z = {r5} orphan (-1)."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.evaluate import bcubed_stats, blocking_quality

    recs = [f"r{i}" for i in range(6)]
    ents = [1, 1, 2, 3, 3, -1]
    grps = ["X", "X", "X", "Y", "Y", "Z"]
    labels = rd.from_arrow(pa.table({
        "source_record_id": pa.array(recs, pa.string()),
        "entity_id": pa.array(ents, pa.int64())}))
    groups = rd.from_arrow(pa.table({
        "match_group_id": pa.array(grps, pa.string()),
        "source_record_id": pa.array(recs, pa.string())}))
    out = bcubed_stats(groups, labels).to_pandas() \
        .set_index("source_record_id").sort_index()
    exp = {  # (cluster_size, n_same, entity_size)
        "r0": (3, 2, 2), "r1": (3, 2, 2), "r2": (3, 1, 1),
        "r3": (2, 2, 2), "r4": (2, 2, 2), "r5": (1, 1, 1)}
    for r, (cs, nsame, es) in exp.items():
        row = out.loc[r]
        assert (row.cluster_size, row.n_same, row.entity_size) == \
            (cs, nsame, es), (r, tuple(row))

    # blocking: candidate pairs (r0,r1),(r0,r2),(r3,r4),(r2,r5)
    unified = labels
    pairs = rd.from_arrow(pa.table({
        "source_record_id_a": pa.array(["r0", "r0", "r3", "r2"]),
        "source_record_id_b": pa.array(["r1", "r2", "r4", "r5"])}))
    q = blocking_quality(unified, pairs).to_pandas().iloc[0]
    # true pairs: entity1 C(2,2)=1, entity3 C(2,2)=1 → 2; covered:
    # (r0,r1) same entity, (r3,r4) same entity → 2
    assert (q.n_records, q.n_candidate_pairs,
            q.n_true_pairs, q.n_true_covered) == (6, 4, 2, 2)


def test_k_core_matches_reference(ray_session):
    """Distributed peeling must match pure-Python k-core on a random
    graph, for k where the core is nonempty and where it is empty."""
    import ray.data as rd

    from payor_linkage.dataops.graph import k_core

    rng = np.random.default_rng(41)
    n_nodes, n_edges = 120, 420
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    m = a != b
    lo, hi = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    pairs = sorted(set(zip(lo.tolist(), hi.tolist())))
    edges = rd.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64())}))

    def ref_k_core(pairs, k):
        adj = {}
        for x, y in pairs:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        changed = True
        while changed:
            changed = False
            for v in list(adj):
                if len(adj[v]) < k:
                    for u in adj.pop(v):
                        adj[u].discard(v)
                    changed = True
        return {v: len(ns) for v, ns in adj.items()}

    for k in (2, 4, 50):
        got = {r["node"]: r["deg"]
               for r in k_core(edges, k).take_all()}
        assert got == ref_k_core(pairs, k), k


def test_exact_dedup_incremental_two_generations(ray_session, tmp_path):
    import ray.data as rd

    from payor_linkage.dataops.dedup import (exact_dedup_incremental,
                                             write_dedup_state)

    state = str(tmp_path / "dedup_state")
    prior = rd.from_items([
        {"doc_id": 1, "text": "alpha"},
        {"doc_id": 2, "text": "beta"},
        {"doc_id": 3, "text": "alpha"},   # prior-internal dup
    ])
    write_dedup_state(prior, state)

    delta = rd.from_items([
        {"doc_id": 10, "text": "alpha"},   # dup of prior → dropped
        {"doc_id": 11, "text": "gamma"},   # new → kept
        {"doc_id": 13, "text": "delta"},   # internal dup, higher id
        {"doc_id": 12, "text": "delta"},   # internal dup, min id → kept
    ])
    kept, buckets = exact_dedup_incremental(delta, state)
    kd = kept.to_pandas().sort_values("doc_id")
    assert list(kd.doc_id) == [11, 12]
    assert len(buckets) >= 1

    # generation 2: previously-kept delta content is now in the state
    delta2 = rd.from_items([
        {"doc_id": 20, "text": "gamma"},   # kept in gen-1 → dropped
        {"doc_id": 21, "text": "epsilon"}, # new → kept
        {"doc_id": 22, "text": "beta"},    # prior → dropped
    ])
    kept2, _ = exact_dedup_incremental(delta2, state)
    assert list(kept2.to_pandas().doc_id) == [21]


def test_dedup_chunks_keeps_first_occurrence(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.dedup import dedup_chunks

    # w=2 chunks: doc0 = [a b][c d]; doc1 repeats chunk "a b" then has a
    # fresh chunk; doc2 is entirely chunks seen before → drops out.
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c d", "a b x y", "c d a b"]),
    }))
    out = {r["doc_id"]: r["text_clean"]
           for r in dedup_chunks(docs, w=2).take_all()}
    assert out == {0: "a b c d", 1: "x y"}


def test_dedup_chunks_within_doc_and_tail(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.dedup import dedup_chunks

    # repeated chunk WITHIN one doc keeps only the first; ragged tail
    # chunk ("e") is its own chunk and survives.
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["a b a b e"]),
    }))
    out = dedup_chunks(docs, w=2).take_all()
    assert out == [{"doc_id": 7, "text_clean": "a b e"}]


def test_quantize_embeddings_bounds_and_extremes(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.similarity import quantize_embeddings

    docs = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.0, 5.0], [1.0, 5.0], [0.5, 5.0]],
                              pa.list_(pa.float32())),
    }))
    rows = quantize_embeddings(docs, levels=256).take_all()
    codes = {(r["vec_id"], r["dim"]): r["code"] for r in rows}
    # dim 1: lo=0 hi=1 → 0.0→0, 1.0→255 (clamped), 0.5→128
    assert codes[(0, 1)] == 0 and codes[(1, 1)] == 255
    assert codes[(2, 1)] == 128
    # constant dimension (hi==lo) → all zero
    assert codes[(0, 2)] == codes[(1, 2)] == codes[(2, 2)] == 0


def test_quantized_topk_integer_distances(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.similarity import quantized_topk

    docs = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [0.1, 0.1], [0.9, 0.9],
                               [1.0, 1.0]], pa.list_(pa.float32())),
    }))
    out = quantized_topk(docs, query_ids=[0], k=2).take_all()
    assert [r["neighbor_id"] for r in out] == [1, 2]
    assert all(isinstance(r["dist"], int) and r["dist"] >= 0 for r in out)
    assert [r["rank"] for r in out] == [1, 2]


def test_dedup_chunks_incremental_two_generations(ray_session, tmp_path):
    """Chaining two deltas through the persisted chunk state must equal
    ONE full dedup_chunks run over the arrival-ordered corpus (prior ids
    < delta1 ids < delta2 ids, so packed order == arrival order)."""
    import pandas as pd
    import ray.data as rd

    from payor_linkage.dataops.dedup import (chunk_state_build,
                                             dedup_chunks,
                                             dedup_chunks_incremental)

    state = str(tmp_path / "chunk_state")
    prior = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b c d", "c d e f"]),
    })
    delta1 = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": pa.array(["a b p q", "p q r s"]),
    })
    delta2 = pa.table({
        "doc_id": pa.array([20], pa.int64()),
        "text": pa.array(["r s e f z"]),
    })
    chunk_state_build(rd.from_arrow(prior), state, w=2)
    out1, _ = dedup_chunks_incremental(rd.from_arrow(delta1), state, w=2)
    out2, _ = dedup_chunks_incremental(rd.from_arrow(delta2), state, w=2)

    full = dedup_chunks(
        rd.from_arrow(pa.concat_tables([prior, delta1, delta2])), w=2)
    full_df = full.to_pandas().sort_values("doc_id").reset_index(drop=True)
    inc_df = pd.concat([out1.to_pandas(), out2.to_pandas()]) \
        .sort_values("doc_id").reset_index(drop=True)
    ref_delta = full_df[full_df.doc_id >= 10].reset_index(drop=True)
    pd.testing.assert_frame_equal(inc_df, ref_delta)
    # spot semantics: "a b" seen in prior → dropped from doc 10;
    # "p q" first in doc 10 → dropped from doc 11; doc 20 keeps only
    # its fresh tail chunk "z"
    got = dict(zip(inc_df.doc_id, inc_df.text_clean))
    assert got == {10: "p q", 11: "r s", 20: "z"}


def test_temperature_sample_quota_exactness(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.text import temperature_sample

    # 90 docs in group a, 10 in b: proportional would give 180/20;
    # α=0.5 (isqrt weights 9 and 3) gives 150/50 — small group boosted.
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(100)), pa.int64()),
        "source": pa.array(["a"] * 90 + ["b"] * 10),
    }))
    out = temperature_sample(docs, group_col="source", total=60,
                             id_col="doc_id").to_pandas()
    per = out.groupby("source").size().to_dict()
    # isqrt weights: w_a=9, w_b=3, W=12 → raw quotas 45 and 15; b has
    # only 10 docs so its quota truncates (without-replacement cap)
    assert per == {"a": 45, "b": 10}
    # deterministic: same call → same ids
    out2 = temperature_sample(docs, group_col="source", total=60,
                              id_col="doc_id").to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_pq_matches_numpy_reference(ray_session):
    """Distributed PQ training equals a pure-numpy Lloyd per subspace
    running the SAME algorithm (same seeded init draws, float64, single
    input block so partials are full sums); encode is deterministic."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.similarity import pq_encode, pq_fit

    rng = np.random.RandomState(5)
    X = np.vstack([np.tile([i * 3.0, -i * 2.0], 4) + rng.randn(30, 8) * 0.1
                   for i in range(4)])
    ids = np.arange(len(X), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array([r.tolist() for r in X],
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    m, k, iters, seed = 2, 4, 5, 23
    C = pq_fit(ds, m=m, k=k, iters=iters, seed=seed)
    assert C.shape == (m, k, 4)

    # reference: identical init draws and update order, float64
    Xf = np.stack([np.asarray(r, dtype=np.float64)
                   for r in tbl["embedding"].to_pylist()])
    n, dim = Xf.shape
    dsub = dim // m
    rr = np.random.RandomState(seed)
    Cr = np.stack([Xf[rr.choice(n, size=k, replace=False),
                      s * dsub:(s + 1) * dsub].copy() for s in range(m)])
    for _ in range(iters):
        newC = Cr.copy()
        for s in range(m):
            Xs = Xf[:, s * dsub:(s + 1) * dsub]
            d2 = ((Xs[:, None, :] - Cr[s][None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(k):
                mem = Xs[a == c]
                if len(mem):
                    newC[s, c] = mem.sum(axis=0) / len(mem)
        Cr = newC
    assert np.allclose(C, Cr, rtol=0, atol=0)

    codes = pq_encode(ds, C).to_pandas() \
        .sort_values(["vec_id", "sub"]).reset_index(drop=True)
    assert len(codes) == n * m
    # encode parity vs a reference argmin over the SAME codebooks
    wide = codes.pivot(index="vec_id", columns="sub", values="code") \
        .sort_index()
    for s in range(m):
        Xs = Xf[:, s * dsub:(s + 1) * dsub]
        d2 = ((Xs[:, None, :] - Cr[s][None, :, :]) ** 2).sum(axis=2)
        assert list(wide[s + 1]) == list(np.argmin(d2, axis=1))
    codes2 = pq_encode(ds, C).to_pandas() \
        .sort_values(["vec_id", "sub"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(codes, codes2)


def test_interval_gaps_crafted(ray_session):
    import datetime as dt

    import ray.data as rd

    from payor_linkage.dataops.temporal import interval_gaps

    # user u: [0,2]s, [1,3]s merge; [5,6]s → gap (3s, 5s); user v: one
    # island → no gaps
    base = dt.datetime(2024, 1, 1)
    rows = [("u", 0, 2.0), ("u", 1, 2.0), ("u", 5, 1.0), ("v", 0, 1.0)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }))
    out = interval_gaps(ds).take_all()
    assert len(out) == 1
    g = out[0]
    # Arrow casts naive timestamps as wall-clock µs since epoch — use
    # the same convention for the expectation (never .timestamp(),
    # which is local-TZ-dependent)
    epoch0 = int((base - dt.datetime(1970, 1, 1)).total_seconds()) \
        * 1_000_000
    assert g["user_id"] == "u"
    assert g["gap_start"] == epoch0 + 3_000_000
    assert g["gap_end"] == epoch0 + 5_000_000


def test_hard_negatives_excludes_same_label(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.similarity import hard_negatives

    # two tight same-label clusters near each query: the nearest
    # same-label vector must NEVER appear; the k wrong-label ones must,
    # ranked by cosine
    vecs = [
        (0, [1.0, 0.0, 0.0], 0),   # query
        (1, [0.99, 0.1, 0.0], 0),  # same label, closest — excluded
        (2, [0.9, 0.3, 0.0], 1),
        (3, [0.7, 0.7, 0.0], 1),
        (4, [0.0, 1.0, 0.0], 2),
    ]
    ds = rd.from_items([{"vec_id": i, "embedding": v, "label": l}
                        for i, v, l in vecs])
    out = hard_negatives(ds, query_ids=[0], k=3).to_pandas() \
        .sort_values("rank")
    assert list(out["neighbor_id"]) == [2, 3, 4]
    assert 1 not in set(out["neighbor_id"])


def test_grouped_winsorize_crafted(ray_session):
    import ray.data as rd
    from fractions import Fraction as F

    from payor_linkage.dataops.aggregates import grouped_winsorize

    # group a: values 1..10 → p10 = 1 (ceil(0.1*10)-1 = idx 0),
    # p90 = 9 (ceil(9)-1 = idx 8); 10 clips to 9, 1 stays
    rows = [{"k": "a", "v": float(i), "rid": i} for i in range(1, 11)]
    rows += [{"k": "b", "v": 100.0, "rid": 11}]  # singleton: lo=hi=100
    ds = rd.from_items(rows)
    out = grouped_winsorize(ds, "k", "v", lo=F(1, 10), hi=F(9, 10),
                            keep_cols=["rid"]).to_pandas() \
        .set_index("rid")["value_w"]
    assert out[10] == 9.0          # clipped down to p90
    assert out[1] == 1.0           # p10 is the min itself
    assert out[5] == 5.0           # interior untouched
    assert out[11] == 100.0        # singleton group maps to itself


def test_bloom_semi_join_exact(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.sketch import bloom_semi_join

    big = rd.from_items([{"key": i % 50, "payload": i} for i in range(400)])
    small = rd.from_items([{"key": k} for k in [3, 7, 7, 11, 999]])
    out = bloom_semi_join(big, small, "key", m_bits=64).to_pandas()
    # tiny m_bits forces false positives through the prefilter — the
    # exact verify join must still remove every one of them
    expect = {i for i in range(400) if i % 50 in (3, 7, 11)}
    assert set(out["payload"]) == expect
    assert set(out["key"]) == {3, 7, 11}


def test_debounce_crafted(ray_session):
    import datetime as dt

    import ray.data as rd

    from payor_linkage.dataops.temporal import debounce

    base = dt.datetime(2024, 1, 1)
    # (user, type, sec, id): u/a at 0s, 1s, 12s → keep 0s (first),
    # drop 1s (gap 1 ≤ 10), keep 12s (gap 11 > 10); u/b independent
    # stream keeps its first even though u/a fired just before it
    rows = [("u", "a", 0, 1), ("u", "a", 1, 2), ("u", "a", 12, 3),
            ("u", "b", 1, 4), ("v", "a", 0, 5)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([base + dt.timedelta(seconds=r[2]) for r in rows],
                       pa.timestamp("us")),
        "event_id": pa.array([r[3] for r in rows], pa.int64()),
    }))
    out = debounce(ds, gap_us=10_000_000).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 4, 5]


def test_cluster_split_no_leakage(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.dedup import cluster_split

    docs = rd.from_items([{"doc_id": i} for i in range(20)])
    # two clusters: {0,1,2} and {10,11}; rest singletons
    pairs = rd.from_items([{"id_a": 0, "id_b": 1}, {"id_a": 1, "id_b": 2},
                           {"id_a": 10, "id_b": 11}])
    out = cluster_split(docs, pairs, eval_hex="80000000").to_pandas()
    assert len(out) == 20
    # every cluster is entirely on one side
    sides = out.groupby("cluster_id")["split"].nunique()
    assert (sides == 1).all()
    assert set(out[out["doc_id"].isin([0, 1, 2])]["cluster_id"]) == {0}
    # deterministic across runs
    out2 = cluster_split(docs, pairs, eval_hex="80000000").to_pandas()
    m = out.merge(out2, on="doc_id", suffixes=("", "_2"))
    assert (m["split"] == m["split_2"]).all()


def test_cross_corpus_filter_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.dedup import cross_corpus_filter

    long_a = "the quick brown fox jumps over the lazy dog " * 4
    long_b = "completely different content about database systems " * 4
    a = rd.from_items([
        {"doc_id": 1, "text": long_a},          # near-dup of eval 10 → drop
        {"doc_id": 2, "text": long_a + "tail"}, # also dups eval 10 → drop
        {"doc_id": 3, "text": "short unique text nothing like the others"},
    ])
    b = rd.from_items([{"doc_id": 10, "text": long_a},
                       {"doc_id": 11, "text": long_b}])
    out = cross_corpus_filter(a, b, threshold=0.5, shingle_k=5,
                              num_perm=64, bands=16).to_pandas()
    # A-internal duplication (1 vs 2) must NOT cause a drop — only
    # cross-corpus matches do
    assert sorted(out["doc_id"]) == [3]
    a2 = rd.from_items([{"doc_id": 1, "text": long_a},
                        {"doc_id": 2, "text": long_a}])
    out2 = cross_corpus_filter(a2, rd.from_items(
        [{"doc_id": 11, "text": long_b}]), threshold=0.5, shingle_k=5,
        num_perm=64, bands=16).to_pandas()
    assert sorted(out2["doc_id"]) == [1, 2]


def test_range_partition_bounds_and_balance(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.aggregates import (fit_range_bounds,
                                                  range_partition_counts)

    # 1..100: quantile_disc at i/4 → ceil(25i)-1 idx → 25, 50, 75
    ds = rd.from_items([{"v": float(i)} for i in range(1, 101)])
    bounds = fit_range_bounds(ds, "v", 4)
    assert bounds == [25.0, 50.0, 75.0]
    counts = range_partition_counts(ds, "v", bounds).to_pandas() \
        .set_index("partition_id")["n_rows"]
    # strict-less assignment: p0 = v ≤ 25 (25 rows), p1 = 26..50, ...
    assert counts.to_dict() == {0: 25, 1: 25, 2: 25, 3: 25}


def test_normalized_dedup_catches_reformatting(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.dedup import normalized_dedup

    ds = rd.from_items([
        {"doc_id": 1, "text": "Hello,  World!"},
        {"doc_id": 2, "text": "hello world"},       # same after norm
        {"doc_id": 3, "text": "HELLO--WORLD"},      # same after norm
        {"doc_id": 4, "text": "goodbye world"},
    ])
    out = normalized_dedup(ds).to_pandas().sort_values("keeper_id") \
        .reset_index(drop=True)
    assert list(out["keeper_id"]) == [1, 4]
    assert list(out["n_dups"]) == [3, 1]


def test_grouped_token_topk_ties_and_k(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.text import grouped_token_topk

    ds = rd.from_items([
        {"lang": "en", "text": "a a a b b c"},
        {"lang": "en", "text": "b z"},
        {"lang": "fr", "text": "x y"},
    ])
    out = grouped_token_topk(ds, "lang", k=2).to_pandas()
    en = out[out["lang"] == "en"].sort_values("rank")
    # counts: a=3, b=3, c=1, z=1 → tie at 3 broken by token asc
    assert list(en["token"]) == ["a", "b"]
    assert list(en["n"]) == [3, 3]
    fr = out[out["lang"] == "fr"].sort_values("rank")
    assert list(fr["token"]) == ["x", "y"]
    assert list(fr["n"]) == [1, 1]


def test_rate_cap_crafted(ray_session):
    import datetime as dt

    import ray.data as rd

    from payor_linkage.dataops.temporal import rate_cap

    base = dt.datetime(2024, 1, 1)
    # user u day 0: events at 0h,1h,2h → keep first 2; day 1: one event
    rows = [("u", 0, 1), ("u", 1, 2), ("u", 2, 3), ("u", 25, 4),
            ("v", 0, 5)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([base + dt.timedelta(hours=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
    }))
    out = rate_cap(ds, window_us=86_400_000_000, k=2).to_pandas()
    assert sorted(out["event_id"]) == [1, 2, 4, 5]


def test_debounce_and_rate_cap_match_pandas_reference(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.RandomState(42)
    n = 3000
    us = rng.randint(0, 10**13, n)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 25, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts_us": us,
        "event_id": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"]),
        "ts": pa.array(df["ts_us"], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array(df["event_id"], pa.int64()),
    }))

    from payor_linkage.dataops.temporal import debounce, rate_cap

    gap = 10**9  # µs
    out = debounce(ds, gap_us=gap).to_pandas()
    ref = df.sort_values(["user_id", "event_type", "ts_us", "event_id"])
    prev = ref.groupby(["user_id", "event_type"])["ts_us"].shift()
    keep = prev.isna() | ((ref["ts_us"] - prev) > gap)
    assert set(out["event_id"]) == set(ref.loc[keep, "event_id"])

    win = 2 * 10**9  # µs tumbling window
    out2 = rate_cap(ds, window_us=win, k=3).to_pandas()
    df2 = df.copy()
    df2["w"] = df2["ts_us"] // win
    df2 = df2.sort_values(["user_id", "w", "ts_us", "event_id"])
    df2["pos"] = df2.groupby(["user_id", "w"]).cumcount()
    assert set(out2["event_id"]) == set(df2.loc[df2["pos"] < 3, "event_id"])


def test_collapse_repeats_crafted(ray_session):
    import datetime as dt

    import ray.data as rd

    from payor_linkage.dataops.temporal import collapse_repeats

    base = dt.datetime(2024, 1, 1)
    rows = [("u", 0, 1, "a"), ("u", 1, 2, "a"), ("u", 2, 3, "b"),
            ("u", 3, 4, "b"), ("u", 4, 5, "a"), ("v", 0, 6, "a")]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    }))
    out = collapse_repeats(ds).to_pandas()
    assert sorted(out["event_id"]) == [1, 3, 5, 6]


def test_state_dwell_crafted(ray_session):
    import datetime as dt

    import ray.data as rd

    from payor_linkage.dataops.temporal import state_dwell

    base = dt.datetime(2024, 1, 1)
    # u: a(0s) a(1s) b(3s) b(4s) a(9s-open); v: a(0s-open)
    rows = [("u", 0, 1, "a"), ("u", 1, 2, "a"), ("u", 3, 3, "b"),
            ("u", 4, 4, "b"), ("u", 9, 5, "a"), ("v", 0, 6, "a")]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows]),
        "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    }))
    out = state_dwell(ds).to_pandas().set_index("state")
    # closed spans: a entered @0 closed @3 (3s); b entered @3 closed @9 (6s)
    assert out.loc["a", "dwell_us"] == 3_000_000
    assert out.loc["a", "n_spans"] == 1
    assert out.loc["b", "dwell_us"] == 6_000_000
    assert out.loc["b", "n_spans"] == 1


def test_ari_pair_counts_crafted(ray_session):
    """Same 6-record corpus as the B-cubed test: cluster X = {r0,r1,r2}
    entities (1,1,2), Y = {r3,r4} entity 3, singleton Z = {r5} orphan."""
    import ray.data as rd

    from payor_linkage.evaluate import ari_pair_counts

    recs = [f"r{i}" for i in range(6)]
    ents = [1, 1, 2, 3, 3, -1]
    grps = ["X", "X", "X", "Y", "Y", "Z"]
    labels = rd.from_arrow(pa.table({
        "source_record_id": pa.array(recs, pa.string()),
        "entity_id": pa.array(ents, pa.int64())}))
    groups = rd.from_arrow(pa.table({
        "match_group_id": pa.array(grps, pa.string()),
        "source_record_id": pa.array(recs, pa.string())}))
    out = ari_pair_counts(groups, labels).to_pandas().iloc[0]
    assert out.n_records == 6
    assert out.pairs_total == 15
    # pred: C(3,2)+C(2,2? no C(2,2)=1)+C(1,2)=3+1+0
    assert out.pairs_pred == 4
    # true: entity 1 ->1, entity 2 ->0, entity 3 ->1, orphan singleton 0
    assert out.pairs_true == 2
    # cells: (X,1)=2 ->1, (X,2)=1 ->0, (Y,3)=2 ->1
    assert out.pairs_both == 2


def test_containment_pairs_crafted(ray_session):
    """A small doc fully inside a big doc has high containment but low
    Jaccard — exactly what the asymmetric join must catch."""
    from payor_linkage.dataops.dedup import containment_pairs

    small = "alpha beta gamma delta"
    big = ("alpha beta gamma delta " +
           " ".join(f"w{i} w{i}x" for i in range(30)))
    other = "zeta eta theta iota kappa"
    ds = _doc_ds([small, big, other], ids=[1, 2, 3])
    out = containment_pairs(ds, threshold=0.6, word_ngram=2).to_pandas()
    got = {(r.id_a, r.id_b): (r.n_inter, r.n_a, r.n_b)
           for r in out.itertuples()}
    # small (3 bigrams) all inside big -> containment 1.0 ordered (1,2)
    assert (1, 2) in got
    n_inter, n_a, n_b = got[(1, 2)]
    assert n_inter == 3 and n_a == 3
    # the reverse direction fails (big not contained in small)
    assert (2, 1) not in got
    # jaccard would be 3/n_b ~ 0.05 — symmetric join would miss it
    assert n_inter / n_b < 0.1


def test_mutual_nn_crafted(ray_session):
    """Two tight pairs + one loner: the loner's NN is not reciprocal."""
    import ray.data as rd

    from payor_linkage.dataops.similarity import mutual_nn

    vecs = [[1.0, 0.0, 0.0], [0.99, 0.01, 0.0],   # mutual pair 0-1
            [0.0, 1.0, 0.0], [0.01, 0.99, 0.0],   # mutual pair 2-3
            [0.5, 0.45, 0.0]]                      # 4 -> 0/1 one-way
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(5)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    }))
    out = mutual_nn(ds).to_pandas()
    got = {(r.id_a, r.id_b) for r in out.itertuples()}
    assert got == {(0, 1), (2, 3)}


def test_association_supports_crafted(ray_session):
    import ray.data as rd

    from payor_linkage.dataops.enrich import association_supports

    rows = [("u1", "a"), ("u1", "b"), ("u1", "a"),   # dup row collapses
            ("u2", "a"), ("u2", "b"), ("u3", "a"),
            ("u3", "c"), ("u4", "b")]
    ds = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows]),
        "item": pa.array([r[1] for r in rows]),
    }))
    out = association_supports(ds, "k", "item").to_pandas()
    got = {(r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.n_keys)
           for r in out.itertuples()}
    # supports: a in u1,u2,u3 (3); b in u1,u2,u4 (3); c in u3 (1)
    assert got[("a", "b")] == (2, 3, 3, 4)
    assert got[("a", "c")] == (1, 3, 1, 4)
    assert ("b", "c") not in got


def test_bfs_layers_crafted(ray_session):
    """Path a-b-c-d plus isolated pair x-y: distances from 'a'."""
    import ray.data as rd

    from payor_linkage.dataops.graph import bfs_layers

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "c", "x"]),
        "dst": pa.array(["b", "c", "d", "y"]),
    }))
    out = bfs_layers(edges).to_pandas()
    got = dict(zip(out["node"], out["dist"]))
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    out2 = bfs_layers(edges, source="x").to_pandas()
    assert dict(zip(out2["node"], out2["dist"])) == {"x": 0, "y": 1}

    out3 = bfs_layers(edges, source="a", max_depth=2).to_pandas()
    assert dict(zip(out3["node"], out3["dist"])) == \
        {"a": 0, "b": 1, "c": 2}


def test_cdc_chunks_match_python_reference(ray_session):
    """Vectorized gear CDC equals the byte-at-a-time recurrence, spans
    tile the blob, and an edit near the front leaves later chunk crcs
    aligned (the shift-resistance fixed-size chunking lacks)."""
    import zlib

    import ray.data as rd

    from payor_linkage.dataops.dedup import _GEAR, cdc_chunk_table

    rng = np.random.RandomState(7)
    blob = rng.bytes(4096)
    mask_bits = 6
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([blob], pa.binary())}))
    out = cdc_chunk_table(ds, mask_bits=mask_bits).to_pandas() \
        .sort_values("chunk_no")

    # pure-python rolling reference: h = 2h + gear[b] mod 2^32
    mask = (1 << mask_bits) - 1
    h, bounds = 0, [0]
    for i, byte in enumerate(blob):
        h = ((h << 1) + int(_GEAR[byte])) & 0xFFFFFFFF
        if (h & mask) == 0 and i + 1 < len(blob):
            bounds.append(i + 1)
    bounds.append(len(blob))
    assert out["offset"].tolist() == bounds[:-1]
    assert out["length"].tolist() == [bounds[j + 1] - bounds[j]
                                      for j in range(len(bounds) - 1)]
    assert out["crc"].tolist() == [
        zlib.crc32(blob[bounds[j]:bounds[j + 1]])
        for j in range(len(bounds) - 1)]
    # spans tile the blob
    assert out["length"].sum() == len(blob)

    # shift-resistance: prepend 3 bytes; chunk crcs beyond the first
    # window mostly survive
    blob2 = b"xyz" + blob
    ds2 = rd.from_arrow(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([blob2], pa.binary())}))
    out2 = cdc_chunk_table(ds2, mask_bits=mask_bits).to_pandas()
    shared = set(out["crc"]) & set(out2["crc"])
    assert len(shared) >= 0.8 * len(out)


def test_snm_pairs_matches_window_reference(ray_session):
    """SNM pairs must equal the brute-force rank-window reference, with
    ties broken by id, exactly-once emission (no duplicate pairs), and
    the fixed pair-volume identity (w-1)*n - w*(w-1)/2. Many tiny
    blocks force the head carry to span multiple following blocks."""
    import ray.data as rd

    from payor_linkage.dataops.dedup import snm_pairs

    keys = ["b", "a", "a", "c", "b", "a", "d", "c", "b", "a", "e", "c"]
    n, w = len(keys), 5
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)[::-1]),
        "snm_key": pa.array(keys, pa.string()),
    })).repartition(10)
    out = snm_pairs(ds, key_cols=["snm_key"], window=w).to_pandas()

    order = sorted(range(n), key=lambda i: (keys[i], n - 1 - i))
    ids = [n - 1 - i for i in order]
    exp = {(min(ids[p], ids[q]), max(ids[p], ids[q]), q - p)
           for p in range(n) for q in range(p + 1, min(p + w, n))}
    got = {(r.id_a, r.id_b, r.rank_gap) for r in out.itertuples()}
    assert got == exp
    assert len(out) == len(got) == (w - 1) * n - w * (w - 1) // 2


def test_snm_pairs_edges(ray_session):
    """window < 2 and empty input both give an empty typed frame."""
    import ray.data as rd

    from payor_linkage.dataops.dedup import snm_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "snm_key": pa.array(["x", "y"], pa.string())}))
    assert snm_pairs(ds, ["snm_key"], window=1).count() == 0
    empty = ds.filter(lambda r: False)
    out = snm_pairs(empty, ["snm_key"], window=4)
    assert out.count() == 0
    assert set(out.schema().names) == {"id_a", "id_b", "rank_gap"}


def test_meta_blocking_pairs_reference(ray_session):
    """CBS weights must equal a brute-force recount; purged blocks
    (too small / too large) contribute nothing; pairs below min_common
    are pruned."""
    import collections

    import ray.data as rd

    from payor_linkage.dataops.dedup import meta_blocking_pairs

    rows = [
        # key k1: docs 1,2,3 ; k2: 1,2 ; k3: 1,2 ; k4: 2,3
        (1, "k1"), (2, "k1"), (3, "k1"),
        (1, "k2"), (2, "k2"),
        (1, "k3"), (2, "k3"),
        (2, "k4"), (3, "k4"),
        (9, "solo"),                      # block of 1 -> purged
        (4, "big"), (5, "big"), (6, "big"), (7, "big"),  # > max_block
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "tok": pa.array([r[1] for r in rows], pa.string())}))
    out = meta_blocking_pairs(ds, min_common=2, min_block=2,
                              max_block=3).to_pandas()

    w = collections.Counter()
    byk = collections.defaultdict(set)
    for i, k in rows:
        byk[k].add(i)
    for k, mem in byk.items():
        if 2 <= len(mem) <= 3:
            mem = sorted(mem)
            for x in range(len(mem)):
                for y in range(x + 1, len(mem)):
                    w[(mem[x], mem[y])] += 1
    exp = {p: c for p, c in w.items() if c >= 2}
    got = {(r.id_a, r.id_b): r.n_common for r in out.itertuples()}
    assert got == exp == {(1, 2): 3, (2, 3): 2}


def _cn_reference(edge_list, min_common, max_degree):
    import collections

    nbrs = collections.defaultdict(set)
    eset = set()
    for a, b in edge_list:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        eset.add((lo, hi))
        nbrs[lo].add(hi)
        nbrs[hi].add(lo)
    w = collections.Counter()
    for c, ns in nbrs.items():
        if len(ns) > max_degree:
            continue
        ns = sorted(ns)
        for x in range(len(ns)):
            for y in range(x + 1, len(ns)):
                w[(ns[x], ns[y])] += 1
    return {p: c for p, c in w.items()
            if c >= min_common and p not in eset}


@pytest.mark.parametrize("as_str", [False, True])
def test_common_neighbors_reference(ray_session, as_str):
    """Distance-2 non-edge pairs with common-neighbor weights must
    equal the brute-force reference for int AND string node ids; hub
    centers above max_degree contribute no wedges; duplicate and
    reversed input edges collapse."""
    import ray.data as rd

    from payor_linkage.dataops.graph import common_neighbors

    edge_list = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 3),
                 (2, 1),                       # reversed dup
                 (10, 20), (10, 21), (10, 22), (10, 23), (10, 24),
                 (20, 21)]
    conv = (lambda v: f"n{v:02d}") if as_str else (lambda v: v)
    el = [(conv(a), conv(b)) for a, b in edge_list]
    t = pa.table({
        "id_a": pa.array([a for a, _ in el]),
        "id_b": pa.array([b for _, b in el])})
    out = common_neighbors(rd.from_arrow(t), min_common=1,
                           max_degree=4).to_pandas()
    exp = _cn_reference(el, 1, 4)
    got = {(r.id_a, r.id_b): r.n_common for r in out.itertuples()}
    assert got == exp
    # the known interesting pairs on the path+chord component
    assert got[(conv(1), conv(3))] == 2 and got[(conv(2), conv(5))] == 2
    # hub (degree 5) emitted no wedges: 20..24 pairs only via edge 20-21
    assert (conv(21), conv(22)) not in got


def test_forest_paths_tiers_and_reference(ray_session):
    """Pointer-doubling root/depth equals a python walk reference on a
    random forest, on BOTH tiers (driver numpy vs distributed join
    doubling)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.graph import forest_paths

    rng = np.random.default_rng(7)
    n = 400
    parent = {}
    for i in range(1, n):  # random forest: parent strictly smaller id
        if rng.random() < 0.9:
            parent[i] = int(rng.integers(0, i))
    edges = rd.from_arrow(pa.table({
        "child": pa.array(list(parent), pa.int64()),
        "parent": pa.array(list(parent.values()), pa.int64())}))

    def walk(i):
        d = 0
        while i in parent:
            i, d = parent[i], d + 1
        return i, d

    nodes = sorted(set(parent) | set(parent.values()))
    want = pd.DataFrame({"node": nodes,
                         "root": [walk(i)[0] for i in nodes],
                         "depth": [walk(i)[1] for i in nodes]})
    for bound in (10**6, 0):
        got = (forest_paths(edges, local_rows_bound=bound).to_pandas()
               .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes))


def test_forest_paths_cycles_and_multiparent(ray_session):
    import pyarrow as pa
    import pytest as _pt
    import ray.data as rd

    from payor_linkage.dataops.graph import forest_paths

    # multi-parent child keeps MIN parent; self-loops dropped
    edges = rd.from_arrow(pa.table({
        "child": ["b", "b", "c", "c"], "parent": ["z", "a", "b", "c"]}))
    got = (forest_paths(edges).to_pandas()
           .set_index("node")[["root", "depth"]])
    assert got.loc["b"].tolist() == ["a", 1]
    assert got.loc["c"].tolist() == ["a", 2]

    # even cycles collapse to non-root fixpoints under doubling — both
    # tiers must refuse rather than emit bogus roots
    cyc = rd.from_arrow(pa.table({"child": ["x", "y"], "parent": ["y", "x"]}))
    for bound in (10**6, 0):
        with _pt.raises(ValueError):
            forest_paths(cyc, max_depth=8, local_rows_bound=bound)


def test_forest_paths_on_match_hierarchy(ray_session, pipeline_result):
    """Real-input smoke: the inferred golden hierarchy is a forest —
    every node resolves, roots self-point at depth 0, and depth-1 node
    count equals the child count of the deduped edge list."""
    from payor_linkage.dataops.graph import forest_paths

    he = pipeline_result.hierarchy.select_columns(
        ["parent_master_id", "child_master_id"])
    got = forest_paths(he, child_col="child_master_id",
                       parent_col="parent_master_id").to_pandas()
    if len(got) == 0:
        return
    roots = got[got["depth"] == 0]
    assert (roots["node"] == roots["root"]).all()
    assert set(got["root"]).issubset(set(roots["node"]))


def test_wl_labels_structure(ray_session):
    """WL refinement: isomorphic neighborhoods share labels (two
    disjoint triangles; path endpoints), non-isomorphic ones differ;
    labels match a DuckDB re-derivation byte-for-byte (the oracle's
    construction)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.graph import wl_labels

    edges = pa.table({
        "id_a": ["a", "b", "c", "p", "q", "r", "x", "y"],
        "id_b": ["b", "c", "a", "q", "r", "p", "y", "z"]})
    got = (wl_labels(rd.from_arrow(edges), rounds=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    m = dict(zip(got["node"], got["wl"]))
    assert len({m[c] for c in "abcpqr"}) == 1  # triangles all alike
    assert m["x"] == m["z"] != m["y"]          # path: ends vs middle
    assert m["x"] != m["a"]

    con = duckdb.connect()
    con.register("edges", edges)
    want = con.execute("""
        WITH canon AS (
          SELECT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
          FROM edges WHERE id_a <> id_b GROUP BY 1, 2),
        sym AS (SELECT a AS center, b AS nbr FROM canon
                UNION ALL SELECT b, a FROM canon),
        l0 AS (SELECT center AS node, CAST(count(*) AS VARCHAR) AS l
               FROM sym GROUP BY 1),
        r1 AS (SELECT s.center AS node,
                      md5(o.l || '|' || string_agg(n.l, ',' ORDER BY n.l))
                          AS l
               FROM sym s JOIN l0 o ON s.center = o.node
                          JOIN l0 n ON s.nbr = n.node
               GROUP BY s.center, o.l),
        r2 AS (SELECT s.center AS node,
                      md5(o.l || '|' || string_agg(n.l, ',' ORDER BY n.l))
                          AS l
               FROM sym s JOIN r1 o ON s.center = o.node
                          JOIN r1 n ON s.nbr = n.node
               GROUP BY s.center, o.l)
        SELECT node, l AS wl FROM r2 ORDER BY node
    """).df()
    con.close()
    pd.testing.assert_frame_equal(got, want)


def test_ewma_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from payor_linkage.dataops.temporal import ewma

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({"k": rng.integers(0, 23, n),
                       "t": rng.permutation(n),
                       "v": rng.normal(size=n)})
    for a in (0.3, 0.05, 0.95):  # spans the om^-seg overflow regimes
        got = (ewma(rd.from_pandas(df), "k", "t", "v", alpha=a)
               .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
        want = (df.sort_values(["k", "t"]).groupby("k")["v"]
                .transform(lambda s: s.ewm(alpha=a, adjust=False).mean()))
        np.testing.assert_allclose(got["ewma"].to_numpy(),
                                   want.to_numpy(), rtol=1e-9)


def test_feature_hash_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import feature_hash_vectors

    docs = pa.table({"doc_id": [1, 2, 3],
                     "text": ["the cat sat the", "dog", ""]})
    got = (feature_hash_vectors(rd.from_arrow(docs), dim=8).to_pandas()
           .sort_values(["doc_id", "dim_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute("""
        SELECT doc_id, ('0x' || substr(md5(tok),1,8))::BIGINT % 8
                   AS dim_idx,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT doc_id, unnest(regexp_split_to_array(
                  lower(text), '[^a-z0-9]+')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    con.close()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes))
    # the same token always lands in the same bucket: doc1 has 'the' ×2
    assert got[got.doc_id == 1]["n"].max() == 2


def test_cms_inner_product_join_size(ray_session):
    """CM inner product never under-estimates the true equi-join size,
    and is exact when buckets don't collide."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.sketch import cms_inner_product, cms_registers

    rng = np.random.default_rng(11)
    ka = rng.integers(0, 40, 3000)
    kb = rng.integers(0, 40, 2000)
    ra = cms_registers(rd.from_arrow(pa.table({"k": ka})), "k")
    rb = cms_registers(rd.from_arrow(pa.table({"k": kb})), "k")
    est = int(cms_inner_product(ra, rb)["est_join_size"][0].as_py())
    ca = np.bincount(ka, minlength=40)
    cb = np.bincount(kb, minlength=40)
    exact = int((ca * cb).sum())
    assert est >= exact
    # 40 keys in 256 buckets: collisions inflate ≤ a few percent here
    assert est <= exact * 2


def test_isotonic_calibration_matches_naive_pava(ray_session):
    import numpy as np
    import pyarrow as pa

    from payor_linkage.evaluate import calibrate_isotonic

    rng = np.random.default_rng(5)
    n_pairs = rng.integers(1, 50, 15)
    n_true = np.array([rng.integers(0, p + 1) for p in n_pairs])
    sweep = pa.table({"bucket": pa.array(np.arange(15), pa.int64()),
                      "n_pairs": pa.array(n_pairs, pa.int64()),
                      "n_true": pa.array(n_true, pa.int64())})
    got = calibrate_isotonic(sweep)["calibrated_precision"].to_numpy()

    # naive O(n^2) reference: repeatedly merge ANY adjacent violator
    blocks = [[float(w), float(t) / max(w, 1), 1]
              for w, t in zip(n_pairs, n_true)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][1] > blocks[i + 1][1] + 1e-15:
                w1, m1, c1 = blocks[i]
                w2, m2, c2 = blocks[i + 1]
                blocks[i:i + 2] = [[w1 + w2,
                                    (w1 * m1 + w2 * m2) / (w1 + w2),
                                    c1 + c2]]
                changed = True
                break
    want = np.repeat([b[1] for b in blocks], [b[2] for b in blocks])
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert (np.diff(got) >= -1e-12).all()


def test_regex_extract_null_on_no_match(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.text import regex_extract_columns

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["alpha beta rest", "123 no match"]}))
    got = regex_extract_columns(
        docs, "text", r"^(?P<w1>[a-z]+) (?P<w2>[a-z]+)",
        ["w1", "w2"]).to_pandas().set_index("doc_id")
    assert got.loc[1].tolist() == ["alpha", "beta"]
    assert got.loc[2].isna().all()


def test_forest_subtree_sums(ray_session):
    """Hand-checked counts + weighted values; values default to 1."""
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.graph import forest_subtree_sums

    edges = rd.from_arrow(pa.table({"child": ["b", "c", "d", "f"],
                                    "parent": ["a", "b", "b", "e"]}))
    got = forest_subtree_sums(edges).to_pandas()
    assert dict(zip(got.node, got.subtree_sum)) == {
        "a": 4, "b": 3, "c": 1, "d": 1, "e": 2, "f": 1}

    vals = rd.from_arrow(pa.table({"node": ["c", "f"], "v": [5, 2]}))
    gw = forest_subtree_sums(edges, values=vals).to_pandas()
    assert dict(zip(gw.node, gw.subtree_sum)) == {
        "a": 5, "b": 5, "c": 5, "d": 0, "e": 2, "f": 2}


def test_interpolate_linear_hand_checked(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.temporal import interpolate_linear

    ev = pa.table({
        "user_id": [1] * 6 + [2] * 3,
        "ts": pa.array([0, 10, 20, 30, 40, 50, 0, 10, 20],
                       pa.timestamp("us")),
        "event_id": list(range(9)),
        "value": [None, 1.0, None, None, 7.0, None,  # edges stay null
                  None, None, 5.0]})
    got = (interpolate_linear(rd.from_arrow(ev)).to_pandas()
           .sort_values(["user_id", "ts"]).reset_index(drop=True))
    want = [None, 1.0, 3.0, 5.0, 7.0, None, None, None, 5.0]
    for g, w in zip(got["interp"], want):
        if w is None:
            assert pd.isna(g)
        else:
            np.testing.assert_allclose(g, w)
    # known rows pass through untouched
    known = got[got.value.notna()]
    assert (known.value == known.interp).all()


def test_ranking_agreement_matches_brute_force(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.evaluate import ranking_agreement

    rng = np.random.default_rng(9)
    n = 200
    a = rng.integers(0, 20, n)
    b = rng.integers(0, 20, n)
    got = ranking_agreement(
        rd.from_arrow(pa.table({"id": np.arange(n), "a": a, "b": b})),
        "id", "a", "b").to_pandas().iloc[0]
    conc = disc = ta = tb = tboth = 0
    for i, j in itertools.combinations(range(n), 2):
        da, db = np.sign(a[i] - a[j]), np.sign(b[i] - b[j])
        if da * db > 0:
            conc += 1
        elif da * db < 0:
            disc += 1
        elif da == 0 and db == 0:
            tboth += 1
        elif da == 0:
            ta += 1
        else:
            tb += 1
    assert [got.concordant, got.discordant, got.tied_a, got.tied_b,
            got.tied_both] == [conc, disc, ta, tb, tboth]
    assert got.n_pairs == n * (n - 1) // 2 == conc + disc + ta + tb + tboth

    import pytest as _pt
    with _pt.raises(ValueError):
        ranking_agreement(
            rd.from_arrow(pa.table({"id": [1], "a": [1], "b": [1]})),
            "id", "a", "b", max_items=0)


def test_kmv_sketch_estimates(ray_session):
    """KMV registers: exact below k; estimate within 15% above k;
    intersection/Jaccard estimates land near truth on crafted overlap."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.sketch import (kmv_estimate,
                                              kmv_intersect_estimate,
                                              kmv_registers)

    small = rd.from_arrow(pa.table({"v": list(range(50)) * 3}))
    regs = kmv_registers(small, "v", k=256).materialize()
    assert regs.count() == 50
    assert kmv_estimate(regs, k=256) == 50.0

    big = rd.from_arrow(pa.table({"v": list(range(20000))}))
    rb = kmv_registers(big, "v", k=256)
    est = kmv_estimate(rb, k=256)
    assert abs(est - 20000) / 20000 < 0.15

    a = rd.from_arrow(pa.table({"v": list(range(0, 12000))}))
    b = rd.from_arrow(pa.table({"v": list(range(6000, 18000))}))
    ra = kmv_registers(a, "v", k=256).materialize()
    rbb = kmv_registers(b, "v", k=256).materialize()
    out = kmv_intersect_estimate(ra, rbb, k=256)
    assert abs(out["jaccard"] - 1 / 3) < 0.12
    assert abs(out["est_intersection"] - 6000) / 6000 < 0.35


def test_fit_logistic_matches_reference_irls(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from payor_linkage.evaluate import fit_logistic

    rng = np.random.default_rng(4)
    n = 3000
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y = (rng.random(n) < 1 / (1 + np.exp(0.5 - 2 * x1 + 1.5 * x2))) \
        .astype("int64")
    df = pd.DataFrame({"f1": x1, "f2": x2, "y": y})
    beta, nrows = fit_logistic(rd.from_pandas(df), ["f1", "f2"], "y",
                               iters=12)
    assert nrows == n
    X = np.column_stack([np.ones(n), x1, x2])
    b = np.zeros(3)
    for _ in range(12):
        p = 1 / (1 + np.exp(-(X @ b)))
        w = p * (1 - p)
        b = b + np.linalg.solve((X.T * w) @ X + 1e-6 * np.eye(3),
                                X.T @ (y - p) - 1e-6 * b)
    np.testing.assert_allclose(beta, b, rtol=1e-6)
    # recovers the generating signs
    assert beta[1] > 0 and beta[2] < 0


def test_matcher_fit_on_real_pairs(ray_session):
    """The learned matcher trained on the real labeled pair features
    separates matches from non-matches on its own training corpus."""
    import numpy as np
    import pyarrow.compute as pc

    import __ray_entry__ as e

    pairs = e.q_pair_training_set("/root/testdata/sf0.01")
    from payor_linkage.evaluate import fit_logistic

    beta, n = fit_logistic(pairs, e._MATCHER_FEATURES, "is_match")
    df = pairs.to_pandas()
    X = np.column_stack(
        [np.ones(len(df))]
        + [df[c].fillna(0.0).to_numpy() for c in e._MATCHER_FEATURES])
    p = 1 / (1 + np.exp(-(X @ beta)))
    acc = ((p > 0.5).astype(int) == df["is_match"]).mean()
    assert acc > 0.9
    coefs = dict(zip(e._MATCHER_FEATURES, beta[1:]))
    assert coefs["score_name"] > 0  # names drive the corpus's truth


def test_grouping_sets_counts(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from payor_linkage.dataops.aggregates import grouping_sets_counts

    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["1", "2", "1", "1", "2"]}))
    got = (grouping_sets_counts(ds, ["a", "b"],
                                [["a", "b"], ["b"], []]).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    want = pd.DataFrame({
        "a": ["ALL", "ALL", "ALL", "x", "x", "y", "y"],
        "b": ["1", "2", "ALL", "1", "2", "1", "2"],
        "n": [3, 2, 5, 1, 1, 2, 1]}).astype(got.dtypes)
    pd.testing.assert_frame_equal(got, want)

    import pytest as _pt
    with _pt.raises(ValueError):
        grouping_sets_counts(ds, ["a"], [["z"]])

"""Unit tests for the reshape (melt / interleave) and decontamination
operators — DuckDB recomputations plus edge cases the sf tables don't
cover (unicode grams, short docs, empty test corpus, exhausted parts)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_melt_matches_union_all(ray_session):
    import duckdb

    from payor_linkage.dataops.reshape import melt

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": np.arange(500, dtype=np.int64),
        "a": rng.normal(size=500), "b": rng.normal(size=500),
    })
    out = (melt(_ds(df), id_cols=["k"], value_cols=["a", "b"])
           .to_pandas().sort_values(["k", "metric"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, 'a' AS metric, a AS val FROM df
        UNION ALL SELECT k, 'b', b FROM df
        ORDER BY k, metric
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_interleave_positions_unique_and_ratio(ray_session):
    """Positions are globally unique, and while every part still has
    rows each epoch of W slots holds exactly the declared mix."""
    from payor_linkage.dataops.reshape import interleave_position

    rng = np.random.default_rng(11)
    parts = rng.choice(["x", "y", "z"], 900, p=[0.5, 0.3, 0.2])
    df = pd.DataFrame({"p": parts, "i": np.arange(900, dtype=np.int64)})
    w = {"x": 3, "y": 2, "z": 1}
    out = (interleave_position(_ds(df), part_col="p", order_cols=["i"],
                               weights=w)
           .to_pandas().sort_values("pos").reset_index(drop=True))
    assert len(out) == 900
    assert out.pos.is_unique
    # per-part ranks follow the i order
    for p, g in out.groupby("p"):
        assert (g.sort_values("i").src_rank.values
                == np.arange(1, len(g) + 1)).all()
    # the first epoch (no part exhausted yet) carries the exact mix
    W = sum(w.values())
    first = out[out.pos < W].p.value_counts()
    assert first["x"] == 3 and first["y"] == 2 and first["z"] == 1


def test_interleave_matches_sql(ray_session):
    import duckdb

    from payor_linkage.dataops.reshape import interleave_position

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"p": rng.choice(["x", "y"], 400),
                       "i": np.arange(400, dtype=np.int64)})
    out = (interleave_position(_ds(df), part_col="p", order_cols=["i"],
                               weights={"x": 2, "y": 1})
           .to_pandas().sort_values("pos").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH w(p, wt, woff) AS (VALUES ('x', 2, 0), ('y', 1, 2)),
        r AS (SELECT p, i, row_number() OVER (PARTITION BY p ORDER BY i)
                     - 1 AS r0 FROM df)
        SELECT p, i, r0 + 1 AS src_rank,
               CAST((r0 // wt) * 3 + woff + (r0 % wt) AS BIGINT) AS pos
        FROM r JOIN w USING (p) ORDER BY pos
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_dense_rank_matches_window(ray_session):
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_dense_rank

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": rng.integers(0, 19, 1500).astype(np.int64),
        "v": rng.integers(0, 12, 1500).astype(np.int64) * 1.5,  # many ties
        "id": np.arange(1500, dtype=np.int64),
    })
    out = (grouped_dense_rank(_ds(df), key="k", value_col="v",
                              carry_cols=["id"])
           .to_pandas().sort_values(["k", "v", "id"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, v, id,
               CAST(dense_rank() OVER (PARTITION BY k ORDER BY v)
                    AS BIGINT) AS drank
        FROM df ORDER BY k, v, id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_contamination_unicode_and_short_docs(ray_session):
    from payor_linkage.dataops.text import contamination_counts

    train = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["abcdef",        # abc bcd cde def
                 "ab",            # too short -> dropped
                 "日本語のテキスト",   # unicode grams
                 "abcabc",        # repeated grams counted once
                 "zzzz"],         # zzz once
    })
    test = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64) + 100,
        "text": ["xxcdexx日本語xx", "zz"],
    })
    out = (contamination_counts(_ds(train), _ds(test), k=3)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.index.tolist() == [0, 2, 3, 4]  # doc 1 dropped (len < 3)
    assert out.loc[0, "n_grams"] == 4
    assert out.loc[0, "n_contaminated"] == 1      # 'cde'
    assert out.loc[2, "n_grams"] == 6
    assert out.loc[2, "n_contaminated"] == 1      # '日本語'
    assert out.loc[3, "n_grams"] == 3             # abc bca cab (abc deduped)
    assert out.loc[4, "n_grams"] == 1 and out.loc[4, "n_contaminated"] == 0


def test_contamination_empty_test_side(ray_session):
    from payor_linkage.dataops.text import contamination_counts

    train = pd.DataFrame({"doc_id": np.array([1], np.int64),
                          "text": ["hello world"]})
    test = pd.DataFrame({"doc_id": np.array([], np.int64),
                         "text": pd.array([], dtype="string")})
    out = (contamination_counts(_ds(train), _ds(test), k=3)
           .to_pandas())
    assert out.n_contaminated.tolist() == [0]
    assert out.n_grams.tolist() == [9]


def test_top_term_df_matches_sql(ray_session):
    import duckdb

    from payor_linkage.dataops.text import top_term_df

    rng = np.random.default_rng(67)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 12)))
             for _ in range(300)] + ["", "!!!"]  # token-free docs dropped
    df = pd.DataFrame({"doc_id": np.arange(302, dtype=np.int64),
                       "text": texts})
    out = (top_term_df(_ds(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text),
                                              '[^a-z0-9]+')) AS token
          FROM df),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok WHERE token <> '' GROUP BY 1, 2),
        win AS (SELECT doc_id, token, tf,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY tf DESC, token) AS rn
                FROM tf),
        dfreq AS (SELECT token,
                         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                  FROM tok WHERE token <> '' GROUP BY 1)
        SELECT w.doc_id, w.token AS top_token, w.tf, d.df
        FROM win w JOIN dfreq d USING (token) WHERE rn = 1
        ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_token_ngram_contamination_edges(ray_session):
    from payor_linkage.dataops.text import token_ngram_contamination

    train = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "lang": ["en"] * 4,
        "text": ["the quick brown fox jumps",   # 3 trigrams, 1 hit
                 "one two",                     # < 3 tokens -> dropped
                 "a b c a b c a b c",          # repeats deduped: 3 grams
                 "quick brown fox quick brown fox"],
    })
    test = pd.DataFrame({
        "doc_id": np.array([99], np.int64),
        "text": ["QUICK, brown... FOX!"],      # normalizes to 1 trigram
    })
    out = (token_ngram_contamination(_ds(train), _ds(test), n=3,
                                     carry_cols=["lang"])
           .to_pandas().set_index("doc_id").sort_index())
    assert out.index.tolist() == [0, 2, 3]
    assert out.loc[0, "n_grams"] == 3
    assert out.loc[0, "n_contaminated"] == 1   # 'quick brown fox'
    assert out.loc[2, "n_grams"] == 3          # abc bca cab patterns
    assert out.loc[2, "n_contaminated"] == 0
    assert out.loc[3, "n_grams"] == 3  # qbf bfq fqb (repeat deduped)
    assert out.loc[3, "n_contaminated"] == 1
    assert (out.lang == "en").all()


def test_hash_sample_complement_partitions(ray_session):
    from payor_linkage.dataops.text import hash_sample

    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    a = hash_sample(_ds(df), 0.3).to_pandas().doc_id
    b = hash_sample(_ds(df), 0.3, complement=True).to_pandas().doc_id
    assert len(a) + len(b) == 1000
    assert set(a).isdisjoint(set(b))


def test_interleave_many_blocks_matches_sql(ray_session):
    """Multi-block stress for the block-prefix rank construction: the
    input is shredded into many blocks so per-part runs straddle many
    sorted blocks; ranks/positions must still be globally correct."""
    import duckdb

    from payor_linkage.dataops.reshape import interleave_position

    rng = np.random.default_rng(79)
    df = pd.DataFrame({"p": rng.choice(["x", "y", "z"], 20000),
                       "i": rng.permutation(20000).astype(np.int64)})
    ds = _ds(df).repartition(37)
    out = (interleave_position(ds, part_col="p", order_cols=["i"],
                               weights={"x": 1, "y": 2, "z": 3})
           .to_pandas().sort_values("pos").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH w(p, wt, woff) AS (VALUES ('x', 1, 0), ('y', 2, 1),
                                       ('z', 3, 3)),
        r AS (SELECT p, i, row_number() OVER (PARTITION BY p ORDER BY i)
                     - 1 AS r0 FROM df)
        SELECT p, i, r0 + 1 AS src_rank,
               CAST((r0 // wt) * 6 + woff + (r0 % wt) AS BIGINT) AS pos
        FROM r JOIN w USING (p) ORDER BY pos
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp)


def test_json_int_field_fallback_paths(ray_session):
    """Regex fast path, spacing variants, missing field, and broken
    JSON all resolve via the json.loads fallback."""
    from payor_linkage.dataops.text import json_int_field

    df = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "props": ['{"k": 7}', '{ "k" :42}', '{"other": 1}',
                  'not json', '{"k": -3, "z": 9}'],
    })
    out = (json_int_field(_ds(df), col="props", field="k")
           .to_pandas().set_index("event_id").sort_index())
    assert out.loc[0, "k"] == 7
    assert out.loc[1, "k"] == 42
    assert pd.isna(out.loc[2, "k"])
    assert pd.isna(out.loc[3, "k"])
    assert out.loc[4, "k"] == -3


def test_regex_redact_edges(ray_session):
    """Rows with no match pass through untouched with count 0; multiple
    matches are all replaced and counted."""
    from payor_linkage.dataops.text import regex_redact

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "props": ["call 555-1234 x89", "no digits here", "", "7 8 9"],
    })
    out = (regex_redact(_ds(df), "props", "[0-9]+", "<N>")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out.redacted.tolist() == [
        "call <N>-<N> x<N>", "no digits here", "", "<N> <N> <N>"]
    assert out.n_redacted.tolist() == [3, 0, 0, 3]


def test_repetition_stats_edges(ray_session):
    """Tie on top count breaks to the lexicographically smaller token;
    token-free docs emit no row; case folds before counting."""
    from payor_linkage.dataops.text import repetition_stats

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["b b a a c",          # tie 2-2 → 'a' wins
                 "The the THE ok",     # case folds → the×3
                 "!!! ...",            # no tokens → dropped
                 "solo"],
    })
    out = (repetition_stats(_ds(df))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.doc_id.tolist() == [0, 1, 3]
    assert out.loc[0, ["n_words", "n_distinct", "top_count",
                       "top_token"]].tolist() == [5, 3, 2, "a"]
    assert out.loc[1, ["n_words", "n_distinct", "top_count",
                       "top_token"]].tolist() == [4, 2, 3, "the"]
    assert out.loc[2, ["n_words", "n_distinct", "top_count",
                       "top_token"]].tolist() == [1, 1, 1, "solo"]


def test_pack_positions_matches_window_cumsum(ray_session):
    """Distributed prefix-sum over many blocks == single-node window
    cumsum; bin boundaries land documents by their FIRST token."""
    import duckdb

    from payor_linkage.dataops.reshape import pack_positions

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "id": np.arange(3000, dtype=np.int64),
        "n": rng.integers(1, 400, 3000).astype(np.int64),
    })
    ds = _ds(df).repartition(23)  # force many blocks through the sort
    out = (pack_positions(ds, "n", ["id"], budget=1000)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH o AS (SELECT id, n,
                          sum(n) OVER (ORDER BY id
                                       ROWS UNBOUNDED PRECEDING) AS c
                   FROM df)
        SELECT id, n, CAST(c AS BIGINT) AS cum,
               CAST((c - n) // 1000 AS BIGINT) AS bin_id
        FROM o ORDER BY id
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp,
                                  check_dtype=False)
    # contiguity: bin ids are non-decreasing and start at 0
    assert out.bin_id.iloc[0] == 0
    assert (np.diff(out.bin_id.values) >= 0).all()


def test_snapshot_diff_all_classes(ray_session):
    """Every change class appears and classifies correctly."""
    from payor_linkage.dataops.cdc import snapshot_diff

    old = pd.DataFrame({"k": np.array([1, 2, 3], np.int64),
                        "v": np.array([10, 20, 30], np.int64)})
    new = pd.DataFrame({"k": np.array([2, 3, 4], np.int64),
                        "v": np.array([20, 99, 40], np.int64)})
    out = (snapshot_diff(_ds(old), _ds(new), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.change.tolist() == ["removed", "unchanged", "changed",
                                   "added"]
    assert out.old_val.tolist() == [10, 20, 30, 0]
    assert out.new_val.tolist() == [0, 20, 99, 40]


def test_apply_upsert_delta_wins(ray_session):
    from payor_linkage.dataops.cdc import apply_upsert

    base = pd.DataFrame({"k": np.array([1, 2], np.int64),
                         "v": np.array([10, 20], np.int64)})
    delta = pd.DataFrame({"k": np.array([2, 3], np.int64),
                          "v": np.array([77, 30], np.int64)})
    out = (apply_upsert(_ds(base), _ds(delta), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.k.tolist() == [1, 2, 3]
    assert out.v.tolist() == [10, 77, 30]


def test_grouped_rank_matches_window(ray_session):
    """RANK with gaps + PERCENT_RANK vs DuckDB, heavy ties, both a
    numeric and a string order column; single-row partitions give 0."""
    import duckdb

    from payor_linkage.dataops.aggregates import grouped_rank

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 40, 2000).astype(np.int64),
        "v": rng.integers(0, 5, 2000).astype(np.int64),
        "i": np.arange(2000, dtype=np.int64),
    })
    df = pd.concat([df, pd.DataFrame(
        {"g": [999], "v": [1], "i": [2000]})], ignore_index=True)
    out = (grouped_rank(_ds(df), "g", "v", carry_cols=["i"])
           .to_pandas().sort_values("i").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, v, i, CAST(rank() OVER w AS BIGINT) AS rnk,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume_dist
        FROM df WINDOW w AS (PARTITION BY g ORDER BY v)
        ORDER BY i
    """).df()
    pd.testing.assert_frame_equal(out[exp.columns.tolist()], exp,
                                  check_dtype=False)
    assert out.loc[out.g == 999, "pct_rank"].item() == 0.0
    assert out.loc[out.g == 999, "cume_dist"].item() == 1.0


def test_chunk_documents_edges(ray_session):
    """Exact-multiple lengths, short docs, empty docs (no rows), and
    the non-ASCII fallback path (character semantics, not bytes)."""
    from payor_linkage.dataops.text import chunk_documents

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["abcdefgh",        # exactly 2×4
                 "xyz",             # one short chunk
                 "",                # no chunks
                 "aébcdéfgh"],      # multibyte → fallback, 9 chars
    })
    out = (chunk_documents(_ds(df), size=4)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    got = list(zip(out.doc_id, out.chunk_idx, out.chunk))
    assert got == [(0, 0, "abcd"), (0, 1, "efgh"),
                   (1, 0, "xyz"),
                   (3, 0, "aébc"), (3, 1, "défg"), (3, 2, "h")]


def test_chunk_documents_zero_copy_many_blocks(ray_session):
    """ASCII zero-copy path reassembles exactly across blocks and the
    concatenation of a doc's chunks reproduces the doc."""
    from payor_linkage.dataops.text import chunk_documents

    rng = np.random.default_rng(13)
    texts = ["".join(rng.choice(list("abcdef "), rng.integers(0, 300)))
             for _ in range(400)]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                       "text": texts})
    out = (chunk_documents(_ds(df).repartition(7), size=32)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    rebuilt = out.groupby("doc_id").chunk.apply("".join)
    for i, t in enumerate(texts):
        if t:
            assert rebuilt[i] == t
        else:
            assert i not in rebuilt.index
    assert (out.chunk.str.len() <= 32).all()


def test_keyed_hash_sample_partitions_by_rate(ray_session):
    """Same id keeps/drops per its key's rate; rate 1.0 keeps all and
    rate 0.0 drops all; default rate applies to unlisted keys."""
    from payor_linkage.dataops.text import hash_sample, keyed_hash_sample

    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "lang": np.tile(["en", "de", "fr", "zh"], 500),
    })
    out = keyed_hash_sample(
        _ds(df), "lang", {"en": 1.0, "de": 0.0, "fr": 0.4},
        default_rate=0.4).to_pandas()
    assert (out[out.doc_id % 4 == 0].lang == "en").all()
    assert len(out[out.lang == "en"]) == 500
    assert len(out[out.lang == "de"]) == 0
    # fr (listed 0.4) and zh (default 0.4) keep exactly the rows the
    # global 0.4 hash_sample keeps among their ids
    flat = hash_sample(_ds(df), 0.4).to_pandas()
    for lang in ["fr", "zh"]:
        assert set(out[out.lang == lang].doc_id) == \
            set(flat[flat.lang == lang].doc_id)


def test_chunk_and_substring_large_string_fallback(ray_session):
    """large_string columns (int64 offsets — what Arrow promotes to for
    >2GB blocks) must route around the int32 zero-copy path and still
    produce identical results."""
    import ray.data as rd

    from payor_linkage.dataops.dedup import substring_dup_pairs
    from payor_linkage.dataops.text import chunk_documents

    shared = "a shared span long enough to pair on twenty-four chars"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["xx " + shared, shared + " yy", "unrelated"],
                         pa.large_string()),
    })
    ds = rd.from_arrow(t)
    chunks = (chunk_documents(ds, size=16)
              .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    rebuilt = chunks.groupby("doc_id").chunk.apply("".join)
    assert rebuilt[0] == "xx " + shared
    pairs = substring_dup_pairs(ds, k=24).to_pandas()
    assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))


def _ref_bpe(texts, n_merges, min_count=2):
    """Pure-Python Sennrich-style BPE reference: overlapping pair
    counts for ranking, greedy left-to-right non-overlapping merge,
    tie-break (count DESC, pair lexicographic ASC)."""
    import collections
    import re

    wc = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        stats = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wc[w]
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_reference_crafted(ray_session):
    """Overlap chains (aaa/aaaa), ties, multi-char merges and early
    stop must match the pure-Python reference exactly."""
    from payor_linkage.dataops.text import bpe_train

    texts = ["aaa aaaa banana bandana", "low lower lowest low",
             "aaa abab baba", "newer newest new news"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = bpe_train(_ds(df), 25).to_pandas()
    exp = _ref_bpe(texts, 25)
    assert [tuple(r) for r in
            got[["left_sym", "right_sym", "n"]].itertuples(index=False)] \
        == exp
    assert got["rank"].tolist() == list(range(1, len(exp) + 1))
    # the distributed tier (forced) must byte-agree with the local one
    dist = bpe_train(_ds(df), 25, driver_word_bound=0).to_pandas()
    pd.testing.assert_frame_equal(got, dist)


def test_bpe_train_matches_reference_corpus(ray_session):
    """Exact merge-sequence equality on the real sf0.001 documents."""
    import pyarrow.parquet as pq

    from payor_linkage.dataops.text import bpe_train

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    got = bpe_train(_ds(tbl.to_pandas()), 20).to_pandas()
    exp = _ref_bpe(tbl["text"].to_pylist(), 20)
    assert [tuple(r) for r in
            got[["left_sym", "right_sym", "n"]].itertuples(index=False)] \
        == exp


def test_bpe_pair_counts_matches_reference(ray_session):
    from payor_linkage.dataops.text import bpe_pair_counts

    texts = ["aaa banana", "low lower", "aaa"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": texts})
    got = bpe_pair_counts(_ds(df)).to_pandas()
    import collections
    import re

    wc = collections.Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wc[w] += 1
    exp = collections.Counter()
    for w, n in wc.items():
        for a, b in zip(w, w[1:]):
            exp[(a, b)] += n
    assert {(r.left_sym, r.right_sym): r.n
            for r in got.itertuples()} == dict(exp)


def test_bpe_segment_matches_reference(ray_session):
    """Segmenting with the trained merges must equal the reference's
    greedy application word by word, and per-group token counts must be
    the segmentation length."""
    from payor_linkage.dataops.text import bpe_segment, bpe_train

    texts = ["aaa aaaa banana bandana", "low lower lowest low",
             "aaa abab baba", "newer newest new news"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    merges = bpe_train(_ds(df), 15)
    out = bpe_segment(_ds(df), merges).to_pandas()

    pairs = list(zip(merges["left_sym"].to_pylist(),
                     merges["right_sym"].to_pylist()))

    def ref_seg(w):
        syms = list(w)
        for a, b in pairs:
            i, nxt = 0, []
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(syms[i])
                    i += 1
            syms = nxt
        return syms

    assert len(out) > 0
    for r in out.itertuples():
        exp = ref_seg(r.word)
        assert r.seg == " ".join(exp), r.word
        assert r.n_tokens == len(exp)


def test_novelty_census_matches_reference(ray_session):
    """Per-doc (unique-gram, distinct-gram) counts must equal a pure
    Python recomputation; docs shorter than the gram width emit no row;
    duplicated docs must have zero corpus-unique grams."""
    from payor_linkage.dataops.text import novelty_census

    texts = [
        "the quick brown fox jumps",     # shares a trigram with doc 1
        "the quick brown dog sits",
        "the quick brown fox jumps",     # exact dup of doc 0
        "one of a kind content here",
        "too short",                      # < 3 tokens -> no row
        "",                               # empty -> no row
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = (novelty_census(_ds(df), word_ngram=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    import collections
    per_doc = {}
    dfreq = collections.Counter()
    for i, t in enumerate(texts):
        toks = t.lower().split()
        grams = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        if grams:
            per_doc[i] = grams
            dfreq.update(grams)
    exp = {i: (sum(dfreq[g] == 1 for g in gs), len(gs))
           for i, gs in per_doc.items()}
    assert list(got["doc_id"]) == sorted(exp)
    for r in got.itertuples():
        assert (r.n_unique_grams, r.n_grams) == exp[r.doc_id], r.doc_id
    # the duplicated pair shares every gram -> zero unique on both
    assert exp[0][0] == 0 and exp[2][0] == 0


def _greedy_cover_reference(texts, ids, k, n):
    per = {}
    for i, t in zip(ids, texts):
        toks = t.lower().split()
        per[i] = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
    covered, out = set(), []
    for r in range(k):
        best = max(per, key=lambda i: (len(per[i] - covered), ),
                   default=None)
        gains = {i: len(g - covered) for i, g in per.items()}
        bg = max(gains.values(), default=0)
        if bg == 0:
            break
        win = min(i for i, g in gains.items() if g == bg)
        covered |= per[win]
        out.append((r + 1, win, bg, len(covered)))
    return out


def test_greedy_cover_matches_reference(ray_session):
    """Driver tier must equal the exact python greedy (ties -> min id,
    early stop when nothing new is coverable)."""
    from payor_linkage.dataops.text import greedy_cover

    texts = [
        "a b c d e",          # grams: abc bcd cde (3 new)
        "a b c d e",          # dup: gain 0 after doc 0
        "x y z w",            # 2 new
        "c d e f g h",        # overlaps cde
        "p q r s t u v",      # 5 new
        "x y z w",            # dup
    ]
    ids = [10, 4, 7, 2, 9, 1]
    df = pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                       "text": texts})
    got = [(r.sel_round, r.doc_id, r.gain, r.covered_total)
           for r in greedy_cover(_ds(df), k=10, word_ngram=3)
           .to_pandas().itertuples()]
    exp = _greedy_cover_reference(texts, ids, 10, 3)
    assert got == exp
    # dups contribute nothing -> selection ends before k
    assert len(got) < 6


def test_greedy_cover_tier_parity(ray_session):
    """Distributed tier (local_rows_bound=0) must be byte-identical to
    the driver tier on the same corpus."""
    from payor_linkage.dataops.text import greedy_cover

    rng = np.random.default_rng(3)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(4, 12)))
             for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})
    a = greedy_cover(_ds(df), k=6, word_ngram=2).to_pandas()
    b = greedy_cover(_ds(df), k=6, word_ngram=2,
                     local_rows_bound=0).to_pandas()
    assert a.equals(b)
    assert len(a) > 0

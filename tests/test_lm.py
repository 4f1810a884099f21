"""Bigram-LM gates: count tables and per-doc stats hand-checked on a
tiny corpus; the float cross-entropy (rows-only q_lm_xent) gated
against a pure-python per-token reference."""

import math

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def lm_corpus(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["the cat sat", "the cat ran", "a dog sat", ""]}))
    from payor_linkage.dataops.text import ngram_lm_counts

    uni, big = ngram_lm_counts(docs, min_count=2)
    return docs, uni, big


def test_lm_counts_hand_checked(lm_corpus):
    _, uni, big = lm_corpus
    u = dict(zip(*uni.to_pandas()[["token", "n"]].T.values.tolist()))
    assert u == {"<s>": 3, "<unk>": 3, "cat": 2, "sat": 2, "the": 2}
    b = {(r.prev, r.cur): r.n for r in big.to_pandas().itertuples()}
    assert b == {("<s>", "the"): 2, ("<s>", "<unk>"): 1,
                 ("the", "cat"): 2, ("cat", "sat"): 1,
                 ("cat", "<unk>"): 1, ("<unk>", "<unk>"): 1,
                 ("<unk>", "sat"): 1}


def test_lm_doc_stats_hand_checked(lm_corpus):
    docs, uni, big = lm_corpus
    from payor_linkage.dataops.text import ngram_lm_doc_stats

    st = (ngram_lm_doc_stats(docs, uni, big).to_pandas()
          .sort_values("doc_id").set_index("doc_id"))
    # doc1 "the cat sat": prev counts <s>,the,cat = 3+2+2; bigram
    # counts 2+2+1
    assert st.loc[1].tolist() == [3, 0, 7, 5]
    assert st.loc[2].tolist() == [3, 1, 7, 5]
    assert st.loc[3].tolist() == [3, 2, 9, 3]
    assert st.loc[4].tolist() == [0, 0, 0, 0]  # empty doc still present


def test_lm_xent_matches_python_reference(lm_corpus):
    docs, uni, big = lm_corpus
    from payor_linkage.dataops.text import ngram_lm_xent

    add_k = 0.5
    u = {r.token: r.n for r in uni.to_pandas().itertuples()}
    b = {(r.prev, r.cur): r.n for r in big.to_pandas().itertuples()}
    vocab = sorted(set(u) - {"<s>", "<unk>"})
    v = len(vocab)

    def ref_xent(text):
        toks = [t for t in
                "".join(c if c.isalnum() else " " for c in text.lower())
                .split() if t]
        toks = [t if t in vocab else "<unk>" for t in toks]
        if not toks:
            return 0, 0.0
        total = 0.0
        prev = "<s>"
        for t in toks:
            p = (b.get((prev, t), 0) + add_k) / (u[prev] + add_k * (v + 1))
            total -= math.log2(p)
            prev = t
        return len(toks), total / len(toks)

    got = (ngram_lm_xent(docs, uni, big, add_k=add_k).to_pandas()
           .sort_values("doc_id").set_index("doc_id"))
    for r in docs.to_pandas().itertuples():
        n_ref, x_ref = ref_xent(r.text)
        assert got.loc[r.doc_id, "n_tokens"] == n_ref
        np.testing.assert_allclose(got.loc[r.doc_id, "xent_bits"], x_ref,
                                   rtol=1e-12)
    # quality ordering: the OOV-junk doc scores strictly worse than the
    # fluent ones
    assert (got.loc[3, "xent_bits"] > got.loc[1, "xent_bits"])

"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship MDM record-linkage pipeline over the
deterministically-synthesized interleaved-document corpus (the
BASELINE.json input shape — synthesized at small scale per the driver's
instruction; no external data) and returns the golden-record table.

``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + the training-data operators); SQL-expressible ones have
DuckDB oracles in ``oracle_sql()`` with IDENTICAL column names; the rest
(ensemble scoring, union-find clustering, MinHash/SimHash/LSH, lang-id,
media decode) register rows-only.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_STOPLIST = ["the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
             "on", "with", "as", "was", "at", "by", "an", "be", "this", "are"]


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _mdm_replicas(sf_dir: str) -> int:
    if "0.1" in os.path.basename(os.path.normpath(sf_dir)):
        return 4
    return 1


def entry() -> Any:
    """Flagship: interleaved documents → normalize → block → score →
    threshold → cluster → survive → golden records."""
    from payor_linkage.pipeline import run_linkage
    from payor_linkage.synth import synth_documents

    res = run_linkage(synth_documents(1))
    return res.golden.drop_columns(["spans"]).to_pandas()


# ── SQL-checked queries ────────────────────────────────────────────────────


def q_normalize_text(sf_dir: str):
    """N2/N3-style vectorized normalizers over the documents table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        up = pc.utf8_upper(pc.utf8_trim_whitespace(b["text"]))
        return pa.table({
            "doc_id": b["doc_id"],
            "prefix6": pc.utf8_slice_codeunits(up, 0, 6),
            "no_vowels": pc.replace_substring_regex(b["text"], "[aeiou]", ""),
        })

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def q_block_counts(sf_dir: str):
    """U2-style blocking-key derivation + per-key counts (skew pre-pass)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def key(b: pa.Table) -> pa.Table:
        up = pc.utf8_upper(b["text"])
        k = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(up, 0, 6), b["lang"], "|")
        return pa.table({"bkey": k})

    out = _docs(sf_dir).map_batches(key, batch_format="pyarrow").groupby("bkey").count()
    return out.rename_columns({"count()": "n"})


def q_blocking_pairs(sf_dir: str):
    """J1-style canonical a<b pair generation within (source, lang) blocks."""
    from payor_linkage.dataops.dedup import blocked_pairs

    return blocked_pairs(_docs(sf_dir), ["source", "lang"], id_col="doc_id")


def q_charset_jaccard_pairs(sf_dir: str):
    """Pair scoring parity: character-set Jaccard (DuckDB jaccard())
    on the first 32 chars, over (source, lang) pairs, threshold 0.9."""
    from payor_linkage.dataops.dedup import ngram_jaccard_pairs
    import pyarrow as pa
    import pyarrow.compute as pc

    def trunc(b: pa.Table) -> pa.Table:
        return b.set_column(b.column_names.index("text"), "text",
                            pc.utf8_slice_codeunits(b["text"], 0, 32))

    ds = _docs(sf_dir).map_batches(trunc, batch_format="pyarrow")
    return ngram_jaccard_pairs(ds, ["source", "lang"], threshold=0.9, charset=True)


def q_exact_dedup(sf_dir: str):
    from payor_linkage.dataops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def q_events_by_type(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    ds = _events(sf_dir)
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))
    # distinct users per type: two-level aggregate (pre-distinct then count)
    dist = (ds.groupby(["event_type", "user_id"]).count()
            .groupby("event_type").count()
            .rename_columns({"count()": "n_users"}))
    import pyarrow as pa

    a = out.to_pandas().set_index("event_type")
    b = dist.to_pandas().set_index("event_type")
    return a.join(b).reset_index()


def q_top_events(sf_dir: str):
    return (_events(sf_dir)
            .select_columns(["event_id", "value"])
            .sort(["value", "event_id"], descending=[True, False])
            .limit(10))


def q_user_windows(sf_dir: str):
    """Tumbling 10-minute window counts per user (streaming-shaped op)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def win(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())  # microseconds
        w = pc.divide(us, 600_000_000)
        return pa.table({"user_id": b["user_id"], "win": pc.cast(w, pa.int64())})

    out = (_events(sf_dir).map_batches(win, batch_format="pyarrow")
           .groupby(["user_id", "win"]).count())
    return out.rename_columns({"count()": "n"})


def q_first_event(sf_dir: str):
    """Survivorship-style first-value per user by (ts, event_id)."""
    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).head(1)
        return pd.DataFrame({"user_id": g.user_id.to_numpy(),
                             "first_event_type": g.event_type.to_numpy()})

    return (_events(sf_dir).groupby("user_id")
            .map_groups(first, batch_format="pandas"))


def q_distinct_source_lang(sf_dir: str):
    out = _docs(sf_dir).groupby(["source", "lang"]).count()
    return out.drop_columns(["count()"])


def q_doc_stats(sf_dir: str):
    from payor_linkage.dataops.text import doc_stats

    return doc_stats(_docs(sf_dir)).drop_columns(["stop_ratio"])


def q_fingerprint(sf_dir: str):
    from payor_linkage.dataops.text import fingerprint

    return fingerprint(_docs(sf_dir)).drop_columns(["rolling_min_hash"])


def q_embedding_neardup(sf_dir: str):
    from payor_linkage.dataops.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(_emb(sf_dir), threshold=0.4)


def q_ann_topk(sf_dir: str):
    from payor_linkage.dataops.similarity import ann_topk

    return ann_topk(_emb(sf_dir), query_ids=[0, 1, 2, 3, 4], k=5)


# ── rows-only queries (non-SQL-expressible semantics) ──────────────────────


def q_minhash_lsh(sf_dir: str):
    from payor_linkage.dataops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5, shingle_k=5, bands=8)


def q_simhash(sf_dir: str):
    from payor_linkage.dataops.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir), max_hamming=16)


def q_ngram_jaccard(sf_dir: str):
    from payor_linkage.dataops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), ["source", "lang"], threshold=0.35, k=3)


def q_ivf_ann(sf_dir: str):
    from payor_linkage.dataops.similarity import ivf_topk

    return ivf_topk(_emb(sf_dir), query_ids=[0, 1, 2, 3, 4], k=5)


def q_lsh_neardup(sf_dir: str):
    from payor_linkage.dataops.similarity import lsh_neardup_pairs

    return lsh_neardup_pairs(_emb(sf_dir), threshold=0.4)


def q_lang_id(sf_dir: str):
    from payor_linkage.dataops.text import lang_id

    return lang_id(_docs(sf_dir))


def q_media_decode(sf_dir: str):
    """Multimodal plumbing: binary payload table → actor-pool decode."""
    import pyarrow as pa

    from payor_linkage.dataops.multimodal import decode_images, synth_media

    def as_ref(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"media_ref": pc.cast(b["doc_id"], pa.string())})

    media = synth_media(
        _docs(sf_dir).limit(200).map_batches(as_ref, batch_format="pyarrow"))
    return decode_images(media).drop_columns(["feature"])


_MDM_CACHE: dict = {}


def _mdm_result(sf_dir: str):
    """One pipeline run shared by all q_mdm_* queries in this process."""
    from payor_linkage.pipeline import run_linkage
    from payor_linkage.synth import synth_documents

    key = _mdm_replicas(sf_dir)
    if key not in _MDM_CACHE:
        _MDM_CACHE[key] = run_linkage(synth_documents(key))
    return _MDM_CACHE[key]


def q_mdm_golden(sf_dir: str):
    return _mdm_result(sf_dir).golden.drop_columns(["spans"])


def q_mdm_candidates(sf_dir: str):
    return _mdm_result(sf_dir).candidates.select_columns(
        ["candidate_id", "source_record_id_a", "source_record_id_b",
         "match_rule", "overall_score", "auto_decision", "final_decision"])


def q_mdm_groups(sf_dir: str):
    return _mdm_result(sf_dir).groups


def q_mdm_xref(sf_dir: str):
    return _mdm_result(sf_dir).xref


def q_mdm_hierarchy(sf_dir: str):
    return _mdm_result(sf_dir).hierarchy


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "q_normalize_text": q_normalize_text,
        "q_block_counts": q_block_counts,
        "q_blocking_pairs": q_blocking_pairs,
        "q_charset_jaccard_pairs": q_charset_jaccard_pairs,
        "q_exact_dedup": q_exact_dedup,
        "q_events_by_type": q_events_by_type,
        "q_top_events": q_top_events,
        "q_user_windows": q_user_windows,
        "q_first_event": q_first_event,
        "q_distinct_source_lang": q_distinct_source_lang,
        "q_doc_stats": q_doc_stats,
        "q_fingerprint": q_fingerprint,
        "q_embedding_neardup": q_embedding_neardup,
        "q_ann_topk": q_ann_topk,
        "q_minhash_lsh": q_minhash_lsh,
        "q_simhash": q_simhash,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_ivf_ann": q_ivf_ann,
        "q_lsh_neardup": q_lsh_neardup,
        "q_lang_id": q_lang_id,
        "q_media_decode": q_media_decode,
        "q_mdm_golden": q_mdm_golden,
        "q_mdm_candidates": q_mdm_candidates,
        "q_mdm_groups": q_mdm_groups,
        "q_mdm_xref": q_mdm_xref,
        "q_mdm_hierarchy": q_mdm_hierarchy,
    }


def oracle_sql() -> dict[str, str]:
    stop_sql = ", ".join(f"'{w}'" for w in _STOPLIST)
    return {
        "q_normalize_text": """
            SELECT doc_id,
                   substr(upper(trim(text)), 1, 6) AS prefix6,
                   regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels
            FROM documents
        """,
        "q_block_counts": """
            SELECT substr(upper(text), 1, 6) || '|' || lang AS bkey,
                   count(*) AS n
            FROM documents GROUP BY 1
        """,
        "q_blocking_pairs": """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM documents a JOIN documents b
              ON a.source = b.source AND a.lang = b.lang
             AND a.doc_id < b.doc_id
        """,
        "q_charset_jaccard_pairs": """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(jaccard(substr(a.text, 1, 32), substr(b.text, 1, 32)), 4) AS jaccard
            FROM documents a JOIN documents b
              ON a.source = b.source AND a.lang = b.lang
             AND a.doc_id < b.doc_id
            WHERE round(jaccard(substr(a.text, 1, 32), substr(b.text, 1, 32)), 4) >= 0.9
        """,
        "q_exact_dedup": """
            SELECT text, min(doc_id) AS keeper_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "q_events_by_type": """
            SELECT event_type, count(*) AS n,
                   min(value) AS min_value, max(value) AS max_value,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "q_top_events": """
            SELECT event_id, value FROM events
            ORDER BY value DESC, event_id LIMIT 10
        """,
        "q_user_windows": """
            SELECT user_id,
                   CAST(floor(epoch(ts) / 600) AS BIGINT) AS win,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "q_first_event": """
            SELECT user_id, event_type AS first_event_type
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) = 1
        """,
        "q_distinct_source_lang": """
            SELECT DISTINCT source, lang FROM documents
        """,
        "q_doc_stats": f"""
            SELECT doc_id,
                   length(text) AS n_chars_calc,
                   len(string_split(text, ' ')) AS n_words,
                   len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens,
                   len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                   len(list_filter(string_split(text, ' '),
                                   x -> list_contains([{stop_sql}], lower(x)))) AS n_stop
            FROM documents
        """,
        "q_fingerprint": """
            SELECT doc_id, md5(text) AS md5 FROM documents
        """,
        "q_embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        "q_ann_topk": """
            SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
                SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) DESC,
                           b.vec_id) AS rank
                FROM embeddings q JOIN embeddings b ON b.vec_id != q.vec_id
                WHERE q.vec_id IN (0, 1, 2, 3, 4)
            ) WHERE rank <= 5
        """,
    }

"""Text-analysis operators: token stats / quality, language-ID,
fingerprinting. Vectorized (pyarrow.compute / numpy) per batch."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
           "on", "with", "as", "was", "at", "by", "an", "be", "this", "are"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit",
           "auf", "für", "von", "den", "des", "zu", "im"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "dans",
           "pour", "que", "qui", "avec", "sur", "au"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "en",
           "que", "por", "con", "para", "del", "se"},
}

# a BPE-ish tokenizer regex: word pieces OR single non-space punctuation
TOKEN_RE = r"\w+|[^\w\s]"


def doc_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Quality-scoring stats per document — all integer counts plus one
    deterministic rounded ratio (oracle-parity-safe):
    n_chars_calc, n_words (single-space split), n_tokens (TOKEN_RE
    matches), n_punct, n_stop (English stopwords), stop_ratio round 4."""
    stops = _STOPWORDS["en"]

    def stats(b: pa.Table) -> pa.Table:
        text = b[text_col]
        n_chars = pc.utf8_length(text)
        words = pc.split_pattern(text, " ")
        n_words = pc.list_value_length(words)
        n_tokens = pc.count_substring_regex(text, TOKEN_RE)
        n_punct = pc.count_substring_regex(text, r"[^\w\s]")
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(pc.utf8_lower(flat),
                           value_set=pa.array(sorted(stops))).to_numpy(zero_copy_only=False)
        n_stop = np.zeros(b.num_rows, dtype=np.int64)
        np.add.at(n_stop, parents[is_stop], 1)
        ratio = [round(s / w, 4) if w else 0.0
                 for s, w in zip(n_stop, n_words.to_pylist())]
        return pa.table({
            id_col: b[id_col],
            "n_chars_calc": pc.cast(n_chars, pa.int64()),
            "n_words": pc.cast(n_words, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_punct": pc.cast(n_punct, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "stop_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


class LangId:
    """Actor-pool language-ID: stopword-hit-rate heuristic per language —
    dictionaries compiled once per actor. ``emit_counts=True`` outputs
    integer (n_hits, n_toks) instead of the float confidence ratio — the
    DuckDB-oracle-safe shape (no computed float ratios)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 emit_counts: bool = False):
        self.text_col, self.id_col = text_col, id_col
        self.emit_counts = emit_counts
        self.tables = {lang: frozenset(words) for lang, words in _STOPWORDS.items()}

    def __call__(self, b: pa.Table) -> pa.Table:
        preds, confs, hits_out, toks_out = [], [], [], []
        for t in b[self.text_col].to_pylist():
            toks = [w.lower() for w in t.split()]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                hits_out.append(0)
                toks_out.append(0)
                continue
            hits = {lang: sum(w in tbl for w in toks)
                    for lang, tbl in self.tables.items()}
            # alphabetically-first language among tied max hit counts
            best = max(sorted(hits), key=hits.get)
            preds.append(best if hits[best] > 0 else "und")
            confs.append(round(hits[best] / len(toks), 4))
            hits_out.append(hits[best])
            toks_out.append(len(toks))
        cols = {self.id_col: b[self.id_col],
                "lang_pred": pa.array(preds, pa.string())}
        if self.emit_counts:
            cols["n_hits"] = pa.array(hits_out, pa.int64())
            cols["n_toks"] = pa.array(toks_out, pa.int64())
        else:
            cols["lang_conf"] = pa.array(confs, pa.float64())
        return pa.table(cols)


def lang_id(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
            emit_counts: bool = False) -> Dataset:
    return ds.map_batches(LangId, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                                     emit_counts=emit_counts),
                          concurrency=(1, 4), batch_size=2048)


def fingerprint(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Content fingerprints: md5 (oracle-parity) + a polynomial rolling
    hash over 8-byte windows (winnowing-style min-window signature),
    fully vectorized: every window hash of a document is one
    sliding_window_view × power-vector dot product in uint64 (31-bit
    modulus keeps the products overflow-free)."""
    MOD = (1 << 31) - 1
    BASE = 257
    W = 8
    PW = np.array([pow(BASE, W - 1 - j, MOD) for j in range(W)], dtype=np.uint64)

    def roll_one(data: bytes) -> int:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        if len(arr) == 0:
            return 0
        if len(arr) < W:
            pw = np.array([pow(BASE, len(arr) - 1 - j, MOD) for j in range(len(arr))],
                          dtype=np.uint64)
            return int((arr * pw).sum() % MOD)
        win = np.lib.stride_tricks.sliding_window_view(arr, W)
        h = (win * PW[None, :]).sum(axis=1) % MOD
        return int(h.min())

    def fp(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        rolls = [roll_one(t.encode()) for t in texts]
        return pa.table({
            id_col: b[id_col],
            "md5": pa.array(md5s, pa.string()),
            "rolling_min_hash": pa.array(rolls, pa.uint64()),
        })

    return ds.map_batches(fp, batch_format="pyarrow")


def token_topk(ds: Dataset, k: int = 50, text_col: str = "text") -> Dataset:
    """Top-k most frequent tokens across the corpus (heavy hitters).

    Tokenization: lowercase, split on runs of non-[a-z0-9] (ASCII word
    chars — chosen so a SQL oracle's regexp_split reproduces it exactly).
    Scale shape: per-batch partial counts (one small table per batch,
    bounded by the batch vocabulary) → one grouped sum over tokens →
    sort + limit k. The shuffle moves vocabularies, never token streams.
    Ties break deterministically by (count desc, token asc)."""
    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b[text_col]), "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Sum

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n")))
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


def token_explode(ds: Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> Dataset:
    """Explode / flat_map / UNNEST WITH ORDINALITY: one output row per
    token occurrence with its 1-based position among the document's
    (non-empty) tokens. Same tokenization contract as ``token_topk``
    (lowercase, split on runs of non-[a-z0-9]). Fully vectorized: list
    offsets → parent repeat → run-relative arange; row counts multiply
    but no Python loop ever touches a row."""
    import numpy as np

    def ex(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b[text_col]), "[^a-z0-9]+").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        parents = np.repeat(ids, lens)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parents = parents[mask]
        flat = flat.filter(pa.array(mask))
        # positions among kept tokens: runs of equal parent are contiguous
        starts = np.nonzero(np.concatenate(
            [[True], parents[1:] != parents[:-1]]))[0]
        run_lens = np.diff(np.concatenate([starts, [len(parents)]]))
        pos = np.arange(len(parents), dtype=np.int64) - \
            np.repeat(starts, run_lens) + 1
        return pa.table({id_col: pa.array(parents),
                         "token": flat,
                         "pos": pa.array(pos, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        ex, batch_format="pyarrow")


def hash_sample(ds: Dataset, rate: float, id_col: str = "doc_id") -> Dataset:
    """Deterministic hash-based sampling: keep rows whose
    md5(str(id)) 8-hex-digit prefix falls below ``rate`` of the space.
    Reproducible across runs/processes (no RNG state — Python's hash()
    is process-randomized, md5 is not) and expressible exactly in SQL as
    a string compare on the md5 hex, so the oracle gate is byte-exact.
    Pure per-batch filter — no shuffle, no driver work."""
    # clamp: at rate ≥ 1 the bound would overflow 8 hex digits ('1' +
    # 8 zeros) and the fixed-width string compare would invert — 'g'
    # sorts above every hex digit, keeping all rows
    bound = "g" if rate >= 1.0 else format(max(0, int(rate * (1 << 32))), "08x")

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        mask = [hashlib.md5(str(i).encode()).hexdigest()[:8] < bound
                for i in ids]
        return b.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")

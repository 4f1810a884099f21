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


def grouped_token_topk(ds: Dataset, group_col: str, k: int = 10,
                       text_col: str = "text") -> Dataset:
    """Per-group top-k tokens (the vocabulary profile per language /
    source): same tokenization contract as ``token_topk``. Per-batch
    (group, token) partial counts → one grouped sum (the exchange moves
    vocabularies, never token streams) → per-group top-k with 1-based
    rank, ties (count desc, token asc).

    The string tiebreak rules out ``grouped_topk`` (numeric-tie
    contract); the final selection is a grouped_apply whose run kernel
    sorts (run, n desc, token) with ``pc.sort_indices`` — a C-level
    sort, never a Python string compare."""
    import numpy as np

    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import grouped_apply

    gt = ds.schema().base_schema.field(group_col).type

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b[text_col]), "[^a-z0-9]+").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        gvals = b[group_col].combine_chunks().take(
            pa.array(np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)))
        mask = pc.not_equal(flat, "")
        t = pa.table({group_col: gvals.filter(mask),
                      "token": flat.filter(mask)})
        agg = t.group_by([group_col, "token"]).aggregate([([], "count_all")])
        return agg.rename_columns([group_col, "token", "n"])

    counts = (ds.select_columns([group_col, text_col])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "token"])
              .aggregate(Sum("n", alias_name="n")))

    out_schema = pa.schema([(group_col, gt), ("token", pa.string()),
                            ("n", pa.int64()), ("rank", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        sub = pa.table({
            "rid": pa.array(rid),
            "n": b["n"].combine_chunks().slice(lo, hi - lo),
            "token": b["token"].combine_chunks().slice(lo, hi - lo)})
        order = pc.sort_indices(sub, sort_keys=[
            ("rid", "ascending"), ("n", "descending"),
            ("token", "ascending")]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        r = rid[order]
        run_starts = np.nonzero(np.concatenate([[True], r[1:] != r[:-1]]))[0]
        rlens = np.diff(np.concatenate([run_starts, [len(r)]]))
        pos = np.arange(len(r), dtype=np.int64) - np.repeat(run_starts, rlens)
        m = pos < k
        take = pa.array(order[m] + lo)
        return pa.table({group_col: b[group_col].take(take),
                         "token": b["token"].take(take),
                         "n": b["n"].take(take),
                         "rank": pa.array(pos[m] + 1, pa.int64())}) \
            .cast(out_schema)

    return grouped_apply(counts, group_col, out_schema=out_schema,
                         runs_fn=runs)


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


def hash_sample(ds: Dataset, rate: float, id_col: str = "doc_id",
                complement: bool = False) -> Dataset:
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
        mask = [(hashlib.md5(str(i).encode()).hexdigest()[:8] < bound)
                != complement for i in ids]
        return b.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")

# ── cross-corpus n-gram decontamination ────────────────────────────────────

def _char_kgram_ids(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char k-gram extraction for a whole batch: one string
    join → UTF-32 codepoint array → per-doc window starts → pack the k
    codepoints of each gram into one int64 (21 bits per codepoint —
    injective for k ≤ 3, every Unicode codepoint < 2^21). Docs shorter
    than k yield no grams. Returns (row_of, gram_ids)."""
    assert k <= 3, "21-bit packing holds at most 3 codepoints per int64"
    n = len(texts)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    lens = np.fromiter((len(t) for t in texts), np.int64, n)
    counts = np.maximum(lens - k + 1, 0)
    doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    total = int(counts.sum())
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    starts = np.repeat(doc_start, counts) + within
    gram = np.zeros(total, dtype=np.int64)
    for j in range(k):
        gram = (gram << 21) | cp[starts + j].astype(np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    return row_of, gram


def distinct_gram_set(ds: Dataset, text_col: str = "text",
                      k: int = 3) -> np.ndarray:
    """Global distinct packed char-k-gram ids of a corpus, as a sorted
    int64 array. Per-batch distinct first (bounded emission), then a
    global distinct aggregate; the result is bounded by the corpus'
    alphabet^k, not its row count — safe to collect and broadcast."""
    def per_batch(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        _, grams = _char_kgram_ids(texts, k)
        return pa.table({"gram": pa.array(np.unique(grams), pa.int64())})

    grams = (ds.select_columns([text_col])
             .map_batches(per_batch, batch_format="pyarrow")
             .unique("gram"))
    # empty corpus → unique() yields None / [None]
    grams = [g for g in (grams or []) if g is not None]
    return np.sort(np.asarray(grams, dtype=np.int64))


def contamination_counts(train_ds: Dataset, test_ds: Dataset,
                         text_col: str = "text", id_col: str = "doc_id",
                         k: int = 3,
                         carry_cols: list[str] | None = None) -> Dataset:
    """Train/test decontamination scan: for every train document of at
    least ``k`` chars, count its distinct char k-grams and how many of
    them occur anywhere in the test corpus.

    Scale shape: the test side reduces to a bounded distinct-gram set
    (alphabet^k), broadcast once via ``ray.put`` and probed per batch
    with one ``searchsorted`` — the train side streams with no shuffle.
    Integer outputs keep SQL oracle parity exact."""
    import ray

    test_grams = distinct_gram_set(test_ds, text_col=text_col, k=k)
    ref = ray.put(test_grams)

    def count(b: pa.Table) -> pa.Table:
        tg = ray.get(ref)
        texts = b[text_col].to_pylist()
        row_of, grams = _char_kgram_ids(texts, k)
        # per-doc distinct grams: sort by (row, gram), drop adjacent dups
        order = np.lexsort((grams, row_of))
        r, g = row_of[order], grams[order]
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
        r, g = r[keep], g[keep]
        if len(tg):
            idx = np.searchsorted(tg, g)
            np.clip(idx, 0, len(tg) - 1, out=idx)
            member = tg[idx] == g
        else:
            member = np.zeros(len(g), dtype=bool)
        n_rows = b.num_rows
        n_grams = np.bincount(r, minlength=n_rows).astype(np.int64)
        n_contam = np.bincount(r, weights=member, minlength=n_rows) \
            .astype(np.int64)
        mask = n_grams > 0  # docs shorter than k carry no grams
        pam = pa.array(mask)
        cols = {id_col: b[id_col].filter(pam)}
        for c in carry_cols or []:
            cols[c] = b[c].filter(pam)
        cols["n_grams"] = pa.array(n_grams[mask])
        cols["n_contaminated"] = pa.array(n_contam[mask])
        return pa.table(cols)

    proj = [id_col, text_col] + [c for c in (carry_cols or [])
                                 if c not in (id_col, text_col)]
    return train_ds.select_columns(proj).map_batches(
        count, batch_format="pyarrow")

# ── per-document top term + document frequency (integer TF-IDF core) ───────

def _tokenize_flat(b: pa.Table, text_col: str):
    """Shared tokenization contract (lowercase, split on runs of
    non-[a-z0-9], drop empties): returns (row_of, tokens)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(b[text_col]), "[^a-z0-9]+").combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(toks)
    row_of = np.repeat(np.arange(b.num_rows, dtype=np.int64), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return row_of[mask], flat.filter(pa.array(mask))


def top_term_df(ds: Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> Dataset:
    """Per-document top token (tf DESC, token ASC) with that token's
    global document frequency — the integer core of TF-IDF scoring.

    Scale shape: a document never spans batches, so term frequency and
    the per-document winner are computed entirely inside each batch (no
    shuffle); the only wide ops are the bounded-vocabulary df aggregate
    and a broadcast lookup to attach df to the winners. Two streaming
    passes over the text, no full materialization."""
    import ray.data  # noqa: F401  (Dataset ops)
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    def winners(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        if len(row_of) == 0:
            return pa.table({id_col: b[id_col].slice(0, 0),
                             "top_token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        t = pa.table({"r": pa.array(row_of), "token": flat}) \
            .group_by(["r", "token"]).aggregate([([], "count_all")])
        r = t["r"].to_numpy(zero_copy_only=False)
        n = t["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = t["token"].combine_chunks()
        trank = np.empty(len(r), dtype=np.int64)
        trank[pc.sort_indices(toks).to_numpy(zero_copy_only=False)
              .astype(np.int64)] = np.arange(len(r))
        order = np.lexsort((trank, -n, r))
        rs = r[order]
        first = order[np.concatenate([[True], rs[1:] != rs[:-1]])]
        take = pa.array(first)
        return pa.table({
            id_col: b[id_col].take(pa.array(r[first])),
            "top_token": toks.take(take),
            "tf": pa.array(n[first], pa.int64()),
        })

    def df_partial(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        t = pa.table({"r": pa.array(row_of), "token": flat})
        # distinct (doc, token) then token→doc-count: docs are whole
        # within a batch, so per-batch counts sum to the global df
        d = t.group_by(["r", "token"]).aggregate([])
        return d.group_by("token").aggregate([([], "count_all")]) \
            .rename_columns(["token", "df"])

    proj = ds.select_columns([id_col, text_col])
    win = proj.map_batches(winners, batch_format="pyarrow")
    df = (proj.map_batches(df_partial, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("df", alias_name="df")))
    return lookup_join(win.rename_columns({"top_token": "token"}), df,
                       on="token").rename_columns({"token": "top_token"})


def _token_ngrams(b: pa.Table, text_col: str, n: int):
    """Vectorized consecutive token n-grams per row: tokenize flat, then
    align n shifted views of the flat token array and join with spaces —
    one Arrow C-kernel concat, no per-row Python. Returns
    (row_of, gram_strings) for rows with ≥ n tokens."""
    row_of, flat = _tokenize_flat(b, text_col)
    total = len(row_of)
    if total < n:
        return (np.empty(0, np.int64),
                pa.array([], pa.string()))
    cut = total - n + 1
    valid = row_of[:cut] == row_of[n - 1:]
    views = [flat.slice(j, cut) for j in range(n)]
    grams = pc.binary_join_element_wise(*views, " ")
    pam = pa.array(valid)
    return row_of[:cut][valid], grams.filter(pam)


def token_ngram_contamination(train_ds: Dataset, test_ds: Dataset,
                              n: int = 3, text_col: str = "text",
                              id_col: str = "doc_id",
                              carry_cols: list[str] | None = None) -> Dataset:
    """Train/test decontamination on consecutive TOKEN n-grams (the
    published-decontamination shape — char grams saturate, token 3+-grams
    discriminate): per train doc, its distinct token-n-gram count and how
    many occur anywhere in the test corpus.

    Scale shape: the test side reduces to a distinct gram-string set
    (bounded by total test tokens — eval sets are small by contract),
    broadcast once and probed with one ``pc.is_in`` C kernel per batch;
    the train side streams with no shuffle."""
    import ray

    def test_partial(b: pa.Table) -> pa.Table:
        _, grams = _token_ngrams(b, text_col, n)
        return pa.table({"gram": grams.unique()})

    grams = (test_ds.select_columns([text_col])
             .map_batches(test_partial, batch_format="pyarrow")
             .unique("gram"))
    grams = [g for g in (grams or []) if g is not None]
    ref = ray.put(pa.array(sorted(grams), pa.string()))

    def count(b: pa.Table) -> pa.Table:
        tg = ray.get(ref)
        row_of, gram_arr = _token_ngrams(b, text_col, n)
        # per-doc distinct via dictionary codes (int sort, no string cmp)
        enc = gram_arr.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, row_of))
        r, g = row_of[order], codes[order]
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
        r = r[keep]
        kept_grams = gram_arr.take(pa.array(order[keep]))
        member = pc.is_in(kept_grams, value_set=tg) \
            .to_numpy(zero_copy_only=False) if len(tg) \
            else np.zeros(len(r), dtype=bool)
        n_rows = b.num_rows
        n_grams = np.bincount(r, minlength=n_rows).astype(np.int64)
        n_contam = np.bincount(r, weights=member, minlength=n_rows) \
            .astype(np.int64)
        mask = n_grams > 0  # rows with < n tokens carry no grams
        pam = pa.array(mask)
        cols = {id_col: b[id_col].filter(pam)}
        for c in carry_cols or []:
            cols[c] = b[c].filter(pam)
        cols["n_grams"] = pa.array(n_grams[mask])
        cols["n_contaminated"] = pa.array(n_contam[mask])
        return pa.table(cols)

    proj = [id_col, text_col] + [c for c in (carry_cols or [])
                                 if c not in (id_col, text_col)]
    return train_ds.select_columns(proj).map_batches(
        count, batch_format="pyarrow")


def json_int_field(ds: Dataset, col: str, field: str,
                   id_col: str = "event_id",
                   out_col: str | None = None) -> Dataset:
    """Extract an integer field from a JSON string column — the
    schema-on-read ETL step. Fast path: ONE vectorized RE2
    ``extract_regex`` kernel per batch; rows the pattern misses
    (unusual spacing / nesting) fall back to a real ``json.loads`` so
    exactness never depends on the regex. Missing field → null."""
    import json
    import re

    out = out_col or field
    pat = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d+)'

    def f(b: pa.Table) -> pa.Table:
        s = b[col].combine_chunks()
        ex = pc.extract_regex(s, pat)
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        miss = pc.invert(pc.is_valid(ex)).to_numpy(zero_copy_only=False)
        if miss.any():
            fixed = vals.to_pylist()
            py = s.to_pylist()
            for i in np.nonzero(miss)[0]:
                try:
                    v = json.loads(py[i]).get(field)
                    fixed[i] = int(v) if v is not None else None
                except (ValueError, TypeError, AttributeError):
                    fixed[i] = None
            vals = pa.array(fixed, pa.int64())
        return pa.table({id_col: b[id_col], out: vals})

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow")


def regex_redact(ds: Dataset, col: str, pattern: str,
                 replacement: str = "#",
                 id_col: str = "event_id") -> Dataset:
    """PII / sensitive-token scrubbing: replace every match of an RE2
    pattern in ``col`` and report the per-row redaction count — the
    standard pre-training privacy pass (emails, phone numbers, ids).

    Map-only (no shuffle), two vectorized RE2 C kernels per batch
    (``replace_substring_regex`` + ``count_substring_regex``). Both
    pyarrow and DuckDB compile RE2, so an oracle's ``regexp_replace(...,
    'g')`` reproduces the replacement byte-for-byte — no dialect skew."""
    def f(b: pa.Table) -> pa.Table:
        s = b[col]
        return pa.table({
            id_col: b[id_col],
            "redacted": pc.replace_substring_regex(s, pattern, replacement),
            "n_redacted": pc.cast(
                pc.count_substring_regex(s, pattern), pa.int64()),
        })

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow")


def repetition_stats(ds: Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> Dataset:
    """Gopher-style repetition / boilerplate quality signals per
    document, all integers (oracle-parity-safe): total token count,
    distinct token count, and the most-frequent token with its count
    (count DESC, token ASC tie-break). High ``top_count / n_words`` or
    low ``n_distinct / n_words`` flags repetitious documents for corpus
    filtering — the ratio itself is left to the consumer so no computed
    float crosses the compare.

    Same tokenization contract as ``token_topk`` (lowercase, split on
    runs of non-[a-z0-9]). A document never spans batches, so everything
    is computed inside the batch — no shuffle. The per-(doc, token)
    counts come from one Arrow ``group_by`` C kernel; the winner pick is
    a lexsort over (doc, -count, token-rank) with token order remapped
    through ``pc.sort_indices`` so no object-dtype string compare runs
    in Python."""
    out_schema = pa.schema([
        (id_col, ds.schema().base_schema.field(id_col).type),
        ("n_words", pa.int64()), ("n_distinct", pa.int64()),
        ("top_count", pa.int64()), ("top_token", pa.string()),
    ])

    def stats(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        if len(row_of) == 0:
            return out_schema.empty_table()
        t = pa.table({"r": pa.array(row_of), "token": flat}) \
            .group_by(["r", "token"]).aggregate([([], "count_all")])
        r = t["r"].to_numpy(zero_copy_only=False)
        n = t["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = t["token"].combine_chunks()
        trank = np.empty(len(r), dtype=np.int64)
        trank[pc.sort_indices(toks).to_numpy(zero_copy_only=False)
              .astype(np.int64)] = np.arange(len(r))
        order = np.lexsort((trank, -n, r))
        rs = r[order]
        first = order[np.concatenate([[True], rs[1:] != rs[:-1]])]
        n_rows = b.num_rows
        n_words = np.bincount(row_of, minlength=n_rows).astype(np.int64)
        n_distinct = np.bincount(r, minlength=n_rows).astype(np.int64)
        mask = n_words > 0  # token-free docs carry no stats row
        docs = np.nonzero(mask)[0]
        # `first` rows are in doc order over exactly the docs with tokens
        take = pa.array(first)
        return pa.table({
            id_col: b[id_col].take(pa.array(r[first])),
            "n_words": pa.array(n_words[docs], pa.int64()),
            "n_distinct": pa.array(n_distinct[docs], pa.int64()),
            "top_count": pa.array(n[first], pa.int64()),
            "top_token": toks.take(take),
        }).cast(out_schema)

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow")


def keyed_hash_sample(ds: Dataset, key_col: str, rates: dict[str, float],
                      default_rate: float = 1.0,
                      id_col: str = "doc_id") -> Dataset:
    """Per-key deterministic downsampling — the corpus-mixing primitive
    "keep 10% of web, 100% of books": each row keeps iff its
    md5(str(id)) 8-hex prefix falls below ITS KEY'S rate of the space.
    Same hashing contract as ``hash_sample`` (md5, never Python's
    process-randomized ``hash()``), so a SQL ``CASE key`` oracle compares
    byte-exact. Pure per-batch filter — no shuffle, no driver work, and
    the key→bound map is a tiny per-batch dictionary lookup."""
    def bound_of(rate: float) -> str:
        return "g" if rate >= 1.0 else \
            format(max(0, int(rate * (1 << 32))), "08x")

    bounds = {k: bound_of(r) for k, r in rates.items()}
    default_bound = bound_of(default_rate)

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        keys = b[key_col].to_pylist()
        mask = [hashlib.md5(str(i).encode()).hexdigest()[:8]
                < bounds.get(k, default_bound)
                for i, k in zip(ids, keys)]
        return b.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def chunk_documents(ds: Dataset, size: int, text_col: str = "text",
                    id_col: str = "doc_id") -> Dataset:
    """Split every document into fixed-width character chunks (the
    chunk-for-embedding step): one output row per chunk with its 0-based
    index. Chunks tile the document exactly (last one short); empty
    documents emit no rows.

    Scale shape: map-only (rows multiply but nothing shuffles). Fast
    path for all-ASCII batches is ZERO-COPY: consecutive chunks of
    consecutive documents tile the Arrow value buffer, so the output
    string array is rebuilt from the SAME data buffer with a new
    vectorized offsets vector (``StringArray.from_buffers``) — no chunk
    string is ever materialized in Python. Non-ASCII batches fall back
    to per-row codepoint slicing (character semantics match SQL's
    ``substr``)."""
    out_schema_fields = [
        (id_col, None), ("chunk_idx", pa.int64()), ("chunk", pa.string())]

    def chunks(b: pa.Table) -> pa.Table:
        id_arr = b[id_col]
        txt = b[text_col].combine_chunks()
        if txt.null_count:
            raise ValueError("chunk_documents: null text")
        nchars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_chunks = (nchars + size - 1) // size  # 0 for empty docs
        total = int(n_chunks.sum())
        parent = np.repeat(np.arange(b.num_rows, dtype=np.int64), n_chunks)
        cum = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, n_chunks)
        if total == 0:
            return pa.table({
                id_col: id_arr.slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            })
        nbytes = pc.binary_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if (nchars == nbytes).all() and not pa.types.is_large_string(
                txt.type):  # large_string has int64 offsets — fallback
            # all-ASCII: chunk boundaries are byte offsets into the
            # existing value buffer — rebuild offsets, share the data
            arr = txt
            old_off = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                                    count=len(arr) + 1,
                                    offset=arr.offset * 4).astype(np.int64)
            doc_start = old_off[:-1]
            ends = (doc_start[parent]
                    + np.minimum((within + 1) * size, nchars[parent]))
            first_start = doc_start[parent[0]] if total else 0
            new_off = np.concatenate(
                [[first_start], ends]).astype(np.int32)
            chunk_arr = pa.StringArray.from_buffers(
                total, pa.py_buffer(new_off.tobytes()), arr.buffers()[2])
        else:
            texts = txt.to_pylist()
            chunk_arr = pa.array(
                [texts[p][w * size:(w + 1) * size]
                 for p, w in zip(parent, within)], pa.string())
        return pa.table({
            id_col: id_arr.take(pa.array(parent)),
            "chunk_idx": pa.array(within, pa.int64()),
            "chunk": chunk_arr,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pyarrow")


# ── retrieval: query-term scoring + top-k ──────────────────────────────────


def _term_counts(b: pa.Table, text_col: str, terms: list[str]) -> np.ndarray:
    """(n_rows, n_terms) occurrence counts, vectorized: one split per
    batch, one is_in per term over the flattened tokens."""
    toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col]), r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    out = np.zeros((b.num_rows, len(terms)), dtype=np.int64)
    for ti, t in enumerate(terms):
        hit = pc.equal(flat, t)
        idx = parent[hit.to_numpy(zero_copy_only=False)]
        np.add.at(out[:, ti], idx, 1)
    return out


def term_match_topk(ds: Dataset, terms: list[str], k: int = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> Dataset:
    """Top-k documents by total query-term occurrences (the integer
    retrieval core — BM25 without the float weighting, so the SQL
    oracle compares byte-exact). Per-block partial top-k (score > 0,
    ties broken score desc / id asc) then one tiny final merge — no
    global sort of the corpus."""
    terms = sorted(set(t.lower() for t in terms))

    def partial(b: pa.Table) -> pa.Table:
        score = _term_counts(b, text_col, terms).sum(axis=1)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        live = score > 0
        ids, score = ids[live], score[live]
        if len(ids) > k:
            order = np.lexsort((ids, -score))[:k]
            ids, score = ids[order], score[order]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "score": pa.array(score, pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        score = b["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "score": pa.array(score[order], pa.int64())})

    return (ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def bm25_topk(ds: Dataset, terms: list[str], k: int = 20, k1: float = 1.5,
              b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> Dataset:
    """BM25 top-k: the float-weighted sibling of `term_match_topk`.
    Two bounded driver scalars (N, avg doc length) + one per-query-term
    df aggregate feed the idf weights; scoring is one vectorized pass
    (per-block partial top-k, tiny final merge). Float scores are
    order-INDEPENDENT here (each doc's score is a fixed-order sum over
    the query terms), but SQL would still recompute logs differently →
    pytest-gated against a numpy reference instead of DuckDB."""
    import math

    terms = sorted(set(t.lower() for t in terms))

    slim = ds.select_columns([id_col, text_col]).materialize()

    def len_tbl(bt: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(bt[text_col]), r"\s+")
        nt = pc.list_value_length(toks)
        return pa.table({"n": pc.cast(nt, pa.int64())})

    lens = slim.map_batches(len_tbl, batch_format="pyarrow")
    n_docs = slim.count()
    if n_docs == 0:
        return slim.map_batches(lambda bt: pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}), batch_format="pyarrow")
    avg_len = (lens.sum("n") or 0) / n_docs

    def df_tbl(bt: pa.Table) -> pa.Table:
        cnt = _term_counts(bt, text_col, terms)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array((cnt > 0).sum(axis=0), pa.int64())})

    df_rows = slim.map_batches(df_tbl, batch_format="pyarrow") \
        .groupby("term").sum("df")
    dfm = {r["term"]: r["sum(df)"] for r in df_rows.take_all()}
    idf = np.array([math.log(1.0 + (n_docs - dfm.get(t, 0) + 0.5)
                             / (dfm.get(t, 0) + 0.5)) for t in terms])

    def partial(bt: pa.Table) -> pa.Table:
        tf = _term_counts(bt, text_col, terms).astype(np.float64)
        toks = pc.split_pattern_regex(pc.utf8_lower(bt[text_col]), r"\s+")
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avg_len)
        score = (idf[None, :] * tf * (k1 + 1.0)
                 / (tf + norm[:, None])).sum(axis=1)
        ids = bt[id_col].to_numpy(zero_copy_only=False)
        live = score > 0
        ids, score = ids[live], score[live]
        if len(ids) > k:
            order = np.lexsort((ids, -score))[:k]
            ids, score = ids[order], score[order]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "score": pa.array(score, pa.float64())})

    def final(bt: pa.Table) -> pa.Table:
        ids = bt[id_col].to_numpy(zero_copy_only=False)
        score = bt["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -score))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "score": pa.array(score[order], pa.float64())})

    return (slim.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def build_vocab(ds: Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> Dataset:
    """Tokenizer-vocabulary construction: every corpus token with its
    document frequency and a dense integer id ranked (df DESC, token
    ASC) — the id table a downstream encoder broadcasts.

    Scale shape: per-batch per-document-distinct df partials (documents
    never straddle batches, so per-batch doc counts Sum to the exact
    global df), ONE bounded grouped Sum over the vocabulary, then ids
    via the distributed ROW_NUMBER prefix construction
    (``reshape.global_ntile``'s shape) — the vocab is never collected
    to the driver. Tokenization contract shared with ``token_topk`` /
    ``token_explode`` (lowercase, split on runs of non-[a-z0-9])."""
    from ray.data.aggregate import Sum

    from payor_linkage.dataops.reshape import global_ntile

    def df_partial(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        t = pa.table({"r": pa.array(row_of), "token": flat})
        d = t.group_by(["r", "token"]).aggregate([])
        return d.group_by("token").aggregate([([], "count_all")]) \
            .rename_columns(["token", "df"])

    df = (ds.select_columns([id_col, text_col])
          .map_batches(df_partial, batch_format="pyarrow")
          .groupby("token").aggregate(Sum("df", alias_name="df")))
    neg = df.map_batches(
        lambda b: pa.table({"neg_df": pc.negate(pc.cast(b["df"], pa.int64())),
                            "token": b["token"]}),
        batch_format="pyarrow")
    ranked = global_ntile(neg, ["neg_df", "token"], k=1,
                          out_rn="token_id", out_bucket="_b")
    return ranked.map_batches(
        lambda b: pa.table({"token": b["token"],
                            "df": pc.negate(b["neg_df"]),
                            "token_id": b["token_id"]}),
        batch_format="pyarrow")


def encode_tokens(ds: Dataset, vocab: Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> Dataset:
    """Token-id encoding: the corpus exploded to (doc_id, pos, token_id)
    against a ``build_vocab`` table — the tokenize-and-encode pass every
    training-data pipeline ends with.

    Scale shape: the vocab (bounded — vocabularies grow sublinearly in
    corpus size) is collected ONCE in id order and broadcast via
    ``ray.put``; each batch maps token→id with a single ``pc.index_in``
    hash probe against the shared Arrow array — zero Python per token,
    no shuffle beyond ``token_explode``'s map. Above broadcast scale
    (~50M terms) swap for ``rayutil.smart_join`` on token."""
    import ray

    vt = vocab.select_columns(["token", "token_id"]).to_pandas()
    order = np.argsort(vt["token_id"].to_numpy())
    ref = ray.put(pa.array(vt["token"].to_numpy()[order], pa.string()))

    def enc(b: pa.Table) -> pa.Table:
        toks = ray.get(ref)
        ids = pc.add(pc.index_in(b["token"], value_set=toks), 1)
        return pa.table({id_col: b[id_col], "pos": b["pos"],
                         "token_id": pc.cast(ids, pa.int64())})

    return token_explode(ds, id_col, text_col).map_batches(
        enc, batch_format="pyarrow")


def _word_counts(ds: Dataset, text_col: str) -> Dataset:
    """Bounded distinct-word count table: the ONE corpus-scale pass of
    BPE training (per-block Arrow group_by partials, one grouped Sum).
    Words use the shared tokenization contract, so they are pure
    [a-z0-9]+ ASCII — every later stage exploits single-byte chars."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        _, flat = _tokenize_flat(b, text_col)
        t = pa.table({"word": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        return t.group_by("word").aggregate([("n", "sum")]) \
            .rename_columns(["word", "n"])

    return (ds.select_columns([text_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _words_to_symbols(b: pa.Table) -> pa.Table:
    """Explode each ASCII word into a list of 1-char symbol strings,
    ZERO-COPY: the char StringArray's value buffer IS the word column's
    data buffer (offsets are pure arithmetic — the round-3 tiling
    trick), and the list offsets are the word offsets rebased to 0."""
    sa = b["word"].combine_chunks()
    if len(sa) == 0:
        return pa.table({"syms": pa.array([], pa.list_(pa.string())),
                         "n": b["n"]})
    if sa.offset != 0:
        sa = pa.concat_arrays([sa])
    off = np.frombuffer(sa.buffers()[1], dtype=np.int32)[: len(sa) + 1] \
        .astype(np.int32)
    start, end = off[0], off[-1]
    char_off = np.arange(start, end + 1, dtype=np.int32)
    chars = pa.StringArray.from_buffers(
        int(end - start), pa.py_buffer(char_off.tobytes()),
        sa.buffers()[2])
    syms = pa.ListArray.from_arrays(pa.array(off - start, pa.int32()),
                                    chars)
    return pa.table({"syms": syms, "n": b["n"]})


def _pair_partial(b: pa.Table) -> pa.Table:
    """Per-block weighted adjacent-symbol-pair counts (overlapping
    occurrences counted, per standard BPE ranking), pre-aggregated with
    the Arrow group_by C kernel so the exchange moves (left_sym,
    right_sym, n) partials bounded by the pair vocabulary."""
    syms = b["syms"].combine_chunks()
    if len(syms) == 0:
        return pa.table({"left_sym": pa.array([], pa.string()),
                         "right_sym": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    flat = pc.list_flatten(syms)
    lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    wid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    wn = np.repeat(b["n"].to_numpy(zero_copy_only=False), lens)
    same = pa.array(wid[:-1] == wid[1:])
    left = flat.slice(0, len(flat) - 1).filter(same)
    right = flat.slice(1).filter(same)
    w = wn[:-1][wid[:-1] == wid[1:]]
    t = pa.table({"left_sym": left, "right_sym": right,
                  "n": pa.array(w, pa.int64())})
    part = t.group_by(["left_sym", "right_sym"]).aggregate([("n", "sum")])
    return part.rename_columns(["left_sym", "right_sym", "n"])


def bpe_pair_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """Round-0 BPE statistics: corpus-wide adjacent character-pair
    counts weighted by word frequency — the SQL-expressible core of the
    trainer (oracle: explode chars with generate_subscripts, self-join
    on pos+1 within word, sum word counts)."""
    from ray.data.aggregate import Sum

    return (_word_counts(ds, text_col)
            .map_batches(_words_to_symbols, batch_format="pyarrow")
            .map_batches(_pair_partial, batch_format="pyarrow")
            .groupby(["left_sym", "right_sym"])
            .aggregate(Sum("n", alias_name="n")))


def _apply_merge(b: pa.Table, lsym: str, rsym: str) -> pa.Table:
    """Apply one BPE merge to a (syms, n) table: greedy left-to-right
    non-overlapping, vectorized — candidate positions from two shifted
    Arrow equality kernels, overlap chains (possible only when
    left == right == ...) resolved by keeping even offsets within
    consecutive candidate runs."""
    syms = b["syms"].combine_chunks()
    if len(syms) == 0:
        return b
    merged = lsym + rsym
    flat = pc.list_flatten(syms)
    lens = pc.list_value_length(syms) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    wid = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    eq_l = pc.equal(flat, lsym).to_numpy(zero_copy_only=False)
    eq_r = pc.equal(flat, rsym).to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(eq_l[:-1] & eq_r[1:] & (wid[:-1] == wid[1:]))
    if sel.size == 0:
        return b
    brk = np.flatnonzero(np.diff(sel) > 1)
    starts = np.concatenate([[0], brk + 1])
    run_lens = np.diff(np.append(starts, sel.size))
    in_run = np.arange(sel.size) - np.repeat(starts, run_lens)
    keep = sel[in_run % 2 == 0]
    keep_mask = np.zeros(len(flat), bool)
    keep_mask[keep] = True
    drop_mask = np.ones(len(flat), bool)
    drop_mask[keep + 1] = False
    new_flat = pc.if_else(pa.array(keep_mask), merged, flat) \
        .filter(pa.array(drop_mask))
    if isinstance(new_flat, pa.ChunkedArray):
        new_flat = new_flat.combine_chunks()
    new_lens = lens - np.bincount(wid[keep], minlength=len(lens))
    offsets = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
    new_syms = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), new_flat)
    return pa.table({"syms": new_syms, "n": b["n"]})


def _best_pair(stats) -> tuple[str, str, int]:
    """Deterministic argmax over a pair-count frame: count DESC,
    left ASC, right ASC."""
    row = stats.sort_values(["n", "left_sym", "right_sym"],
                            ascending=[False, True, True]).iloc[0]
    return str(row["left_sym"]), str(row["right_sym"]), int(row["n"])


def bpe_train(ds: Dataset, n_merges: int, text_col: str = "text",
              min_count: int = 2, driver_word_bound: int = 500_000):
    """Distributed byte-pair-encoding merge training (Sennrich-style):
    learn ``n_merges`` symbol merges over the corpus, returning the
    merge table (rank, left_sym, right_sym, n) with deterministic
    tie-break (count DESC, left ASC, right ASC).

    Scale shape: the corpus is touched ONCE (the distinct-word count
    shuffle); training then runs over the bounded distinct-word table,
    TIERED like ``cluster.build_match_groups``: below
    ``driver_word_bound`` distinct words the loop runs driver-local on
    the collected Arrow table (identical kernels, no per-round Ray
    barrier); above it, each round is a per-block pair-count partial +
    one bounded grouped Sum with only the PAIR-COUNT AGGREGATE (bounded
    by the symbol-pair vocabulary, never the corpus) collected for the
    argmax, and the merge applied as a broadcast ``map_batches``. Both
    tiers share ``_pair_partial`` / ``_apply_merge``, so they are
    byte-identical by construction. Training stops early when no pair
    reaches ``min_count``."""
    import ray as _ray
    from ray.data.aggregate import Sum

    cur = (_word_counts(ds, text_col)
           .map_batches(_words_to_symbols, batch_format="pyarrow")
           .materialize())

    merges: list[tuple[str, str, int]] = []
    if cur.count() <= driver_word_bound:
        tbl = pa.concat_tables(
            _ray.get(cur.to_arrow_refs())).combine_chunks()
        for _ in range(n_merges):
            stats = _pair_partial(tbl)
            if stats.num_rows == 0:
                break
            agg = stats.group_by(["left_sym", "right_sym"]) \
                .aggregate([("n", "sum")]) \
                .rename_columns(["left_sym", "right_sym", "n"])
            lsym, rsym, cnt = _best_pair(agg.to_pandas())
            if cnt < min_count:
                break
            merges.append((lsym, rsym, cnt))
            tbl = _apply_merge(tbl, lsym, rsym)
    else:
        for _ in range(n_merges):
            stats = (cur.map_batches(_pair_partial,
                                     batch_format="pyarrow")
                     .groupby(["left_sym", "right_sym"])
                     .aggregate(Sum("n", alias_name="n"))).to_pandas()
            if len(stats) == 0:
                break
            lsym, rsym, cnt = _best_pair(stats)
            if cnt < min_count:
                break
            merges.append((lsym, rsym, cnt))
            cur = cur.map_batches(
                lambda b, a=lsym, c=rsym: _apply_merge(b, a, c),
                batch_format="pyarrow").materialize()

    return pa.table({
        "rank": pa.array(np.arange(1, len(merges) + 1, dtype=np.int64)),
        "left_sym": pa.array([m[0] for m in merges], pa.string()),
        "right_sym": pa.array([m[1] for m in merges], pa.string()),
        "n": pa.array([m[2] for m in merges], pa.int64()),
    })


def bpe_segment(ds: Dataset, merges: pa.Table,
                text_col: str = "text") -> Dataset:
    """Apply a learned BPE merge table to the corpus's distinct-word
    table: one row per word with its space-joined segmentation and
    token count. The merge list is a bounded broadcast (vocab-sized);
    each batch replays the merges in rank order through the same
    vectorized ``_apply_merge`` kernel the trainer uses, so
    train→segment round-trips are consistent by construction. The
    word-grain output is bounded by the corpus vocabulary — encoding
    full documents is this same kernel applied to a (doc, word) explode
    plus a broadcast word→seg lookup."""
    import ray

    pairs_ref = ray.put(list(zip(merges["left_sym"].to_pylist(),
                                 merges["right_sym"].to_pylist())))

    def seg(b: pa.Table) -> pa.Table:
        pairs = ray.get(pairs_ref)
        if b.num_rows == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "seg": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        tmp = _words_to_symbols(b)
        for lsym, rsym in pairs:
            tmp = _apply_merge(tmp, lsym, rsym)
        syms = tmp["syms"].combine_chunks()
        return pa.table({
            "word": b["word"],
            "n": b["n"],
            "seg": pc.binary_join(syms, " "),
            "n_tokens": pc.cast(pc.list_value_length(syms), pa.int64()),
        })

    return _word_counts(ds, text_col).map_batches(
        seg, batch_format="pyarrow")


def vocab_coverage(ds: Dataset, vocab_size: int, text_col: str = "text",
                   id_col: str = "doc_id") -> Dataset:
    """Per-document vocabulary coverage: token count + OOV count given
    the corpus's own top-``vocab_size`` vocabulary (df DESC, token ASC —
    ``build_vocab``'s ranking). The tokenizer-sizing diagnostic: how
    much of each document a truncated vocab fails to cover, as exact
    integers.

    Scale shape: the truncated vocab (bounded by construction) filters
    from ``build_vocab``'s distributed id table and broadcasts via
    ``ray.put``; each batch is one ``pc.is_in`` probe over the flat
    token stream + two reduceat-style bincounts — no second shuffle."""
    import ray

    vocab = build_vocab(ds, text_col=text_col, id_col=id_col) \
        .map_batches(
            lambda b: b.filter(pc.less_equal(b["token_id"], vocab_size)),
            batch_format="pyarrow")
    toks = pa.concat_tables(
        ray.get(vocab.select_columns(["token"]).materialize()
                .to_arrow_refs()))["token"].combine_chunks()
    vref = ray.put(toks)

    def cover(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        n_tok = np.bincount(row_of, minlength=b.num_rows).astype(np.int64)
        oov = pc.invert(pc.is_in(flat, value_set=ray.get(vref))) \
            .to_numpy(zero_copy_only=False)
        n_oov = np.bincount(row_of, weights=oov,
                            minlength=b.num_rows).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_oov": pa.array(n_oov, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        cover, batch_format="pyarrow")


def source_token_overlap(ds: Dataset, key_col: str = "source",
                         text_col: str = "text") -> "pa.Table":
    """Cross-feed vocabulary overlap: for every pair of sources with at
    least one shared token, the distinct-token set sizes, intersection
    and union — the corpus-diagnostics matrix behind 'how much does
    feed A's language overlap feed B's' (all-integer Jaccard inputs,
    so the oracle is byte-exact; ratio left to the reader per the
    float-parity rule).

    Scale shape: ONE distributed distinct over (source, token) — per-
    batch distinct partials shrink the exchange to bounded size (vocab
    is sublinear in corpus, sources are a handful of feeds), then the
    bounded table collects and the pairwise intersections are one
    boolean matmul (sources × vocab) — no token-level self-join ever
    runs. Bound: sources × vocab rows on the driver (~|V|·|feeds|,
    megabytes at 100 TB corpus scale); above it, swap the matmul for a
    token-keyed self-join via ``rayutil.smart_join``."""
    pairs = (ds.select_columns([key_col, text_col])
             .map_batches(
                 lambda b: _distinct_key_tokens(b, key_col, text_col),
                 batch_format="pyarrow")
             .groupby([key_col, "token"]).count())
    t = pa.concat_tables(
        _collect_refs(pairs), promote_options="default")
    keys = t[key_col].combine_chunks()
    kcodes = pc.dictionary_encode(keys)
    kd = kcodes.dictionary if isinstance(kcodes, pa.Array) \
        else kcodes.chunk(0).dictionary
    ki = (kcodes.indices if isinstance(kcodes, pa.Array)
          else kcodes.chunk(0).indices).to_numpy(zero_copy_only=False)
    tcodes = pc.dictionary_encode(t["token"].combine_chunks())
    ti = (tcodes.indices if isinstance(tcodes, pa.Array)
          else tcodes.chunk(0).indices).to_numpy(zero_copy_only=False)
    nk, nv = len(kd), int(ti.max()) + 1 if len(ti) else 0
    m = np.zeros((nk, nv), dtype=np.int64)
    m[ki, ti] = 1
    inter = m @ m.T
    sizes = m.sum(axis=1)
    names = np.asarray(kd.to_pylist())
    order = np.argsort(names, kind="stable")
    a_idx, b_idx = [], []
    for x in range(nk):
        for y in range(nk):
            sa, sb = order[x], order[y]
            if names[sa] < names[sb] and inter[sa, sb] > 0:
                a_idx.append(sa)
                b_idx.append(sb)
    a = np.asarray(a_idx, dtype=np.int64)
    b = np.asarray(b_idx, dtype=np.int64)
    return pa.table({
        "source_a": pa.array(names[a] if len(a) else [], pa.string()),
        "source_b": pa.array(names[b] if len(b) else [], pa.string()),
        "n_a": pa.array(sizes[a] if len(a) else [], pa.int64()),
        "n_b": pa.array(sizes[b] if len(b) else [], pa.int64()),
        "n_inter": pa.array(inter[a, b] if len(a) else [], pa.int64()),
        "n_union": pa.array(
            sizes[a] + sizes[b] - inter[a, b] if len(a) else [],
            pa.int64()),
    })


def _distinct_key_tokens(b: pa.Table, key_col: str,
                         text_col: str) -> pa.Table:
    """Per-batch distinct (key, token) partial for source_token_overlap
    (shared tokenization contract)."""
    row_of, flat = _tokenize_flat(b, text_col)
    t = pa.table({key_col: b[key_col].take(pa.array(row_of)),
                  "token": flat})
    return t.group_by([key_col, "token"]).aggregate([])


def _collect_refs(ds: Dataset) -> list:
    """Collect a BOUNDED Dataset's blocks as Arrow tables via plasma
    refs (zero-copy reads; callers document their bound)."""
    import ray

    return ray.get(ds.materialize().to_arrow_refs())


def prune_rare_tokens(ds: Dataset, min_count: int,
                      text_col: str = "text", id_col: str = "doc_id",
                      unk: str = "<unk>") -> Dataset:
    """Corpus token pruning (classic word-level LM preprocessing):
    every token whose corpus-wide occurrence count is below
    ``min_count`` is replaced by ``unk``, and each document's text is
    rebuilt from its surviving token stream (single-space joined, in
    original order) with exact kept/unk counts. Documents that tokenize
    to nothing are dropped (matching the SQL GROUP BY semantics).

    Scale shape: ONE bounded vocabulary aggregate (``_word_counts`` —
    per-block Arrow partials, one grouped Sum), the keep-set (words
    with count ≥ min_count, sublinear in corpus size) broadcast once
    via ``ray.put``; then a single streaming map pass whose per-batch
    work is one ``pc.is_in`` hash probe over the flat token stream, an
    ``if_else`` substitution, and a zero-Python ``binary_join`` over a
    rebuilt ListArray — no second shuffle, no per-row loop. Above
    broadcast scale swap the keep-set probe for ``rayutil.smart_join``
    on token (the rare tail is the LONG side; the kept head is the
    broadcastable one, which is why the keep-set — not the prune-set —
    is shipped)."""
    import ray

    kept = _word_counts(ds, text_col).map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], min_count)),
        batch_format="pyarrow")
    toks = pa.concat_tables(
        ray.get(kept.select_columns(["word"]).materialize()
                .to_arrow_refs()),
        promote_options="default")["word"].combine_chunks()
    kref = ray.put(toks)

    def prune(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        flat = flat.combine_chunks() if isinstance(
            flat, pa.ChunkedArray) else flat
        lens = np.bincount(row_of, minlength=b.num_rows).astype(np.int64)
        offsets = np.concatenate(
            [[0], np.cumsum(lens)]).astype(np.int32)
        keep = pc.is_in(flat, value_set=ray.get(kref))
        keep_np = keep.to_numpy(zero_copy_only=False)
        out_toks = pc.if_else(keep, flat, pa.scalar(unk, pa.string()))
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            out_toks.combine_chunks() if isinstance(
                out_toks, pa.ChunkedArray) else out_toks)
        text_out = pc.binary_join(la, " ")
        n_unk = np.bincount(row_of[~keep_np],
                            minlength=b.num_rows).astype(np.int64)
        t = pa.table({id_col: b[id_col], "text": text_out,
                      "n_tokens": pa.array(lens, pa.int64()),
                      "n_unk": pa.array(n_unk, pa.int64())})
        return t.filter(pa.array(lens > 0))

    return ds.select_columns([id_col, text_col]).map_batches(
        prune, batch_format="pyarrow")


def temperature_sample(ds: Dataset, group_col: str = "source",
                       total: int = 200, id_col: str = "doc_id") -> Dataset:
    """Temperature-based corpus mixing (the multilingual up/down-
    sampling step of large-scale training pipelines): allocate ``total``
    output documents across groups proportional to ``n_g^0.5`` (α = 0.5
    temperature — flattens the group-size distribution, boosting small
    sources), then pick each group's quota deterministically as its
    highest-md5-hash documents.

    Exactness contract: weights are ``isqrt(n_g)`` (INTEGER sqrt) and
    quotas come from integer largest-remainder arithmetic (floor shares
    + one extra unit per largest remainder, ties by group ascending) —
    no order-dependent float sums anywhere, so the SQL oracle reproduces
    the allocation bit-exactly (the ``prorate_integer`` precedent).
    Selection is the md5-prefix rank order ``q_stratified_sample``
    already uses (hex-lexicographic ⇔ integer-prefix order).

    Scale shape: one bounded grouped count (rows = distinct groups),
    driver-side integer quota math, then one hash pass + one
    ``grouped_topk`` (per-batch combiner keeps ≤ max-quota rows per
    group per batch) + a broadcast-quota filter. The corpus is never
    collected."""
    import math

    import ray

    from payor_linkage.dataops.aggregates import grouped_topk

    counts = {r[group_col]: r["count()"]
              for r in ds.groupby(group_col).count().take_all()}
    groups = sorted(counts)
    w = {g: math.isqrt(int(counts[g])) for g in groups}
    W = sum(w.values())
    if W == 0:
        raise ValueError("temperature_sample: all groups empty")
    q0 = {g: (total * w[g]) // W for g in groups}
    rem = {g: (total * w[g]) % W for g in groups}
    extra = total - sum(q0.values())
    for g in sorted(groups, key=lambda g: (-rem[g], g))[:extra]:
        q0[g] += 1
    # sampling is WITHOUT replacement: a group cannot supply more docs
    # than it has, so quotas truncate at group size (the output may then
    # total < ``total`` — documented, and mirrored by the oracle's LEAST)
    quotas = {g: min(q0[g], int(counts[g])) for g in groups}

    def add_hash(b: pa.Table) -> pa.Table:
        hh = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
              for i in b[id_col].to_pylist()]
        return b.append_column("h", pa.array(hh, pa.int64()))

    hashed = (ds.select_columns([id_col, group_col])
              .map_batches(add_hash, batch_format="pyarrow"))
    kmax = max(quotas.values())
    top = grouped_topk(hashed, key=group_col, order_col="h", k=kmax,
                       tie_col=id_col, keep_cols=[id_col])
    qref = ray.put(quotas)

    def within_quota(b: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        ranks = b["rank"].to_numpy(zero_copy_only=False)
        lim = np.array([qs.get(g, 0) for g in b[group_col].to_pylist()],
                       dtype=np.int64)
        return b.filter(pa.array(ranks <= lim))

    return top.map_batches(within_quota, batch_format="pyarrow")


def compression_signal(docs: Dataset, id_col: str = "doc_id",
                       text_col: str = "text", level: int = 6) -> Dataset:
    """Per-document zlib compressibility — the cheap boilerplate /
    repetition quality signal (templated or machine-generated text
    compresses far below natural prose; web-corpus pipelines gate on
    it alongside the Gopher repetition stats). Emits (id, raw_len,
    comp_len, ratio_bp) with ``ratio_bp = comp_len * 10000 //
    max(raw_len, 1)`` — pure integers, and zlib at a fixed level is
    bit-stable, so output is deterministic.

    Shape: the per-row ``zlib.compress`` call IS the kernel (C code
    per document, exactly like a decode stage); stateless, so the
    default task pool suffices — no actor needed. Driver gate is
    rows-only (DuckDB has no zlib); pytest gates the lengths against
    direct zlib."""
    import zlib

    def f(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            enc = (t or "").encode("utf-8", "surrogatepass")
            raw[i] = len(enc)
            comp[i] = len(zlib.compress(enc, level))
        return pa.table({
            id_col: b[id_col],
            "raw_len": pa.array(raw, pa.int64()),
            "comp_len": pa.array(comp, pa.int64()),
            "ratio_bp": pa.array(comp * 10000 // np.maximum(raw, 1),
                                 pa.int64())})

    return docs.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pyarrow")


def boilerplate_prune(ds: Dataset, max_df: int, text_col: str = "text",
                      id_col: str = "doc_id", sep: str = " ") -> Dataset:
    """C4-style boilerplate removal: split each document into units on
    ``sep`` (lines for newline-structured text, tokens here), count
    each unit's DOCUMENT frequency, DROP every unit that appears in
    ``max_df``-or-more distinct documents, and rebuild the text from
    the surviving units in original order — the "remove lines shared
    across many pages" dedup step of web-corpus curation (C4 removed
    any three-sentence span occurring twice; the unit+DF form is the
    same shape). Emits (id, text, n_kept, n_dropped); documents with
    no surviving unit are dropped (SQL grouped-filter semantics).

    Scale shape: DF is ONE bounded vocabulary aggregate (per-batch
    distinct-doc partial counts — exact because a document never
    straddles a batch — then one grouped sum); the PRUNE set (units
    with df ≥ max_df) is broadcast once via ``ray.put`` — ubiquitous
    units are few by definition, the opposite side from
    ``prune_rare_tokens``'s kept head. The rewrite pass is one
    streaming map: ``pc.split_pattern`` (same empty-preserving
    semantics as SQL string_split), one ``pc.is_in`` probe over the
    flat unit stream, a rebuilt ListArray and a zero-Python
    ``binary_join`` — no second shuffle, no per-row loop."""
    import ray

    def df_partial(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(b[text_col], sep)
        flat = pc.list_flatten(lists)
        row_of = pc.list_parent_indices(lists)
        pairs = pa.table({"unit": flat, "_r": row_of}) \
            .group_by(["unit", "_r"]).aggregate([])
        g = pairs.group_by("unit").aggregate([([], "count_all")])
        return pa.table({"unit": g["unit"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    df = ds.select_columns([text_col]) \
        .map_batches(df_partial, batch_format="pyarrow") \
        .groupby("unit").sum("n")
    prune = df.map_batches(
        lambda b: b.filter(pc.greater_equal(b["sum(n)"], max_df))
        .select(["unit"]), batch_format="pyarrow")
    prune_units = pa.concat_tables(
        ray.get(prune.materialize().to_arrow_refs()),
        promote_options="default")["unit"].combine_chunks()
    pref = ray.put(prune_units)

    def rewrite(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(b[text_col], sep)
        flat = pc.list_flatten(lists).combine_chunks()
        row_of = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        drop = pc.is_in(flat, value_set=ray.get(pref)) \
            .to_numpy(zero_copy_only=False)
        total = np.bincount(row_of, minlength=b.num_rows).astype(np.int64)
        kept_n = np.bincount(row_of[~drop],
                             minlength=b.num_rows).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(kept_n)]).astype(np.int32)
        vals = flat.filter(pa.array(~drop))
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            vals.combine_chunks() if isinstance(vals, pa.ChunkedArray)
            else vals)
        t = pa.table({id_col: b[id_col],
                      "text": pc.binary_join(la, sep),
                      "n_kept": pa.array(kept_n, pa.int64()),
                      "n_dropped": pa.array(total - kept_n, pa.int64())})
        return t.filter(pa.array(kept_n > 0))

    return ds.select_columns([id_col, text_col]).map_batches(
        rewrite, batch_format="pyarrow")


def regex_count_profile(ds: Dataset, col: str, patterns: dict,
                        id_col: str = "event_id") -> Dataset:
    """PII / pattern-density profiling: for each row, the number of
    non-overlapping matches of every named pattern in ``patterns``
    (name → RE2 regex) — the "how much scrubbing would this need"
    census run BEFORE a redaction pass (``regex_redact`` is the
    destructive sibling). One output column per pattern, prefixed
    ``n_``.

    Shape: map-only; each pattern is one vectorized
    ``pc.count_substring_regex`` RE2 kernel per batch (pyarrow and
    DuckDB both compile RE2, so `len(regexp_extract_all(...))`
    oracles match exactly)."""
    def f(b: pa.Table) -> pa.Table:
        cols = {id_col: b[id_col]}
        for name, pat in patterns.items():
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(b[col], pat), pa.int64())
        return pa.table(cols)

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow")


def word_ngram_rows(ds: Dataset, n: int, text_col: str = "text",
                    id_col: str = "doc_id",
                    out_col: str = "gram") -> Dataset:
    """Explode documents into DISTINCT (id, whitespace-word n-gram)
    rows — the shared front end of the novelty census and gram-keyed
    blocking (per-doc dedup happens inside the batch, so the exchange
    carries each (doc, gram) once)."""
    sch = ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]

    def gram_rows(b: pa.Table) -> pa.Table:
        out_id, out_g = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            toks = (t or "").lower().split()
            grams = {" ".join(toks[j:j + n])
                     for j in range(len(toks) - n + 1)}
            out_id.extend([i] * len(grams))
            out_g.extend(grams)
        return pa.table({id_col: pa.array(out_id, idt),
                         out_col: pa.array(out_g, pa.string())})

    return ds.select_columns([id_col, text_col]).map_batches(
        gram_rows, batch_format="pyarrow")


def novelty_census(ds: Dataset, word_ngram: int = 3,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> Dataset:
    """Per-document novelty census: of each document's distinct word
    n-grams, how many are corpus-UNIQUE (document frequency 1) vs
    total — the memorization-risk / data-valuation signal (a document
    whose grams all recur elsewhere adds nothing; one full of unique
    grams is novel). Integer (n_unique_grams, n_grams) output keeps
    the oracle float-free; the novelty ratio derives downstream.

    Shape: one distinct-gram explosion (per-doc dedup inside the
    batch), one vocab-grain df groupby, the df table attached back by
    gram (`lookup_join`, hash-join fallback above its bound), then one
    doc-grain grouped sum of (df == 1) flags — counts only on every
    exchange after the explosion."""
    from ray.data.aggregate import Count, Sum

    from payor_linkage.rayutil import lookup_join

    grams = word_ngram_rows(ds, word_ngram, text_col=text_col,
                            id_col=id_col).materialize()
    df = grams.groupby("gram").aggregate(Count(alias_name="df"))
    with_df = lookup_join(grams, df, on="gram")

    def partial(b: pa.Table) -> pa.Table:
        uniq = pc.cast(pc.equal(b["df"], 1), pa.int64())
        t = pa.table({id_col: b[id_col], "n_unique_grams": uniq,
                      "n_grams": pa.array(
                          np.ones(b.num_rows, dtype=np.int64))})
        return (t.group_by(id_col)
                .aggregate([("n_unique_grams", "sum"), ("n_grams", "sum")])
                .rename_columns([id_col, "n_unique_grams", "n_grams"]))

    return (with_df.map_batches(partial, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("n_unique_grams", alias_name="n_unique_grams"),
                       Sum("n_grams", alias_name="n_grams")))


def greedy_cover(ds: Dataset, k: int = 10, word_ngram: int = 3,
                 text_col: str = "text", id_col: str = "doc_id",
                 local_rows_bound: int = 2_000_000) -> Dataset:
    """Greedy maximum-coverage data selection: pick ``k`` documents,
    one per round, each maximizing the count of corpus n-grams not yet
    covered by earlier picks (ties → smallest id; rounds stop early
    when no remaining document adds coverage). The classic (1−1/e)
    submodular-selection step of "choose a small, diverse training
    subset"; returns (sel_round, id, gain, covered_total) — all
    integers, fully deterministic.

    Tiers (the bpe_train / cluster.py pattern): below
    ``local_rows_bound`` distinct (doc, gram) rows the loop runs
    driver-local over collected plasma-backed Arrow (dictionary codes
    + one bincount per round — no per-round cluster barriers); above
    it, a distributed loop: the covered-gram set (bounded by the k
    selected docs' grams) is broadcast via ``ray.put`` each round, one
    map pass scores per-doc uncovered counts with in-batch group_by,
    per-block bests stream to the driver, and one filtered pass
    fetches the winner's grams. Byte-parity between tiers is
    pytest-gated. No SQL oracle — iterative greedy (aggregation inside
    recursion is not CTE-expressible); exact pytest reference gate
    instead."""
    import ray
    import ray.data as rd

    grams = word_ngram_rows(ds, word_ngram, text_col=text_col,
                            id_col=id_col).materialize()
    gsch = grams.schema()
    idt = dict(zip(gsch.names, gsch.types))[id_col]
    out_schema = pa.schema([("sel_round", pa.int64()), (id_col, idt),
                            ("gain", pa.int64()),
                            ("covered_total", pa.int64())])
    n_rows = grams.count()
    sel_ids, sel_gains = [], []

    if n_rows <= local_rows_bound:
        tbl = pa.concat_tables(_collect_refs(grams),
                               promote_options="default")
        if tbl.num_rows:
            denc = tbl[id_col].combine_chunks().dictionary_encode()
            genc = tbl["gram"].combine_chunks().dictionary_encode()
            d = denc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            g = genc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            doc_ids = denc.dictionary
            covered = np.zeros(len(genc.dictionary), dtype=bool)
            for _ in range(k):
                gains = np.bincount(d[~covered[g]],
                                    minlength=len(doc_ids))
                best = int(gains.max()) if len(gains) else 0
                if best == 0:
                    break
                cand = np.flatnonzero(gains == best)
                # tie-break on the id VALUE, not the dictionary code
                win = cand[np.argmin([doc_ids[int(c)].as_py()
                                      for c in cand])] if len(cand) > 1 \
                    else cand[0]
                covered[g[d == win]] = True
                sel_ids.append(doc_ids[int(win)].as_py())
                sel_gains.append(best)
    else:
        covered: set = set()
        for _ in range(k):
            cov_ref = ray.put(pa.array(sorted(covered), pa.string()))

            def score(b: pa.Table, ref=cov_ref) -> pa.Table:
                cov = ray.get(ref)
                t = b.filter(pc.invert(
                    pc.is_in(b["gram"], value_set=cov)))
                if t.num_rows == 0:
                    return pa.schema([(id_col, idt),
                                      ("gain", pa.int64())]).empty_table()
                part = (pa.table({id_col: t[id_col]})
                        .group_by(id_col).aggregate([([], "count_all")]))
                return pa.table({id_col: part[id_col],
                                 "gain": pc.cast(part["count_all"],
                                                 pa.int64())})

            from ray.data.aggregate import Sum

            per_doc = (grams.map_batches(score, batch_format="pyarrow")
                       .groupby(id_col)
                       .aggregate(Sum("gain", alias_name="gain")))

            def block_best(b: pa.Table) -> pa.Table:
                if b.num_rows == 0:
                    return b
                # max gain, then min id among that gain
                mx = pc.max(b["gain"])
                t = b.filter(pc.equal(b["gain"], mx))
                mi = pc.min(t[id_col])
                return t.filter(pc.equal(t[id_col], mi)).slice(0, 1)

            bests = per_doc.map_batches(
                block_best, batch_format="pyarrow").take_all()
            if not bests:
                break
            bests.sort(key=lambda r: (-r["gain"], r[id_col]))
            win_id, best = bests[0][id_col], int(bests[0]["gain"])
            if best == 0:
                break
            new_grams = grams.filter(
                expr=f"{id_col} == {win_id!r}").take_all()
            covered |= {r["gram"] for r in new_grams}
            sel_ids.append(win_id)
            sel_gains.append(best)

    cum = np.cumsum(sel_gains).astype(np.int64) if sel_gains else []
    return rd.from_arrow(pa.table({
        "sel_round": pa.array(np.arange(1, len(sel_ids) + 1,
                                        dtype=np.int64)),
        id_col: pa.array(sel_ids, idt),
        "gain": pa.array(sel_gains, pa.int64()),
        "covered_total": pa.array(cum, pa.int64())}).cast(out_schema))


# ── n-gram language-model quality scoring ──────────────────────────────────

_LM_BOS = "<s>"
_LM_UNK = "<unk>"


def _lm_vocab_ref(uni: Dataset, min_count: int):
    """Collect the in-vocab tokens (unigram count ≥ min_count) once,
    sorted, and broadcast. Vocabularies grow sublinearly in corpus
    size (the `encode_tokens` bound argument); above broadcast scale
    swap the fold for a smart_join on token."""
    import ray

    def keep(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(b["n"], min_count)
        return pa.table({"token": b["word"].filter(m),
                         "n": b["n"].filter(m)})

    vt = uni.map_batches(keep, batch_format="pyarrow").to_pandas()
    toks = np.sort(vt["token"].to_numpy())
    order = np.argsort(vt["token"].to_numpy())
    cnts = vt["n"].to_numpy()[order].astype(np.int64)
    return ray.put((pa.array(toks, pa.string()), cnts))


def _lm_fold_ids(b: pa.Table, text_col: str, vocab_arr):
    """Tokenize + fold to dense ids: 0..V-1 vocab (sorted order), V =
    <unk>, V+1 = <s>. Returns (row_of, ids, V)."""
    row_of, flat = _tokenize_flat(b, text_col)
    v = len(vocab_arr)
    idx = pc.index_in(flat, value_set=vocab_arr).to_numpy(
        zero_copy_only=False)
    ids = np.where(np.isnan(idx) if idx.dtype.kind == "f" else idx < 0,
                   v, idx).astype(np.int64)
    return row_of, ids, v


def _lm_bigram_keys(row_of, ids, v):
    """Composite int keys prev*(V+2)+cur with <s> prepended per doc —
    pure integer arithmetic, no Python per token."""
    if len(ids) == 0:
        return np.empty(0, np.int64)
    starts = np.empty(len(ids), dtype=bool)
    starts[0] = True
    starts[1:] = row_of[1:] != row_of[:-1]
    prev = np.empty_like(ids)
    prev[1:] = ids[:-1]
    prev[0] = 0
    prev[starts] = v + 1  # BOS
    return prev * (v + 2) + ids


def ngram_lm_counts(ds: Dataset, text_col: str = "text",
                    min_count: int = 2) -> tuple[Dataset, Dataset]:
    """Bigram language-model training (the CCNet/KenLM-style quality
    model, reduced to its count tables): unigram counts folded to
    ``<unk>`` below ``min_count`` (plus the per-document ``<s>`` BOS
    mass) and folded bigram counts — the sufficient statistics of an
    add-k bigram LM; smoothing/log-probs derive downstream as pure
    arithmetic.

    Scale shape: the unigram pass is `_word_counts` (per-block Arrow
    partials, one bounded grouped Sum). The bigram pass folds tokens to
    dense ids against the broadcast vocab, collapses each block with
    ``np.bincount``-style unique counting on composite int keys, and
    grouped-Sums (key, n) partials — only integer pairs ride the
    exchange; token strings reappear once, at the bounded decode.

    Returns ``(unigrams, bigrams)``: ``(token, n)`` with ``<s>`` /
    ``<unk>`` rows, and ``(prev, cur, n)``."""
    import ray
    from ray.data.aggregate import Sum

    uni = _word_counts(ds, text_col).materialize()
    ref = _lm_vocab_ref(uni, min_count)

    def big_partial(b: pa.Table) -> pa.Table:
        vocab_arr, _ = ray.get(ref)
        row_of, ids, v = _lm_fold_ids(b, text_col, vocab_arr)
        keys = _lm_bigram_keys(row_of, ids, v)
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(uk, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    bigram_keys = (ds.select_columns([text_col])
                   .map_batches(big_partial, batch_format="pyarrow")
                   .groupby("key").aggregate(Sum("n", alias_name="n"))
                   .materialize())

    def decode(b: pa.Table) -> pa.Table:
        vocab_arr, _ = ray.get(ref)
        ext = pa.concat_arrays([vocab_arr.combine_chunks()
                                if isinstance(vocab_arr, pa.ChunkedArray)
                                else vocab_arr,
                                pa.array([_LM_UNK, _LM_BOS], pa.string())])
        v = len(ext) - 2
        k = b["key"].to_numpy(zero_copy_only=False)
        return pa.table({"prev": ext.take(pa.array(k // (v + 2))),
                         "cur": ext.take(pa.array(k % (v + 2))),
                         "n": b["n"]})

    bigrams = bigram_keys.map_batches(decode, batch_format="pyarrow")

    # folded unigram table: vocab rows + <unk> mass + <s> (= docs with
    # ≥1 token — exactly the BOS emission count, read off the bigrams)
    def fold_uni(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b["n"], min_count)
        tok = pc.if_else(keep, b["word"], pa.scalar(_LM_UNK))
        return pa.table({"token": tok, "n": b["n"]})

    folded = (uni.map_batches(fold_uni, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n")))

    def bos_rows(b: pa.Table) -> pa.Table:
        m = pc.equal(b["prev"], _LM_BOS)
        return pa.table({"token": b["prev"].filter(m),
                         "n": b["n"].filter(m)})

    bos = (bigrams.map_batches(bos_rows, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n")))
    return folded.union(bos).materialize(), bigrams.materialize()


def ngram_lm_doc_stats(ds: Dataset, unigrams: Dataset, bigrams: Dataset,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> Dataset:
    """Per-document bigram-LM probe statistics as EXACT INTEGERS —
    ``(doc_id, n_tokens, n_oov, sum_prev, sum_bi)`` where ``sum_bi`` /
    ``sum_prev`` total the trained bigram / previous-token counts over
    the document's (BOS-prefixed, OOV-folded) bigrams. These are the
    LM-probe joins a float cross-entropy would consume
    (:func:`ngram_lm_xent`); keeping the queried output integral makes
    the DuckDB gate float-free (the `bcubed_stats` convention).

    Scale shape: the vocab + folded unigram counts broadcast once
    (bounded); documents are rows so per-batch doc stats are exact; the
    bigram probe is a `lookup_join` on composite int keys (size-aware:
    broadcast below its bound, hash join above); the final assembly is
    ONE tagged-union grouped sum — no doc-grain join."""
    import ray
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    # broadcast: sorted vocab + count vector indexed by folded id
    uni_tbl = unigrams.to_pandas()
    toks = uni_tbl["token"].to_numpy()
    cnts = uni_tbl["n"].to_numpy().astype(np.int64)
    special = {_LM_UNK: 0, _LM_BOS: 0}
    vmask = ~np.isin(toks, list(special))
    vsort = np.argsort(toks[vmask])
    vocab_sorted = toks[vmask][vsort]
    v = len(vocab_sorted)
    counts_by_id = np.zeros(v + 2, dtype=np.int64)
    counts_by_id[:v] = cnts[vmask][vsort]
    for t, slot in ((_LM_UNK, v), (_LM_BOS, v + 1)):
        hit = cnts[toks == t]
        if len(hit):
            counts_by_id[slot] = int(hit[0])
    import pyarrow as _pa

    ref = ray.put((_pa.array(vocab_sorted, _pa.string()), counts_by_id))

    def doc_partial(b: pa.Table) -> pa.Table:
        vocab_arr, cbi = ray.get(ref)
        row_of, ids, vv = _lm_fold_ids(b, text_col, vocab_arr)
        n = b.num_rows
        n_tokens = np.bincount(row_of, minlength=n).astype(np.int64)
        n_oov = np.bincount(row_of[ids == vv], minlength=n).astype(np.int64)
        keys = _lm_bigram_keys(row_of, ids, vv)
        prev_ids = keys // (vv + 2)
        sum_prev = np.bincount(row_of, weights=cbi[prev_ids],
                               minlength=n).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "n_tokens": pa.array(n_tokens, pa.int64()),
                         "n_oov": pa.array(n_oov, pa.int64()),
                         "sum_prev": pa.array(sum_prev, pa.int64()),
                         "sum_bi": pa.array(np.zeros(n, np.int64))})

    stats = ds.select_columns([id_col, text_col]).map_batches(
        doc_partial, batch_format="pyarrow")

    def explode_keys(b: pa.Table) -> pa.Table:
        vocab_arr, _ = ray.get(ref)
        row_of, ids, vv = _lm_fold_ids(b, text_col, vocab_arr)
        keys = _lm_bigram_keys(row_of, ids, vv)
        return pa.table({id_col: b[id_col].take(pa.array(row_of)),
                         "key": pa.array(keys, pa.int64())})

    def bigram_keyed(b: pa.Table) -> pa.Table:
        vocab_arr, _ = ray.get(ref)
        vv = len(vocab_arr)
        spec = {_LM_UNK: vv, _LM_BOS: vv + 1}

        def enc(col):
            raw = pc.index_in(b[col], value_set=vocab_arr).to_numpy(
                zero_copy_only=False)
            out = np.where(np.isnan(raw) if raw.dtype.kind == "f"
                           else raw < 0, -1, raw).astype(np.int64)
            s = b[col].to_numpy(zero_copy_only=False)
            for t, sl in spec.items():
                out[s == t] = sl
            return out

        key = enc("prev") * (vv + 2) + enc("cur")
        return pa.table({"key": pa.array(key, pa.int64()), "bn": b["n"]})

    probed = lookup_join(
        ds.select_columns([id_col, text_col]).map_batches(
            explode_keys, batch_format="pyarrow"),
        bigrams.map_batches(bigram_keyed, batch_format="pyarrow"),
        "key")

    def bi_rows(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, np.int64)
        return pa.table({id_col: b[id_col],
                         "n_tokens": pa.array(z), "n_oov": pa.array(z),
                         "sum_prev": pa.array(z),
                         "sum_bi": pc.cast(b["bn"], pa.int64())})

    return (stats.union(probed.map_batches(bi_rows, batch_format="pyarrow"))
            .groupby(id_col).aggregate(
                Sum("n_tokens", alias_name="n_tokens"),
                Sum("n_oov", alias_name="n_oov"),
                Sum("sum_prev", alias_name="sum_prev"),
                Sum("sum_bi", alias_name="sum_bi")))


def ngram_lm_xent(ds: Dataset, unigrams: Dataset, bigrams: Dataset,
                  id_col: str = "doc_id", text_col: str = "text",
                  add_k: float = 0.5) -> Dataset:
    """Per-document add-k bigram cross-entropy (bits/token) under a
    trained `ngram_lm_counts` model — the CCNet-style quality signal
    (low = fluent/in-domain, high = junk). P(cur|prev) = (c(bigram)+k)
    / (c(prev)+k·(V+1)); per-doc sums are computed in one deterministic
    numpy order per document (iterative floats — pytest-gated, not
    SQL)."""
    import ray

    uni_tbl = unigrams.to_pandas()
    toks = uni_tbl["token"].to_numpy()
    cnts = uni_tbl["n"].to_numpy().astype(np.int64)
    vmask = ~np.isin(toks, [_LM_UNK, _LM_BOS])
    vsort = np.argsort(toks[vmask])
    vocab_sorted = toks[vmask][vsort]
    v = len(vocab_sorted)
    counts_by_id = np.zeros(v + 2, dtype=np.int64)
    counts_by_id[:v] = cnts[vmask][vsort]
    for t, slot in ((_LM_UNK, v), (_LM_BOS, v + 1)):
        hit = cnts[toks == t]
        if len(hit):
            counts_by_id[slot] = int(hit[0])

    big = bigrams.to_pandas()  # bounded: observed folded bigrams

    def enc_tok(arr):
        if v == 0:
            out = np.full(len(arr), v, np.int64)
        else:
            pos = np.clip(np.searchsorted(vocab_sorted, arr), 0, v - 1)
            out = np.where(vocab_sorted[pos] == arr, pos, v).astype(np.int64)
        out[arr == _LM_BOS] = v + 1
        return out

    rawkey = (enc_tok(big["prev"].to_numpy()) * (v + 2)
              + enc_tok(big["cur"].to_numpy()))
    border = np.argsort(rawkey, kind="stable")
    bkey = rawkey[border]
    bval = big["n"].to_numpy().astype(np.int64)[border]
    ref = ray.put((pa.array(vocab_sorted, pa.string()), counts_by_id,
                   bkey, bval))

    def score(b: pa.Table) -> pa.Table:
        vocab_arr, cbi, bk, bv = ray.get(ref)
        row_of, ids, vv = _lm_fold_ids(b, text_col, vocab_arr)
        n = b.num_rows
        keys = _lm_bigram_keys(row_of, ids, vv)
        if len(bk):
            pos = np.clip(np.searchsorted(bk, keys), 0, len(bk) - 1)
            cbig = np.where(bk[pos] == keys, bv[pos], 0).astype(np.float64)
        else:
            cbig = np.zeros(len(keys), np.float64)
        cprev = cbi[keys // (vv + 2)].astype(np.float64)
        logp = np.log2(cbig + add_k) - np.log2(cprev + add_k * (vv + 1))
        total = np.bincount(row_of, weights=-logp, minlength=n)
        n_tok = np.bincount(row_of, minlength=n).astype(np.int64)
        xent = np.where(n_tok > 0, total / np.maximum(n_tok, 1), 0.0)
        return pa.table({id_col: b[id_col],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "xent_bits": pa.array(xent, pa.float64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow")


def feature_hash_vectors(ds: Dataset, id_col: str = "doc_id",
                         text_col: str = "text", dim: int = 64) -> Dataset:
    """The hashing trick (Weinberger et al.): each document's tokens
    bucketed into a fixed ``dim``-dimensional count vector via the
    32-bit md5-prefix hash — the schema-free featurizer that turns
    arbitrary text into k-means/kNN-ready vectors with no vocabulary
    pass at all. Long-form integer output ``(doc_id, dim_idx, n)``
    (zero dims omitted), so the gate is float-free.

    Scale shape: map-only — md5 runs through DuckDB's vectorized C++
    kernel per batch (the `grouped_checksum` precedent), bucket = h %
    dim in numpy, and per-document counts finalize inside the batch
    (documents are rows, so no exchange at all)."""
    import duckdb

    def partial(b: pa.Table) -> pa.Table:
        row_of, flat = _tokenize_flat(b, text_col)
        if len(flat) == 0:
            return pa.table({id_col: b[id_col].take(pa.array([], pa.int64())),
                             "dim_idx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        con = duckdb.connect()
        con.register("t", pa.table({"tok": flat}))
        h = con.execute(
            "SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM t"
        ).arrow()["h"].to_numpy(zero_copy_only=False)
        con.close()
        bucket = (h % dim).astype(np.int64)
        t = pa.table({id_col: b[id_col].take(pa.array(row_of)),
                      "dim_idx": pa.array(bucket, pa.int64()),
                      "n": pa.array(np.ones(len(bucket), np.int64))})
        return (t.group_by([id_col, "dim_idx"]).aggregate([("n", "sum")])
                .rename_columns([id_col, "dim_idx", "n"]))

    return ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow")


def regex_extract_columns(ds: Dataset, text_col: str, pattern: str,
                          group_names: list[str],
                          id_col: str = "doc_id") -> Dataset:
    """First-match regex group extraction to typed columns —
    ``regexp_extract(text, pattern, group)`` semantics per group name
    (non-matching rows get nulls): the workhorse ETL primitive for
    pulling structured fields out of semi-structured text.

    Map-only and fully vectorized: ``pc.extract_regex`` (RE2 through
    Arrow's C++ kernel) runs once per batch and the struct result is
    unpacked zero-copy; no Python per row."""
    import pyarrow.compute as pc

    def ext(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b[text_col], pattern)
        cols = {id_col: b[id_col]}
        for g in group_names:
            cols[g] = pc.struct_field(m, g)
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        ext, batch_format="pyarrow")

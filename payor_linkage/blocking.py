"""Blocking: key emission → hot-key salting → duplicate-free pair generation.

Replaces the reference's blocking self-join
(`/root/reference/transform/payor_mdm/models/match/int_blocking_pairs.sql:11-33`)
with a shuffle-on-block-key design (SURVEY §2.4 J1):

1. every record explodes to one key-row per blocking key it carries
   (tax key only when non-empty — the SQL's explicit guard; name / zip3
   keys always, with the reference's 'XX'/'XXX' null-coalescing; plus the
   Soundex phonetic key), carrying the record's *other* keys too;
2. a small count pre-pass finds hot keys (skew!). Hot keys are salted
   into bounded sub-blocks by a stable hash of the record id; a *liaison*
   sub-block samples ~cap records ACROSS all salts (independent second
   hash) so transitive clustering can reunite a genuinely-same-entity
   mega block; degenerate hot keys (pure null-coalescing) are parked;
3. ``groupby(bkey).map_groups`` emits canonical a<b pairs **exactly
   once**: a block emits a pair only if it is the pair's minimum common
   salted key under a fixed type precedence (tax < name < zip < pho <
   liaison-of-each). Every emitter can decide this locally from the
   carried keys + the broadcast hot map — the SQL's SELECT DISTINCT
   without a second all-to-all shuffle.

Pairs carry both records' comparison payloads (avoids the reference's two
join-backs, `int_match_scored.sql:49-51`).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from payor_linkage.config import BlockingConfig
from payor_linkage.schema import PAIR_PAYLOAD_FIELDS

_CARRY = ["source_record_id"] + PAIR_PAYLOAD_FIELDS
# driver-local bound for the incremental touched-key counts splice: a
# (bkey, n) slice of ≤ this many rows is a few hundred MB at worst;
# wider deltas fall back to the distributed merge
_TOUCHED_LOCAL_BOUND = 2_000_000
# driver tier for the touched KEY-ROW subset (payload-wide) feeding the
# incremental pair emission — ~150 MB at 500k rows
_PAIRS_LOCAL_BOUND = 500_000
# fixed type precedence for duplicate-free emission
_TYPES = ["tax", "name", "zip", "pho"]
_KEY_COLS = {"tax": "block_tax_id", "name": "block_name_key",
             "zip": "block_zip3_name4", "pho": "block_phonetic"}


def _salt_of(rid: str, n_salts: int) -> int:
    return zlib.crc32(rid.encode()) % n_salts


def _is_liaison_member(rid: str, n_salts: int) -> bool:
    # independent second hash → expected n/n_salts ≈ cap members drawn
    # from ALL salts (cross-salt connectivity)
    return zlib.crc32((rid + "~L").encode()) % n_salts == 0


def _key_rows_batch(batch: pa.Table, use_phonetic: bool) -> pa.Table:
    """Explode each record into one row per blocking key, carrying every
    key (for precedence) + the comparison payload."""
    n = batch.num_rows
    base_cols = {c: batch[c] for c in _CARRY}
    for t in _TYPES:
        base_cols[f"k_{t}"] = batch[_KEY_COLS[t]]
    pieces = []

    def mk(block_type: str, valid: pa.Array | None):
        keys = batch[_KEY_COLS[block_type]]
        t = pa.table({
            "bkey": pc.binary_join_element_wise(
                pa.array([block_type] * n), pc.coalesce(pc.cast(keys, pa.string()), pa.scalar("")), "|"),
            **base_cols,
        })
        if valid is not None:
            t = t.filter(valid)
        pieces.append(t)

    tax = batch["block_tax_id"]
    mk("tax", pc.and_(pc.is_valid(tax), pc.not_equal(pc.coalesce(tax, pa.scalar("")), "")))
    mk("name", None)
    mk("zip", None)
    if use_phonetic:
        pho = batch["block_phonetic"]
        mk("pho", pc.is_valid(pho))
    return pa.concat_tables(pieces)


def _is_degenerate_key(bkey: str) -> bool:
    """Keys built purely from null coalescing carry no matching signal.
    name key = name6+state ('XX' when null state): empty name → only the
    2-char state remains. zip key = zip3('XXX')+name4: empty name → 3
    chars. Pairing those is O(records-per-state²) noise — the reference's
    unhandled skew cliff (SURVEY §4)."""
    btype, _, key = bkey.partition("|")
    if btype == "name":
        return len(key) <= 2
    if btype == "zip":
        return len(key) <= 3
    return False


def key_counts(key_rows: Dataset) -> Dataset:
    """Per-bkey record counts as a (bkey, n) Dataset — the hot-key
    pre-pass, exposed so a full run can PERSIST it as blocking state
    and an incremental run can merge a delta's counts into it instead
    of re-scanning the corpus (the counts table is distinct-key-sized,
    not corpus-sized)."""
    from ray.data.aggregate import Sum

    return (partial_key_counts(key_rows)
            .groupby("bkey").aggregate(Sum("n", alias_name="n")))


def partial_key_counts(key_rows: Dataset) -> Dataset:
    """Per-BLOCK (bkey, n) partial counts — one map pass, no shuffle.
    bkeys repeat across blocks; any grouped Sum downstream finishes the
    count (``key_counts`` / ``merge_key_counts``). Counting runs through
    Arrow's C++ group_by (np.unique on object-dtype strings pays a
    Python richcompare per comparison)."""
    def partial(b: pa.Table) -> pa.Table:
        return (b.select(["bkey"]).group_by("bkey")
                .aggregate([([], "count_all")])
                .rename_columns(["bkey", "n"]))

    return (key_rows.select_columns(["bkey"])
            .map_batches(partial, batch_format="pyarrow"))


def merge_key_counts(prior_counts: Dataset, delta_counts: Dataset) -> Dataset:
    """prior (bkey, n) + delta (bkey, n) → combined counts, identical to
    recounting the combined corpus (grouped sum over the two small
    tables — never touches the corpus)."""
    from ray.data.aggregate import Sum

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (prior_counts.union(delta_counts)
            .repartition(cpus)
            .groupby("bkey").aggregate(Sum("n", alias_name="n")))


def _hot_entries(rows, cap: int, park_degenerate: bool,
                 park_above: int | None, pho_cap: int | None) -> dict[str, int]:
    """Shared per-key hot/park decision over (bkey, n) rows already
    pre-filtered to n > min(cap, pho_cap)."""
    out = {}
    for k, n in rows:
        k_cap = pho_cap if (pho_cap is not None and k.startswith("pho|")) else cap
        if n <= k_cap:
            continue
        parked = (park_degenerate and _is_degenerate_key(k)) or \
            (park_above is not None and n > park_above)
        out[k] = -1 if parked else -(-n // k_cap)
    return out


def _hot_from_counts(counts: Dataset, cap: int, park_degenerate: bool,
                     park_above: int | None = None,
                     pho_cap: int | None = None) -> dict[str, int]:
    """(bkey, n) counts → {bkey: n_salts} for keys above the cap (tiny).
    Parked keys map to -1 — they produce no pairs and are excluded from
    the emission-precedence computation. A key is parked when degenerate
    (null-coalescing junk) or larger than ``park_above`` (salting bounds
    sub-block memory but still emits O(n·cap) pairs — beyond the bound
    the key is collision noise, not an entity)."""
    low_cap = min(cap, pho_cap or cap)
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], low_cap)), batch_format="pyarrow")
    return _hot_entries(((r["bkey"], r["n"]) for r in hot.take_all()),
                        cap, park_degenerate, park_above, pho_cap)


def _hot_from_table(counts: pa.Table, cap: int, park_degenerate: bool,
                    park_above: int | None = None,
                    pho_cap: int | None = None) -> dict[str, int]:
    """Driver-local `_hot_from_counts` over an Arrow (bkey, n) table —
    the incremental path's touched-key slice (delta-bounded)."""
    low_cap = min(cap, pho_cap or cap)
    t = counts.filter(pc.greater(counts["n"], low_cap))
    return _hot_entries(zip(t["bkey"].to_pylist(), t["n"].to_pylist()),
                        cap, park_degenerate, park_above, pho_cap)


def blocking_key_stats(counts: Dataset, cfg=None) -> dict:
    """Parked/salted key accounting over a (bkey, n) counts table —
    SURVEY §4's dropped-pair accounting, surfaced so blocking recall
    loss is observable in ``audit.pipeline_metrics`` (not only via the
    q_mdm_blocking_quality pairs-completeness oracle). One tiny
    filtered collect (same slice ``_hot_from_counts`` reads); parked
    keys emit NO pairs, salted keys emit O(n·cap) instead of O(n²)."""
    from payor_linkage.config import BlockingConfig

    cfg = cfg or BlockingConfig()
    total = counts.count()
    if cfg.hot_key_cap is None:
        return {"keys": total, "salted_keys": 0, "parked_keys": 0,
                "salted_records": 0, "parked_records": 0}
    low_cap = min(cfg.hot_key_cap, cfg.pho_key_cap or cfg.hot_key_cap)
    nmap = {r["bkey"]: r["n"] for r in counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], low_cap)),
        batch_format="pyarrow").take_all()}
    hot = _hot_entries(nmap.items(), cfg.hot_key_cap,
                       cfg.park_degenerate_hot_keys, cfg.park_key_above,
                       cfg.pho_key_cap)
    parked = [k for k, v in hot.items() if v == -1]
    salted = [k for k, v in hot.items() if v > 0]
    return {"keys": total,
            "salted_keys": len(salted), "parked_keys": len(parked),
            "salted_records": int(sum(nmap[k] for k in salted)),
            "parked_records": int(sum(nmap[k] for k in parked))}


def _find_hot_keys(key_rows: Dataset, cap: int, park_degenerate: bool,
                   park_above: int | None = None,
                   pho_cap: int | None = None) -> dict[str, int]:
    """Count pre-pass over key rows → hot map (see _hot_from_counts)."""
    return _hot_from_counts(key_counts(key_rows), cap, park_degenerate,
                            park_above, pho_cap)


def _salt_batch(batch: pa.Table, hot: dict[str, int]) -> pa.Table:
    """Rewrite hot keys to 'key#salt' sub-keys, add liaison rows, drop
    parked (n_salts = -1) key rows."""
    bkeys = batch["bkey"].to_numpy(zero_copy_only=False)
    ids = batch["source_record_id"].to_numpy(zero_copy_only=False)
    out = bkeys.copy()
    keep = np.ones(len(bkeys), dtype=bool)
    liaison_rows: list[int] = []
    for i, k in enumerate(bkeys):
        n_salts = hot.get(k)
        if n_salts is None:
            continue
        if n_salts < 0:  # parked
            keep[i] = False
            continue
        out[i] = f"{k}#{_salt_of(ids[i], n_salts)}"
        if _is_liaison_member(ids[i], n_salts):
            liaison_rows.append(i)
    t = batch.set_column(batch.column_names.index("bkey"), "bkey",
                         pa.array(out, pa.string()))
    parts = [t.filter(pa.array(keep)) if not keep.all() else t]
    if liaison_rows:
        lia = batch.take(pa.array(liaison_rows, pa.int64()))
        lia = lia.set_column(
            lia.column_names.index("bkey"), "bkey",
            pa.array([f"{k}#L" for k in lia["bkey"].to_pylist()], pa.string()))
        parts.append(lia)
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def _pairs_schema() -> pa.Schema:
    fields = []
    for c in _CARRY:
        fields.append((f"{c}_a", pa.string()))
        fields.append((f"{c}_b", pa.string()))
    return pa.schema(fields)


def _rank_arrays(group: pa.Table, hot: dict[str, int]) -> dict[str, np.ndarray]:
    """Per-row per-type salted-key info: key string, salt, liaison flag.
    Parked keys (n_salts = -1) are nulled — they never co-locate a pair."""
    ids = group["source_record_id"].to_numpy(zero_copy_only=False)
    out: dict[str, np.ndarray] = {"ids": ids}
    for t in _TYPES:
        raw = group[f"k_{t}"].to_numpy(zero_copy_only=False)
        keys = np.array([None if (k is None or k == "") else k for k in raw],
                        dtype=object)
        n_salts = np.array([hot.get(f"{t}|{k}", 0) if k is not None else 0
                            for k in keys], dtype=np.int64)
        keys = np.where(n_salts < 0, None, keys)   # parked → unusable
        n_salts = np.maximum(n_salts, 0)
        salts = np.array([_salt_of(i, n) if n > 0 else -1
                          for i, n in zip(ids, n_salts)], dtype=np.int64)
        lia = np.array([_is_liaison_member(i, n) if n > 0 else False
                        for i, n in zip(ids, n_salts)], dtype=bool)
        out[f"key_{t}"] = keys
        out[f"nsalt_{t}"] = n_salts
        out[f"salt_{t}"] = salts
        out[f"lia_{t}"] = lia
    return out


def make_runs_pair_emitter(hot: dict[str, int], new_ids_ref=None):
    """Block-level pair emitter: vectorizes pair generation + the
    min-common-key precedence across ALL runs of a sorted block at once.
    Keys are dictionary-encoded to int codes (object-string comparisons
    over k² pair arrays were the hot-block straggler).

    ``new_ids_ref`` (incremental path): a ``ray.put`` broadcast of the
    delta's record ids — pairs without a new endpoint are masked out
    right after index generation, BEFORE the precedence compute and the
    payload gather. Touched buckets at the bench's 14% world delta emit
    2.7× more raw pairs than survive the new-endpoint filter (1.95M vs
    713k), so the early mask removes ~2/3 of the emitter's work; the
    surviving pair SET is identical to filtering afterwards."""

    def emit_runs(b: pa.Table, starts, ends) -> pa.Table:
        if len(starts) == 0:
            return _pairs_schema().empty_table()
        ids = b["source_record_id"].to_numpy(zero_copy_only=False)
        bkeys = b["bkey"].to_numpy(zero_copy_only=False)
        n = b.num_rows
        isnew = None
        if new_ids_ref is not None:
            isnew = pc.is_in(
                b["source_record_id"],
                value_set=ray.get(new_ids_ref)).to_numpy(
                zero_copy_only=False).astype(bool)

        # per-type per-row: int key codes (−1 null/parked), salts, liaison
        codes: dict[str, np.ndarray] = {}
        salts: dict[str, np.ndarray] = {}
        lias: dict[str, np.ndarray] = {}
        for t in _TYPES:
            col = b[f"k_{t}"]
            enc = pc.dictionary_encode(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            uniq = enc.dictionary.to_pylist()
            if not uniq:  # type entirely null in this block (sparse feeds)
                codes[t] = np.full(n, -1, dtype=np.int64)
                salts[t] = np.full(n, -1, dtype=np.int64)
                lias[t] = np.zeros(n, dtype=bool)
                continue
            idx = pc.fill_null(enc.indices, -1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            # per-unique: n_salts (0 not hot, -1 parked)
            u_nsalt = np.array([hot.get(f"{t}|{u}", 0) if u not in (None, "") else 0
                                for u in uniq], dtype=np.int64)
            u_valid = np.array([u not in (None, "") for u in uniq], dtype=bool)
            row_nsalt = np.where(idx >= 0, u_nsalt[np.maximum(idx, 0)], 0)
            row_valid = (idx >= 0) & np.where(idx >= 0, u_valid[np.maximum(idx, 0)], False)
            code = np.where(row_valid & (row_nsalt >= 0), idx, -1)
            codes[t] = code
            need = code >= 0
            srow = np.full(n, -1, dtype=np.int64)
            lrow = np.zeros(n, dtype=bool)
            hot_rows = np.nonzero(need & (row_nsalt > 0))[0]
            for i in hot_rows:
                ns = row_nsalt[i]
                srow[i] = _salt_of(ids[i], ns)
                lrow[i] = _is_liaison_member(ids[i], ns)
            salts[t] = srow
            lias[t] = lrow

        # pair index arrays across all runs + per-pair own rank
        ai_parts, bi_parts, rank_parts = [], [], []
        for s_, e_ in zip(starts, ends):
            k = e_ - s_
            if k < 2:
                continue
            own = bkeys[s_]
            own_raw, _, own_suffix = own.partition("#")
            own_type = own_raw.partition("|")[0]
            own_rank = (10 + _TYPES.index(own_type)) if own_suffix == "L" \
                else _TYPES.index(own_type)
            run_idx = np.arange(s_, e_)
            order = run_idx[np.argsort(ids[s_:e_])]
            iu, ju = np.triu_indices(k, k=1)
            if isnew is not None:
                keep = isnew[order[iu]] | isnew[order[ju]]
                if not keep.any():
                    continue
                iu, ju = iu[keep], ju[keep]
            ai_parts.append(order[iu])
            bi_parts.append(order[ju])
            rank_parts.append(np.full(len(iu), own_rank, dtype=np.int64))
        if not ai_parts:
            return _pairs_schema().empty_table()
        ai = np.concatenate(ai_parts)
        bi = np.concatenate(bi_parts)
        own_rank = np.concatenate(rank_parts)

        best = np.full(len(ai), 99, dtype=np.int64)
        for ti, t in enumerate(_TYPES):
            code = codes[t]
            eq = (code[ai] >= 0) & (code[ai] == code[bi])
            if not eq.any():
                continue
            hot_t = salts[t][ai] >= 0
            co_sub = eq & (~hot_t | (salts[t][ai] == salts[t][bi]))
            best = np.minimum(best, np.where(co_sub, ti, 99))
            co_lia = eq & hot_t & lias[t][ai] & lias[t][bi]
            best = np.minimum(best, np.where(co_lia, 10 + ti, 99))

        mask = best == own_rank
        if not mask.any():
            return _pairs_schema().empty_table()
        ai, bi = ai[mask], bi[mask]
        cols: dict[str, pa.Array] = {}
        for c in _CARRY:
            arr = b[c].combine_chunks() if isinstance(b[c], pa.ChunkedArray) else b[c]
            cols[f"{c}_a"] = arr.take(pa.array(ai))
            cols[f"{c}_b"] = arr.take(pa.array(bi))
        return pa.table(cols)

    return emit_runs


def make_pair_emitter(hot: dict[str, int]):
    """Group fn emitting each canonical pair exactly once (min common
    salted key wins). `hot` maps raw 'type|key' → n_salts."""

    def emit(group: pa.Table) -> pa.Table:
        k = group.num_rows
        if k < 2:
            return _pairs_schema().empty_table()
        own = group["bkey"][0].as_py()
        own_raw, _, own_suffix = own.partition("#")
        own_type = own_raw.partition("|")[0]
        own_is_liaison = own_suffix == "L"
        own_rank = (10 + _TYPES.index(own_type)) if own_is_liaison \
            else _TYPES.index(own_type)

        info = _rank_arrays(group, hot)
        ids = info["ids"]
        order = np.argsort(ids)
        iu, ju = np.triu_indices(k, k=1)
        ai, bi = order[iu], order[ju]

        best = np.full(len(ai), 99, dtype=np.int64)
        for ti, t in enumerate(_TYPES):
            keys = info[f"key_{t}"]
            ka, kb = keys[ai], keys[bi]
            eq = (ka == kb) & (ka != None)  # noqa: E711 (vectorized object cmp)
            if not eq.any():
                continue
            nsalt = info[f"nsalt_{t}"]
            salt = info[f"salt_{t}"]
            lia = info[f"lia_{t}"]
            hot_t = nsalt[ai] > 0
            # co-located in the same salted sub-block (or key not hot)
            co_sub = eq & (~hot_t | (salt[ai] == salt[bi]))
            best = np.minimum(best, np.where(co_sub, ti, 99))
            # co-located in the liaison sub-block of this type
            co_lia = eq & hot_t & lia[ai] & lia[bi]
            best = np.minimum(best, np.where(co_lia, 10 + ti, 99))

        mask = best == own_rank
        if not mask.any():
            return _pairs_schema().empty_table()
        ai, bi = ai[mask], bi[mask]
        cols: dict[str, pa.Array] = {}
        for c in _CARRY:
            arr = group[c].combine_chunks() if isinstance(group[c], pa.ChunkedArray) else group[c]
            cols[f"{c}_a"] = arr.take(pa.array(ai))
            cols[f"{c}_b"] = arr.take(pa.array(bi))
        return pa.table(cols)

    return emit


def blocking_key_rows(unified: Dataset, cfg: BlockingConfig | None = None) -> Dataset:
    """unified records → exploded blocking key rows (one row per key a
    record carries, payload attached). The shared front half of
    ``blocking_pairs`` / ``delta_blocking_pairs``."""
    cfg = cfg or BlockingConfig()
    return unified.map_batches(
        lambda b: _key_rows_batch(b, cfg.use_phonetic_key),
        batch_format="pyarrow")


def blocking_pairs(unified: Dataset, cfg: BlockingConfig | None = None,
                   *, counts: Dataset | None = None) -> Dataset:
    """unified records → duplicate-free candidate pairs with payloads.

    ONE groupby shuffle for pair generation (plus the small count
    pre-pass when hot-key capping is on); no dedup shuffle — see module
    docstring. Pass ``counts`` (a persisted ``key_counts`` stage output)
    to skip the pre-pass — the incremental path's blocking state."""
    cfg = cfg or BlockingConfig()
    key_rows = blocking_key_rows(unified, cfg)

    hot: dict[str, int] = {}
    if cfg.hot_key_cap:
        hot = _hot_from_counts(
            counts if counts is not None else key_counts(key_rows),
            cfg.hot_key_cap,
            cfg.park_degenerate_hot_keys, cfg.park_key_above,
            cfg.pho_key_cap)
        if hot:
            hot_ref = ray.put(hot)

            def salt(batch: pa.Table) -> pa.Table:
                return _salt_batch(batch, ray.get(hot_ref))

            key_rows = key_rows.map_batches(salt, batch_format="pyarrow")

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(key_rows, "bkey", out_schema=_pairs_schema(),
                         runs_fn=make_runs_pair_emitter(hot))


def _counts_probe_block(t: pa.Table, tset, low_cap) -> pa.Table | None:
    """One (bkey, n) counts block filtered to touched-or-hot rows with
    an is_touched flag — the single scatter_blocks pass that replaces
    the separate touched-slice and hot-candidate Dataset stages of the
    incremental hot-map rebuild."""
    if t.num_rows == 0 or "bkey" not in t.column_names:
        return None
    tch = pc.is_in(t["bkey"], value_set=tset)
    mask = tch if low_cap is None else pc.or_(tch, pc.greater(t["n"], low_cap))
    f = t.filter(mask)
    return pa.table({"bkey": f["bkey"], "n": pc.cast(f["n"], pa.int64()),
                     "is_touched": pc.is_in(f["bkey"], value_set=tset)})


# delta corpora below this row count emit their key rows / counts as
# driver-local Arrow kernels (the exploded key rows are ~5× the docs;
# 200k docs ≈ 1M key rows ≈ tens of MB) — above it the Dataset path runs
_DELTA_LOCAL_ROWS_BOUND = 200_000


def delta_blocking_pairs(unified_all: Dataset, new_ids,
                         cfg: BlockingConfig | None = None,
                         unified_new: Dataset | None = None,
                         prior_counts: Dataset | None = None,
                         return_counts: bool = False):
    """Incremental blocking: candidate pairs with ≥ 1 endpoint among
    ``new_ids``, emitted from exactly the buckets a new record touches —
    the delta pass that lets a 0.1% corpus addition skip re-scoring the
    other 99.9%.

    Why this is exact: the pair emitter's min-common-key rule reads only
    a pair's carried keys + the broadcast hot map — never bucket
    contents — so a touched bucket emits the same pairs it would in a
    full run; any pair with a new endpoint has ALL its buckets touched
    (every key of a new record is a touched key), so it is emitted by
    its deciding bucket; and every old–old pair was already emitted by
    the prior run under the same rule, so dropping them loses nothing.
    The hot map is recomputed over the FULL key universe (the count
    pre-pass is a cheap column aggregate, not pair work) so salting
    matches a fresh full run; exactness therefore assumes the delta
    does not flip a key across the hot threshold mid-epoch — the
    documented stable-hot-map regime.

    Scale shape: ``new_ids`` and the touched-key set are delta-bounded
    broadcasts (``ray.put`` once, ``pc.is_in`` per batch); pair
    emission runs on the touched subset only. With ``prior_counts`` (a
    persisted ``key_counts`` stage output from the prior run) the
    hot-key map is rebuilt from prior + delta counts — EXACTLY the
    combined-corpus map a full run would compute — without the
    corpus-wide count pre-pass, and the corpus key-row pass streams
    straight into the touched-bucket filter with no materialize.
    ``return_counts=True`` additionally returns the combined counts
    Dataset so chained increments stay delta-cheap."""
    cfg = cfg or BlockingConfig()

    nid_arr = pa.array(sorted(set(new_ids)), pa.string())
    nid_ref = ray.put(nid_arr)

    touched: list | None = None
    dpart: Dataset | None = None
    if unified_new is not None:
        # ONE delta key pass yields both the touched-key set (a new
        # record's keys ARE the touched keys) and the delta's count
        # partials (bkeys repeat across blocks; the merge's grouped Sum
        # finishes them) — no delta-side shuffle at all. Small deltas
        # run the same kernels driver-locally (zero Ray stages — the
        # delta's exploded key rows are delta-bounded by definition).
        if unified_new.count() <= _DELTA_LOCAL_ROWS_BOUND:
            import ray.data as _rd

            new_tbl = pa.concat_tables(
                [t for t in ray.get(unified_new.to_arrow_refs())
                 if t.num_rows], promote_options="default")
            krows = _key_rows_batch(new_tbl, cfg.use_phonetic_key)
            ptbl = (krows.select(["bkey"]).group_by("bkey")
                    .aggregate([([], "count_all")])
                    .rename_columns(["bkey", "n"]))
            ptbl = ptbl.set_column(
                1, "n", pc.cast(ptbl["n"], pa.int64())).combine_chunks()
            dpart = _rd.from_arrow(ptbl)
        else:
            delta_rows = blocking_key_rows(unified_new, cfg)
            dpart = partial_key_counts(delta_rows).materialize()
            ptbl = pa.concat_tables(ray.get(dpart.to_arrow_refs()),
                                    promote_options="default")
        touched = pc.unique(ptbl["bkey"].combine_chunks()).to_pylist()

    key_rows = blocking_key_rows(unified_all, cfg)
    combined_counts: Dataset | None = None
    hot: dict[str, int] = {}
    if prior_counts is not None and dpart is not None \
            and len(touched) <= _TOUCHED_LOCAL_BOUND:
        # Only TOUCHED keys can change count, so the combined-corpus
        # counts/hot-map rebuild needs no shuffle at all: sum the
        # touched slice driver-locally (delta-bounded) and splice it
        # over the prior counts with a map-only filter. Hot entries for
        # untouched keys are read off the prior counts unchanged; the
        # touched slice is re-decided exactly — together identical to
        # `_hot_from_counts(merge_key_counts(prior, delta))`.
        from payor_linkage.rayutil import scatter_blocks

        tset_arr = pa.array(sorted(touched), pa.string())
        tset_ref = ray.put(tset_arr)

        def drop_touched(b: pa.Table) -> pa.Table:
            return b.filter(pc.invert(pc.is_in(
                b["bkey"], value_set=ray.get(tset_ref))))

        # ONE raw-task scatter over the prior counts yields both the
        # touched slice (spliced with the delta partials below) and the
        # untouched hot-candidate rows — replacing two sequential
        # Dataset stages (touched filter + _hot_from_counts pre-pass)
        low_cap = (min(cfg.hot_key_cap, cfg.pho_key_cap or cfg.hot_key_cap)
                   if cfg.hot_key_cap else None)
        probe = scatter_blocks(
            prior_counts, _counts_probe_block, tset_arr, low_cap,
            schema=pa.schema([("bkey", pa.string()), ("n", pa.int64()),
                              ("is_touched", pa.bool_())]))
        pt = probe.filter(probe["is_touched"]).select(["bkey", "n"])
        merged = (pa.concat_tables(
            [pt, ptbl.select(["bkey", "n"])],
            promote_options="default")
            .group_by("bkey").aggregate([("n", "sum")])
            .rename_columns(["bkey", "n"]))
        merged = merged.set_column(
            1, "n", pc.cast(merged["n"], pa.int64())).combine_chunks()
        import ray.data as _rd

        combined_counts = prior_counts.map_batches(
            drop_touched, batch_format="pyarrow").union(
            _rd.from_arrow(merged))
        if cfg.hot_key_cap:
            uh = probe.filter(pc.and_(
                pc.invert(probe["is_touched"].combine_chunks()),
                pc.greater(probe["n"].combine_chunks(), low_cap)))
            hot = _hot_entries(
                zip(uh["bkey"].to_pylist(), uh["n"].to_pylist()),
                cfg.hot_key_cap, cfg.park_degenerate_hot_keys,
                cfg.park_key_above, cfg.pho_key_cap)
            hot.update(_hot_from_table(merged, cfg.hot_key_cap,
                                       cfg.park_degenerate_hot_keys,
                                       cfg.park_key_above,
                                       cfg.pho_key_cap))
    elif prior_counts is not None and dpart is not None:
        # adversarially wide delta: fall back to the distributed merge
        combined_counts = merge_key_counts(prior_counts, dpart) \
            .materialize()
        if cfg.hot_key_cap:
            hot = _hot_from_counts(combined_counts, cfg.hot_key_cap,
                                   cfg.park_degenerate_hot_keys,
                                   cfg.park_key_above, cfg.pho_key_cap)
    else:
        # no prior state — fall back to the corpus-wide pre-pass
        key_rows = key_rows.materialize()
        if return_counts or cfg.hot_key_cap:
            combined_counts = key_counts(key_rows).materialize()
        if cfg.hot_key_cap:
            hot = _hot_from_counts(combined_counts, cfg.hot_key_cap,
                                   cfg.park_degenerate_hot_keys,
                                   cfg.park_key_above, cfg.pho_key_cap)

    if touched is None:
        def only_new(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["source_record_id"],
                                     value_set=ray.get(nid_ref)))

        touched = key_rows.map_batches(only_new, batch_format="pyarrow") \
            .unique("bkey")
    tkey_ref = ray.put(pa.array(sorted(touched), pa.string()))
    hot_ref = ray.put(hot)

    def touched_salted(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["bkey"], value_set=ray.get(tkey_ref)))
        return _salt_batch(b, ray.get(hot_ref)) if hot else b

    sub = key_rows.map_batches(touched_salted, batch_format="pyarrow")

    from payor_linkage.rayutil import grouped_apply

    # the touched subset is delta-bounded → below the driver tier the
    # emission skips grouped_apply's repartition+sort shuffles (the
    # emitter itself is scattered back over Ray tasks by
    # local_grouped_runs, so pair compute stays parallel)
    pairs = grouped_apply(sub, "bkey", out_schema=_pairs_schema(),
                          runs_fn=make_runs_pair_emitter(
                              hot, new_ids_ref=nid_ref),
                          local_rows_bound=_PAIRS_LOCAL_BOUND)

    def with_new_endpoint(b: pa.Table) -> pa.Table:
        nid = ray.get(nid_ref)
        return b.filter(pc.or_(
            pc.is_in(b["source_record_id_a"], value_set=nid),
            pc.is_in(b["source_record_id_b"], value_set=nid)))

    out = pairs.map_batches(with_new_endpoint, batch_format="pyarrow")
    if return_counts:
        return out, combined_counts
    return out

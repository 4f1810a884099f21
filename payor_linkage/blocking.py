"""Blocking: key emission → hot-key salting → pair generation → pair dedup.

Replaces the reference's blocking self-join
(`/root/reference/transform/payor_mdm/models/match/int_blocking_pairs.sql:11-33`)
with a shuffle-on-block-key design (SURVEY §2.4 J1):

1. every record is exploded to one key-row per blocking key it carries
   (tax key only when non-empty — the SQL's explicit guard; name / zip3
   keys always, with the reference's 'XX'/'XXX' null-coalescing; plus the
   Soundex phonetic key);
2. a *small* count pre-pass finds hot keys (skew!); hot keys are salted
   into bounded sub-blocks by hash-of-record-id, with chain-link pairs
   between consecutive sub-block anchors so transitive clustering can
   still reunite a genuinely-same-entity mega block; degenerate hot keys
   (built purely from null coalescing) are parked;
3. ``groupby(bkey).map_groups`` emits canonical a<b pairs carrying both
   records' comparison payloads (avoids the reference's two join-backs,
   `int_match_scored.sql:49-51`);
4. exact pair dedup (a pair can arise from several keys — the SQL's
   SELECT DISTINCT) as a ``groupby(pair_key).aggregate(Min(...))``:
   payloads are identical across duplicates, so Min is a pure first-value
   with no per-group Python.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Min

from payor_linkage.config import BlockingConfig
from payor_linkage.schema import PAIR_PAYLOAD_FIELDS

# columns carried through pair generation (payload for the scorer)
_CARRY = ["source_record_id"] + PAIR_PAYLOAD_FIELDS


def _key_rows_batch(batch: pa.Table, use_phonetic: bool) -> pa.Table:
    """Explode each record into one row per blocking key it participates in."""
    carry = {c: batch[c] for c in _CARRY}
    pieces = []

    def mk(block_type: str, keys: pa.ChunkedArray | pa.Array, valid: pa.Array | None):
        t = pa.table({
            "bkey": pc.binary_join_element_wise(
                pa.array([block_type] * batch.num_rows), pc.cast(keys, pa.string()), "|"),
            **carry,
        })
        if valid is not None:
            t = t.filter(valid)
        pieces.append(t)

    # Block 2 (tax): both non-null and non-empty — int_blocking_pairs.sql:22-26
    tax = batch["block_tax_id"]
    mk("tax", tax, pc.and_(pc.is_valid(tax), pc.not_equal(pc.coalesce(tax, pa.scalar("")), "")))
    # Block 1 (name6+state) and Block 3 (zip3+name4): always non-null by construction
    mk("name", batch["block_name_key"], None)
    mk("zip", batch["block_zip3_name4"], None)
    if use_phonetic and "block_phonetic" in batch.column_names:
        pho = batch["block_phonetic"]
        mk("pho", pho, pc.is_valid(pho))
    return pa.concat_tables(pieces)


def _is_degenerate_key(bkey: str) -> bool:
    """Keys built purely from null coalescing carry no matching signal.
    name key = name6+state ('XX' when null state): empty name → only the
    2-char state remains. zip key = zip3('XXX')+name4: empty name → 3 chars.
    Pairing those would be O(records-per-state²) noise — the reference's
    unhandled skew cliff (SURVEY §4)."""
    btype, _, key = bkey.partition("|")
    if btype == "name":
        return len(key) <= 2
    if btype == "zip":
        return len(key) <= 3
    return False


def _find_hot_keys(key_rows: Dataset, cap: int) -> dict[str, int]:
    """Count pre-pass → {bkey: n_records} for keys above the cap.
    Hot keys are by definition few; the collected result is tiny."""
    counts = key_rows.groupby("bkey").count()
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], cap)), batch_format="pyarrow")
    return {r["bkey"]: r["count()"] for r in hot.take_all()}


def _salt_batch(batch: pa.Table, hot: dict[str, int], cap: int, park_degenerate: bool) -> pa.Table:
    """Rewrite hot keys to 'key#salt' sub-keys; park degenerate hot keys.

    Connectivity: records whose (stable) hash lands in salt 0 are *also*
    emitted into a liaison sub-block 'key#L' (expected size ≈ cap, members
    from every salt w.h.p.), so the liaison block's pairs transitively link
    all sub-blocks of a genuinely-same-entity mega key — the clustering
    stage reunites them. Uses crc32, not Python hash() (which is
    process-randomized and would break determinism across workers)."""
    bkeys = batch["bkey"].to_numpy(zero_copy_only=False)
    ids = batch["source_record_id"].to_numpy(zero_copy_only=False)
    out = bkeys.copy()
    keep = np.ones(len(bkeys), dtype=bool)
    liaison_rows: list[int] = []
    for i, k in enumerate(bkeys):
        n = hot.get(k)
        if n is None:
            continue
        if park_degenerate and _is_degenerate_key(k):
            keep[i] = False
            continue
        n_salts = -(-n // cap)
        salt = zlib.crc32(ids[i].encode()) % n_salts
        out[i] = f"{k}#{salt}"
        if salt == 0 and n_salts > 1:
            liaison_rows.append(i)
    t = batch.set_column(batch.column_names.index("bkey"), "bkey", pa.array(out, pa.string()))
    parts = [t.filter(pa.array(keep)) if not keep.all() else t]
    if liaison_rows:
        lia = batch.take(pa.array(liaison_rows, pa.int64()))
        lia = lia.set_column(
            lia.column_names.index("bkey"), "bkey",
            pa.array([f"{k}#L" for k in lia["bkey"].to_pylist()], pa.string()))
        parts.append(lia)
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]


def _emit_pairs(group: pa.Table) -> pa.Table:
    """All canonical (a<b) pairs within one block, payloads attached."""
    k = group.num_rows
    if k < 2:
        return _empty_pairs_table()
    ids = group["source_record_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)  # canonical ordering → a < b by construction
    iu, ju = np.triu_indices(k, k=1)
    ai, bi = order[iu], order[ju]
    cols: dict[str, pa.Array] = {
        "pair_key": pa.array(np.char.add(np.char.add(ids[ai].astype(str), "|"),
                                         ids[bi].astype(str))),
    }
    for c in _CARRY:
        arr = group[c].combine_chunks() if isinstance(group[c], pa.ChunkedArray) else group[c]
        cols[f"{c}_a" if c != "source_record_id" else "source_record_id_a"] = arr.take(pa.array(ai))
        cols[f"{c}_b" if c != "source_record_id" else "source_record_id_b"] = arr.take(pa.array(bi))
    return pa.table(cols)


def _pairs_schema() -> pa.Schema:
    fields = [("pair_key", pa.string())]
    for c in _CARRY:
        name = "source_record_id" if c == "source_record_id" else c
        fields.append((f"{name}_a", pa.string()))
        fields.append((f"{name}_b", pa.string()))
    return pa.schema(fields)


def _empty_pairs_table() -> pa.Table:
    return _pairs_schema().empty_table()


def blocking_pairs(unified: Dataset, cfg: BlockingConfig | None = None) -> Dataset:
    """unified records → deduped candidate pairs with payloads.

    Shuffles: groupby(bkey) for pair generation + groupby(pair_key) for
    dedup. Hot keys are salted (bounded sub-blocks) after a count
    pre-pass; parked/salted volume is reported via `blocking_skew_report`.
    """
    cfg = cfg or BlockingConfig()
    key_rows = unified.map_batches(
        lambda b: _key_rows_batch(b, cfg.use_phonetic_key), batch_format="pyarrow")

    if cfg.hot_key_cap:
        hot = _find_hot_keys(key_rows, cfg.hot_key_cap)
        if hot:
            hot_ref = ray.put(hot)
            cap = cfg.hot_key_cap
            park = cfg.park_degenerate_hot_keys

            def salt(batch: pa.Table) -> pa.Table:
                return _salt_batch(batch, ray.get(hot_ref), cap, park)

            key_rows = key_rows.map_batches(salt, batch_format="pyarrow")

    pairs = key_rows.groupby("bkey").map_groups(
        _emit_pairs, batch_format="pyarrow")

    # exact pair dedup (SELECT DISTINCT): payloads identical per pair_key →
    # Min == first value; one aggregate shuffle, no per-group Python.
    agg_cols = [c for c in _pairs_schema().names if c != "pair_key"]
    deduped = pairs.groupby("pair_key").aggregate(
        *[Min(c, alias_name=c, ignore_nulls=True) for c in agg_cols])
    return deduped

"""Change-data-capture operators over keyed snapshots: diff two table
versions (added / removed / changed / unchanged) and apply a delta to a
base snapshot (last-writer-wins upsert / MERGE).

The MDM-adjacent maintenance primitives: a linkage pipeline re-runs on a
new landing drop and the steward wants "what changed since yesterday";
an incremental pipeline applies today's delta to yesterday's golden
snapshot without recomputing it.

Both operators are ONE shuffle: each side is tagged map-only into a
common (key, per-side value, per-side presence flag) surface, the two
streams union, and a single grouped aggregate collapses each key — no
join machinery, no driver materialization. A snapshot by contract holds
at most one row per key, so per-side ``Sum`` is exact value carriage
(the numeric-value contract; integers recommended so nothing
order-dependent crosses the shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _tagged(ds: Dataset, key: str, val: str, side: int) -> Dataset:
    def f(b: pa.Table) -> pa.Table:
        v = b[val].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(b.num_rows, dtype=np.int64)
        return pa.table({
            key: b[key],
            "_v0": pa.array(v if side == 0 else z, pa.int64()),
            "_v1": pa.array(v if side == 1 else z, pa.int64()),
            "_h0": pa.array(np.full(b.num_rows, 1 - side, np.int64)),
            "_h1": pa.array(np.full(b.num_rows, side, np.int64)),
        })

    return ds.select_columns([key, val]).map_batches(
        f, batch_format="pyarrow")


def _collapse(old: Dataset, new: Dataset, key: str, val: str) -> Dataset:
    from ray.data.aggregate import Max, Sum

    both = _tagged(old, key, val, 0).union(_tagged(new, key, val, 1))
    return both.groupby(key).aggregate(
        Sum("_v0", alias_name="_v0"), Sum("_v1", alias_name="_v1"),
        Max("_h0", alias_name="_h0"), Max("_h1", alias_name="_h1"))


def snapshot_diff(old: Dataset, new: Dataset, key: str, val: str,
                  out_old: str = "old_val", out_new: str = "new_val",
                  out_change: str = "change") -> Dataset:
    """Classify every key across two snapshot versions:
    ``added`` (key only in new), ``removed`` (only in old), ``changed``
    (both, value differs), ``unchanged``. Absent-side values surface as
    0 with the presence encoded in ``change`` — the FULL OUTER JOIN +
    CASE shape, executed as one tagged-union grouped aggregate."""
    def classify(b: pa.Table) -> pa.Table:
        h0 = b["_h0"].to_numpy(zero_copy_only=False).astype(bool)
        h1 = b["_h1"].to_numpy(zero_copy_only=False).astype(bool)
        v0 = b["_v0"].to_numpy(zero_copy_only=False)
        v1 = b["_v1"].to_numpy(zero_copy_only=False)
        change = np.select(
            [~h0, ~h1, v0 != v1],
            ["added", "removed", "changed"], default="unchanged")
        return pa.table({
            key: b[key],
            out_old: pa.array(v0, pa.int64()),
            out_new: pa.array(v1, pa.int64()),
            out_change: pa.array(change.tolist(), pa.string()),
        })

    return _collapse(old, new, key, val).map_batches(
        classify, batch_format="pyarrow")


def scd2_history(events: Dataset, key: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "event_type") -> Dataset:
    """Slowly-changing-dimension Type-2 history build: collapse an
    ordered per-key observation stream into validity intervals — one row
    per *run of equal values*, with ``valid_from`` (first observation of
    the run), ``valid_to`` (start of the next run, NULL for the current
    row) and a 1-based ``version``. The LAG-change-detect + LEAD-close
    window shape as one distributed pass.

    One grouped sort; change detection is a dictionary-encoded
    code-shift compare vectorized across every run in a block (the
    rid-primary lexsort keeps runs on their span offsets, so run firsts
    sit exactly at the original start positions)."""
    import pyarrow.compute as pc

    from payor_linkage.rayutil import grouped_apply

    s = events.schema().base_schema
    key_type = s.field(key).type
    out_schema = pa.schema([(key, key_type), (value_col, pa.string()),
                            ("valid_from", pa.timestamp("us")),
                            ("valid_to", pa.timestamp("us")),
                            ("version", pa.int64())])

    slim = events.map_batches(
        lambda b: pa.table({key: b[key],
                            "_ts": pc.cast(pc.cast(b[ts_col],
                                                   pa.timestamp("us")),
                                           pa.int64()),
                            "_id": b[id_col],
                            value_col: b[value_col]}),
        batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        lo, hi = starts[0], ends[-1]
        ts = b["_ts"].to_numpy(zero_copy_only=False)[lo:hi]
        eid = b["_id"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, rid))
        vals = b[value_col].combine_chunks().take(pa.array(order + lo))
        codes = vals.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        t = ts[order]
        n = len(t)
        change = np.zeros(n, dtype=bool)
        change[starts - lo] = True
        change[1:] |= codes[1:] != codes[:-1]
        ch = np.flatnonzero(change)
        ch_r = rid[ch]  # rid-primary sort: rid[order] == rid
        # close each interval at the next change of the SAME run
        nxt = np.concatenate([t[ch[1:]], [0]])
        open_end = np.concatenate([ch_r[1:] != ch_r[:-1], [True]])
        firsts = np.flatnonzero(
            np.concatenate([[True], ch_r[1:] != ch_r[:-1]]))
        counts = np.diff(np.append(firsts, len(ch)))
        version = np.arange(len(ch)) - np.repeat(firsts, counts) + 1
        return pa.table({
            key: b[key].combine_chunks().take(pa.array(order[ch] + lo)),
            value_col: vals.take(pa.array(ch)),
            "valid_from": pa.array(t[ch], pa.int64())
                .cast(pa.timestamp("us")),
            "valid_to": pa.array(nxt, pa.int64(), mask=open_end)
                .cast(pa.timestamp("us")),
            "version": pa.array(version, pa.int64()),
        }).cast(out_schema)

    return grouped_apply(slim, key, out_schema=out_schema, runs_fn=runs)


def apply_upsert(base: Dataset, delta: Dataset, key: str, val: str,
                 out_val: str | None = None) -> Dataset:
    """MERGE / last-writer-wins upsert: one row per key; the delta's
    value wins where present, the base's survives otherwise, and
    delta-only keys insert. Same one-shuffle tagged-union shape as
    ``snapshot_diff``."""
    out = out_val or val

    def pick(b: pa.Table) -> pa.Table:
        h1 = b["_h1"].to_numpy(zero_copy_only=False).astype(bool)
        v0 = b["_v0"].to_numpy(zero_copy_only=False)
        v1 = b["_v1"].to_numpy(zero_copy_only=False)
        return pa.table({
            key: b[key],
            out: pa.array(np.where(h1, v1, v0), pa.int64()),
        })

    return _collapse(base, delta, key, val).map_batches(
        pick, batch_format="pyarrow")

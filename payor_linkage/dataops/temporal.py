"""Temporal operators Ray Data lacks natively: partitioned as-of join.

The as-of join is the canonical "custom operator" case from the build
guide: expressed as a composition of a tagged union + one
``grouped_apply`` sort per partition key — no bespoke task graph.
Partitioning assumption: one partition key (e.g. ``user_id``) whose
per-key row count is bounded (an entity's event history), so a key's
full run fits one block slice; the grouped sort is the only shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from payor_linkage.rayutil import grouped_apply


def asof_join(left: Dataset, right: Dataset, on: str = "user_id",
              ts_col: str = "ts", left_id: str = "event_id",
              right_id: str = "event_id",
              out_col: str = "prior_event_id",
              direction: str = "backward") -> Dataset:
    """For every ``left`` row, attach the nearest ``right`` row in the
    same ``on`` partition — LEFT-join semantics (unmatched → null).
    ``direction="backward"`` (default): greatest right ``ts_col`` ≤ the
    left row's, ties on right timestamps resolving to the max
    ``right_id``; ``direction="forward"``: smallest right ``ts_col`` ≥
    the left row's, ties resolving to the min ``right_id``;
    ``direction="nearest"``: minimal ``|l_ts − r_ts|``, distance ties
    to the EARLIER right timestamp, same-timestamp ties to the min
    ``right_id`` — i.e. SQL's ``ORDER BY abs(diff), r_ts, r_id LIMIT
    1``. All deterministic.

    Output: (``left_id``, ``on``, ``out_col``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction={direction!r}")
    lt = left.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(b[ts_col], pa.int64()),
                            "_lid": b[left_id],
                            "_rid": pa.nulls(b.num_rows, pa.int64()),
                            "_side": pa.array([1] * b.num_rows, pa.int8())}),
        batch_format="pyarrow")
    rt = right.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(b[ts_col], pa.int64()),
                            "_lid": pa.nulls(b.num_rows, pa.int64()),
                            "_rid": b[right_id],
                            "_side": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow")

    s = left.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(left_id, pa.int64()), (on, key_type),
                            (out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False)
        ts = b["_ts"].to_numpy(zero_copy_only=False)
        lid = b["_lid"].to_numpy(zero_copy_only=False)
        rid = b["_rid"].to_numpy(zero_copy_only=False)
        side = b["_side"].to_numpy(zero_copy_only=False)
        out_l, out_k, out_r = [], [], []
        for s, e in zip(starts, ends):
            sl = slice(s, e)
            is_l = side[sl] == 1
            l_ts, l_id = ts[sl][is_l], lid[sl][is_l]
            r_ts, r_id = ts[sl][~is_l], rid[sl][~is_l]
            if len(l_ts) == 0:
                continue
            if len(r_ts) == 0:
                out_l.extend(l_id.tolist())
                out_k.extend([keys[s]] * len(l_id))
                out_r.extend([None] * len(l_id))
                continue
            # sort right by (ts, id): at equal ts, backward's
            # searchsorted 'right' − 1 lands on the LAST entry (max id)
            # and forward's 'left' on the FIRST ≥ ts (min id)
            order = np.lexsort((r_id, r_ts))
            r_ts, r_id = r_ts[order], r_id[order]
            if direction == "backward":
                pos = np.searchsorted(r_ts, l_ts, side="right") - 1
                matched = pos >= 0
                vals = np.where(matched, r_id[np.maximum(pos, 0)], 0)
            elif direction == "forward":
                pos = np.searchsorted(r_ts, l_ts, side="left")
                matched = pos < len(r_ts)
                vals = np.where(matched,
                                r_id[np.minimum(pos, len(r_ts) - 1)], 0)
            else:  # nearest
                nxt = np.searchsorted(r_ts, l_ts, side="right")
                prv = nxt - 1                       # last ts ≤ l_ts
                has_p, has_n = prv >= 0, nxt < len(r_ts)
                dp = l_ts - r_ts[np.maximum(prv, 0)]
                dn = r_ts[np.minimum(nxt, len(r_ts) - 1)] - l_ts
                pick_prev = has_p & (~has_n | (dp <= dn))
                chosen_ts = np.where(pick_prev,
                                     r_ts[np.maximum(prv, 0)],
                                     r_ts[np.minimum(nxt, len(r_ts) - 1)])
                # min right_id at the chosen timestamp: first index of
                # that ts in the (ts, id)-sorted right side
                first = np.searchsorted(r_ts, chosen_ts, side="left")
                matched = has_p | has_n
                vals = np.where(matched, r_id[first], 0)
            out_l.extend(l_id.tolist())
            out_k.extend([keys[s]] * len(l_id))
            out_r.extend([int(v) if m else None
                          for v, m in zip(vals, matched)])
        return pa.table({left_id: pa.array(out_l, pa.int64()),
                         on: pa.array(out_k, key_type),
                         out_col: pa.array(out_r, pa.int64())})

    return grouped_apply(lt.union(rt), on, out_schema=out_schema,
                         runs_fn=runs)


def sessionize_counts(events: Dataset, on: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      gap_us: int = 1_800_000_000) -> Dataset:
    """Gap-based sessionization (streaming-shaped): within each ``on``
    partition, order events by (ts, id) and start a new session whenever
    the gap to the previous event exceeds ``gap_us``. Output one row per
    session: (key, session_seq, n_events). One grouped sort; session
    assignment is a vectorized diff+cumsum per run."""
    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(on, key_type), ("session_seq", pa.int64()),
                            ("n_events", pa.int64())])
    slim = events.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(b[ts_col], pa.int64()),
                            "_id": b[id_col]}),
        batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False)
        ts = b["_ts"].to_numpy(zero_copy_only=False)
        eid = b["_id"].to_numpy(zero_copy_only=False)
        out_k, out_s, out_n = [], [], []
        for st, e in zip(starts, ends):
            t = ts[st:e]
            order = np.lexsort((eid[st:e], t))
            t = t[order]
            brk = np.concatenate([[0], (np.diff(t) > gap_us).astype(np.int64)])
            sess = np.cumsum(brk)
            uniq, cnt = np.unique(sess, return_counts=True)
            out_k.extend([keys[st]] * len(uniq))
            out_s.extend(uniq.tolist())
            out_n.extend(cnt.tolist())
        return pa.table({on: pa.array(out_k, key_type),
                         "session_seq": pa.array(out_s, pa.int64()),
                         "n_events": pa.array(out_n, pa.int64())})

    return grouped_apply(slim, on, out_schema=out_schema, runs_fn=runs)


def range_join_count(left: Dataset, right: Dataset, on: str = "user_id",
                     ts_col: str = "ts", left_id: str = "event_id",
                     lo_offset_us: int = -600_000_000, hi_offset_us: int = 0,
                     out_col: str = "n_in_range") -> Dataset:
    """Interval/range join reduced to a count: for every ``left`` row,
    count ``right`` rows in the same ``on`` partition whose timestamp
    falls in ``[ts + lo_offset_us, ts + hi_offset_us]`` (inclusive).
    Same composition as `asof_join`: tagged union + one grouped sort;
    per-run cost is two binary searches per left row."""
    lt = left.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(b[ts_col], pa.int64()),
                            "_lid": b[left_id],
                            "_side": pa.array([1] * b.num_rows, pa.int8())}),
        batch_format="pyarrow")
    rt = right.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(b[ts_col], pa.int64()),
                            "_lid": pa.nulls(b.num_rows, pa.int64()),
                            "_side": pa.array([0] * b.num_rows, pa.int8())}),
        batch_format="pyarrow")

    s = left.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(left_id, pa.int64()), (on, key_type),
                            (out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False)
        ts = b["_ts"].to_numpy(zero_copy_only=False)
        lid = b["_lid"].to_numpy(zero_copy_only=False)
        side = b["_side"].to_numpy(zero_copy_only=False)
        out_l, out_k, out_n = [], [], []
        for st, e in zip(starts, ends):
            sl = slice(st, e)
            is_l = side[sl] == 1
            l_ts, l_id = ts[sl][is_l], lid[sl][is_l]
            if len(l_ts) == 0:
                continue
            r_ts = np.sort(ts[sl][~is_l])
            lo = np.searchsorted(r_ts, l_ts + lo_offset_us, side="left")
            hi = np.searchsorted(r_ts, l_ts + hi_offset_us, side="right")
            out_l.extend(l_id.tolist())
            out_k.extend([keys[st]] * len(l_id))
            out_n.extend((hi - lo).tolist())
        return pa.table({left_id: pa.array(out_l, pa.int64()),
                         on: pa.array(out_k, key_type),
                         out_col: pa.array(out_n, pa.int64())})

    return grouped_apply(lt.union(rt), on, out_schema=out_schema,
                         runs_fn=runs)


def hopping_window_counts(events: Dataset, window_us: int, hop_us: int,
                          ts_col: str = "ts",
                          key_col: str = "user_id") -> Dataset:
    """Hopping (overlapping/sliding) window counts per key.

    Each event lands in exactly ``window_us // hop_us`` windows
    (``window_us`` must be a multiple of ``hop_us``): window starts are
    hop-aligned, window = [start, start + window_us). Emission is one
    vectorized pass per cover offset — a compile-time constant, never a
    per-event loop — followed by ONE groupby count (the only shuffle,
    over (key, win_start) rows)."""
    import pyarrow.compute as pc

    assert window_us % hop_us == 0, "window must be a multiple of hop"
    covers = window_us // hop_us

    def emit(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts_col], pa.int64())          # µs since epoch
        # FLOOR division (Arrow's integer divide truncates toward zero,
        # which would put pre-1970 events in windows that don't contain
        # them): q - 1 when negative with a nonzero remainder
        q = pc.divide(us, hop_us)
        r = pc.subtract(us, pc.multiply(q, hop_us))
        base = pc.if_else(
            pc.and_(pc.less(us, 0), pc.not_equal(r, 0)),
            pc.subtract(q, 1), q)
        parts = []
        for off in range(covers):
            start = pc.multiply(pc.subtract(base, off), hop_us)
            parts.append(pa.table({key_col: b[key_col],
                                   "win_start": pc.cast(start, pa.int64())}))
        return pa.concat_tables(parts)

    out = (events.map_batches(emit, batch_format="pyarrow")
           .groupby([key_col, "win_start"]).count())
    return out.rename_columns({"count()": "n"})


def funnel_counts(events: Dataset, on: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  from_type: str = "view", to_type: str = "purchase",
                  window_us: int = 600_000_000) -> Dataset:
    """Funnel / conversion analysis: per key, how many ``from_type``
    events were followed by at least one ``to_type`` event within
    ``[ts, ts + window_us]`` (inclusive — pure timestamp comparison, so
    equal-timestamp ordering never matters). Output one row per key
    with ≥ 1 ``from_type`` event: (key, n_from, n_converted).

    Scale shape: rows of other event types are dropped BEFORE the one
    grouped sort; the conversion test is two vectorized ``searchsorted``
    probes over the block's to-event positions (sorted (run, ts) rank
    order doubles as the probe key) — no per-run Python loop."""
    from .aggregates import _run_ids

    import pyarrow.compute as pc

    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(on, key_type), ("n_from", pa.int64()),
                            ("n_converted", pa.int64())])

    def slim(b: pa.Table) -> pa.Table:
        is_a = pc.equal(b[type_col], from_type)
        is_b = pc.equal(b[type_col], to_type)
        t = pa.table({on: b[on], "_ts": pc.cast(b[ts_col], pa.int64()),
                      "_a": is_a, "_b": is_b})
        return t.filter(pc.or_(is_a, is_b))

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        ts = b["_ts"].to_numpy(zero_copy_only=False)[lo:hi]
        a_m = b["_a"].to_numpy(zero_copy_only=False)[lo:hi]
        b_m = b["_b"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((ts, rid))
        ts_s, a_s, b_s, r_s = ts[order], a_m[order], b_m[order], rid
        pos_b = np.nonzero(b_s)[0]
        ts_b, r_b = ts_s[pos_b], r_s[pos_b]
        pos_a = np.nonzero(a_s)[0]
        conv = np.zeros(len(pos_a), dtype=bool)
        if len(pos_b) and len(pos_a):
            # first to-event AFTER the from-event's sorted position: the
            # minimal ts ≥ from-ts among later same-run to-events
            j = np.searchsorted(pos_b, pos_a, side="right")
            jc = np.minimum(j, len(pos_b) - 1)
            conv |= ((j < len(pos_b)) & (r_b[jc] == r_s[pos_a])
                     & (ts_b[jc] <= ts_s[pos_a] + window_us))
            # an equal-ts to-event may sort BEFORE the from-event: the
            # last earlier same-run to-event has the max earlier ts
            jp = np.maximum(j - 1, 0)
            conv |= ((j > 0) & (r_b[jp] == r_s[pos_a])
                     & (ts_b[jp] == ts_s[pos_a]))
        run_of_a = r_s[pos_a]
        uniq, inv = np.unique(run_of_a, return_inverse=True)
        n_from = np.bincount(inv).astype(np.int64)
        n_conv = np.bincount(inv, weights=conv,
                             minlength=len(uniq)).astype(np.int64)
        keys = b[on].take(pa.array(starts[uniq]))
        return pa.table({on: keys, "n_from": pa.array(n_from),
                         "n_converted": pa.array(n_conv)}).cast(out_schema)

    return grouped_apply(events.map_batches(slim, batch_format="pyarrow"),
                         on, out_schema=out_schema, runs_fn=runs)


def transition_counts(events: Dataset, on: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      state_col: str = "event_type") -> Dataset:
    """Markov transition matrix over event sequences: global counts of
    (state → next state) for consecutive events within each partition
    key — the ``LEAD() OVER`` + GROUP BY shape as a distributed
    operator (user-journey / n-gram-over-sessions analytics).

    One grouped sort; transitions are a single shifted comparison
    vectorized across every run in a block (run-crossing positions
    masked), pre-counted per block with one Arrow ``group_by`` C kernel
    so the final exchange moves (state, state, n) partials bounded by
    the state vocabulary squared — never the event stream."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    proj = [on, ts_col, id_col, state_col]
    out_schema = pa.schema([("from_state", pa.string()),
                            ("to_state", pa.string()),
                            ("n", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = b[ts_col].to_numpy(zero_copy_only=False)[lo:hi]
        eid = b[id_col].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, rid))
        st = b[state_col].combine_chunks().take(
            pa.array(order + lo))
        same_run = rid[order][1:] == rid[order][:-1]
        mask = pa.array(same_run)
        frm = st.slice(0, len(st) - 1).filter(mask)
        to = st.slice(1).filter(mask)
        if len(frm) == 0:
            return out_schema.empty_table()
        part = pa.table({"from_state": frm, "to_state": to}) \
            .group_by(["from_state", "to_state"]) \
            .aggregate([([], "count_all")])
        return pa.table({
            "from_state": part["from_state"],
            "to_state": part["to_state"],
            "n": pc.cast(part["count_all"], pa.int64()),
        }).cast(out_schema)

    partials = grouped_apply(events.select_columns(proj), on,
                             out_schema=out_schema, runs_fn=runs)
    return partials.groupby(["from_state", "to_state"]).aggregate(
        Sum("n", alias_name="n"))


def fill_forward(events: Dataset, on: str = "user_id",
                 order_cols: list[str] | None = None,
                 value_col: str = "value",
                 out_col: str = "filled") -> Dataset:
    """LOCF imputation: carry the last non-null ``value_col`` forward
    within each partition, ordered by ``order_cols`` — the
    ``last_value(... IGNORE NULLS) OVER (... ROWS UNBOUNDED PRECEDING)``
    window as a distributed operator. Leading nulls stay null. Values
    are *selected*, never computed, so float parity with SQL is exact.

    One grouped sort; the fill is one ``np.maximum.accumulate`` over
    global source indices (monotone, so a fill can never leak across
    run boundaries: any index carried from an earlier run is < the
    row's own run start and is masked back to null)."""
    import pyarrow.compute as pc

    order_cols = order_cols or ["ts", "event_id"]
    proj = [on] + [c for c in order_cols if c != on] + [value_col]
    vt = events.schema().base_schema.field(value_col).type
    out_schema = pa.schema(
        [(c, events.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, vt)])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
                for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        vcol = b[value_col].combine_chunks()
        valid = pc.is_valid(vcol).to_numpy(zero_copy_only=False)[lo:hi][order]
        span = hi - lo
        idx = np.arange(span, dtype=np.int64)
        src = np.maximum.accumulate(np.where(valid, idx, -1))
        lens = (ends - starts).astype(np.int64)
        run_start = np.repeat((starts - lo).astype(np.int64), lens)
        has_src = src >= run_start
        take_idx = np.where(has_src, src, 0)
        take = pa.array(order + lo)
        filled = vcol.take(pa.array(order[take_idx] + lo))
        filled = pc.if_else(pa.array(has_src), filled,
                            pa.scalar(None, vt))
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = filled
        return pa.table(cols).cast(out_schema)

    return grouped_apply(events.select_columns(proj), on,
                         out_schema=out_schema, runs_fn=runs)


def _run_ids_local(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Run index per row of the span [starts[0], ends[-1]) — same
    contract as dataops.aggregates._run_ids."""
    return np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)


def debounce(events: Dataset, on: str = "user_id",
             type_col: str = "event_type", ts_col: str = "ts",
             id_col: str = "event_id",
             gap_us: int = 604_800_000_000) -> Dataset:
    """Event debounce: within each (key, type) stream ordered by
    (ts, id), keep a row only if it is the stream's first or arrived
    more than ``gap_us`` after its predecessor — LAG-based burst
    suppression. The kept set depends on the predecessor ROW, not the
    previously-kept one, so the semantics are exactly
    ``lag(ts) IS NULL OR ts - lag(ts) > gap`` (SQL-checkable; the
    keep-chain variant would be iterative).

    One grouped sort (grouped_apply on the key); the per-(key, type)
    predecessor test is vectorized across every run in a block via
    dictionary codes + one lexsort — no Python loop over runs."""
    import pyarrow.compute as pc

    s = events.schema()
    types = dict(zip(s.names, s.types))
    proj = [on, type_col, ts_col, id_col]
    out_schema = pa.schema([(c, types[c]) for c in proj])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        codes = pc.dictionary_encode(
            b[type_col].combine_chunks().slice(lo, hi - lo)) \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)[lo:hi]
        eid = b[id_col].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, codes, rid))
        r, c, t = rid[order], codes[order], ts[order]
        first = np.concatenate(
            [[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
        gap_ok = np.concatenate([[True], (t[1:] - t[:-1]) > gap_us])
        take = pa.array(order[first | gap_ok] + lo)
        return pa.table({c2: b[c2].take(take)
                         for c2 in proj}).cast(out_schema)

    return grouped_apply(events.select_columns(proj), on,
                         out_schema=out_schema, runs_fn=runs)


def collapse_repeats(events: Dataset, on: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "event_type") -> Dataset:
    """Consecutive-duplicate collapse: per key ordered by (ts, id),
    keep a row only if its value DIFFERS from the immediately previous
    row's — state-stream compression (the CDC "distinct consecutive"
    form: a sensor/status feed collapses to its change points).

    One grouped sort; the previous-value comparison is vectorized
    across every run in a block via dictionary codes — codes only need
    equality, so per-batch code spaces are safe."""
    import pyarrow.compute as pc

    s = events.schema()
    types = dict(zip(s.names, s.types))
    proj = [on, ts_col, id_col, value_col]
    out_schema = pa.schema([(c, types[c]) for c in proj])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = pc.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)[lo:hi]
        eid = b[id_col].to_numpy(zero_copy_only=False)[lo:hi]
        codes = pc.dictionary_encode(
            b[value_col].combine_chunks().slice(lo, hi - lo)) \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, rid))
        r, c = rid[order], codes[order]
        keep = np.concatenate(
            [[True], (r[1:] != r[:-1]) | (c[1:] != c[:-1])])
        take = pa.array(order[keep] + lo)
        return pa.table({c2: b[c2].take(take)
                         for c2 in proj}).cast(out_schema)

    return grouped_apply(events.select_columns(proj), on,
                         out_schema=out_schema, runs_fn=runs)


def rate_cap(events: Dataset, on: str = "user_id", ts_col: str = "ts",
             id_col: str = "event_id", window_us: int = 86_400_000_000,
             k: int = 2) -> Dataset:
    """Per-key rate limiting: within each (key, tumbling window) keep
    only the first ``k`` events by (ts, id) — quota enforcement /
    sampling-at-ingest. Window assignment is integer floor-division of
    the epoch-µs timestamp (SQL: ``ts_us // window``), so the oracle
    reproduces buckets exactly.

    One grouped sort on the key; window ids, within-window positions
    and the ≤k mask are vectorized across every run in a block."""
    import pyarrow.compute as pc

    s = events.schema()
    types = dict(zip(s.names, s.types))
    proj = [on, ts_col, id_col]
    out_schema = pa.schema([(c, types[c]) for c in proj])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = pc.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)[lo:hi]
        eid = b[id_col].to_numpy(zero_copy_only=False)[lo:hi]
        win = ts // window_us
        order = np.lexsort((eid, ts, win, rid))
        r, w = rid[order], win[order]
        first = np.concatenate([[True], (r[1:] != r[:-1]) | (w[1:] != w[:-1])])
        run_starts = np.nonzero(first)[0]
        rlens = np.diff(np.concatenate([run_starts, [len(r)]]))
        pos = np.arange(len(r), dtype=np.int64) - np.repeat(run_starts, rlens)
        take = pa.array(order[pos < k] + lo)
        return pa.table({c: b[c].take(take) for c in proj}).cast(out_schema)

    return grouped_apply(events.select_columns(proj), on,
                         out_schema=out_schema, runs_fn=runs)


def interval_coverage(events: Dataset, on: str = "user_id",
                      ts_col: str = "ts", dur_col: str = "value") -> Dataset:
    """Gaps-and-islands interval merge: each event opens an interval
    ``[ts, ts + max(floor(dur*1e6), 0)]`` (microseconds, duration
    clamped non-negative); per key, overlapping/touching intervals merge
    into islands. Output one row per key: (key, n_intervals, n_islands,
    covered_us) — all integers, so the SQL-window oracle compares
    byte-exact (no order-dependent float sums).

    One grouped sort; island detection is vectorized ACROSS runs with a
    segmented running-max built on end-RANKS (rank + run_id*(n+1) keeps
    ``np.maximum.accumulate`` overflow-safe where raw epoch values ×
    run index would not be). The non-negative clamp is load-bearing:
    with e >= s, a new island's start strictly exceeds the previous
    running max, so the run-wide running max IS the island-local max."""
    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(on, key_type), ("n_intervals", pa.int64()),
                            ("n_islands", pa.int64()),
                            ("covered_us", pa.int64())])

    def slim(b: pa.Table) -> pa.Table:
        start = pa.compute.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dur = np.maximum(np.floor(
            b[dur_col].to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64), 0)
        return pa.table({on: b[on],
                         "_s": pa.array(start, pa.int64()),
                         "_e": pa.array(start + dur, pa.int64())})

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        sarr = b["_s"].to_numpy(zero_copy_only=False)[lo:hi]
        earr = b["_e"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((earr, sarr, rid))
        r_, s_, e_ = rid[order], sarr[order], earr[order]
        n = len(s_)
        se = np.sort(e_)
        rk = np.searchsorted(se, e_).astype(np.int64)
        cm = np.maximum.accumulate(rk + r_ * (n + 1)) - r_ * (n + 1)
        cme = se[cm]  # running max end within run, inclusive
        first = np.concatenate([[True], r_[1:] != r_[:-1]])
        new = first.copy()
        nf = np.nonzero(~first)[0]
        new[nf] = s_[nf] > cme[nf - 1]
        isl_start = np.nonzero(new)[0]
        isl_last = np.concatenate([isl_start[1:], [n]]) - 1
        covered = se[cm[isl_last]] - s_[isl_start]
        isl_rid = r_[isl_start]
        run_first = np.nonzero(np.concatenate(
            [[True], isl_rid[1:] != isl_rid[:-1]]))[0]
        n_islands = np.diff(np.concatenate([run_first,
                                            [len(isl_start)]]))
        covered_run = np.add.reduceat(covered, run_first)
        keys = b[on].take(pa.array(starts.astype(np.int64)))
        return pa.table({
            on: keys,
            "n_intervals": pa.array((ends - starts).astype(np.int64),
                                    pa.int64()),
            "n_islands": pa.array(n_islands, pa.int64()),
            "covered_us": pa.array(covered_run, pa.int64())})

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(events.map_batches(slim, batch_format="pyarrow"),
                         on, out_schema=out_schema, runs_fn=runs)


def interval_overlap_join(left: Dataset, right: Dataset,
                          on: str = "user_id", ts_col: str = "ts",
                          dur_col: str = "value",
                          left_id: str = "event_id") -> Dataset:
    """Interval-overlap join reduced to per-left-row aggregates: for
    every left interval ``[ts, ts + max(floor(dur*1e6), 0)]`` count the
    same-key right intervals with POSITIVE overlap and sum the total
    overlapped microseconds (right multiplicity counts — the answer is
    the integral of the right-coverage step function over the left
    interval).

    Same composition as `asof_join` / `range_join_count`: tagged union,
    ONE grouped sort, then per run (a) two binary searches per left row
    for the count (starts-before-end minus ends-at-or-before-start) and
    (b) a coverage sweep — right endpoints become a +1/−1 step
    function whose prefix integral is evaluated at both left endpoints.
    All-integer arithmetic → byte-exact SQL parity."""
    def tag(ds: Dataset, side: int) -> Dataset:
        def f(b: pa.Table) -> pa.Table:
            start = pa.compute.cast(b[ts_col], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            dur = np.maximum(np.floor(
                b[dur_col].to_numpy(zero_copy_only=False) * 1_000_000
            ).astype(np.int64), 0)
            return pa.table({
                on: b[on],
                "_s": pa.array(start, pa.int64()),
                "_e": pa.array(start + dur, pa.int64()),
                "_lid": (b[left_id] if side == 1
                         else pa.nulls(b.num_rows, pa.int64())),
                "_side": pa.array([side] * b.num_rows, pa.int8())})
        return ds.map_batches(f, batch_format="pyarrow")

    s = left.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(left_id, pa.int64()), (on, key_type),
                            ("n_overlap", pa.int64()),
                            ("overlap_us", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        keys = b[on].to_numpy(zero_copy_only=False)
        sarr = b["_s"].to_numpy(zero_copy_only=False)
        earr = b["_e"].to_numpy(zero_copy_only=False)
        lid = b["_lid"].to_numpy(zero_copy_only=False)
        side = b["_side"].to_numpy(zero_copy_only=False)
        out_l, out_k, out_n, out_o = [], [], [], []
        for st, en in zip(starts, ends):
            sl = slice(st, en)
            is_l = side[sl] == 1
            ls, le = sarr[sl][is_l], earr[sl][is_l]
            lids = lid[sl][is_l]
            if len(ls) == 0:
                continue
            # zero-length intervals (clamped negative durations) can
            # never overlap positively — drop rights, zero out lefts
            rs_all, re_all = sarr[sl][~is_l], earr[sl][~is_l]
            pos = rs_all < re_all
            rs = np.sort(rs_all[pos])
            re = np.sort(re_all[pos])
            n_ov = (np.searchsorted(rs, le, side="left")
                    - np.searchsorted(re, ls, side="right"))
            n_ov[ls >= le] = 0
            if len(rs):
                # coverage step function over merged breakpoints
                pts = np.concatenate([rs, re])
                dlt = np.concatenate([np.ones(len(rs), np.int64),
                                      -np.ones(len(re), np.int64)])
                o = np.argsort(pts, kind="stable")
                pts, dlt = pts[o], dlt[o]
                cov = np.cumsum(dlt)
                # prefix integral of coverage at each breakpoint
                seg = np.diff(pts)
                integ = np.concatenate(
                    [[0], np.cumsum(cov[:-1] * seg)])

                def ival(t):
                    j = np.searchsorted(pts, t, side="right") - 1
                    v = np.zeros(len(t), dtype=np.int64)
                    ok = j >= 0
                    jj = j[ok]
                    # cov[-1] is always 0, so t past the last breakpoint
                    # correctly reduces to integ[-1]
                    v[ok] = integ[jj] + cov[jj] * (t[ok] - pts[jj])
                    return v

                ov = ival(le) - ival(ls)
            else:
                ov = np.zeros(len(ls), dtype=np.int64)
            out_l.extend(lids.tolist())
            out_k.extend([keys[st]] * len(ls))
            out_n.extend(np.maximum(n_ov, 0).tolist())
            out_o.extend(ov.tolist())
        return pa.table({left_id: pa.array(out_l, pa.int64()),
                         on: pa.array(out_k, key_type),
                         "n_overlap": pa.array(out_n, pa.int64()),
                         "overlap_us": pa.array(out_o, pa.int64())})

    return grouped_apply(tag(left, 1).union(tag(right, 0)), on,
                         out_schema=out_schema, runs_fn=runs)


def cohort_retention(events: Dataset, on: str = "user_id",
                     ts_col: str = "ts",
                     bucket_us: int = 7 * 86400 * 1_000_000) -> Dataset:
    """Cohort retention matrix: each user's first-ever event assigns
    their cohort period (``floor(epoch_us / bucket_us)``); the output
    counts, per (cohort_period, period_offset), the distinct users
    active ``offset`` periods after their cohort — the classic product
    retention triangle.

    Scale shape: a per-batch distinct-(user, period) projection shrinks
    the event stream to at most one row per user-period BEFORE the only
    grouped exchange (by user). Each complete user run derives its
    cohort as a segmented min and emits its distinct offsets (a user
    contributes at most one row per offset by construction), then one
    bounded groupby counts — the final table is cohorts × offsets,
    tiny at any corpus size. No per-user state ever reaches the driver.
    """
    def distinct_user_period(b: pa.Table) -> pa.Table:
        u = b[on].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (pa.compute.cast(b[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False) // bucket_us)
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        keep = np.concatenate(
            [[True], (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])])
        return pa.table({on: pa.array(us[keep], pa.int64()),
                         "_w": pa.array(ws[keep], pa.int64())})

    out_schema = pa.schema([("cohort_period", pa.int64()),
                            ("period_offset", pa.int64())])

    def runs(b: pa.Table, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        w = b["_w"].to_numpy(zero_copy_only=False)
        rid = _run_ids_local(starts, ends)
        lo, hi = starts[0], ends[-1]
        w = w[lo:hi]
        cohort = np.minimum.reduceat(w, starts - lo)
        off = w - cohort[rid]
        # distinct (run, offset) — rows may repeat across source batches
        order = np.lexsort((off, rid))
        rs, os_ = rid[order], off[order]
        keep = np.concatenate(
            [[True], (rs[1:] != rs[:-1]) | (os_[1:] != os_[:-1])])
        return pa.table({
            "cohort_period": pa.array(cohort[rs[keep]], pa.int64()),
            "period_offset": pa.array(os_[keep], pa.int64())})

    pairs = grouped_apply(
        events.select_columns([on, ts_col])
        .map_batches(distinct_user_period, batch_format="pyarrow"),
        on, out_schema=out_schema, runs_fn=runs)
    return (pairs.groupby(["cohort_period", "period_offset"]).count()
            .map_batches(lambda t: t.rename_columns(
                ["cohort_period", "period_offset", "n_users"]),
                batch_format="pyarrow"))


def session_paths(events: Dataset, on: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  type_col: str = "event_type",
                  gap_us: int = 1_800_000_000, sep: str = ">") -> Dataset:
    """Session path mining: gap-sessionize each key's event stream (same
    break rule as ``sessionize_counts``), serialize every session as an
    ordered ``sep``-joined event-type path, and count sessions per
    distinct path — the journey-analytics STRING_AGG-per-session +
    GROUP BY shape as one composed distributed pass.

    One grouped sort; session boundaries are a vectorized gap diff, path
    strings materialize through a single ``pc.binary_join`` over a
    ListArray built from boundary offsets (no per-session Python join),
    and each block pre-counts its paths with the Arrow ``group_by`` C
    kernel so the final exchange moves (path, n) partials bounded by the
    path vocabulary — never the event stream."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    out_schema = pa.schema([("path", pa.string()),
                            ("n_sessions", pa.int64())])
    slim = events.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(
                                pa.compute.cast(b[ts_col],
                                                pa.timestamp("us")),
                                pa.int64()),
                            "_id": b[id_col],
                            type_col: b[type_col]}),
        batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        ts = b["_ts"].to_numpy(zero_copy_only=False)[lo:hi]
        eid = b["_id"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, rid))
        t = ts[order]
        n = len(t)
        brk = np.zeros(n, dtype=bool)
        brk[starts - lo] = True  # rid-primary sort keeps span offsets
        brk[1:] |= (t[1:] - t[:-1]) > gap_us
        offsets = np.append(np.flatnonzero(brk), n).astype(np.int32)
        vals = b[type_col].combine_chunks().take(pa.array(order + lo))
        paths = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals),
            sep)
        part = pa.table({"path": paths}).group_by("path") \
            .aggregate([([], "count_all")])
        return pa.table({
            "path": part["path"],
            "n_sessions": pc.cast(part["count_all"], pa.int64()),
        }).cast(out_schema)

    partials = grouped_apply(
        slim.select_columns([on, "_ts", "_id", type_col]), on,
        out_schema=out_schema, runs_fn=runs)
    return partials.groupby("path").aggregate(
        Sum("n_sessions", alias_name="n_sessions"))


def late_events(events: Dataset, delay_us: int, on: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id") -> Dataset:
    """Watermark lateness detection: in ARRIVAL order (``id_col``), an
    event is late when its timestamp falls more than ``delay_us`` behind
    the running maximum timestamp of everything that arrived before it —
    the out-of-orderness diagnostic a streaming window assignment needs
    when picking its allowed-lateness. Emits only the late rows.

    One grouped sort by arrival; the per-run previous-running-max is the
    rank-based segmented ``np.maximum.accumulate`` (rank + rid·(n+1)
    keeps it overflow-safe where raw epoch × run index would not),
    shifted one arrival back with run firsts masked."""
    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(id_col, pa.int64()), (on, key_type),
                            ("ts", pa.timestamp("us")),
                            ("late_by_us", pa.int64())])
    slim = events.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(
                                pa.compute.cast(b[ts_col],
                                                pa.timestamp("us")),
                                pa.int64()),
                            "_id": b[id_col]}),
        batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = b["_ts"].to_numpy(zero_copy_only=False)[lo:hi]
        eid = b["_id"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, rid))
        t = ts[order]
        n = len(t)
        st = np.sort(t)
        rk = np.searchsorted(st, t).astype(np.int64)
        cm = np.maximum.accumulate(rk + rid * (n + 1)) - rid * (n + 1)
        prev_max = np.empty(n, dtype=np.int64)
        prev_max[1:] = st[cm[:-1]]
        first = np.zeros(n, dtype=bool)
        first[starts - lo] = True
        # a run's first arrival has no predecessor: late_by 0, never
        # late (an int sentinel would overflow the subtraction)
        prev_max[first] = t[first]
        late_by = prev_max - t
        sel = np.flatnonzero(late_by > delay_us)
        take = pa.array(order[sel] + lo)
        return pa.table({
            id_col: b["_id"].take(take),
            on: b[on].take(take),
            "ts": pa.array(t[sel], pa.int64()).cast(pa.timestamp("us")),
            "late_by_us": pa.array(late_by[sel], pa.int64()),
        }).cast(out_schema)

    return grouped_apply(slim, on, out_schema=out_schema, runs_fn=runs)


def longest_streak(events: Dataset, on: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   value_col: str = "event_type") -> Dataset:
    """Longest consecutive same-value streak per key (ordered by
    (ts, id)) — the gaps-and-islands MAX(island length) analytic. One
    grouped sort; island lengths and per-run maxima are pure reduceat
    arithmetic over dictionary-encoded value codes."""
    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(on, key_type), ("max_streak", pa.int64())])
    slim = events.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(
                                pa.compute.cast(b[ts_col],
                                                pa.timestamp("us")),
                                pa.int64()),
                            "_id": b[id_col],
                            value_col: b[value_col]}),
        batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = b["_ts"].to_numpy(zero_copy_only=False)[lo:hi]
        eid = b["_id"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, rid))
        vals = b[value_col].combine_chunks().take(pa.array(order + lo))
        codes = vals.dictionary_encode().indices.to_numpy(
            zero_copy_only=False)
        n = len(codes)
        brk = np.zeros(n, dtype=bool)
        brk[starts - lo] = True
        brk[1:] |= codes[1:] != codes[:-1]
        isl_start = np.flatnonzero(brk)
        isl_len = np.diff(np.append(isl_start, n))
        isl_rid = rid[isl_start]
        run_first = np.flatnonzero(
            np.concatenate([[True], isl_rid[1:] != isl_rid[:-1]]))
        max_streak = np.maximum.reduceat(isl_len, run_first)
        return pa.table({
            on: b[on].take(pa.array(starts)),
            "max_streak": pa.array(max_streak, pa.int64()),
        }).cast(out_schema)

    return grouped_apply(slim, on, out_schema=out_schema, runs_fn=runs)


def densify_locf(events: Dataset, step_us: int, on: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "value") -> Dataset:
    """Time-grid densification with LOCF (resample / gap-fill): for
    every key, emit one row per ``step_us`` grid slot between its first
    and last event (slots are epoch multiples, ceil(min)..floor(max),
    all-integer arithmetic) carrying the value of the latest event
    at-or-before the slot (ties by max id). The value is SELECTED,
    never computed, so float parity is exact.

    One grouped sort; the grid is a vectorized per-run arange and the
    LOCF attach one block-wide searchsorted — the row-MULTIPLYING shape
    (output ≈ span/step per key), so pick ``step_us`` to the analysis
    grain, not below it."""
    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    vt = dict(zip(s.names, s.types))[value_col]
    out_schema = pa.schema([(on, key_type), ("slot_us", pa.int64()),
                            (value_col, vt)])
    slim = events.map_batches(
        lambda b: pa.table({on: b[on],
                            "_ts": pa.compute.cast(
                                pa.compute.cast(b[ts_col],
                                                pa.timestamp("us")),
                                pa.int64()),
                            "_id": b[id_col],
                            value_col: b[value_col]}),
        batch_format="pyarrow")

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = b["_ts"].to_numpy(zero_copy_only=False)[lo:hi]
        eid = b["_id"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, rid))
        t = ts[order]
        # per-run grid + one searchsorted per run (the asof_join loop
        # precedent — a run-offset combined key would overflow int64 at
        # epoch-µs spans × run index)
        slots, idxs, key_rows = [], [], []
        for r in range(len(starts)):
            st, en = starts[r] - lo, ends[r] - lo
            tr = t[st:en]
            s_lo = (tr[0] + step_us - 1) // step_us
            s_hi = tr[-1] // step_us
            if s_hi < s_lo:
                continue
            sl = np.arange(s_lo, s_hi + 1, dtype=np.int64) * step_us
            # first slot ≥ first event, so the probe always matches
            idx = np.searchsorted(tr, sl, side="right") - 1 + st
            slots.append(sl)
            idxs.append(idx)
            key_rows.append(np.full(len(sl), starts[r], np.int64))
        if not slots:
            return out_schema.empty_table()
        slot = np.concatenate(slots)
        idx = np.concatenate(idxs)
        vals = b[value_col].combine_chunks() \
            .take(pa.array(order[idx] + lo))
        return pa.table({
            on: b[on].take(pa.array(np.concatenate(key_rows))),
            "slot_us": pa.array(slot, pa.int64()),
            value_col: vals,
        }).cast(out_schema)

    return grouped_apply(slim, on, out_schema=out_schema, runs_fn=runs)


def interval_gaps(events: Dataset, on: str = "user_id",
                  ts_col: str = "ts", dur_col: str = "value") -> Dataset:
    """Complement of the merged-interval islands (``interval_coverage``'s
    sibling): per key, each maximal UNCOVERED gap between consecutive
    islands as one (key, gap_start, gap_end) row (microsecond epoch
    ints, half-open). A gap row exists exactly at every island start
    except the run's first — where the sorted start strictly exceeds
    the running max end of all preceding intervals.

    Same one-grouped-sort shape and segmented rank-based running-max
    kernel as ``interval_coverage`` (see its overflow note)."""
    s = events.schema()
    key_type = dict(zip(s.names, s.types))[on]
    out_schema = pa.schema([(on, key_type), ("gap_start", pa.int64()),
                            ("gap_end", pa.int64())])

    def slim(b: pa.Table) -> pa.Table:
        start = pa.compute.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dur = np.maximum(np.floor(
            b[dur_col].to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64), 0)
        return pa.table({on: b[on],
                         "_s": pa.array(start, pa.int64()),
                         "_e": pa.array(start + dur, pa.int64())})

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        sarr = b["_s"].to_numpy(zero_copy_only=False)[lo:hi]
        earr = b["_e"].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((earr, sarr, rid))
        r_, s_, e_ = rid[order], sarr[order], earr[order]
        n = len(s_)
        se = np.sort(e_)
        rk = np.searchsorted(se, e_).astype(np.int64)
        cm = np.maximum.accumulate(rk + r_ * (n + 1)) - r_ * (n + 1)
        cme = se[cm]  # running max end within run, inclusive
        first = np.concatenate([[True], r_[1:] != r_[:-1]])
        gap_rows = np.nonzero(~first & np.concatenate(
            [[False], s_[1:] > cme[:-1]]))[0]
        take = pa.array((starts[r_[gap_rows]]).astype(np.int64)) \
            if len(gap_rows) else pa.array([], pa.int64())
        return pa.table({
            on: b[on].take(take),
            "gap_start": pa.array(cme[gap_rows - 1]
                                  if len(gap_rows) else
                                  np.array([], np.int64)),
            "gap_end": pa.array(s_[gap_rows] if len(gap_rows) else
                                np.array([], np.int64)),
        }).cast(out_schema)

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(events.map_batches(slim, batch_format="pyarrow"),
                         on, out_schema=out_schema, runs_fn=runs)


def state_dwell(events: Dataset, on: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                value_col: str = "event_type") -> Dataset:
    """Time-in-state: collapse each key's stream to its state-change
    points (``collapse_repeats``), then attribute ``next_change_ts −
    change_ts`` to the state ENTERED — per-state total dwell and
    closed-span count, the session/uptime accounting aggregate over a
    status feed. Each key's final open state has no end yet and is
    excluded (SQL ``LEAD(...) IS NOT NULL`` semantics). Dwell is exact
    integer µs (timestamp subtraction, no accumulation-order float).

    Shape: change-point compression FIRST (the stream shrinks before
    any pair arithmetic), then one grouped sort over the collapsed
    stream with diffs vectorized across runs, per-batch
    (state, dwell, n) partials → one bounded grouped sum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    changes = collapse_repeats(events, on=on, ts_col=ts_col,
                               id_col=id_col, value_col=value_col)
    vtype = events.schema().base_schema.field(value_col).type
    part_schema = pa.schema([("state", vtype), ("dwell_us", pa.int64()),
                             ("n_spans", pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids_local(starts, ends)
        ts = pc.cast(b[ts_col], pa.int64()) \
            .to_numpy(zero_copy_only=False)[lo:hi]
        eid = b[id_col].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((eid, ts, rid))
        r, t = rid[order], ts[order]
        closed = np.concatenate([r[1:] == r[:-1], [False]])
        dwell = np.zeros(len(t), dtype=np.int64)
        if len(t) > 1:
            dwell[:-1] = t[1:] - t[:-1]
        state = b[value_col].take(pa.array(order[closed] + lo))
        part = pa.table({"state": state,
                         "d": pa.array(dwell[closed])}) \
            .group_by("state").aggregate([("d", "sum"), ([], "count_all")])
        return pa.table({
            "state": part["state"],
            "dwell_us": pc.cast(part["d_sum"], pa.int64()),
            "n_spans": pc.cast(part["count_all"], pa.int64()),
        }).cast(part_schema)

    partials = grouped_apply(changes, on, out_schema=part_schema,
                             runs_fn=runs)
    return partials.groupby("state").aggregate(
        Sum("dwell_us", alias_name="dwell_us"),
        Sum("n_spans", alias_name="n_spans"))


def ewma(ds: Dataset, key: str, order_col: str, value_col: str,
         alpha: float = 0.3) -> Dataset:
    """Per-key exponentially weighted moving average over an ordered
    value stream (``y_i = α·x_i + (1−α)·y_{i−1}``, seeded with the
    first value — pandas ``ewm(adjust=False)`` semantics): the classic
    streaming smoother / anomaly baseline. Returns every input row
    plus its ``ewma`` column.

    Shape: one grouped sort (`grouped_apply`), runs re-ordered by
    ``order_col`` and smoothed with the scaled-cumsum closed form in
    segments of 256 (exactly one renormalization per segment keeps
    (1−α)^−j bounded; the segment loop is ~n/256 python steps, the
    arithmetic is numpy). Floats are iterative by nature — pytest-
    gated against pandas ewm, not SQL."""
    import numpy as np

    from payor_linkage.rayutil import grouped_apply

    sch = dict(zip(ds.schema().names, ds.schema().types))
    out_schema = pa.schema([(key, sch[key]), (order_col, sch[order_col]),
                            (value_col, sch[value_col]),
                            ("ewma", pa.float64())])
    om = 1.0 - alpha
    # om^-seg must stay inside float64: ~300 decimal digits of headroom
    seg = 256 if om <= 0.0 or om >= 1.0 else \
        max(1, min(256, int(300.0 / max(1e-12, -np.log10(om)))))

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        n = hi - lo
        sizes = (ends - starts).astype(np.int64)
        rid = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        ov = b[order_col].to_numpy(zero_copy_only=False)[lo:hi]
        order = np.lexsort((ov, rid))
        x = b[value_col].to_numpy(zero_copy_only=False)[lo:hi][order] \
            .astype(np.float64)
        y = np.empty(n, np.float64)
        offs = np.concatenate([starts - lo, [n]])
        for r in range(len(starts)):
            s, e = int(offs[r]), int(offs[r + 1])
            y[s] = carry = x[s]  # seed: y_0 = x_0
            for cs in range(s + 1, e, seg):
                ce = min(cs + seg, e)
                t = np.arange(1, ce - cs + 1, dtype=np.float64)
                pw = om ** t
                # y_{cs+j} = om^j·carry + α·Σ_t v_t·om^(j−t)
                y[cs:ce] = pw * (carry + alpha * np.cumsum(
                    x[cs:ce] * om ** (-t)))
                carry = y[ce - 1]
        inv_order = np.empty(n, np.int64)
        inv_order[order] = np.arange(n)
        cols = {key: b[key].slice(lo, n),
                order_col: b[order_col].slice(lo, n),
                value_col: b[value_col].slice(lo, n),
                "ewma": pa.array(y[inv_order], pa.float64())}
        return pa.table(cols).cast(out_schema)

    prepped = ds.select_columns([key, order_col, value_col])
    return grouped_apply(prepped, key, out_schema=out_schema, runs_fn=runs)


def interpolate_linear(events: Dataset, on: str = "user_id",
                       order_cols: list[str] | None = None,
                       value_col: str = "value",
                       out_col: str = "interp") -> Dataset:
    """Linear interpolation of interior nulls: within each partition
    ordered by ``order_col``, a null value between two known neighbors
    becomes ``v_prev + (v_next − v_prev) · ((t − t_prev) / (t_next −
    t_prev))``; leading/trailing nulls (no neighbor on one side) stay
    null, known rows pass through unchanged — the standard time-series
    gap fill one step up from LOCF.

    Ordering is by ``order_cols`` (default ["ts", "event_id"] — pass a
    unique tiebreaker, exactly as `fill_forward` does); interpolation
    distance uses the FIRST order column as int64 time. One grouped
    sort; prev/next known indices come from the `fill_forward`
    monotone-accumulate trick run in both directions (run-boundary
    leaks masked the same way). The single float expression is written
    identically in the SQL oracle, so parity is byte-exact (IEEE ops
    are deterministic given the same expression tree); equal-timestamp
    gaps divide by GREATEST(dt, 1) on both sides."""
    import pyarrow.compute as pc

    order_cols = order_cols or ["ts", "event_id"]
    proj = [on] + [c for c in order_cols if c != on] + [value_col]
    out_schema = pa.schema(
        [(c, events.schema().base_schema.field(c).type) for c in proj]
        + [(out_col, pa.float64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = int(starts[0]), int(ends[-1])
        span = hi - lo
        rid = _run_ids_local(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi]
                for c in order_cols]
        ov = arrs[0]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        vcol = b[value_col].combine_chunks()
        v = vcol.to_numpy(zero_copy_only=False)[lo:hi][order] \
            .astype(np.float64)
        t = ov[order].astype(np.int64)
        valid = pc.is_valid(vcol).to_numpy(
            zero_copy_only=False)[lo:hi][order]
        idx = np.arange(span, dtype=np.int64)
        prev = np.maximum.accumulate(np.where(valid, idx, -1))
        nxt = span - 1 - np.maximum.accumulate(
            np.where(valid[::-1], idx, -1))[::-1]
        lens = (ends - starts).astype(np.int64)
        run_start = np.repeat((starts - lo).astype(np.int64), lens)
        run_end = np.repeat((ends - lo).astype(np.int64), lens)
        ok = valid | ((prev >= run_start) & (nxt < run_end)
                      & (prev >= 0) & (nxt <= span - 1))
        pi = np.clip(prev, 0, span - 1)
        ni = np.clip(nxt, 0, span - 1)
        dt = (t - t[pi]).astype(np.float64)
        dT = np.maximum(t[ni] - t[pi], 1).astype(np.float64)
        interp = v[pi] + (v[ni] - v[pi]) * (dt / dT)
        out = np.where(valid, v, np.where(ok, interp, np.nan))
        res = pa.array(out, pa.float64())
        res = pc.if_else(pa.array(ok | valid), res,
                         pa.scalar(None, pa.float64()))
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_col] = res
        return pa.table(cols).cast(out_schema)

    from payor_linkage.rayutil import grouped_apply

    return grouped_apply(events.select_columns(proj), on,
                         out_schema=out_schema, runs_fn=runs)

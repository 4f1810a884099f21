"""Reshaping operators: unpivot (melt) and deterministic weighted
interleave — the dataset-mixing primitive a training-data pipeline uses
to blend sources at fixed ratios.

Reference parity: the reference app pivots/unpivots measure columns in
its SQL models; interleaving is the standard corpus-mixing step of a
large-scale training-data pipeline (weighted round-robin across sources).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from payor_linkage.rayutil import grouped_apply

from .aggregates import _run_ids


def melt(ds: Dataset, id_cols: list[str], value_cols: list[str],
         var_name: str = "metric", value_name: str = "val") -> Dataset:
    """Unpivot ``value_cols`` into (``var_name``, ``value_name``) rows —
    ``UNPIVOT`` / ``UNION ALL`` of one projection per measure.

    Map-only (no shuffle): each batch emits ``len(value_cols)`` stacked
    projections; the measure label is a dictionary-encoded constant
    column (no per-row Python). Values pass through unchanged (cast to
    float64), so float parity with a SQL unpivot is exact."""
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in id_cols]
        + [(var_name, pa.string()), (value_name, pa.float64())])

    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        zeros = pa.array(np.zeros(n, dtype=np.int32))
        parts = []
        for c in value_cols:
            cols = {ic: b[ic] for ic in id_cols}
            cols[var_name] = pa.DictionaryArray.from_arrays(
                zeros, pa.array([c], pa.string()))
            cols[value_name] = b[c].cast(pa.float64())
            parts.append(pa.table(cols).cast(out_schema))
        return pa.concat_tables(parts)

    return (ds.select_columns(id_cols + value_cols)
            .map_batches(f, batch_format="pyarrow"))


def interleave_position(ds: Dataset, part_col: str, order_cols: list[str],
                        weights: dict[str, int], out_rank: str = "src_rank",
                        out_col: str = "pos") -> Dataset:
    """Deterministic weighted round-robin interleave: assign every row a
    global sequence position such that reading positions in order yields
    the parts mixed at the given integer ratios (an epoch of
    ``W = sum(weights)`` slots repeats; part ``p`` owns ``weights[p]``
    contiguous slots at a fixed offset).

    The training-data mixing primitive: blend corpora at fixed ratios
    without materializing the merged order — each row's position is pure
    arithmetic on its per-part rank ``r``:
    ``pos = (r // w) * W + off + (r % w)``.

    One grouped sort (per-part ranking); every part must appear in
    ``weights``. Emits 1-based ``src_rank`` and 0-based ``pos``."""
    parts = sorted(weights)
    w_of = {p: int(weights[p]) for p in parts}
    off_of, acc = {}, 0
    for p in parts:
        off_of[p] = acc
        acc += w_of[p]
    total_w = acc

    proj = [part_col] + [c for c in order_cols if c != part_col]
    out_schema = pa.schema(
        [(c, ds.schema().base_schema.field(c).type) for c in proj]
        + [(out_rank, pa.int64()), (out_col, pa.int64())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = _run_ids(starts, ends)
        arrs = [b[c].to_numpy(zero_copy_only=False)[lo:hi] for c in order_cols]
        order = np.lexsort(tuple(reversed(arrs)) + (rid,))
        lens = (ends - starts).astype(np.int64)
        r = np.arange(hi - lo, dtype=np.int64) - np.repeat(starts - lo, lens)
        run_keys = b[part_col].take(pa.array(starts)).to_pylist()
        w = np.repeat(np.array([w_of[k] for k in run_keys], np.int64), lens)
        off = np.repeat(np.array([off_of[k] for k in run_keys], np.int64),
                        lens)
        pos = (r // w) * total_w + off + (r % w)
        take = pa.array(order + lo)
        cols = {c: b[c].take(take) for c in proj}
        cols[out_rank] = pa.array(r + 1, pa.int64())
        cols[out_col] = pa.array(pos, pa.int64())
        return pa.table(cols).cast(out_schema)

    return grouped_apply(ds.select_columns(proj), part_col,
                         out_schema=out_schema, runs_fn=runs)

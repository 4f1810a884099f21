"""Small Ray helpers shared by the pipeline stages."""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset


def join_partitions(requested: int | None = None, cap: int = 64) -> int:
    """Safe hash-join partition count for the *current* cluster.

    ``Dataset.join`` spawns one aggregator actor per partition; asking for
    more partitions than schedulable CPUs deadlocks the streaming executor
    on a small cluster (observed with 32 partitions on 8 CPUs). On a real
    multi-node cluster, scale with total CPUs up to ``cap``.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    auto = max(2, min(cap, cpus // 2))
    if requested is None:
        return auto
    return max(2, min(requested, auto))


def nested_safe_join(left: Dataset, right: Dataset, on: str) -> Dataset:
    """Inner equi-join that tolerates nested (list/struct) payload columns.

    ``Dataset.join`` finalizes with pyarrow acero, which rejects
    ``list<struct<...>>`` non-key fields (e.g. our carried ``spans``
    column). This variant unions the two sides with a ``_side`` tag and
    merges per key inside ``groupby(on).map_groups`` — a sort shuffle,
    which pyarrow handles fine for nested payloads. Use only where a
    nested column must survive the join; plain joins are cheaper.
    """
    # force Arrow blocks so schema types are pyarrow DataTypes (pandas-block
    # datasets report numpy/python types, which pa.nulls can't take)
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))
    l_types = {n: t for n, t in l_schema.items() if n != on}
    r_types = {n: t for n, t in r_schema.items() if n != on and n not in l_schema}

    def pad_left(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "_side": pa.array([0] * b.num_rows, pa.int8())}
        for n in l_types:
            cols[n] = b[n]
        for n, t in r_types.items():
            cols[n] = pa.nulls(b.num_rows, t)
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        cols = {on: b[on], "_side": pa.array([1] * b.num_rows, pa.int8())}
        for n, t in l_types.items():
            cols[n] = pa.nulls(b.num_rows, t)
        for n in r_types:
            cols[n] = b[n]
        return pa.table(cols)

    u = left.map_batches(pad_left, batch_format="pyarrow").union(
        right.map_batches(pad_right, batch_format="pyarrow"))

    l_cols = list(l_types)
    r_cols = list(r_types)

    def merge(g: pa.Table) -> pa.Table:
        import numpy as np
        side = g["_side"].to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        if len(li) == 0 or len(ri) == 0:
            cols = {on: pa.array([], g[on].type), }
            for n in l_cols:
                cols[n] = pa.array([], g[n].type)
            for n in r_cols:
                cols[n] = pa.array([], g[n].type)
            return pa.table(cols)
        # cartesian within key (typically 1 x 1 or 1 x n)
        lrep = np.repeat(li, len(ri))
        rrep = np.tile(ri, len(li))
        cols = {on: g[on].take(pa.array(lrep))}
        for n in l_cols:
            cols[n] = g[n].take(pa.array(lrep))
        for n in r_cols:
            cols[n] = g[n].take(pa.array(rrep))
        return pa.table(cols)

    return u.groupby(on).map_groups(merge, batch_format="pyarrow")

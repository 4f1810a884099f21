"""Cluster-quality evaluation: pairwise F1 against ground-truth labels.

North-rule metric: pairwise F1 ≥ 0.99 on labeled pairs *within the same
blocking keys* (BASELINE.json) — i.e. over the candidate pair universe the
blocker produces, a pair is true iff both records carry the same
ground-truth ``entity_id`` and predicted iff both land in the same
``match_group_id``. Orphans (entity_id = -1) are never true pairs.
"""

from __future__ import annotations

import pandas as pd


def pairwise_f1(pairs: pd.DataFrame, labels: pd.DataFrame, groups: pd.DataFrame) -> dict:
    """pairs: candidate pairs (source_record_id_a/b) — the blocked universe;
    labels: (source_record_id, entity_id); groups: MATCH_GROUPS rows."""
    ent = labels.set_index("source_record_id")["entity_id"]
    grp = groups.set_index("source_record_id")["match_group_id"]

    a = pairs["source_record_id_a"]
    b = pairs["source_record_id_b"]
    ea, eb = ent.reindex(a).to_numpy(), ent.reindex(b).to_numpy()
    ga, gb = grp.reindex(a).to_numpy(), grp.reindex(b).to_numpy()

    truth = (ea == eb) & (ea != -1) & (eb != -1)
    pred = ga == gb

    tp = int((truth & pred).sum())
    fp = int((~truth & pred).sum())
    fn = int((truth & ~pred).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": round(precision, 4), "recall": round(recall, 4),
            "f1": round(f1, 4)}


def blocking_quality(unified, pairs):
    """Distributed blocking-evaluation metrics (the ER-literature pair:
    reduction ratio + pairs completeness) as ONE row of exact integers:
    ``n_records``, ``n_candidate_pairs``, ``n_true_pairs``
    (Σ C(entity_size, 2) over real entities, orphans excluded) and
    ``n_true_covered`` (candidate pairs whose endpoints share a real
    entity). RR = 1 − cand/C(n,2) and PC = covered/true stay exact
    rationals for the consumer — no float ever crosses the oracle.

    Scale shape: record/pair counts are streaming aggregates; entity
    sizes are one bounded groupby over ``entity_id`` with a per-block
    C(n,2) partial sum; coverage attaches the (record → entity) label
    map to both pair endpoints via broadcast ``lookup_join`` (which
    falls back to a shuffle join above 5M labels). Nothing but the one
    output row reaches the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    labels = unified.select_columns(["source_record_id", "entity_id"]) \
        .materialize()
    n_records = labels.count()
    n_cand = pairs.count()

    ent_sizes = (labels
                 .map_batches(lambda b: b.filter(
                     pc.not_equal(b["entity_id"], -1)),
                     batch_format="pyarrow")
                 .groupby("entity_id").count())

    def comb2(b: pa.Table) -> pa.Table:
        n = b["count()"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"tp": pa.array([int((n * (n - 1) // 2).sum())],
                                        pa.int64())})
    tp_rows = ent_sizes.map_batches(comb2, batch_format="pyarrow")
    agg = tp_rows.aggregate(Sum("tp", alias_name="tp"))
    n_true = int(agg["tp"] or 0)

    pa_ids = pairs.select_columns(
        ["source_record_id_a", "source_record_id_b"]).materialize()
    ea = lookup_join(
        pa_ids.map_batches(
            lambda b: pa.table({"source_record_id": b["source_record_id_a"],
                                "other": b["source_record_id_b"]}),
            batch_format="pyarrow"),
        labels, "source_record_id")
    eb = lookup_join(
        ea.map_batches(
            lambda b: pa.table({"source_record_id": b["other"],
                                "ent_a": b["entity_id"]}),
            batch_format="pyarrow"),
        labels, "source_record_id")
    covered = eb.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b["ent_a"], b["entity_id"]),
            pc.not_equal(b["ent_a"], -1))),
        batch_format="pyarrow").count()

    return rd.from_arrow(pa.table({
        "n_records": pa.array([n_records], pa.int64()),
        "n_candidate_pairs": pa.array([n_cand], pa.int64()),
        "n_true_pairs": pa.array([n_true], pa.int64()),
        "n_true_covered": pa.array([covered], pa.int64())}))


def bcubed_stats(groups, labels):
    """Per-record B-cubed cluster-quality integers:
    ``(source_record_id, cluster_size, n_same, entity_size)`` —
    precision_i = n_same/cluster_size, recall_i = n_same/entity_size.
    Emitted as exact integers so the DuckDB oracle (window counts over
    the membership + label sidecars) is float-free; orphans
    (entity_id = -1) are singleton entities by definition (n_same =
    entity_size = 1).

    Scale shape: one ``smart_join`` at record grain, then two grouped
    exchanges — by cluster (run length = cluster_size; per-run entity
    value-counts scattered back to rows, vectorized ACROSS runs with a
    single lexsort) and by entity (run length = entity_size). No
    per-group Python, no driver materialization."""
    import numpy as np
    import pyarrow as pa
    from payor_linkage.rayutil import grouped_apply, smart_join

    ce = smart_join(
        groups.select_columns(["match_group_id", "source_record_id"]),
        labels.select_columns(["source_record_id", "entity_id"]),
        "source_record_id")

    mid_schema = pa.schema([
        ("source_record_id", pa.string()), ("entity_id", pa.int64()),
        ("cluster_size", pa.int64()), ("n_same", pa.int64())])

    def by_cluster(b: pa.Table, starts: np.ndarray, ends: np.ndarray):
        lo, hi = int(starts[0]), int(ends[-1])
        ent = b["entity_id"].to_numpy(zero_copy_only=False)[lo:hi] \
            .astype(np.int64)
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        size = np.repeat((ends - starts).astype(np.int64), ends - starts)
        order = np.lexsort((ent, rid))
        rs, es = rid[order], ent[order]
        bnd = np.concatenate([[True], (rs[1:] != rs[:-1]) |
                              (es[1:] != es[:-1])])
        seg_starts = np.nonzero(bnd)[0]
        seg_lens = np.diff(np.concatenate([seg_starts, [len(rs)]]))
        n_same_sorted = np.repeat(seg_lens, seg_lens)
        n_same = np.empty(len(ent), dtype=np.int64)
        n_same[order] = n_same_sorted
        n_same[ent == -1] = 1
        return pa.table({
            "source_record_id": b["source_record_id"].slice(lo, hi - lo),
            "entity_id": pa.array(ent, pa.int64()),
            "cluster_size": pa.array(size, pa.int64()),
            "n_same": pa.array(n_same, pa.int64())})

    mid = grouped_apply(ce, "match_group_id", out_schema=mid_schema,
                        runs_fn=by_cluster)

    out_schema = pa.schema([
        ("source_record_id", pa.string()), ("cluster_size", pa.int64()),
        ("n_same", pa.int64()), ("entity_size", pa.int64())])

    def by_entity(b: pa.Table, starts: np.ndarray, ends: np.ndarray):
        lo, hi = int(starts[0]), int(ends[-1])
        ent = b["entity_id"].to_numpy(zero_copy_only=False)[lo:hi]
        size = np.repeat((ends - starts).astype(np.int64), ends - starts)
        size[ent == -1] = 1
        return pa.table({
            "source_record_id": b["source_record_id"].slice(lo, hi - lo),
            "cluster_size": b["cluster_size"].slice(lo, hi - lo),
            "n_same": b["n_same"].slice(lo, hi - lo),
            "entity_size": pa.array(size, pa.int64())})

    return grouped_apply(mid, "entity_id", out_schema=out_schema,
                         runs_fn=by_entity)


def decision_confusion(unified, candidates):
    """Decision-level pairwise confusion counts as ONE row of exact
    integers: predicted pairs (final_decision = match), true positives
    (predicted, endpoints share a real entity), false positives, and
    false negatives (true pairs never predicted = Σ C(n,2) − tp). The
    precision/recall the steward tunes stay exact rationals downstream.

    Same scale shape as ``blocking_quality``: streaming counts, one
    bounded entity groupby, two broadcast label attaches."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    labels = unified.select_columns(["source_record_id", "entity_id"]) \
        .materialize()
    pred = candidates.map_batches(
        lambda b: b.filter(pc.equal(b["final_decision"], "match")),
        batch_format="pyarrow").select_columns(
        ["source_record_id_a", "source_record_id_b"]).materialize()
    n_pred = pred.count()

    ent_sizes = (labels
                 .map_batches(lambda b: b.filter(
                     pc.not_equal(b["entity_id"], -1)),
                     batch_format="pyarrow")
                 .groupby("entity_id").count())

    def comb2(b: pa.Table) -> pa.Table:
        n = b["count()"].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"tp": pa.array([int((n * (n - 1) // 2).sum())],
                                        pa.int64())})

    n_true = int(ent_sizes.map_batches(comb2, batch_format="pyarrow")
                 .aggregate(Sum("tp", alias_name="tp"))["tp"] or 0)

    ea = lookup_join(
        pred.map_batches(
            lambda b: pa.table({"source_record_id": b["source_record_id_a"],
                                "other": b["source_record_id_b"]}),
            batch_format="pyarrow"),
        labels, "source_record_id")
    eb = lookup_join(
        ea.map_batches(
            lambda b: pa.table({"source_record_id": b["other"],
                                "ent_a": b["entity_id"]}),
            batch_format="pyarrow"),
        labels, "source_record_id")
    tp = eb.map_batches(
        lambda b: b.filter(pc.and_(
            pc.equal(b["ent_a"], b["entity_id"]),
            pc.not_equal(b["ent_a"], -1))),
        batch_format="pyarrow").count()
    return rd.from_arrow(pa.table({
        "n_pred_pairs": pa.array([n_pred], pa.int64()),
        "tp": pa.array([tp], pa.int64()),
        "fp": pa.array([n_pred - tp], pa.int64()),
        "fn": pa.array([n_true - tp], pa.int64()),
    }))


def threshold_sweep(unified, candidates, granularity: int = 20):
    """Per-score-bucket pair counts for threshold tuning: bucket =
    floor(score · granularity) (null scores → −granularity), with the
    count of pairs and of TRUE pairs (endpoints share a real entity) in
    each bucket — cumulate downstream for the precision/recall curve.
    Exact integers; the one float op (floor of a stored double × an
    integer) is IEEE-identical in SQL.

    Scale shape: two broadcast label attaches, per-batch bucket
    pre-counts, one bounded grouped Sum."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from payor_linkage.rayutil import lookup_join

    labels = unified.select_columns(["source_record_id", "entity_id"]) \
        .materialize()
    pairs = candidates.select_columns(
        ["source_record_id_a", "source_record_id_b", "overall_score"]) \
        .materialize()
    ea = lookup_join(
        pairs.map_batches(
            lambda b: pa.table({"source_record_id": b["source_record_id_a"],
                                "other": b["source_record_id_b"],
                                "score": b["overall_score"]}),
            batch_format="pyarrow"),
        labels, "source_record_id")
    eb = lookup_join(
        ea.map_batches(
            lambda b: pa.table({"source_record_id": b["other"],
                                "ent_a": b["entity_id"],
                                "score": b["score"]}),
            batch_format="pyarrow"),
        labels, "source_record_id")

    def partial(b: pa.Table) -> pa.Table:
        sc = b["score"].to_numpy(zero_copy_only=False)
        bucket = np.where(np.isnan(sc), -granularity,
                          np.floor(np.nan_to_num(sc) * granularity)) \
            .astype(np.int64)
        true = (pc.and_(pc.equal(b["ent_a"], b["entity_id"]),
                        pc.not_equal(b["ent_a"], -1))
                .to_numpy(zero_copy_only=False).astype(np.int64))
        t = pa.table({"bucket": pa.array(bucket, pa.int64()),
                      "n_pairs": pa.array(np.ones(len(bucket), np.int64)),
                      "n_true": pa.array(true, pa.int64())})
        return t.group_by("bucket").aggregate(
            [("n_pairs", "sum"), ("n_true", "sum")]) \
            .rename_columns(["bucket", "n_pairs", "n_true"])

    return (eb.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(
                Sum("n_pairs", alias_name="n_pairs"),
                Sum("n_true", alias_name="n_true")))


def inferred_pairs(groups, candidates):
    """Transitive-match audit: every unordered record pair that shares
    a match group but was never auto-matched as a direct pair — the
    steward's "inferred merge" review surface (a group of k records is
    justified by as few as k−1 scored match edges; the remaining
    C(k,2)−(k−1) pairs are accepted only by transitivity, and a bad
    edge shows up here as an implausible inferred pair). One row per
    inferred pair: (match_group_id, id_a, id_b) with id_a < id_b.

    Shape: pair expansion runs inside ONE grouped sort with the
    ``cooccurrence_counts`` m²-index arithmetic (vectorized across all
    runs in a block — groups are small, so per-group fan-out is
    bounded); the matched-edge key set (~O(records) — one edge per
    scored match) is broadcast once via ``ray.put`` and probed with
    one ``pc.is_in`` per block. Above the broadcast bound, swap the
    probe for a ``rayutil.smart_join`` anti-join on the pair key."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from payor_linkage.rayutil import grouped_apply

    def edge_key(b: pa.Table) -> pa.Table:
        m = b.filter(pc.equal(b["final_decision"], "match"))
        return pa.table({"k": pc.binary_join_element_wise(
            m["source_record_id_a"], m["source_record_id_b"], "|")})

    ekeys = pa.concat_tables(
        ray.get(candidates.map_batches(edge_key, batch_format="pyarrow")
                .materialize().to_arrow_refs()),
        promote_options="default")["k"].combine_chunks()
    eref = ray.put(ekeys)

    out_schema = pa.schema([("match_group_id", pa.string()),
                            ("id_a", pa.string()),
                            ("id_b", pa.string())])

    def runs(b: pa.Table, starts, ends) -> pa.Table:
        lo, hi = starts[0], ends[-1]
        rid = np.repeat(np.arange(len(starts), dtype=np.int64),
                        ends - starts)
        ids = b["source_record_id"].combine_chunks()
        enc = ids.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)[lo:hi]
        drank = np.empty(len(enc.dictionary), dtype=np.int64)
        drank[pc.sort_indices(enc.dictionary)
              .to_numpy(zero_copy_only=False).astype(np.int64)] = \
            np.arange(len(enc.dictionary))
        codes = drank[codes]
        order = np.lexsort((codes, rid))
        r, g = rid[order], codes[order]
        run_starts = np.nonzero(
            np.concatenate([[True], r[1:] != r[:-1]]))[0]
        m = np.diff(np.concatenate([run_starts, [len(r)]]))
        sq = m * m
        total = int(sq.sum())
        if total == 0:
            return out_schema.empty_table()
        cum = np.concatenate([[0], np.cumsum(sq)[:-1]])
        p = np.arange(total, dtype=np.int64) - np.repeat(cum, sq)
        mrep = np.repeat(m, sq)
        srep = np.repeat(run_starts, sq)
        i = srep + p // mrep
        j = srep + p % mrep
        mask = i < j
        inv = np.empty(len(drank), dtype=np.int64)
        inv[drank] = np.arange(len(drank))
        dict_sorted = enc.dictionary.take(pa.array(inv))
        ida = dict_sorted.take(pa.array(g[i[mask]]))
        idb = dict_sorted.take(pa.array(g[j[mask]]))
        # run index of each pair → its group's first row in the block
        grp = b["match_group_id"].take(pa.array(starts[r[i[mask]]]))
        key = pc.binary_join_element_wise(ida, idb, "|")
        keep = pc.invert(pc.is_in(key, value_set=ray.get(eref)))
        return pa.table({"match_group_id": grp, "id_a": ida,
                         "id_b": idb}).filter(keep).cast(out_schema)

    return grouped_apply(
        groups.select_columns(["match_group_id", "source_record_id"]),
        "match_group_id", out_schema=out_schema, runs_fn=runs)


def ari_pair_counts(groups, labels):
    """Pair-counting cluster-agreement integers for Adjusted Rand:
    one row of exact BIGINTs — ``n_records``, ``pairs_total``
    (C(N,2)), ``pairs_pred`` (Σ C(|cluster|,2)), ``pairs_true``
    (Σ C(|entity|,2)), ``pairs_both`` (Σ C(n_ij,2) over the
    contingency cells). ARI = (both − pred·true/total) /
    ((pred+true)/2 − pred·true/total) derives downstream; keeping the
    output integral makes the DuckDB-oracle gate float-free (the
    ``bcubed_stats`` convention). Orphans (entity_id = −1) are
    singleton entities: they contribute to pairs_pred/pairs_total but
    never to a true entity or a contingency cell (C(1,2) = 0).

    Scale shape: one record-grain ``smart_join``, then three grouped
    counts (cells / clusters / entities) each collapsed per batch to
    C(n,2) partials and summed — only counts ride any exchange; the
    final row is a bounded scalar collect."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from payor_linkage.rayutil import smart_join

    ce = smart_join(
        groups.select_columns(["match_group_id", "source_record_id"]),
        labels.select_columns(["source_record_id", "entity_id"]),
        "source_record_id")

    def pair_sum(counts_ds) -> int:
        def c2(b: pa.Table) -> pa.Table:
            n = pc.cast(b["count()"], pa.int64())
            p = pc.divide(pc.multiply(n, pc.subtract(n, 1)), 2)
            return pa.table({"p": p})

        s = counts_ds.map_batches(c2, batch_format="pyarrow").sum("p")
        return int(s or 0)

    def drop_orphans(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b["entity_id"], -1))

    labeled = ce.map_batches(drop_orphans, batch_format="pyarrow")
    pairs_both = pair_sum(
        labeled.groupby(["match_group_id", "entity_id"]).count())
    pairs_true = pair_sum(labeled.groupby("entity_id").count())
    pairs_pred = pair_sum(ce.groupby("match_group_id").count())
    n = ce.count()

    return pa.table({
        "n_records": pa.array([n], pa.int64()),
        "pairs_total": pa.array([n * (n - 1) // 2], pa.int64()),
        "pairs_pred": pa.array([pairs_pred], pa.int64()),
        "pairs_true": pa.array([pairs_true], pa.int64()),
        "pairs_both": pa.array([pairs_both], pa.int64()),
    })


# ── Fellegi–Sunter parameter estimation ────────────────────────────────────

# binary agreement fields for FS estimation: exact-equality comparisons on
# the normalized pair payload (blocking.py carries {f}_a/{f}_b on every
# candidate pair — no join-back needed). Bit i of a pattern = FS_FIELDS[i].
FS_FIELDS = ["payor_name_clean", "tax_id", "cms_plan_id", "state_code",
             "zip_code", "phone"]


def fs_agreement_patterns(pairs, fields=FS_FIELDS):
    """Histogram of binary agreement patterns γ over candidate pairs —
    the sufficient statistic for Fellegi–Sunter EM (field i agrees iff
    both sides non-null AND equal; bit i of ``pattern``). The classic
    observation that makes FS estimation embarrassingly scalable: EM
    never needs the pairs again, only the ≤2^K pattern counts, so the
    corpus-sized pair set is touched exactly once.

    Scale shape: per-block vectorized bitmask (pyarrow equality → numpy
    shift/or) collapsed to a per-block ``bincount`` partial, then one
    grouped sum over ≤2^K tiny rows — only (pattern, count) ride the
    exchange. Reference semantics: the m/u machinery the reference
    hand-tunes as strategy weights (`snowflake/07_scoring.sql` weight
    constants); here estimated from data."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    k = len(fields)
    if k > 20:
        raise ValueError("fs_agreement_patterns: 2^K pattern space too wide")

    def pat(b: pa.Table) -> pa.Table:
        mask = np.zeros(b.num_rows, dtype=np.int64)
        for i, f in enumerate(fields):
            eq = pc.fill_null(pc.equal(b[f + "_a"], b[f + "_b"]), False)
            mask |= eq.to_numpy(zero_copy_only=False).astype(np.int64) << i
        cnt = np.bincount(mask, minlength=1 << k)
        nz = np.nonzero(cnt)[0]
        return pa.table({"pattern": pa.array(nz, pa.int64()),
                         "n_pairs": pa.array(cnt[nz], pa.int64())})

    parts = pairs.map_batches(pat, batch_format="pyarrow")
    return parts.groupby("pattern").aggregate(
        Sum("n_pairs", alias_name="n_pairs"))


def fs_em_weights(patterns, fields=FS_FIELDS, iters=40, init_m=0.9,
                  init_u=0.1, init_lambda=0.05, eps=1e-6):
    """Fellegi–Sunter m/u estimation via EM over the pattern histogram
    (Winkler's formulation): per-field match/unmatch agreement
    probabilities plus the log2 agreement/disagreement weights that
    make the composite score additive. Driver-tier by construction —
    the input is ≤2^K rows regardless of corpus size (the whole point
    of :func:`fs_agreement_patterns`), so there is nothing to
    distribute and no fallback needed.

    Returns ``(table, lambda_match)``: table columns ``field, m_prob,
    u_prob, agree_weight, disagree_weight``; ``lambda_match`` is the
    estimated match prevalence among candidate pairs."""
    import numpy as np
    import pyarrow as pa

    if hasattr(patterns, "to_pandas") and not isinstance(patterns, pa.Table):
        patterns = patterns.to_pandas()  # Dataset → small frame
        pats = patterns["pattern"].to_numpy()
        cnts = patterns["n_pairs"].to_numpy()
    else:
        pats = patterns["pattern"].to_numpy()
        cnts = patterns["n_pairs"].to_numpy()

    k = len(fields)
    g = ((pats[:, None] >> np.arange(k)) & 1).astype(np.float64)  # P×K
    n = cnts.astype(np.float64)
    m = np.full(k, float(init_m))
    u = np.full(k, float(init_u))
    lam = float(init_lambda)
    for _ in range(iters):
        log_pm = g @ np.log(m) + (1.0 - g) @ np.log(1.0 - m)
        log_pu = g @ np.log(u) + (1.0 - g) @ np.log(1.0 - u)
        pm = lam * np.exp(log_pm)
        pu = (1.0 - lam) * np.exp(log_pu)
        w = pm / (pm + pu)  # E-step: P(match | γ)
        wn, vn = w * n, (1.0 - w) * n
        m = np.clip(g.T @ wn / wn.sum(), eps, 1.0 - eps)
        u = np.clip(g.T @ vn / vn.sum(), eps, 1.0 - eps)
        lam = float(np.clip(wn.sum() / n.sum(), 1e-9, 1.0 - 1e-9))

    tbl = pa.table({
        "field": pa.array(list(fields), pa.string()),
        "m_prob": pa.array(m, pa.float64()),
        "u_prob": pa.array(u, pa.float64()),
        "agree_weight": pa.array(np.log2(m / u), pa.float64()),
        "disagree_weight": pa.array(np.log2((1.0 - m) / (1.0 - u)),
                                    pa.float64()),
    })
    return tbl, lam


def calibrate_isotonic(sweep) -> "pa.Table":
    """Isotonic calibration of the match-score → precision curve: PAVA
    (pool-adjacent-violators) over the `threshold_sweep` buckets, so
    calibrated precision is monotone non-decreasing in score — the
    standard way to turn raw ensemble scores into trustworthy review-
    queue probabilities without a parametric fit. Driver-tier by
    construction (≤ granularity+1 buckets regardless of corpus size);
    the bucket integers underneath are the oracle-checked surface
    (q_mdm_threshold_sweep), the float output is pytest-gated against
    a naive merge-violators reference."""
    import numpy as np
    import pyarrow as pa

    if hasattr(sweep, "to_pandas") and not isinstance(sweep, pa.Table):
        sweep = sweep.to_pandas()
    df = sweep if not isinstance(sweep, pa.Table) else sweep.to_pandas()
    df = df.sort_values("bucket").reset_index(drop=True)
    w = df["n_pairs"].to_numpy().astype(np.float64)
    y = df["n_true"].to_numpy().astype(np.float64) / np.maximum(w, 1.0)

    # stack-based PAVA: maintain blocks of (weight, mean); merge while
    # the last two violate monotonicity
    bw, bm, bn = [], [], []  # weight, mean, count of buckets pooled
    for wi, yi in zip(w, y):
        cw, cm, cn = wi, yi, 1
        while bw and bm[-1] > cm:
            pw, pm, pn = bw.pop(), bm.pop(), bn.pop()
            cm = (pw * pm + cw * cm) / max(pw + cw, 1e-300)
            cw += pw
            cn += pn
        bw.append(cw)
        bm.append(cm)
        bn.append(cn)
    cal = np.repeat(np.array(bm), np.array(bn))
    return pa.table({
        "bucket": pa.array(df["bucket"].to_numpy(), pa.int64()),
        "n_pairs": pa.array(df["n_pairs"].to_numpy(), pa.int64()),
        "n_true": pa.array(df["n_true"].to_numpy(), pa.int64()),
        "calibrated_precision": pa.array(cal, pa.float64()),
    })


def ranking_agreement(ds, id_col: str, a_col: str, b_col: str,
                      max_items: int = 20_000) -> "pa.Table":
    """Kendall pair-concordance integers between two per-item scores
    (the τ-b sufficient statistics): over all item pairs i<j, counts
    of concordant / discordant / tied-in-a / tied-in-b / tied-in-both
    sign combinations — the exact, float-free way to compare two
    rankings (two ANN configs, two scorers, score-vs-label). τ-b
    derives downstream as pure arithmetic.

    Driver-tier BY CONTRACT: rankings are query-result-sized (top-k
    lists, per-entity aggregates), never corpus-sized — raises above
    ``max_items``. The n² classification runs chunk-vectorized in
    numpy (no python per pair); upstream score construction is the
    distributed part."""
    import numpy as np
    import pyarrow as pa

    tbl = ds.to_pandas() if hasattr(ds, "to_pandas") and not isinstance(
        ds, pa.Table) else (ds.to_pandas() if isinstance(ds, pa.Table)
                            else ds)
    n = len(tbl)
    if n > max_items:
        raise ValueError(f"ranking_agreement: {n} items exceeds the "
                         f"bounded-ranking contract ({max_items})")
    a = tbl[a_col].to_numpy()
    b = tbl[b_col].to_numpy()
    conc = disc = tie_a = tie_b = tie_both = 0
    chunk = max(1, 10_000_000 // max(n, 1))
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        rows = np.arange(s, e)
        mask = np.arange(n)[None, :] > rows[:, None]  # j > i only
        da = np.sign(a[s:e, None].astype(np.int64)
                     - a[None, :].astype(np.int64))
        db = np.sign(b[s:e, None].astype(np.int64)
                     - b[None, :].astype(np.int64))
        prod = da * db
        conc += int(((prod > 0) & mask).sum())
        disc += int(((prod < 0) & mask).sum())
        tie_both += int(((da == 0) & (db == 0) & mask).sum())
        tie_a += int(((da == 0) & (db != 0) & mask).sum())
        tie_b += int(((da != 0) & (db == 0) & mask).sum())
    return pa.table({
        "n_items": pa.array([n], pa.int64()),
        "n_pairs": pa.array([n * (n - 1) // 2], pa.int64()),
        "concordant": pa.array([conc], pa.int64()),
        "discordant": pa.array([disc], pa.int64()),
        "tied_a": pa.array([tie_a], pa.int64()),
        "tied_b": pa.array([tie_b], pa.int64()),
        "tied_both": pa.array([tie_both], pa.int64()),
    })


BLOCK_SCHEMES = ["block_name_key", "block_tax_id", "block_zip3_name4",
                 "block_phonetic"]


def blocking_scheme_stats(unified, schemes: list[str] | None = None):
    """Per-scheme blocking statistics — the scheme-selection table the
    ER literature reads before committing to keys: for each candidate
    key column, ``n_keys`` (distinct non-null), ``n_records`` (rows
    keyed), ``sum_pairs`` (Σ C(block,2) — the scheme's pair budget)
    and ``covered_pairs`` (Σ C(same-entity-in-block,2) — the true
    pairs it can recall; orphans excluded). All exact integers; the
    recall-per-cost ratio derives downstream.

    Scale shape: per scheme, TWO bounded grouped counts (key; key ×
    entity) each collapsed to C(n,2) partials per batch — only
    counters ride the exchanges; no pair is ever materialized."""
    import pyarrow as pa
    import pyarrow.compute as pc

    schemes = list(schemes or BLOCK_SCHEMES)

    def pair_sum(counts_ds) -> int:
        def c2(b: pa.Table) -> pa.Table:
            n = pc.cast(b["count()"], pa.int64())
            return pa.table({"p": pc.divide(
                pc.multiply(n, pc.subtract(n, 1)), 2)})

        s = counts_ds.map_batches(c2, batch_format="pyarrow").sum("p")
        return int(s or 0)

    rows = []
    for sc in schemes:
        keyed = unified.select_columns([sc, "entity_id"]).map_batches(
            lambda b, c=sc: b.filter(b[c].is_valid()),
            batch_format="pyarrow").materialize()
        n_records = keyed.count()
        by_key = keyed.groupby(sc).count().materialize()
        n_keys = by_key.count()
        sum_pairs = pair_sum(by_key)
        real = keyed.map_batches(
            lambda b: b.filter(pc.not_equal(b["entity_id"], -1)),
            batch_format="pyarrow")
        covered = pair_sum(real.groupby([sc, "entity_id"]).count())
        rows.append((sc, n_keys, n_records, sum_pairs, covered))

    return pa.table({
        "scheme": pa.array([r[0] for r in rows], pa.string()),
        "n_keys": pa.array([r[1] for r in rows], pa.int64()),
        "n_records": pa.array([r[2] for r in rows], pa.int64()),
        "sum_pairs": pa.array([r[3] for r in rows], pa.int64()),
        "covered_pairs": pa.array([r[4] for r in rows], pa.int64()),
    })


def fit_logistic(ds, feature_cols: list[str], label_col: str,
                 iters: int = 12, ridge: float = 1e-6):
    """Distributed logistic-regression fit (IRLS/Newton) — the learned
    linear matcher over per-pair similarity features, replacing the
    reference's hand-set weight chain with coefficients estimated from
    labeled pairs. The canonical distributed-ML-fit shape: each Newton
    round broadcasts β and reduces ONE (k+1)²+(k+1)-float sufficient-
    statistic row per batch (Xᵀdiag(w)X and Xᵀ(y−p), intercept
    folded in as a constant column); the driver solves the (k+1)
    system. Rounds = ``iters``; the corpus is never collected. Null
    features are zero-filled (a skipped strategy contributes nothing,
    matching the renormalized-weights semantics).

    Returns ``(beta, n_rows)`` with ``beta[0]`` the intercept —
    floats by nature; pytest-gated against a single-machine numpy
    IRLS reference at the optimum (unique under the ridge term)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    k = len(feature_cols) + 1  # + intercept
    n_rows = ds.count()
    beta = np.zeros(k, np.float64)

    for _ in range(iters):
        bref = ray.put(beta.copy())

        def partial(b: pa.Table) -> pa.Table:
            bb = ray.get(bref)
            x = np.column_stack(
                [np.ones(b.num_rows, np.float64)]
                + [pc.fill_null(pc.cast(b[c], pa.float64()), 0.0)
                   .to_numpy(zero_copy_only=False)
                   for c in feature_cols])
            y = b[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            z = x @ bb
            p = 1.0 / (1.0 + np.exp(-z))
            w = p * (1.0 - p)
            xtwx = (x.T * w) @ x                 # k×k
            grad = x.T @ (y - p)                 # k
            flat = np.concatenate([xtwx.ravel(), grad])
            return pa.table({f"s{i}": pa.array([v], pa.float64())
                             for i, v in enumerate(flat)})

        # one row of k²+k floats per batch — a bounded driver collect
        # (blocks, not rows), summed in block order (deterministic)
        ptbl = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = ptbl.to_numpy(dtype=np.float64).sum(axis=0)
        xtwx = sums[:k * k].reshape(k, k) + ridge * np.eye(k)
        grad = sums[k * k:] - ridge * beta
        beta = beta + np.linalg.solve(xtwx, grad)
    return beta, n_rows

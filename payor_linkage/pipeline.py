"""End-to-end pipeline composition + CLI.

The dbt DAG (SURVEY §3.1) as one Python function over Ray Datasets:

    documents → unify → blocking_pairs → score_pairs → decide
              → build_match_groups → build_golden / build_xref
              → infer_hierarchy → audit/metrics

Each stage optionally checkpoints (storage.checkpointed) so a re-run —
or the steward loop's downstream-only rebuild (S10) — resumes from the
last valid stage. Never calls ray.init()/shutdown() (driver owns the
session); the CLI entry guards its own init.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
from ray.data import Dataset

from payor_linkage.audit import build_audit_log
from payor_linkage.blocking import blocking_pairs
from payor_linkage.cluster import build_match_groups
from payor_linkage.config import PipelineConfig
from payor_linkage.decide import decide
from payor_linkage.normalize import unify
from payor_linkage.scoring import score_pairs
from payor_linkage.storage import checkpointed, fingerprint
from payor_linkage.survivorship import SurvivorshipConfig, build_golden, build_xref
from payor_linkage.hierarchy import infer_hierarchy


@dataclass
class LinkageResult:
    unified: Dataset
    candidates: Dataset
    groups: Dataset
    golden: Dataset
    xref: Dataset
    hierarchy: Dataset
    audit: Dataset
    # blocking state: the per-bkey record counts (distinct-key-sized,
    # persisted like any stage) — lets incremental_update rebuild the
    # combined-corpus hot-key map from prior + delta counts instead of
    # re-scanning the corpus
    block_counts: Dataset | None = None


def run_linkage(documents: Dataset, cfg: PipelineConfig | None = None,
                steward_overlay: Dataset | None = None,
                surv_cfg: SurvivorshipConfig | None = None) -> LinkageResult:
    """Full MDM run over an interleaved-document Dataset."""
    from payor_linkage.blocking import blocking_key_rows, key_counts

    cfg = cfg or PipelineConfig()
    root = cfg.checkpoint_dir
    base_fp = fingerprint("v1", cfg.blocking, cfg.scoring,
                          steward_overlay is not None)

    from payor_linkage.rayutil import coalesce_small_blocks

    unified = coalesce_small_blocks(checkpointed(root, "unified", base_fp)(
        lambda: unify(documents)).materialize())
    block_counts = checkpointed(
        root, "block_counts", fingerprint(base_fp, "bcounts"))(
        lambda: key_counts(blocking_key_rows(unified, cfg.blocking))
    ).materialize()
    pairs = checkpointed(root, "pairs", fingerprint(base_fp, "pairs"))(
        lambda: blocking_pairs(unified, cfg.blocking, counts=block_counts))
    candidates = coalesce_small_blocks(checkpointed(
        root, "candidates", fingerprint(base_fp, "cands"))(
        lambda: decide(score_pairs(pairs, cfg.scoring), cfg.scoring,
                       steward_overlay)).materialize())
    groups = checkpointed(root, "groups", fingerprint(base_fp, "groups"))(
        lambda: build_match_groups(candidates, unified, cfg.cluster)).materialize()
    golden = checkpointed(root, "golden", fingerprint(base_fp, "golden"))(
        lambda: build_golden(groups, unified, surv_cfg)).materialize()
    xref = checkpointed(root, "xref", fingerprint(base_fp, "xref"))(
        lambda: build_xref(groups, unified)).materialize()
    hierarchy = checkpointed(root, "hierarchy", fingerprint(base_fp, "hier"))(
        lambda: infer_hierarchy(golden, unified, xref)).materialize()
    audit = build_audit_log(golden, hierarchy, steward_overlay)
    return LinkageResult(unified, candidates, groups, golden, xref,
                         hierarchy, audit, block_counts=block_counts)


def main() -> None:  # pragma: no cover - CLI entry
    import argparse

    import ray
    import ray.data as rd

    from payor_linkage.synth import synth_documents

    ap = argparse.ArgumentParser(description="payor_linkage MDM pipeline")
    ap.add_argument("--input", help="path to a document table (parquet/lance); "
                                    "default: seeded synthetic corpus")
    ap.add_argument("--replicas", type=int, default=1)
    ap.add_argument("--checkpoint-dir")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        if args.input:
            from payor_linkage.storage import read_stage
            docs = read_stage(args.input)
        else:
            docs = synth_documents(args.replicas)
        cfg = PipelineConfig(checkpoint_dir=args.checkpoint_dir)
        res = run_linkage(docs, cfg)
        print({
            "records": res.unified.count(),
            "candidates": res.candidates.count(),
            "golden": res.golden.count(),
            "hierarchy": res.hierarchy.count(),
        })
    finally:
        ray.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()


def _changed_group_ids(old_groups: Dataset, new_groups: Dataset) -> list:
    """Group ids whose member SET differs between two MATCH_GROUPS
    tables (delta-bounded: a group changes only by touching a new
    record or a merge). One tagged union + one grouped count — a
    (gid, rid) pair present in both sides contributes count 2/tag-sum
    1; anything else marks the gid."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def tag(ds: Dataset, t: int) -> Dataset:
        return ds.select_columns(["match_group_id", "source_record_id"]) \
            .map_batches(lambda b: b.append_column(
                "t", pa.array([t] * b.num_rows, pa.int64())),
                batch_format="pyarrow")

    try:
        import ray as _ray

        _cpus = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        _cpus = 4
    # both group tables arrive in many small blocks; Ray's groupby fans
    # out one reduce partition per input block — coalesce first
    g = (tag(old_groups, 0).union(tag(new_groups, 1))
         .repartition(_cpus * 2)
         .groupby(["match_group_id", "source_record_id"])
         .aggregate(Count(alias_name="n"), Sum("t", alias_name="s")))
    bad = g.map_batches(
        lambda b: b.filter(pc.or_(pc.not_equal(b["n"], 2),
                                  pc.not_equal(b["s"], 1))),
        batch_format="pyarrow")
    return bad.unique("match_group_id")


def _patch_by_group(old: Dataset, rebuilt: Dataset, affected: list,
                    id_col: str, single_block_rebuilt: bool = False) -> Dataset:
    """Replace ``old``'s rows for the affected group ids with the
    rebuilt subset (broadcast id-set filter; affected is
    delta-bounded). Pass ``single_block_rebuilt=True`` when ``rebuilt``
    is a driver-built one-block dataset — the coalescing repartition is
    then skipped while block counts stay pinned."""
    import ray
    import pyarrow.compute as pc

    ref = ray.put(pa.array(sorted(affected), pa.string()))

    def drop_affected(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.is_in(
            b[id_col], value_set=ray.get(ref))))

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    out = old.map_batches(drop_affected, batch_format="pyarrow") \
        .union(rebuilt)
    # coalesce ONLY when block counts would compound across incremental
    # generations (observed: 720-block golden/xref made the hierarchy
    # patch 5× slower than the work it did) — the driver-local patch
    # path (single_block_rebuilt) unions ONE rebuilt block onto an
    # already-pinned old side, where an unconditional repartition would
    # pay a full rewrite of the corpus-sized table for nothing; block
    # growth is +1/generation there, reset by the > cpus*4 check
    n_old = None
    if single_block_rebuilt:
        try:
            n_old = old.num_blocks()  # old is always materialized
        except Exception:
            n_old = None
    if n_old is None or n_old > cpus * 4:
        out = out.repartition(cpus * 2)
    return out


def incremental_update(prior: LinkageResult, new_documents: Dataset,
                       cfg: PipelineConfig | None = None,
                       steward_overlay: Dataset | None = None,
                       surv_cfg: SurvivorshipConfig | None = None
                       ) -> LinkageResult:
    """Add a batch of new documents to an already-linked corpus WITHOUT
    re-scoring or re-clustering it: only pairs with a new endpoint are
    blocked + scored (``blocking.delta_blocking_pairs``, whose hot-key
    map merges the prior run's persisted key counts with the delta's —
    no corpus re-scan), prior candidates are reused verbatim, and
    clustering rebuilds ONLY the components a delta edge touches
    (``cluster.incremental_match_groups`` — prior components are closed
    under prior edges, so full-run components are prior components
    merged along delta edges). Survivorship / xref / hierarchy are
    patched only for those components; untouched groups keep their
    prior rows byte-identical. A diffuse delta (touching more than ~30%
    of prior records — the adversarial uniform-sprinkle regime) falls
    back to a full clustering rebuild, still byte-exact.

    Exactness contract (gated by ``test_incremental_matches_full`` and
    ``test_incremental_supernode_path``): with a stable hot-key map
    across the delta, every output table is byte-equal to a fresh full
    run over the combined corpus. Pass the same ``steward_overlay`` /
    configs the prior run used."""
    import pyarrow.compute as pc
    import ray

    from payor_linkage.blocking import delta_blocking_pairs
    from payor_linkage.cluster import incremental_match_groups
    from payor_linkage.hierarchy import patch_hierarchy

    cfg = cfg or PipelineConfig()

    from payor_linkage.rayutil import coalesce_small_blocks

    import pyarrow.compute as _pc
    import ray.data as _rd

    from payor_linkage.blocking import _DELTA_LOCAL_ROWS_BOUND
    from payor_linkage.normalize import normalize_batch
    from payor_linkage.rayutil import scatter_blocks

    small_delta = new_documents.count() <= _DELTA_LOCAL_ROWS_BOUND
    if small_delta:
        # delta tier: normalize through raw scatter tasks (same
        # normalize_batch kernel, no Dataset stage launch), splice the
        # combined corpus as prior blocks + ONE delta block by
        # reference (rd.from_arrow_refs — 0.1 s where
        # union().materialize() rewrote the corpus for 1.5-2.5 s). Row
        # order matches the union exactly (prior blocks then delta);
        # block count grows +1 per generation. One ray.put serves both
        # the delta dataset and the splice.
        new_tbl = scatter_blocks(new_documents, normalize_batch)
        new_ref = ray.put(new_tbl)
        unified_new = _rd.from_arrow_refs([new_ref])
        new_ids = _pc.unique(
            new_tbl["source_record_id"].combine_chunks()).to_pylist()
        unified = _rd.from_arrow_refs(
            list(prior.unified.to_arrow_refs()) + [new_ref])
    else:
        unified_new = coalesce_small_blocks(
            unify(new_documents).materialize())
        new_ids = unified_new.unique("source_record_id")
        unified = coalesce_small_blocks(
            prior.unified.union(unified_new).materialize())

    pairs_delta, new_counts = delta_blocking_pairs(
        unified, new_ids, cfg.blocking, unified_new=unified_new,
        prior_counts=prior.block_counts, return_counts=True)
    cands_delta = coalesce_small_blocks(
        decide(score_pairs(pairs_delta, cfg.scoring,
                           task_mode=small_delta), cfg.scoring,
               steward_overlay).materialize())
    candidates = coalesce_small_blocks(
        prior.candidates.union(cands_delta).materialize())

    sub = incremental_match_groups(prior.groups, prior.candidates,
                                   cands_delta, unified, new_ids,
                                   cfg.cluster)
    local_tbls = None
    if sub is not None:
        groups_sub, affected, unified_sub, local_tbls = sub
        if local_tbls is not None:
            # groups_sub was built driver-local — its table is in hand,
            # so new_gids needs no Ray pass either
            new_gids = pc.unique(
                local_tbls[0]["match_group_id"].combine_chunks()
            ).to_pylist()
        else:
            groups_sub = groups_sub.materialize()
            new_gids = groups_sub.unique("match_group_id")
        groups = _patch_by_group(
            prior.groups, groups_sub, affected, "match_group_id",
            single_block_rebuilt=local_tbls is not None).materialize()
        affected_all = sorted(set(affected) | set(new_gids))
    else:
        # diffuse delta — full clustering rebuild over the combined graph
        groups = build_match_groups(candidates, unified, cfg.cluster) \
            .materialize()
        affected = affected_all = _changed_group_ids(prior.groups, groups)
        groups_sub = unified_sub = None
        if affected:
            aref = ray.put(pa.array(sorted(affected), pa.string()))

            def only_affected(b: pa.Table) -> pa.Table:
                return b.filter(pc.is_in(b["match_group_id"],
                                         value_set=ray.get(aref)))

            groups_sub = groups.map_batches(
                only_affected, batch_format="pyarrow").materialize()

    if groups_sub is not None and affected_all:
        # survivorship/xref rebuilds: fully driver-local when the
        # subgraph fit the driver tier (same election kernels, zero Ray
        # stages); else stream the delta-bounded member slice —
        # build_golden/build_xref stream their `unified` argument end to
        # end (members attach + spans attach), so handing them the full
        # corpus here would pay two corpus-wide passes per patched table
        hier_sub = None
        if local_tbls is not None:
            import ray.data as _rd

            from payor_linkage.survivorship import local_golden, local_xref

            groups_tbl, unified_tbl = local_tbls
            # combine_chunks before from_arrow: Ray's put serializer
            # pays per-chunk offset-buffer copies on many-chunk tables
            golden_sub_tbl = local_golden(groups_tbl, unified_tbl,
                                          surv_cfg).combine_chunks()
            xref_sub_tbl = local_xref(groups_tbl,
                                      unified_tbl).combine_chunks()
            golden_sub = _rd.from_arrow(golden_sub_tbl)
            xref_sub = _rd.from_arrow(xref_sub_tbl)
            hier_sub = (unified_tbl, golden_sub_tbl, xref_sub_tbl)
        else:
            u_src = unified_sub if unified_sub is not None else unified
            from payor_linkage.cluster import INCR_LOCAL_ROWS_BOUND
            lrb = INCR_LOCAL_ROWS_BOUND if unified_sub is not None else 0
            golden_sub = build_golden(groups_sub, u_src, surv_cfg,
                                      local_rows_bound=lrb)
            xref_sub = build_xref(groups_sub, u_src)
        golden = _patch_by_group(
            prior.golden, golden_sub, affected, "master_payor_id",
            single_block_rebuilt=local_tbls is not None).materialize()
        xref = _patch_by_group(
            prior.xref, xref_sub, affected, "master_payor_id",
            single_block_rebuilt=local_tbls is not None).materialize()
        hierarchy = patch_hierarchy(golden, unified, xref,
                                    prior.hierarchy,
                                    affected_all,
                                    local_sub=hier_sub).materialize()
    else:
        golden, xref = prior.golden, prior.xref
        hierarchy = prior.hierarchy
    audit = build_audit_log(golden, hierarchy, steward_overlay)
    return LinkageResult(unified, candidates, groups, golden, xref,
                         hierarchy, audit,
                         # materialized: carried as the NEXT increment's
                         # prior state — a lazy splice would re-execute
                         # its lineage every generation
                         block_counts=new_counts.materialize()
                         if new_counts is not None else None)

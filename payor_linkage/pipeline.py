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


def run_linkage(documents: Dataset, cfg: PipelineConfig | None = None,
                steward_overlay: Dataset | None = None,
                surv_cfg: SurvivorshipConfig | None = None) -> LinkageResult:
    """Full MDM run over an interleaved-document Dataset."""
    cfg = cfg or PipelineConfig()
    root = cfg.checkpoint_dir
    base_fp = fingerprint("v1", cfg.blocking, cfg.scoring,
                          steward_overlay is not None)

    unified = checkpointed(root, "unified", base_fp)(
        lambda: unify(documents)).materialize()
    pairs = checkpointed(root, "pairs", fingerprint(base_fp, "pairs"))(
        lambda: blocking_pairs(unified, cfg.blocking))
    candidates = checkpointed(root, "candidates", fingerprint(base_fp, "cands"))(
        lambda: decide(score_pairs(pairs, cfg.scoring), cfg.scoring,
                       steward_overlay)).materialize()
    groups = checkpointed(root, "groups", fingerprint(base_fp, "groups"))(
        lambda: build_match_groups(candidates, unified, cfg.cluster)).materialize()
    golden = checkpointed(root, "golden", fingerprint(base_fp, "golden"))(
        lambda: build_golden(groups, unified, surv_cfg)).materialize()
    xref = checkpointed(root, "xref", fingerprint(base_fp, "xref"))(
        lambda: build_xref(groups, unified)).materialize()
    hierarchy = checkpointed(root, "hierarchy", fingerprint(base_fp, "hier"))(
        lambda: infer_hierarchy(golden, unified, xref)).materialize()
    audit = build_audit_log(golden, hierarchy, steward_overlay)
    return LinkageResult(unified, candidates, groups, golden, xref, hierarchy, audit)


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

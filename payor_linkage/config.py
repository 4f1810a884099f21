"""Pipeline configuration — thresholds, blocking-key skew handling, sizing.

The reference hard-codes its thresholds in SQL
(`/root/reference/transform/payor_mdm/models/match/match_candidates.sql:34-39`);
here they are data, like the reference's survivorship rules-as-data idea
(`snowflake/07_seed_survivorship_config.sql`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class BlockingConfig:
    # emit the Soundex phonetic key alongside the reference's 3 keys
    # (north-rule addition; SURVEY §2.3 U2)
    use_phonetic_key: bool = True
    # phonetic blocks get a much lower cap: Soundex keys are low-precision
    # recall boosters whose buckets grow linearly with corpus size — salting
    # them early keeps phonetic pair cost at O(rows × cap/2) instead of
    # O(bucket²) (same-entity recall is preserved by the other key types +
    # the liaison sub-block)
    pho_key_cap: int = 32
    # hot-key handling: keys with more than `hot_key_cap` member records are
    # salted into ceil(n/hot_key_cap) sub-blocks (hash-of-id assignment);
    # pairs are generated within a sub-block plus one chain-link pair between
    # consecutive sub-block anchors, preserving cluster connectivity while
    # bounding per-key pair count at O(n * cap) instead of O(n^2).
    # None disables capping (exact reference pair semantics).
    hot_key_cap: int | None = 1000
    # degenerate keys (empty-name 'XX…' / 'XXX…' keys) above the cap are
    # *parked* (no pairs at all) instead of salted — they carry no signal.
    park_degenerate_hot_keys: bool = True
    # hard pair-count bound: ANY key larger than this is parked (salting
    # bounds sub-block size but still emits O(n·cap) pairs per key — a key
    # this hot is collision noise, not an entity; parked volume should be
    # surfaced via blocking metrics)
    park_key_above: int = 50_000


@dataclass
class ScoringConfig:
    auto_match_threshold: float = 0.85   # match_candidates.sql:36
    review_threshold: float = 0.60       # match_candidates.sql:37
    batch_size: int = 2048               # pairs per scorer actor batch (keeps the pool busy)
    # emit the reference's full ensemble_detail object as a JSON column
    # (MATCH_CANDIDATES.ensemble_detail, 12_abbreviation_dict.sql:78-79);
    # off by default — json.dumps per pair costs real throughput at scale
    emit_ensemble_detail: bool = False
    concurrency: tuple[int, int] | int | None = None  # actor pool size (None → auto)
    # score through plain tasks with a per-worker-process scorer cache
    # (module state persists across tasks like an actor's __init__)
    # instead of spawning an actor pool: byte-identical output, no pool
    # ramp — which hits the high-CPU side hardest (N actor spawns) and
    # so directly helps scaling efficiency. Set False to force the pool
    # (dedicated processes, caches bounded by actor lifetime).
    task_mode: bool = True


@dataclass
class ClusterConfig:
    max_rounds: int = 50                 # label-propagation fixpoint bound
    join_num_partitions: int | None = None  # None → adapt to cluster CPUs
    # when the match-edge count is provably below this bound, connected
    # components run as a driver-side union-find over the (bounded) edge
    # list with the component map broadcast back — singletons and group
    # assembly stay distributed. Above it, alternating sort-contract
    # rounds (sort by src / by dst + per-block spanning-forest
    # union-find, no joins) shrink the edge list; if it fits the bound
    # the driver finishes, else the iterated label-propagation path runs
    # (the last-resort 10^12-scale path). 0 disables the local path.
    local_cc_max_edges: int = 2_000_000
    contract_rounds: int = 6             # max sort-contract rounds


@dataclass
class PipelineConfig:
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    # per-stage checkpoint root (None → no checkpoints)
    checkpoint_dir: str | None = None
    # drop sidecar label columns in production mode
    keep_labels: bool = True

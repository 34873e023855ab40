"""Pipeline configuration — the CanalParameter / instance-assembly analog.

Mirrors the reference's filter + instance configuration surface
(CanalParameter → CanalInstanceWithManager.java:102-221; filter wiring
AbstractEventParser.java:63-65 and EntryEventSink.doFilter:151-162):

- ``table_whitelist_regex`` / ``table_blacklist_regex`` — Perl-regex
  table filters, ``^…$``-anchored like AviaterRegexFilter.java:63-96 (F1/F2).
- ``table_list`` — exact-membership filter (AviaterSimpleFilter.java:25-47, F3).
- ``predicate`` — arbitrary user predicate over the batch, the
  AviaterELFilter analog (F4): ``fn(pa.Table) -> bool mask``.
- ``drop_ops`` — event-class filters (F6): e.g. drop all deletes.
- ``column_projection`` — per-payload-column keep list (F5 field
  white-list, LogEventConvert.needField:937-943): dropped columns are
  nulled in the row images.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional


def actor_pool(lo: int = 2, cap: int = 0) -> tuple[int, int]:
    """Autoscaling actor-pool bounds for ``map_batches(Cls, concurrency=...)``.

    ``(lo, hi)`` where ``hi`` tracks the cluster's CPU count (the
    parse-worker sizing rule, AbstractEventParser.java:207: workers =
    f(cores), never a constant) so stateful stages scale with the node
    instead of capping the pipeline at a fixed actor count. ``cap``
    bounds ``hi`` when the stage is memory-heavy (wide media payloads).
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray import/startup races
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or lo
    hi = max(lo, cpus)
    if cap:
        hi = min(hi, cap)
    return (lo, hi)


def actor_pool_free(lo: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds that always leave at least one CPU
    for non-actor stages. Ray 2.49's streaming executor deadlocks when
    an actor pool can claim every CPU while an upstream NON-actor stage
    (a parquet read, a shuffle) still needs one to produce the pool's
    input (observed: read_parquet → fused actor stage at 4 CPUs; same
    root cause as the fixed-pool clamp in corpus.decontaminate). Use
    this instead of :func:`actor_pool` whenever the stage's input may
    come from a read rather than in-memory blocks."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray import/startup races
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or (lo + 1)
    return (lo, max(lo, cpus - 1))


@dataclass
class ReplayConfig:
    num_partitions: int = 16  # lake hash partitions (P)
    segments_per_batch: int = 4  # micro-batch = this many journal files
    # rows per map_batches call in the combiner; large batches amortize
    # per-task overhead (128k measured ~15% faster than 32k at bench
    # scale; harmless for small replays — a batch is capped by block
    # size anyway)
    batch_size: int = 65536
    salt_factor: int = 1  # >1 = salted two-stage reduce for hot keys
    table_whitelist_regex: Optional[str] = None
    table_blacklist_regex: Optional[str] = None
    table_list: Optional[tuple[str, ...]] = None
    drop_ops: tuple[str, ...] = ()
    column_projection: Optional[tuple[str, ...]] = None  # payload columns to KEEP
    predicate: Optional[Callable] = None  # fn(pa.Table) -> BooleanArray mask
    combiner_concurrency: Optional[int] = None  # None = elastic tasks
    # sink write strategy:
    #   "compact" — rewrite the whole partition each batch (read-optimal)
    #   "delta"   — append a change file (write-optimal, merge-on-read);
    #               partitions auto-compact at compact_threshold files
    sink_mode: str = "compact"
    compact_threshold: int = 8
    # auto-compaction strategy when a delta partition reaches
    # compact_threshold files:
    #   "major" — merge-on-read the WHOLE partition (base + deltas) and
    #             rewrite one file (read-optimal; write cost
    #             O(partition bytes) — at 100-TB scale the base dwarfs
    #             the deltas, so every threshold crossing rewrites it)
    #   "minor" — fold the accumulated deltas plus this batch's changes
    #             into ONE delta file, never reading or rewriting the
    #             base (LSM minor compaction; write cost O(delta
    #             bytes)). Partitions stay at ≤2 files; run
    #             Lake.compact() for the single-file read fast-path.
    compact_mode: str = "major"
    # GTID-style failover dedup: ALSO drop events whose logical txn_id
    # is <= the manifest's txn_hwm. Enables switching to a mirror /
    # archived copy of the stream whose file positions are incomparable
    # (different segment numbering) without double-applying — the
    # MysqlGtIdSet resume semantics (MysqlConnection.java:184,
    # driver/.../MysqlGtIdSet.java).
    gtid_dedup: bool = False
    # source uuid for gtid_executed audit bookkeeping: when set, each
    # commit extends the manifest's MySQL-format executed interval set
    # (state/gtid.GtidSet) by the txn range it applied — the
    # gtid_executed audit/resume surface. None = no bookkeeping.
    source_uuid: str | None = None
    # pipelined micro-batches: execute up to this many batch pipelines
    # concurrently (phase-1 writes are invisible until the strictly
    # in-order phase-2 commits). >1 requires sink_mode="delta" (compact
    # mode merges the previous batch's output and must be serial);
    # auto-compaction moves to the driver after the commits.
    pipeline_depth: int = 1
    # extension surface (§2.10): the CanalEventDownStreamHandler analog —
    # called around the phase-2 manifest commit of every micro-batch.
    #   before_commit(batch_id, plan, touched) -> None (raise to abort)
    #   after_commit(manifest) -> None
    before_commit: Optional[Callable] = None
    after_commit: Optional[Callable] = None

"""State-driven compaction policy: compact WHEN the manifest says read
amplification crossed a bound, not every N epochs.

A fixed ``compact_every=N`` cadence is wrong in both directions at
10^10-event scale: skewed ingest piles deltas onto hot buckets long
before epoch N (reads of those buckets resolve dozens of delta files),
while cold buckets get rewritten for nothing. The policy reads the
ONLY signal that matters — per-bucket live-file counts, already in the
folded manifest state, zero extra IO — and compacts exactly the
buckets over threshold. Each MOR read of a bucket opens every one of
its delta files, so ``max_files_per_bucket`` IS the read-amplification
bound: the policy keeps per-bucket file counts ≤ threshold forever,
regardless of tail length or skew.

Runs inline in the ingest loop (run_stream), the follower
(jobs/run_follow.py), or a standalone daemon tick — and because
compaction commits now auto-rebase over disjoint concurrent appends
(table.commit_rewrite retry), a policy daemon can run beside a live
ingest writer.

Reference analogue: the ETL server's background file-maintenance loop
(etl:actors/FileManagementActor.scala:62-97) — there a directory
sweep on a timer; here a manifest-threshold trigger.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from qwery_spark.lake.table import LakeTable, Snapshot


@dataclass
class CompactionPolicy:
    """Compact a bucket when its live-file count exceeds
    ``max_files_per_bucket`` (base file + deltas; each file is one more
    open-and-merge on every read of that bucket). ``min_due_buckets``
    batches tiny maintenance commits: wait until that many buckets are
    due (1 = eager). ``expire_keep``/``vacuum`` piggyback log expiry
    and orphan GC on each triggered compaction, keeping metadata and
    dead-file footprints flat on long runs."""

    max_files_per_bucket: int = 8
    min_due_buckets: int = 1
    expire_keep: int | None = None
    vacuum: bool = False
    # clustering applied to triggered compactions: maintenance rewrites
    # are the natural (free) moment to restore sort/z-order — the data
    # is being rewritten anyway
    sort_cols: list | None = None
    zorder_cols: list | None = None
    max_records_per_file: int = 2_000_000

    def __post_init__(self):
        # a policy misconfiguration must fail at CONSTRUCTION, not at
        # the first triggered tick hours into a stream
        if self.sort_cols and self.zorder_cols:
            raise ValueError(
                "CompactionPolicy: sort_cols and zorder_cols are exclusive"
            )
        if self.max_files_per_bucket < 1:
            raise ValueError("CompactionPolicy: max_files_per_bucket >= 1")

    def due_buckets(self, snap: Snapshot) -> set[int]:
        counts = Counter(f["bucket"] for f in snap.files())
        return {b for b, n in counts.items() if n > self.max_files_per_bucket}


@dataclass
class MaintenanceReport:
    triggered: bool = False
    due_buckets: set[int] = field(default_factory=set)
    files_before: int = 0
    files_after: int = 0
    snapshots_expired: int = 0
    files_vacuumed: int = 0
    # a concurrent writer won the commit race this tick; the next tick
    # retries against the new head (the due buckets are by definition
    # the hot buckets a live ingest writer appends to)
    conflict: bool = False


def maybe_compact(
    spark: SparkSession, table: LakeTable, policy: CompactionPolicy
) -> MaintenanceReport:
    """One policy tick: read the manifest (no data IO), compact the due
    buckets if enough are due, optionally expire + vacuum. Safe to call
    after every epoch — a no-op tick costs one cached snapshot read."""
    snap = table.snapshot()
    rep = MaintenanceReport(files_before=len(snap.files()))
    if snap.write_mode != "mor":
        rep.files_after = rep.files_before
        return rep
    if policy.zorder_cols:
        # surface a bad zorder spec on EVERY tick (cheap dict lookups),
        # not only when a bucket finally crosses the threshold
        from qwery_spark.lake.merge import validate_zorder_cols

        validate_zorder_cols(
            snap, policy.zorder_cols, "CompactionPolicy.zorder_cols"
        )
    due = policy.due_buckets(snap)
    rep.due_buckets = due
    if len(due) < max(policy.min_due_buckets, 1):
        rep.files_after = rep.files_before
        return rep
    from qwery_spark.lake.merge import compact
    from qwery_spark.lake.table import CommitConflict

    try:
        compact(
            spark, table, buckets=due,
            sort_cols=policy.sort_cols, zorder_cols=policy.zorder_cols,
            max_records_per_file=policy.max_records_per_file,
        )
    except CommitConflict:
        # the advertised concurrent mode's COMMON case: an ingest
        # append to a due (hot) bucket landed between our snapshot
        # read and the rewrite commit, beyond what commit_rewrite's
        # disjoint-bucket rebase can absorb. Losing the race is not an
        # error for a policy daemon — the work is still due, the next
        # tick resnapshots and retries against the new head.
        rep.conflict = True
        rep.files_after = len(table.snapshot().files())
        return rep
    rep.triggered = True
    if policy.expire_keep:
        rep.snapshots_expired = table.expire_snapshots(keep_last=policy.expire_keep)
    if policy.vacuum:
        # default grace protects concurrent writers' staged files (the
        # policy daemon is explicitly allowed to run beside a writer)
        rep.files_vacuumed = table.vacuum()
    rep.files_after = len(table.snapshot().files())
    return rep

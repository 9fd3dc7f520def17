"""Cluster entrypoint: CDC-out follower via spark-submit — the
downstream half of the pipeline (jobs/run_ingest.py writes the table;
this job tails its commit log and ships change rows to consumers).

    spark-submit \
      --py-files qwery_spark.zip \
      jobs/run_follow.py \
      --table /lake/tok_sequences --sink /exports/changes \
      --state /exports/changes/_follow_state.json \
      [--replica /lake/replica] [--poll 30] [--max-polls N] [--coarse]
      [--join-table /lake/enriched --join-dim /lake/sources
       --join-fk source --join-right-cols trust]

Each new commit window lands as parquet under ``--sink/from=<lo>/``
(insert/update_postimage/delete rows, Delta-CDF column contract; the
window END travels in the rows' _commit_version), and/or merges into
``--replica`` (epoch key ``follow:<to>`` makes re-delivery idempotent).
The sink dir is keyed by the window START only: a crash-before-persist
re-ships from the same lo and OVERWRITES the partial dir — consumers
reading ``sink/**`` see each change exactly once, because successive
persisted los partition the version axis. The resume point is pinned to
``--state`` on startup and after every successful window via
``follow_changes(on_advance=...)``; a restarted job picks up exactly
where the previous one stopped, even if the first run shipped nothing.
``--max-polls`` bounds the run (drain-style); omit it for a daemon.

No local-mode assumptions: uses the ambient SparkSession from
spark-submit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--table", required=True)
    p.add_argument("--sink", help="directory for per-window change parquet")
    p.add_argument("--replica", help="lake table to replicate into")
    p.add_argument("--state", required=True,
                   help="JSON file persisting the last synced version")
    p.add_argument("--from-version", type=int, default=None,
                   help="override the resume point (default: --state file, "
                        "else the table head = follow new commits only)")
    p.add_argument("--poll", type=float, default=30.0)
    p.add_argument("--max-polls", type=int, default=None)
    p.add_argument("--coarse", action="store_true",
                   help="net endpoint diff per window instead of per-commit "
                        "rows (the cheap mode for far-behind consumers)")
    p.add_argument("--window", type=int, default=None,
                   help="window-attributed hybrid feed: one endpoint diff "
                        "per chunk of <= N data commits (near-coarse cost "
                        "for a far-behind follower, window-level "
                        "_commit_version attribution); overrides --coarse")
    p.add_argument("--agg-table",
                   help="maintain an incremental COUNT/SUM rollup lake "
                        "table at this path from each window "
                        "(operators/materialize; built from the source's "
                        "state at the resume point if missing)")
    p.add_argument("--agg-group", help="group column for --agg-table")
    p.add_argument("--agg-sum", default="",
                   help="comma-separated numeric columns to SUM for "
                        "--agg-table")
    p.add_argument("--agg-min", default="",
                   help="comma-separated numeric columns to MIN for "
                        "--agg-table (retraction of a group's stored "
                        "extremum recomputes ONLY that group from the "
                        "base)")
    p.add_argument("--agg-max", default="",
                   help="comma-separated numeric columns to MAX for "
                        "--agg-table (same retraction fallback)")
    p.add_argument("--scd2-table",
                   help="maintain an incremental SCD2 history lake table "
                        "at this path from each window (built from the "
                        "source's state at the resume point if missing)")
    p.add_argument("--sigindex-table",
                   help="maintain a persisted MinHash signature index "
                        "(operators/sigindex) at this path from each "
                        "window; only changed docs re-shingle")
    p.add_argument("--sigindex-text", default="text",
                   help="source text column for --sigindex-table")
    p.add_argument("--annindex-table",
                   help="maintain a persisted IVF ANN index "
                        "(operators/annindex) at this path from each "
                        "window; only changed vectors re-assign")
    p.add_argument("--annindex-centroids",
                   help="JSON file holding the fixed centroid vectors "
                        "(list of float lists) for --annindex-table")
    p.add_argument("--annindex-emb", default="embedding",
                   help="source embedding column for --annindex-table")
    p.add_argument("--vocab-table",
                   help="maintain an incremental token-frequency "
                        "(vocabulary) lake table (operators/vocab) at "
                        "this path from each window; the window's arrays "
                        "explode and partial-aggregate before one "
                        "token-keyed shuffle")
    p.add_argument("--vocab-tokens", default="tokens",
                   help="source token-array column for --vocab-table")
    p.add_argument("--spanindex-table",
                   help="maintain a persisted exact-span (substring) "
                        "index (operators/spanindex) at this path from "
                        "each window; changed docs re-fingerprint, the "
                        "corpus never does (token-array column taken "
                        "from --vocab-tokens)")
    p.add_argument("--spanindex-length", type=int, default=16,
                   help="window length L for --spanindex-table")
    p.add_argument("--join-table",
                   help="maintain an incremental materialized JOIN view "
                        "(operators/joinview; fact = the followed table "
                        "enriched with --join-dim columns) at this path "
                        "from each window; the dim side's change window "
                        "is its commits since the dim version in --state")
    p.add_argument("--join-dim",
                   help="dimension lake table for --join-table (keyed by "
                        "the join column)")
    p.add_argument("--join-fk",
                   help="fact-side foreign-key column joining to "
                        "--join-dim's key")
    p.add_argument("--join-left-cols", default="",
                   help="comma-separated fact columns carried into the "
                        "view (beyond key + fk)")
    p.add_argument("--join-right-cols", default="",
                   help="comma-separated dim columns carried into the "
                        "view")
    p.add_argument("--join-how", default="inner", choices=["inner", "left"],
                   help="join semantics for --join-table")
    p.add_argument("--auto-compact-files", type=int, default=None,
                   help="replica maintenance: compact any replica bucket "
                        "whose live-file count exceeds this bound after a "
                        "window applies (state-driven, skew-aware)")
    p.add_argument("--cluster-every", type=int, default=None,
                   help="with --auto-compact-files: additionally rewrite "
                        "the whole replica sorted by its key after this "
                        "many data commits since the last full sorted "
                        "rewrite (CompactionPolicy.cluster_every_commits) "
                        "— keeps changelog hull/row-group pruning tight "
                        "under scattered-update feeds with no "
                        "hand-scheduled compaction")
    p.add_argument("--auto-compact-views", type=int, default=None,
                   help="same manifest-threshold policy applied to the "
                        "maintained MOR view tables (SCD2 history, "
                        "signature index, ANN index — each window appends "
                        "delta files to them too); the ANN index is "
                        "re-clustered by cell on trigger so probe file "
                        "pruning stays tight")
    args = p.parse_args(argv)
    if not (args.sink or args.replica or args.agg_table or args.scd2_table
            or args.sigindex_table or args.annindex_table
            or args.join_table or args.vocab_table or args.spanindex_table):
        p.error("need --sink, --replica, --agg-table, --scd2-table, "
                "--sigindex-table, --annindex-table, --join-table, "
                "--vocab-table and/or --spanindex-table")
    if args.agg_table and not args.agg_group:
        p.error("--agg-table requires --agg-group")
    if args.join_table and not (args.join_dim and args.join_fk
                                and args.join_right_cols):
        p.error("--join-table requires --join-dim, --join-fk and "
                "--join-right-cols")
    if args.cluster_every and not (args.auto_compact_files and args.replica):
        p.error("--cluster-every requires --auto-compact-files and "
                "--replica (it extends the replica's compaction policy)")
    if args.annindex_table and not args.annindex_centroids:
        p.error("--annindex-table requires --annindex-centroids")

    from pyspark.sql import SparkSession

    from qwery_spark.lake.changes import replicate
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.streaming.stream import follow_changes

    spark = SparkSession.builder.appName("qwery-follow").getOrCreate()
    table = LakeTable(args.table)

    start = args.from_version
    # dim-side resume point for --join-table, persisted alongside the
    # fact version (the two feeds advance in lockstep per window)
    dim_state = {"v": None}
    if os.path.exists(args.state):
        with open(args.state) as fh:
            st = json.load(fh)
        if os.path.normpath(st.get("table", "")) != table.path:
            p.error(
                f"--state {args.state} was written for table "
                f"{st.get('table')!r}, not {table.path!r}"
            )
        if start is None:
            start = st["version"]
        dim_state["v"] = st.get("dim_version")
    if start is None:
        start = table.current_version()

    def persist(version: int) -> None:
        tmp = args.state + ".tmp"
        st = {"version": version, "table": table.path}
        if dim_state["v"] is not None:
            st["dim_version"] = dim_state["v"]
        with open(tmp, "w") as fh:
            json.dump(st, fh)
        os.replace(tmp, args.state)

    # pin the resume point BEFORE the loop: a drain that sees no new
    # commits must still leave a state file, or the next run would
    # re-default to the then-current head and silently skip the gap
    persist(start)

    # incremental-view targets: build AT the resume point when the view
    # is missing OR is an empty v0 shell (a build that crashed between
    # table-create and its first merge — path existence alone is NOT a
    # completed-build signal). A completed view (version > 0) is left
    # alone; re-building it at a later resume point would double-apply.
    def _needs_build(path: str) -> bool:
        if not os.path.exists(path):
            return True
        return LakeTable(path).current_version() == 0

    agg_sum = [c for c in args.agg_sum.split(",") if c]
    agg_min = [c for c in args.agg_min.split(",") if c]
    agg_max = [c for c in args.agg_max.split(",") if c]
    if args.agg_table:
        from qwery_spark.operators.materialize import build_agg, update_agg

        if _needs_build(args.agg_table):
            build_agg(spark, table, args.agg_table, args.agg_group, agg_sum,
                      at_version=start, min_cols=agg_min, max_cols=agg_max)
    if args.scd2_table:
        from qwery_spark.operators.materialize import build_scd2, update_scd2

        if _needs_build(args.scd2_table):
            build_scd2(spark, table, args.scd2_table, at_version=start)
    if args.sigindex_table:
        from qwery_spark.operators.sigindex import (
            build_signature_index,
            update_signature_index,
        )

        if _needs_build(args.sigindex_table):
            build_signature_index(spark, table, args.sigindex_table,
                                  text_col=args.sigindex_text,
                                  at_version=start)
    if args.vocab_table:
        from qwery_spark.operators.vocab import build_vocab, update_vocab

        if _needs_build(args.vocab_table):
            build_vocab(spark, table, args.vocab_table,
                        tokens_col=args.vocab_tokens, at_version=start)
    if args.spanindex_table:
        from qwery_spark.operators.spanindex import (
            build_span_index,
            update_span_index,
        )

        if _needs_build(args.spanindex_table):
            build_span_index(spark, table, args.spanindex_table,
                             tokens_col=args.vocab_tokens,
                             length=args.spanindex_length,
                             at_version=start)
    join_left = [c for c in args.join_left_cols.split(",") if c]
    join_right = [c for c in args.join_right_cols.split(",") if c]
    if args.join_table:
        from qwery_spark.operators.joinview import build_join, update_join

        dim_tbl = LakeTable(args.join_dim)
        if _needs_build(args.join_table):
            # a fresh build pins BOTH resume points: fact at `start`,
            # dim at its current head
            dim_state["v"] = dim_tbl.current_version()
            build_join(spark, table, dim_tbl, args.join_table,
                       args.join_fk, join_left, join_right,
                       how=args.join_how, at_left_version=start,
                       at_right_version=dim_state["v"])
            # re-pin so a drain that ships no window still records the
            # dim resume point the build just defined
            persist(start)
        elif dim_state["v"] is None:
            # an existing view with no recorded dim resume point cannot
            # be safely continued — the dim changes since its build are
            # unknowable from here
            p.error(
                f"--state {args.state} has no dim_version for the "
                f"existing join view {args.join_table!r} — delete the "
                "view to rebuild it at the current resume point"
            )
    centroids = None
    if args.annindex_table:
        from qwery_spark.operators.annindex import (
            build_ann_index,
            update_ann_index,
        )

        with open(args.annindex_centroids) as fh:
            centroids = json.load(fh)
        if _needs_build(args.annindex_table):
            build_ann_index(spark, table, args.annindex_table, centroids,
                            emb_col=args.annindex_emb, at_version=start)

    def sink(feed, lo, hi):
        if args.sink:
            feed.write.mode("overwrite").parquet(
                os.path.join(args.sink, f"from={lo}")
            )
        if args.replica:
            # epoch-keyed: a crashed-and-restarted window re-merge
            # no-ops; the feed DataFrame is reused, not recomputed
            replica = LakeTable(args.replica)
            replicate(
                spark, table, replica, lo, hi,
                epoch_id=f"follow:{hi}", feed=feed,
            )
            if args.auto_compact_files:
                from qwery_spark.lake.maintenance import (
                    CompactionPolicy,
                    maybe_compact,
                )

                cluster_kw = {}
                if args.cluster_every:
                    cluster_kw = {
                        "sort_cols": [replica.snapshot().m["key_col"]],
                        "cluster_every_commits": args.cluster_every,
                    }
                maybe_compact(
                    spark, replica,
                    CompactionPolicy(
                        max_files_per_bucket=args.auto_compact_files,
                        **cluster_kw,
                    ),
                )
        # incremental views share ONE preimage-bearing feed for (lo, hi]
        # (the sink feed lacks preimages by design); every maintainer
        # is window-epoch-keyed, so a crashed-and-restarted window
        # no-ops — the indexes filter the preimage rows out themselves
        if (args.agg_table or args.scd2_table or args.sigindex_table
                or args.annindex_table or args.join_table
                or args.vocab_table or args.spanindex_table):
            from qwery_spark.lake.changes import read_changes

            pfeed = read_changes(
                spark, table, lo, hi, granular=False, include_preimages=True
            ).persist()
            try:
                if args.agg_table:
                    update_agg(spark, table, LakeTable(args.agg_table),
                               args.agg_group, agg_sum, lo, hi, feed=pfeed,
                               min_cols=agg_min, max_cols=agg_max)
                if args.scd2_table:
                    update_scd2(spark, table, LakeTable(args.scd2_table),
                                lo, hi, feed=pfeed)
                if args.sigindex_table:
                    update_signature_index(
                        spark, table, LakeTable(args.sigindex_table),
                        lo, hi, text_col=args.sigindex_text, feed=pfeed,
                    )
                if args.annindex_table:
                    update_ann_index(
                        spark, table, LakeTable(args.annindex_table),
                        centroids, lo, hi, emb_col=args.annindex_emb,
                        feed=pfeed,
                    )
                if args.vocab_table:
                    update_vocab(spark, table, LakeTable(args.vocab_table),
                                 args.vocab_tokens, lo, hi, feed=pfeed)
                if args.spanindex_table:
                    update_span_index(
                        spark, table, LakeTable(args.spanindex_table),
                        args.vocab_tokens, args.spanindex_length,
                        lo, hi, feed=pfeed,
                    )
                if args.join_table:
                    # the fact side reuses the shared window diff; the
                    # dim side diffs its own commits since the persisted
                    # dim resume point. A crash between this commit and
                    # persist() re-applies with a wider dim window —
                    # safe: the window batch is a recompute of the
                    # affected keys at the current heads, so
                    # re-application converges (and the higher LWW
                    # ordinal wins)
                    dim_hi = dim_tbl.current_version()
                    update_join(
                        spark, table, dim_tbl, LakeTable(args.join_table),
                        args.join_fk, join_left, join_right,
                        lo, dim_state["v"], to_left=hi, to_right=dim_hi,
                        how=args.join_how, left_feed=pfeed,
                    )
                    dim_state["v"] = dim_hi
            finally:
                pfeed.unpersist()
            if args.auto_compact_views:
                from qwery_spark.lake.maintenance import (
                    CompactionPolicy,
                    maybe_compact,
                )

                bound = args.auto_compact_views
                # the maintained views are derived MOR tables whose
                # per-window delta appends accumulate exactly like the
                # replica's — the same read-amplification bound applies.
                # (the agg rollup is COW and self-compacting.)
                for path, policy in (
                    (args.scd2_table, CompactionPolicy(max_files_per_bucket=bound)),
                    (args.sigindex_table, CompactionPolicy(max_files_per_bucket=bound)),
                    (args.annindex_table, CompactionPolicy(
                        max_files_per_bucket=bound, sort_cols=["cell"])),
                    # the span index is MOR too (vocab is COW and
                    # self-compacting)
                    (args.spanindex_table, CompactionPolicy(
                        max_files_per_bucket=bound)),
                ):
                    if path:
                        maybe_compact(spark, LakeTable(path), policy)

    from qwery_spark.lake.changes import VersionExpiredError

    try:
        last = follow_changes(
            spark,
            table,
            sink,
            start_version=start,
            poll_sec=args.poll,
            max_polls=args.max_polls,
            granular=not args.coarse,
            window=args.window,
            on_advance=persist,
        )
    except VersionExpiredError as e:
        # the resume point fell out of the source's retention window:
        # exit with the rebuild contract instead of a stack trace (the
        # state file is left at the expired version deliberately — a
        # rebuild script reads it to know what was lost)
        print(json.dumps({"error": "version_expired", "message": str(e)}),
              file=sys.stderr)
        return 3
    print(json.dumps({"last_synced_version": last}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

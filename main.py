#!/usr/bin/env python
"""spark-submit entry point (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Package and launch:

    python package.py                       # -> dist/etl_cms_spark.zip
    spark-submit --py-files dist/etl_cms_spark.zip main.py \
        --changelog /path/to/changelog.parquet \
        --lake /path/to/lake --epochs 8 [--stream] [--salt] \
        [--merge-mode mor --compact-every 4]

On a cluster, only --master/--deploy-mode on the spark-submit line
change; the code is identical to the local[.] path the tests run.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changelog", default=None, help="parquet changelog dir")
    ap.add_argument(
        "--source-table", default=None,
        help="with --stream: tail another MoR lake table's commit "
        "history (lake_changelog source) instead of a file changelog "
        "— the multi-hop bronze->silver shape",
    )
    ap.add_argument("--lake", required=True, help="lake root dir")
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--stream", action="store_true", help="Structured Streaming tail")
    ap.add_argument(
        "--envelope-format",
        choices=["flat", "debezium"],
        default="flat",
        help="with --stream --changelog: wire shape of the tailed "
        "directory — 'debezium' flattens op/before/after/source.lsn "
        "envelopes in-stream (key-changing updates split into "
        "delete+insert)",
    )
    ap.add_argument("--salt", action="store_true", help="salted dedup for hot keys")
    ap.add_argument(
        "--salt-task-row-budget", type=int, default=32_000_000,
        help="auto mode: salt when the hottest key's estimated rows "
        "reach this (see BENCH/skew_ab.json for why share alone never salts)",
    )
    ap.add_argument(
        "--broadcast-dedup-max-rows", type=int, default=500_000,
        help="auto mode: broadcast-semi dedup for batches whose estimated "
        "rows fit this budget (~25 MB of (key, max-lsn) pairs at 500k)",
    )
    ap.add_argument("--merge-mode", choices=["cow", "mor"], default="cow")
    ap.add_argument("--compact-every", type=int, default=None)
    ap.add_argument(
        "--compact-cluster-by", default=None, metavar="COL[,COL...]",
        help="sort compacted bucket files by these value columns "
        "(then key) so selective non-key predicates skip row groups; "
        "trades point-lookup stats tightness",
    )
    ap.add_argument(
        "--stats-cols", default=None, metavar="COL[,COL...]",
        help="keep the planning-time pruning cache (sink/stats.py) "
        "covering these columns: with --maintain, schedules a refresh "
        "for uncovered dirs (default: whatever the cache tracks); in "
        "the batch epoch loop, refreshes after scheduled compactions",
    )
    ap.add_argument(
        "--member-cols", default=None, metavar="COL[,COL...]",
        help="keep membership sketches (Bloom-style equality/IN file "
        "pruning, sink/stats.py) covering these columns under "
        "--maintain (default: whatever the cache tracks)",
    )
    ap.add_argument(
        "--compact-cluster-layout", default="linear",
        choices=["linear", "zorder"],
        help="linear = lexicographic (tight stats on the LEADING "
        "cluster column); zorder = Morton-interleaved rank key "
        "(bounded row-group stats on EVERY cluster column)",
    )
    ap.add_argument(
        "--demux-domains",
        action="store_true",
        help="route rows into per-domain destination tables",
    )
    ap.add_argument(
        "--demux-tombstones",
        choices=["targeted", "blanket"],
        default="targeted",
        help="cross-domain delete fan-out strategy (targeted = "
        "previous-version lookup, order-independent; blanket = "
        "brute-force every-domain fan-out)",
    )
    ap.add_argument(
        "--dedup-mode",
        choices=["strict", "salted", "join", "broadcast", "merge", "auto"],
        default="strict",
        help="per-epoch max-LSN dedup form (see CDCPipeline docstring; "
        "'broadcast' = payload never shuffles in the dedup stage — for "
        "micro-batches whose distinct-key set is broadcastable; 'auto' = "
        "resolve per epoch from sampled hot-key share + cluster shape)",
    )
    ap.add_argument(
        "--dedup-filter-index",
        default=None,
        help="path of an IncrementalTextDedupIndex (created if absent): "
        "near-duplicate NEW documents route to the duplicates/ log "
        "instead of the main table, canonical-first-wins",
    )
    ap.add_argument(
        "--row-image",
        choices=["full", "minimal"],
        default="full",
        help="minimal = updates carry only changed columns (binlog "
        "row_image=MINIMAL): per-column fold + hydration against the "
        "pre-epoch table replace the whole-row dedup forms",
    )
    ap.add_argument(
        "--audit-max-delete-ratio",
        type=float,
        default=None,
        metavar="R",
        help="write-audit-publish gate: stage each epoch and REJECT it "
        "(whole batch to quarantine, cursor still advances) when "
        "deletes exceed fraction R of its rows — a mass-delete "
        "circuit breaker; repair later via the quarantine flow. "
        "With --demux-domains the gate is a multi-table transaction: "
        "one verdict publishes or discards the main table AND every "
        "domain sink together",
    )
    ap.add_argument(
        "--rebucket",
        type=int,
        default=None,
        help="grow the lake's bucket count to N before ingesting "
        "(one bounded rewrite; no-op if already N)",
    )
    ap.add_argument(
        "--compact-depth",
        type=int,
        default=None,
        help="fold a bucket's MoR delta stack once it exceeds N file "
        "sets (SELECTIVE: only the offending buckets are rewritten)",
    )
    ap.add_argument(
        "--vacuum-every",
        type=int,
        default=None,
        help="run snapshot-expiry vacuum every N epochs/micro-batches "
        "(bounds storage on sustained runs)",
    )
    ap.add_argument(
        "--vacuum-keep-last",
        type=int,
        default=8,
        help="retention horizon for --vacuum-every: keep the last N "
        "snapshots (size past the slowest changelog consumer's lag)",
    )
    ap.add_argument(
        "--max-versions-per-batch",
        type=int,
        default=None,
        help="with --stream --source-table: cap each micro-batch at N "
        "upstream snapshot versions (needs --processing-time)",
    )
    ap.add_argument(
        "--processing-time",
        default=None,
        metavar="INTERVAL",
        help="with --stream: run a continuous paced tail (e.g. '10 "
        "seconds') instead of the default drain-and-stop",
    )
    ap.add_argument(
        "--bucketed-table",
        default=None,
        help="read the changelog from a producer-bucketed catalog table "
        "(stage_changelog_bucketed) instead of --changelog parquet — "
        "the per-epoch dedup then runs Exchange-free",
    )
    ap.add_argument(
        "--maintain",
        action="store_true",
        help="maintenance mode: plan (and run, unless --dry-run) "
        "selective compaction + retention for the MAIN table under "
        "--lake from its own metadata tables; prints the plan and "
        "results as JSON.  Uses --compact-depth (default 4) and "
        "--vacuum-keep-last as the policies",
    )
    ap.add_argument(
        "--dry-run",
        action="store_true",
        help="with --maintain: print the plan, execute nothing",
    )
    ap.add_argument(
        "--expire-tombstones-below",
        type=int,
        default=None,
        metavar="LSN",
        help="with --maintain: tombstone-retention policy — plan an "
        "expiry compaction for buckets holding delete markers with "
        "_lsn below this horizon (choose the oldest LSN any "
        "out-of-order source can still deliver)",
    )
    ap.add_argument(
        "--dml",
        choices=["delete", "update"],
        default=None,
        help="admin DML mode on the MAIN table under --lake (retention, "
        "GDPR erasure, backfill corrections): DELETE/UPDATE rows "
        "matching --where, committed as one idempotent change epoch "
        "(flows into CDC-out, respects time travel); 'update' needs "
        "--set; no --where = all rows (logical TRUNCATE for delete)",
    )
    ap.add_argument(
        "--where",
        action="append",
        default=None,
        metavar="COL=V | COL=LO..HI | COL=V1,V2",
        help="with --dml: predicate (repeatable, ANDed) — equality, "
        "closed range, or IN list; values coerced to the column type",
    )
    ap.add_argument(
        "--set",
        action="append",
        default=None,
        dest="set_assignments",
        metavar="COL=VALUE",
        help="with --dml update: assignment (repeatable); values "
        "coerced to the column type",
    )
    ap.add_argument(
        "--branch",
        default=None,
        metavar="ACTION",
        help="branch-ref admin on the main table: create:NAME[@VERSION] "
        "| ff:NAME (fast-forward onto main) | drop:NAME | list",
    )
    ap.add_argument(
        "--txn-col",
        default=None,
        help="transaction-id column: batch epochs slice on commit-LSN "
        "boundaries (no transaction ever splits an epoch); with "
        "--stream, micro-batches defer incomplete transactions "
        "(rows carry txn_total — Debezium transaction-metadata "
        "event counts)",
    )
    ap.add_argument(
        "--txn-flush-lsn-lag",
        type=int,
        default=None,
        help="streaming txn gate: force-flush a transaction whose "
        "newest row lags the stream head by more than this many LSNs",
    )
    args = ap.parse_args()
    if args.dml == "update" and not args.set_assignments:
        ap.error("--dml update requires --set COL=VALUE")
    if not args.maintain and not args.dml and not args.branch:
        if not args.changelog and not args.bucketed_table and not args.source_table:
            ap.error("one of --changelog / --bucketed-table / --source-table is required")
        if args.source_table and not args.stream:
            ap.error("--source-table requires --stream")

    # under spark-submit the session/master comes from the submit
    # command line; fall back to the tuned local builder otherwise.
    spark = SparkSession.builder.appName("etl-cms-spark").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    if args.branch:
        import json as _json
        import os

        from etl_cms_spark.sink.lake import LakeTable

        table = LakeTable(spark, os.path.join(args.lake, "tables", "files"))
        action, _, operand = args.branch.partition(":")
        if action == "create":
            name, _, at = operand.partition("@")
            v = table.create_branch(name, int(at) if at else None)
            print(_json.dumps({"branch": name, "created_at": v}))
        elif action == "ff":
            head = table.fast_forward(operand)
            print(_json.dumps({"branch": operand, "fast_forwarded_to": head}))
        elif action == "drop":
            table.drop_branch(operand)
            print(_json.dumps({"branch": operand, "dropped": True}))
        elif action == "list":
            print(_json.dumps({"branches": table.branches()}))
        else:
            ap.error(f"unknown --branch action {action!r}")
        return

    if args.dml:
        import os

        from etl_cms_spark.sink.lake import LakeTable

        table = LakeTable(spark, os.path.join(args.lake, "tables", "files"))
        schema = table._load_manifest()["schema"]

        def coerce(col, v):
            t = schema.get(col, "string")
            if t in ("int", "bigint", "long", "smallint", "tinyint"):
                return int(v)
            if t in ("double", "float"):
                return float(v)
            if t == "boolean":
                return v.lower() in ("1", "true", "t")
            return v

        preds = {}
        for spec in args.where or []:
            col, _, val = spec.partition("=")
            if not _:
                ap.error(f"--where needs COL=...: {spec!r}")
            if ".." in val:
                lo, _, hi = val.partition("..")
                preds[col] = (coerce(col, lo), coerce(col, hi))
            elif "," in val:
                preds[col] = [coerce(col, v) for v in val.split(",")]
            else:
                preds[col] = (coerce(col, val), coerce(col, val))
        if args.dml == "delete":
            rec = table.delete_where(preds or None)
        else:
            sets = {}
            for spec in args.set_assignments:
                col, _, val = spec.partition("=")
                if not _:
                    ap.error(f"--set needs COL=VALUE: {spec!r}")
                sets[col] = coerce(col, val)
            rec = table.update_where(sets, preds or None)
        print(json.dumps(rec))
        return

    if args.maintain:
        import os

        from etl_cms_spark.sink.lake import LakeTable
        from etl_cms_spark.sink.maintenance import plan_maintenance, run_maintenance

        table = LakeTable(spark, os.path.join(args.lake, "tables", "files"))
        plan = plan_maintenance(
            table,
            max_depth=args.compact_depth or 4,
            keep_last_snapshots=args.vacuum_keep_last,
            stats_cols=(args.stats_cols.split(",") if args.stats_cols else None),
            member_cols=(args.member_cols.split(",") if args.member_cols else None),
            expire_tombstones_below=args.expire_tombstones_below,
        )
        print(json.dumps({"plan": plan}))
        if not args.dry_run and plan["actions"]:
            print(json.dumps({"results": run_maintenance(table, plan)}))
        return

    filter_index = None
    if args.dedup_filter_index:
        import os

        from etl_cms_spark.operators.textindex import IncrementalTextDedupIndex

        if os.path.exists(os.path.join(args.dedup_filter_index, "_meta.json")):
            filter_index = IncrementalTextDedupIndex(spark, args.dedup_filter_index)
        else:
            filter_index = IncrementalTextDedupIndex.build(
                spark, args.dedup_filter_index, "content", "doc_id"
            )

    epoch_audit = None
    if args.audit_max_delete_ratio is not None:
        cap = args.audit_max_delete_ratio

        def epoch_audit(staged, _cap=cap):
            s = staged.summary()
            n = s["rows_upserted"] + s["rows_deleted"]
            return n == 0 or (s["rows_deleted"] / n) <= _cap

    if args.stream:
        from etl_cms_spark.streaming.stream import start_stream

        q, pipeline = start_stream(
            spark, args.changelog, args.lake, salt_hot_keys=args.salt,
            source_table=args.source_table,
            demux_domains=args.demux_domains,
            dedup_filter_index=filter_index,
            row_image=args.row_image,
            epoch_audit=epoch_audit,
            compact_depth=args.compact_depth,
            vacuum_every=args.vacuum_every,
            vacuum_keep_last=args.vacuum_keep_last,
            max_versions_per_batch=args.max_versions_per_batch,
            processing_time=args.processing_time,
            envelope_format=args.envelope_format,
            txn_col=args.txn_col,
            txn_flush_lsn_lag=args.txn_flush_lsn_lag,
        )
        q.awaitTermination()
    else:
        from etl_cms_spark.plans.pipeline import CDCPipeline

        pipeline = CDCPipeline(
            spark,
            args.lake,
            n_buckets=args.n_buckets,
            salt_hot_keys=args.salt,
            merge_mode=args.merge_mode,
            compact_every=args.compact_every,
            compact_depth=args.compact_depth,
            vacuum_every=args.vacuum_every,
            vacuum_keep_last=args.vacuum_keep_last,
            compact_cluster_by=(
                args.compact_cluster_by.split(",")
                if args.compact_cluster_by
                else None
            ),
            compact_cluster_layout=args.compact_cluster_layout,
            stats_cols=(args.stats_cols.split(",") if args.stats_cols else None),
            member_cols=(args.member_cols.split(",") if args.member_cols else None),
            demux_domains=args.demux_domains,
            demux_tombstones=args.demux_tombstones,
            dedup_mode=args.dedup_mode,
            dedup_filter_index=filter_index,
            salt_task_row_budget=args.salt_task_row_budget,
            broadcast_dedup_max_rows=args.broadcast_dedup_max_rows,
            row_image=args.row_image,
            epoch_audit=epoch_audit,
            txn_col=args.txn_col,
        )
        if args.rebucket:
            pipeline.init_tables()
            print(json.dumps(pipeline.table.rebucket(args.rebucket)))
        if args.bucketed_table:
            pipeline.run_from_table(args.bucketed_table)
        else:
            changes = spark.read.parquet(args.changelog)
            pipeline.run(changes, n_epochs=args.epochs)

    for rec in pipeline.table.lineage():
        print(json.dumps(rec))
    # audit-rejected epochs never reach the table's lineage — surface
    # them from the run metrics so the gate's decisions are visible.
    for rec in getattr(pipeline, "metrics", []):
        if rec.get("audit_rejected"):
            print(json.dumps(rec))


if __name__ == "__main__":
    main()

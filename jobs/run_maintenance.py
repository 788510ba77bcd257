#!/usr/bin/env python
"""Maintenance-job entrypoint — the engine's spark-submit surface.

    spark-submit --py-files fepoc.zip jobs/run_maintenance.py \
        --table /path/to/table --op compact \
        [--target-bytes 134217728] [--job-id nightly-42] \
        [--parallelism 32] [--source-parquet /path/to/merge_source]

Ops: compact | cluster-zorder | cluster-hilbert | merge |
     expire | gc | rewrite-manifests | verify

Every op is resumable: pass the same --job-id after a crash and
completed partition units are skipped (lineage checkpoint log).
Exit code 0 on success; the op summary is printed as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from feature_engineering_poc_spark.session import get_session


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--op", required=True,
                    choices=["compact", "cluster-zorder", "cluster-hilbert", "merge",
                             "expire", "gc", "rewrite-manifests", "verify"])
    ap.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    ap.add_argument("--job-id", default=None)
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--source-parquet", default=None, help="merge source path")
    ap.add_argument("--duplicate-policy", default="error", choices=["error", "last"])
    ap.add_argument("--keep-last", type=int, default=None, help="expire retention")
    ap.add_argument("--snapshot", type=int, default=None, help="verify against snapshot")
    ap.add_argument("--partitions", default=None,
                    help="comma-separated partition scope for compact/cluster")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_session(master=args.master, parallelism=args.parallelism)
    try:
        from feature_engineering_poc_spark.lakehouse import TokenTable
        from feature_engineering_poc_spark.lakehouse.clustering import cluster
        from feature_engineering_poc_spark.lakehouse.compaction import compact
        from feature_engineering_poc_spark.lakehouse.equivalence import (
            assert_scan_equivalent,
        )
        from feature_engineering_poc_spark.lakehouse.expire import (
            expire_snapshots,
            remove_orphans,
            rewrite_manifests,
        )
        from feature_engineering_poc_spark.lakehouse.merge import merge_into

        table = TokenTable(args.table)
        if not table.exists():
            raise FileNotFoundError(f"not a table root: {args.table}")

        parts = args.partitions.split(",") if args.partitions else None
        if args.op == "compact":
            result = compact(spark, table, target_file_bytes=args.target_bytes,
                             job_id=args.job_id, partitions=parts)
        elif args.op in ("cluster-zorder", "cluster-hilbert"):
            result = cluster(spark, table, curve=args.op.split("-")[1],
                             target_file_bytes=args.target_bytes, job_id=args.job_id,
                             partitions=parts)
        elif args.op == "merge":
            if not args.source_parquet:
                raise ValueError("--source-parquet required for merge")
            src = spark.read.parquet(args.source_parquet)
            result = merge_into(spark, table, src, duplicate_policy=args.duplicate_policy,
                                job_id=args.job_id)
        elif args.op == "expire":
            result = expire_snapshots(spark, table, keep_last=args.keep_last or 2)
        elif args.op == "gc":
            result = remove_orphans(spark, table)
        elif args.op == "rewrite-manifests":
            result = rewrite_manifests(spark, table)
        else:  # verify
            sid = args.snapshot if args.snapshot is not None else table.current_snapshot_id()
            result = assert_scan_equivalent(
                table.scan(spark, sid), table.scan(spark)
            )
        print(json.dumps({"op": args.op, "table": args.table, **result}))
        return 0
    finally:
        if not preexisting:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())

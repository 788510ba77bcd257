#!/usr/bin/env python
"""Config-driven batch job entrypoint (R2).

Parity with runner/JobRunner.scala:36-211 lifecycle: CLI args → session
→ job config → source registry → resolve source → read → fold
transformers → sink. Launch:

    spark-submit --py-files fepoc.zip jobs/run_job.py \
        --job-config job.json --source-catalog catalog_dir \
        [--master local[8]] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from feature_engineering_poc_spark.config import load_job_config, load_source_registry
from feature_engineering_poc_spark.operators.runner import run_pipeline
from feature_engineering_poc_spark.session import get_session
from feature_engineering_poc_spark.sinks import write_sink
from feature_engineering_poc_spark.sources import read_source


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job-config", required=True)
    ap.add_argument("--source-catalog", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_session(master=args.master, parallelism=args.parallelism)
    try:
        job = load_job_config(args.job_config)
        registry = load_source_registry(args.source_catalog)
        src = registry.get(job.input_source.name, job.input_source.version)
        if src is None:
            raise ValueError(
                f"source '{job.input_source.name}' (version "
                f"{job.input_source.version}) not found in catalog"
            )
        df = read_source(spark, src)
        # load_params.filter_condition (sample_job_config.json): declared
        # but never consumed by the reference runner — made real here as
        # a post-read predicate, so Catalyst pushes it into the scan.
        cond = job.input_source.load_params.get("filter_condition")
        if cond:
            df = df.filter(cond)
        df = run_pipeline(
            df, [{"name": t.name, "params": t.params} for t in job.feature_transformers]
        )
        write_sink(df, job.output_sink)
        return 0
    finally:
        if not preexisting:  # don't tear down a caller-owned session
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())

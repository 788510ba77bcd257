"""Bin-packing small-file compaction (north_rule operator #1).

Shape of the job, scale-first:

1. PLAN (driver, metadata only): filter the manifest to
   smaller-than-threshold files, FFD-bin-pack per partition
   (plans/binpack.py). No data rows are read for planning.
2. EXECUTE (cluster, one Spark job per partition unit): read exactly
   the binned files, ``repartitionByRange(n_bins, doc_id)`` +
   ``sortWithinPartitions`` so output files hold tight, disjoint
   doc_id ranges (maximum min/max pruning power), write to a
   DETERMINISTICALLY-NAMED directory with mode=overwrite (idempotent
   rerun), stamp per-file footer stats (stats.py — footer reads only).
   Compaction within a partition needs NO shuffle beyond the one range
   repartition; nothing crosses partitions.
3. CHECKPOINT: a lineage record per completed partition carries the
   unit's new manifest rows + metrics; a resumed job skips completed
   units entirely (lineage.py).
4. COMMIT (atomic): new manifest = old manifest − compacted files +
   new files; CAS snapshot swap. Readers pinned to the old snapshot
   still resolve the old files (they are not deleted until
   snapshot expiry — expire.py).

Reference precedent: Delta ``optimizeWrite``/``autoCompact`` knobs the
reference enables but delegates (SparkSessionManager.scala:73-74); here
the mechanism is explicit and from scratch.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

from ..plans.binpack import pack_bins
from .lineage import LineageLog
from .metadata import MANIFEST_SCHEMA, TOKEN_SCHEMA, TokenTable, list_parquet_files
from .stats import file_stats_rows

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _rewrite_bins_distributed(
    spark: SparkSession, bin_specs: list[dict]
) -> list[dict]:
    """Execute bin rewrites as ONE shuffle-free Spark job.

    Each task receives bin specs, reads the bin's files with pyarrow
    (vectorized C++, no per-row Python), sorts the bin by doc_id for
    locality, writes exactly one target-size output file, and returns
    its manifest row (footer stats computed in-task — no second pass).

    Compaction within a partition is embarrassingly parallel across
    bins: no shuffle, no range-sampling pass, parallelism = number of
    bins (at 100 TB: hundreds of thousands).
    """
    import json as _json

    import pandas as pd

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from feature_engineering_poc_spark.lakehouse import fs as fslayer

        cols = ["doc_id", "tokens", "n_tok", "source"]
        for pdf in batches:
            out = []
            for spec_json in pdf["spec"]:
                spec = _json.loads(spec_json)
                # fs layer: inputs/outputs may be local paths or
                # file://-or-object-store URIs (fs.py)
                tbl = pa.concat_tables(
                    [fslayer.read_parquet(f, columns=cols) for f in spec["files"]]
                )
                tbl = tbl.take(pc.sort_indices(tbl.column("doc_id")))
                # zstd: compacted files are cold data — trade CPU (which
                # scales with executors) for bytes (which cost forever)
                n_bytes = fslayer.write_parquet(tbl, spec["out"], compression="zstd")
                doc = tbl.column("doc_id")
                ntk = tbl.column("n_tok")
                out.append(
                    {
                        "file_path": spec["out"],
                        "partition": spec["partition"],
                        "record_count": tbl.num_rows,
                        "file_bytes": n_bytes,
                        "min_doc_id": pc.min(doc).as_py(),
                        "max_doc_id": pc.max(doc).as_py(),
                        "min_n_tok": pc.min(ntk).as_py(),
                        "max_n_tok": pc.max(ntk).as_py(),
                        "min_zkey": None,
                        "max_zkey": None,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MANIFEST_SCHEMA.fields])

    # Slices = 4×parallelism (capped by bin count): several bins ride
    # one task, cutting per-task launch/Arrow overhead ~an order of
    # magnitude vs task-per-bin while keeping 4 waves for balance.
    # parallelize (not repartition): no round-robin shuffle, no barrier.
    n_slices = max(1, min(len(bin_specs), spark.sparkContext.defaultParallelism * 4))
    rdd = spark.sparkContext.parallelize(
        [(_json.dumps(s),) for s in bin_specs], n_slices
    )
    specs_df = spark.createDataFrame(rdd, "spec string")
    return [r.asDict() for r in specs_df.mapInPandas(kernel, MANIFEST_SCHEMA).collect()]


def compact(
    spark: SparkSession,
    table: TokenTable,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    small_file_threshold: int | None = None,
    job_id: str | None = None,
    mode: str = "binpack",
    partitions: list[str] | None = None,
    units_per_job: int = 64,
    _fail_after_units: int | None = None,
) -> dict:
    """Compact small files; returns a summary dict (snapshot_id=None if no-op).

    ``mode="binpack"`` (default, Iceberg-binpack semantics): zero
    shuffle — each FFD bin becomes one task that rewrites its files
    into one sorted output file. ``mode="sort"``: per-partition global
    sort via ``repartitionByRange(doc_id)`` (use when the table needs
    re-sorting, not just file-size repair; clustering.py is the
    dedicated re-sort op).

    Binpack execution GROUPS partition units: up to ``units_per_job``
    partitions' bins ride in ONE Spark job (bins are independent tasks,
    so grouping loses no parallelism). This bounds the per-job driver
    submission overhead — the constant serial term — at 1/64th of a
    job per partition, while lineage checkpoints stay per-partition
    (a crash mid-chunk redoes at most one chunk of deterministic,
    mode=overwrite outputs). A table with 10^5 small partitions
    compacts in ~1.5k jobs instead of 10^5.

    A ``job_id`` that already committed returns its recorded result —
    replays are no-ops (idempotent under foreachBatch-style reruns).

    ``_fail_after_units`` is a test hook that injects a crash after N
    completed units to exercise checkpoint resume (forces the
    sequential one-unit-per-job path so the crash point is exact).
    """
    parent = table.current_snapshot_id()
    threshold = small_file_threshold or int(target_file_bytes * 0.75)
    job_tag = job_id or f"compact-snap{parent}"
    log = LineageLog(table.root, job_tag)
    prior = log.committed()
    if prior is not None:  # replayed job: already committed, no-op
        return {k: v for k, v in prior.items()
                if k not in ("event", "job_id", "timestamp_ms")}
    published = table.snapshot_for_job(job_tag)
    if published is not None:
        # crash between VERSION swap and the 'committed' lineage append:
        # snapshot is live — repair the log instead of re-committing the
        # same manifest rows (see metadata.snapshot_for_job)
        summary = dict(published["summary"])
        log.log_event("committed", snapshot_id=published["snapshot_id"], **summary)
        return {"snapshot_id": published["snapshot_id"], **summary}

    # PLAN — metadata only, DRIVER-SIDE for small manifests (pyarrow
    # footer reads, zero Spark jobs; distributed collect above
    # SMALL_MANIFEST_ROWS) — same driver planning Iceberg's
    # rewriteDataFiles does.
    by_part: dict[str, list] = defaultdict(list)
    for r in table.manifest_records(spark, parent):
        if r["file_bytes"] < threshold and (
            partitions is None or r["partition"] in partitions
        ):
            by_part[r["partition"]].append(
                (r["file_path"], r["file_bytes"], r["record_count"])
            )

    units = []  # (partition, bins)
    for part in sorted(by_part):
        bins = pack_bins(by_part[part], part, target_file_bytes)
        if len(by_part[part]) > len(bins):  # merging actually reduces file count
            units.append((part, bins))
    if not units:
        return {"snapshot_id": None, "units": 0, "files_in": 0, "files_out": 0, "rows": 0}

    done = log.completed_units()
    resumed = sum(1 for part, _ in units if part in done)
    pending = [(part, bins) for part, bins in units if part not in done]

    def run_unit(part: str, bins) -> None:
        files = [f for b in bins for f in b.files]
        rows = sum(b.rows for b in bins)
        n_out = len(bins)
        out_dir = table.new_data_dir(job_tag) / part
        if mode == "binpack":
            specs = [
                {"files": b.files, "partition": part, "out": str(out_dir / f"bin-{i:05d}.parquet")}
                for i, b in enumerate(bins)
            ]
            stats = _rewrite_bins_distributed(spark, specs)
            new_count = len(stats)
        else:  # mode == "sort": global per-partition re-sort (one range shuffle)
            df = spark.read.schema(TOKEN_SCHEMA).parquet(*files)
            (
                df.repartitionByRange(n_out, "doc_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", max(1, (rows + n_out - 1) // n_out + 1))
                .parquet(str(out_dir))
            )
            new_files = list_parquet_files(out_dir)
            stats = file_stats_rows(spark, [(f, part) for f in new_files])
            new_count = len(new_files)
        log.mark_unit_done(
            part,
            files_in=files,
            new_manifest_rows=stats,
            metrics={
                "files_rewritten": len(files),
                "files_written": new_count,
                "bytes_compacted": sum(b.bytes for b in bins),
                "rows": rows,
            },
        )

    # EXECUTE. Binpack: pending units GROUPED into chunks of
    # ``units_per_job`` — all of a chunk's bins ride one Spark job
    # (bins are independent tasks; grouping adds parallelism within the
    # job and slashes per-job driver overhead). Lineage checkpoints stay
    # per-partition. Sort mode / the crash hook run one unit per job
    # (sort needs its own range shuffle per partition; the hook needs an
    # exact crash point).
    if _fail_after_units is not None:
        for i, (part, bins) in enumerate(pending, 1):
            run_unit(part, bins)
            if i >= _fail_after_units:
                raise RuntimeError(f"injected failure after {i} units (test hook)")
    elif mode == "binpack" and pending:
        for chunk_start in range(0, len(pending), units_per_job):
            chunk = pending[chunk_start : chunk_start + units_per_job]
            all_specs = []
            for part, bins in chunk:
                out_dir = table.new_data_dir(job_tag) / part
                all_specs.extend(
                    {
                        "files": b.files,
                        "partition": part,
                        "out": str(out_dir / f"bin-{i:05d}.parquet"),
                    }
                    for i, b in enumerate(bins)
                )
            stats_all = _rewrite_bins_distributed(spark, all_specs)
            stats_by_part: dict[str, list[dict]] = defaultdict(list)
            for s in stats_all:
                stats_by_part[s["partition"]].append(s)
            for part, bins in chunk:
                files = [f for b in bins for f in b.files]
                log.mark_unit_done(
                    part,
                    files_in=files,
                    new_manifest_rows=stats_by_part[part],
                    metrics={
                        "files_rewritten": len(files),
                        "files_written": len(stats_by_part[part]),
                        "bytes_compacted": sum(b.bytes for b in bins),
                        "rows": sum(b.rows for b in bins),
                    },
                )
    elif pending:
        with ThreadPoolExecutor(max_workers=min(8, len(pending))) as ex:
            futures = [ex.submit(run_unit, part, bins) for part, bins in pending]
            for f in futures:
                f.result()

    # COMMIT — manifest delta assembled from lineage (covers resumed
    # units too); driver-side pyarrow write for small manifests,
    # distributed above SMALL_MANIFEST_ROWS (metadata.commit_delta).
    done = log.completed_units()
    removed_files = [f for rec in done.values() for f in rec["files_in"]]
    new_rows = [row for rec in done.values() for row in rec["new_manifest_rows"]]
    summary = {
        "files_compacted": len(removed_files),
        "files_written": len(new_rows),
        "rows_rewritten": sum(rec["metrics"]["rows"] for rec in done.values()),
        "bytes_compacted": sum(rec["metrics"]["bytes_compacted"] for rec in done.values()),
        "units": len(units),
        "units_resumed": resumed,
        "job_tag": job_tag,
    }
    sid = table.commit_delta(
        spark, removed_files, new_rows, operation="compact", summary=summary, parent_id=parent
    )
    log.log_event("committed", snapshot_id=sid, **summary)
    return {"snapshot_id": sid, **summary}

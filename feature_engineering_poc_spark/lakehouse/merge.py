"""MERGE INTO over doc_id — copy-on-write, file-scoped (north_rule op #6).

Semantics (SQL MERGE): source rows carry an optional ``_op`` column in
{"upsert", "delete"} (absent → all upsert).

- matched + upsert  → update the target row's tokens/n_tok in place
  (``source`` is the partition column and is immutable under update,
  like Iceberg identity-partition best practice; updates never move a
  row across partitions)
- matched + delete  → remove the row
- not-matched + upsert → insert (routed to its own source partition)
- not-matched + delete → no-op
- duplicate source keys → error (SQL MERGE cardinality rule), or
  ``duplicate_policy="last"`` dedupe via salted two-phase aggregation
  (skew.py) keyed on a ``_seq`` ordering column when present.

Scale shape:

1. PRUNE (metadata): manifest min/max doc_id overlap vs the source key
   range → candidate files. No data read.
2. PROBE (one column-pruned job): read ONLY doc_id + input_file_name
   from candidates, inner-join source keys → the exact touched-file
   set + the matched-keys DataFrame (stays distributed; only the
   distinct file list is collected, as in Iceberg driver planning).
3. REWRITE per partition unit (resumable, lineage-checkpointed): read
   touched files, LEFT join deduped source on doc_id (broadcast when
   the source's estimated size fits an executor; AQE skew-join covers
   partition-level skew — key-level skew was already defused by the
   salted dedupe), apply update/delete, write range-partitioned
   sorted output.
4. INSERT unit: source anti-join matched keys → new files per
   partition.
5. COMMIT: manifest − touched files + rewritten + inserted; atomic
   snapshot swap. Old snapshots untouched (snapshot isolation).
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import LineageLog
from .metadata import MANIFEST_SCHEMA, TOKEN_SCHEMA, TokenTable, list_parquet_files
from .skew import salted_latest_by_key
from .stats import file_stats_df


class DuplicateSourceKeys(ValueError):
    pass


def _prepare_source(
    source_df: DataFrame, duplicate_policy: str, salt: int = 16
) -> DataFrame:
    cols = set(source_df.columns)
    if "_op" not in cols:
        source_df = source_df.withColumn("_op", F.lit("upsert"))
    if "_seq" not in source_df.columns:
        source_df = source_df.withColumn("_seq", F.lit(0).cast("long"))
    source_df = source_df.select("doc_id", "tokens", "n_tok", "source", "_op", "_seq")
    if duplicate_policy == "error":
        dup = source_df.groupBy("doc_id").count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise DuplicateSourceKeys(
                f"source has duplicate doc_id (e.g. {dup[0]['doc_id']}); "
                "pass duplicate_policy='last' to dedupe"
            )
        return source_df
    if duplicate_policy == "last":
        # salted two-phase agg — hot duplicate keys fan out before the
        # final per-key reduce (skew.py)
        return salted_latest_by_key(source_df, key="doc_id", order_col="_seq", salt=salt)
    raise ValueError(f"unknown duplicate_policy: {duplicate_policy}")


def merge_into(
    spark: SparkSession,
    table: TokenTable,
    source_df: DataFrame,
    duplicate_policy: str = "error",
    salt: int = 16,
    job_id: str | None = None,
    _fail_after_units: int | None = None,
) -> dict:
    """``salt`` controls the fan-out of the two-phase dedupe when
    ``duplicate_policy="last"`` (key-level source skew is defused
    there; the downstream joins see unique keys)."""
    parent = table.current_snapshot_id()
    manifest = table.manifest_df(spark)
    src = _prepare_source(source_df, duplicate_policy, salt).persist()
    try:
        return _merge(spark, table, manifest, src, parent, job_id, _fail_after_units)
    finally:
        src.unpersist()


def _merge(spark, table, manifest, src, parent, job_id, _fail_after_units):
    log = LineageLog(table.root, job_id or f"merge-snap{parent}")
    done = log.completed_units()

    # 1. PRUNE — metadata only: files whose [min,max] doc_id range can
    # contain any source key.
    key_range = src.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).collect()[0]
    if key_range.lo is None:  # empty source
        return {"snapshot_id": None, "rows_updated": 0, "rows_deleted": 0, "rows_inserted": 0}
    cand = manifest.filter(
        (F.col("max_doc_id") >= key_range.lo) & (F.col("min_doc_id") <= key_range.hi)
    )
    cand_rows = cand.select("file_path", "partition").collect()
    cand_by_part: dict[str, list[str]] = defaultdict(list)
    for r in cand_rows:
        cand_by_part[r.partition].append(r.file_path)
    cand_files = [r.file_path for r in cand_rows]

    # 2. PROBE — column-pruned scan of candidates (doc_id only) to find
    # exactly-touched files and the matched key set.
    # source keys are UNIQUE here (dup policy ran in _prepare_source —
    # key-level skew is defused there by the salted two-phase dedupe),
    # so the probe join is a plain equi-join; AQE skew-join covers any
    # residual partition-level skew.
    src_keys = src.select("doc_id")
    if cand_files:
        probe = (
            spark.read.schema(TOKEN_SCHEMA)
            .parquet(*cand_files)
            .select("doc_id", F.input_file_name().alias("file_path"))
        )
        matched = probe.join(src_keys, "doc_id").persist()
        touched_files = {r.file_path for r in matched.select("file_path").distinct().collect()}
    else:
        matched = spark.createDataFrame([], "doc_id string, file_path string").persist()
        touched_files = set()

    # broadcast the source into the rewrite joins when it plausibly fits
    # an executor (updates are usually ≪ table); estimated from the
    # persisted source's own stats, not guessed
    est = src.agg(
        F.count("*").alias("n"), F.avg(F.coalesce("n_tok", F.lit(0))).alias("avg_tok")
    ).collect()[0]
    src_bytes_est = int((est.n or 0) * ((est.avg_tok or 0) * 4 + 64))
    broadcast_src = src_bytes_est < 256 * 1024 * 1024

    # global matched-row counts — ONE small agg over the persisted probe
    # (per-unit counting would re-execute each unit's join: the range
    # repartition's sampling pass runs the plan twice)
    op_counts = {
        r._op: r.n
        for r in src.join(matched.select("doc_id").distinct(), "doc_id")
        .groupBy("_op")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    metrics = {
        "rows_updated": int(op_counts.get("upsert", 0)),
        "rows_deleted": int(op_counts.get("delete", 0)),
        "rows_inserted": 0,
    }
    out_root = table.new_data_dir(f"merge-snap{parent}")
    touched_norm = {_norm(t) for t in touched_files}

    def run_rewrite_unit(part: str, files_p: list[str]) -> None:
        target_p = spark.read.schema(TOKEN_SCHEMA).parquet(*files_p)
        src_side = src.select(
            F.col("doc_id").alias("s_doc_id"),
            F.col("tokens").alias("s_tokens"),
            F.col("n_tok").alias("s_n_tok"),
            F.col("_op").alias("s_op"),
        )
        if broadcast_src:
            src_side = F.broadcast(src_side)
        joined = target_p.alias("t").join(
            src_side, F.col("t.doc_id") == F.col("s_doc_id"), "left"
        )
        rewritten = (
            joined.filter((F.col("s_op").isNull()) | (F.col("s_op") != "delete"))
            .select(
                F.col("t.doc_id").alias("doc_id"),
                F.coalesce(
                    F.when(F.col("s_op") == "upsert", F.col("s_tokens")), F.col("t.tokens")
                ).alias("tokens"),
                F.coalesce(
                    F.when(F.col("s_op") == "upsert", F.col("s_n_tok")), F.col("t.n_tok")
                ).alias("n_tok"),
                F.col("t.source").alias("source"),
            )
        )
        out_dir = out_root / part
        n_out = max(1, len(files_p) // 2)  # merged output ≈ input volume
        (
            rewritten.repartitionByRange(n_out, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(str(out_dir))
        )
        new_files = list_parquet_files(out_dir)
        stats = [r.asDict() for r in file_stats_df(spark, [(f, part) for f in new_files]).collect()]
        log.mark_unit_done(
            f"rewrite:{part}",
            files_in=files_p,
            new_manifest_rows=stats,
            metrics={"files_rewritten": len(files_p), "files_written": len(new_files)},
        )

    # 3. REWRITE touched files — one resumable unit per partition, run
    # concurrently (Spark interleaves the jobs; lineage appends are
    # thread-safe). Sequential under the crash-injection test hook.
    pending = []
    for part in sorted(cand_by_part):
        files_p = [f for f in cand_by_part[part] if _norm(f) in touched_norm]
        if files_p and f"rewrite:{part}" not in done:
            pending.append((part, files_p))
    if _fail_after_units is not None:
        for i, (part, files_p) in enumerate(pending, 1):
            run_rewrite_unit(part, files_p)
            if i >= _fail_after_units:
                raise RuntimeError(f"injected failure after {i} units (test hook)")
    elif pending:
        with ThreadPoolExecutor(max_workers=min(8, len(pending))) as ex:
            for f in [ex.submit(run_rewrite_unit, p, fs) for p, fs in pending]:
                f.result()

    # 4. INSERT unit — not-matched upserts, routed per partition.
    if "insert" not in done:
        inserts = (
            src.filter(F.col("_op") == "upsert")
            .join(matched.select("doc_id").distinct(), "doc_id", "left_anti")
            .select("doc_id", "tokens", "n_tok", "source")
        ).persist()
        n_ins = inserts.count()
        stats = []
        if n_ins:
            ins_dir = out_root / "_inserts"
            parts = sorted(r.source for r in inserts.select("source").distinct().collect())

            def write_ins(p: str) -> list[tuple[str, str]]:
                d = ins_dir / p
                (
                    inserts.filter(F.col("source") == p)
                    .repartitionByRange(max(1, spark.sparkContext.defaultParallelism // 4), "doc_id")
                    .sortWithinPartitions("doc_id")
                    .write.mode("overwrite")
                    .parquet(str(d))
                )
                return [(f, p) for f in list_parquet_files(d)]

            with ThreadPoolExecutor(max_workers=min(8, len(parts))) as ex:
                pairs = [pr for fut in [ex.submit(write_ins, p) for p in parts]
                         for pr in fut.result()]
            stats = [r.asDict() for r in file_stats_df(spark, pairs).collect()]
        inserts.unpersist()
        log.mark_unit_done("insert", files_in=[], new_manifest_rows=stats,
                           metrics={"rows_inserted": n_ins})
    matched.unpersist()

    # 5. COMMIT — assemble from lineage (covers resumed units).
    done = log.completed_units()
    removed = [f for rec in done.values() for f in rec["files_in"]]
    new_rows = [row for rec in done.values() for row in rec["new_manifest_rows"]]
    for rec in done.values():
        for k in metrics:
            metrics[k] += rec["metrics"].get(k, 0)
    removed_df = spark.createDataFrame([(f,) for f in removed] or [], "file_path string")
    new_manifest = manifest.join(F.broadcast(removed_df), "file_path", "left_anti")
    if new_rows:
        new_manifest = new_manifest.unionByName(spark.createDataFrame(new_rows, MANIFEST_SCHEMA))
    summary = {**metrics, "files_rewritten": len(removed), "files_written": len(new_rows),
               "candidate_files": len(cand_files), "touched_files": len(touched_files)}
    sid = table.commit(new_manifest, operation="merge", summary=summary, parent_id=parent)
    log.log_event("committed", snapshot_id=sid, **summary)
    return {"snapshot_id": sid, **summary}


def _norm(p: str) -> str:
    return p.removeprefix("file://").removeprefix("file:")

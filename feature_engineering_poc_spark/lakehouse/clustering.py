"""Z-order / Hilbert clustering rewrite (north_rule ops #2-3).

Reorders each partition's rows along a space-filling curve over the
cluster columns so that file-level min/max stats become selective for
MULTI-column predicates — the pruning mechanism is manifest min/max
(metadata.py scan planning), the clustering rewrite is what makes
those ranges tight.

Scale shape:
- Curve keys are computed by an Arrow-batched pandas UDF over numpy
  (plans/sfc.py) — zero per-row Python.
- Column bounds for grid normalization come from the MANIFEST
  (min-of-mins / max-of-maxs per partition) — no data pass.
- One range shuffle per partition unit (``repartitionByRange(zkey)``)
  + in-partition sort; that is the minimum data movement any
  clustering rewrite can do.
- The zkey is PERSISTED as an extra column in the rewritten files, so
  parquet footers (and thus the manifest, via stats.py) carry zkey
  min/max for curve-range pruning; table scans use the fixed 4-column
  schema and never see it.
- Per-partition resumable units with lineage checkpoints, atomic
  snapshot commit — same protocol as compaction.
"""

from __future__ import annotations

from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sfc import (
    hilbert_index,
    interleave_bits,
    normalize_to_grid,
    string_prefix_ordinal,
)
from .lineage import LineageLog
from .metadata import TOKEN_SCHEMA, TokenTable, list_parquet_files
from .stats import file_stats_rows

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _mm3_hash_int(value: int, seed: int = 42) -> int:
    """Murmur3_x86_32.hashInt — Spark's hash of an IntegerType column.

    ``repartition(n, col)`` places a row in partition
    ``pmod(murmur3(col), n)``; reproducing the hash on the driver lets
    us pick column VALUES that land in chosen partitions (see
    ``_partition_remap``). Verified against ``F.hash`` in
    tests/test_clustering.py.
    """

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    k1 = ((value & 0xFFFFFFFF) * 0xCC9E2D51) & 0xFFFFFFFF
    k1 = (rotl(k1, 15) * 0x1B873593) & 0xFFFFFFFF
    h1 = (seed ^ k1) & 0xFFFFFFFF
    h1 = (rotl(h1, 13) * 5 + 0xE6546B64) & 0xFFFFFFFF
    h1 ^= 4  # total bytes hashed
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _partition_remap(n: int) -> list[int]:
    """For each target partition i < n, an int value x with
    pmod(murmur3(x), n) == i — so ``repartition(n, remap[bucket])``
    places bucket i exactly in partition i (monotone placement, which a
    plain hash of the bucket id would scramble)."""
    remap: list[int | None] = [None] * n
    found, x = 0, 0
    while found < n:
        i = _mm3_hash_int(x) % n
        if remap[i] is None:
            remap[i] = x
            found += 1
        x += 1
    return remap  # type: ignore[return-value]


@dataclass
class _ColSpec:
    name: str
    kind: str  # "numeric" | "string"
    lo: float
    hi: float


def _make_key_udf(specs: list[_ColSpec], curve: str, bits: int):
    """Factory: pandas UDF computing the SFC key for these column specs."""

    def _kernel(*cols: pd.Series) -> pd.Series:
        grids = []
        for series, spec in zip(cols, specs):
            if spec.kind == "string":
                ordv = string_prefix_ordinal(series).astype(np.float64)
                grids.append(normalize_to_grid(ordv, spec.lo, spec.hi, bits))
            else:
                vals = series.to_numpy(dtype=np.float64, na_value=spec.lo)
                grids.append(normalize_to_grid(vals, spec.lo, spec.hi, bits))
        key = hilbert_index(grids, bits) if curve == "hilbert" else interleave_bits(grids, bits)
        return pd.Series(key.astype(np.int64))

    return F.pandas_udf(_kernel, "long")


def _partition_bounds(
    spark: SparkSession, manifest_rows: list, columns: list[str], files: list[str]
) -> list[_ColSpec]:
    """Grid bounds per cluster column — computed from the ALREADY-
    collected manifest rows for the stats columns (doc_id, n_tok):
    zero extra Spark jobs on the default path. Columns without
    manifest stats cost one column-pruned data agg."""
    specs: list[_ColSpec] = []
    covered = {"doc_id", "n_tok"}
    agg_row = None
    extra = [c for c in columns if c not in covered]
    if extra:
        df = spark.read.schema(TOKEN_SCHEMA).parquet(*files)
        aggs = []
        for c in extra:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        agg_row = df.agg(*aggs).collect()[0]
    lo_doc = min((r["min_doc_id"] for r in manifest_rows if r["min_doc_id"] is not None), default="")
    hi_doc = max((r["max_doc_id"] for r in manifest_rows if r["max_doc_id"] is not None), default="")
    lo_nt = min((r["min_n_tok"] for r in manifest_rows if r["min_n_tok"] is not None), default=0)
    hi_nt = max((r["max_n_tok"] for r in manifest_rows if r["max_n_tok"] is not None), default=1)
    for c in columns:
        if c == "doc_id":
            lo, hi = string_prefix_ordinal([lo_doc or "", hi_doc or ""])
            specs.append(_ColSpec(c, "string", float(lo), float(hi)))
        elif c == "n_tok":
            specs.append(_ColSpec(c, "numeric", float(lo_nt or 0), float(hi_nt or 1)))
        else:
            lo, hi = agg_row[f"lo_{c}"], agg_row[f"hi_{c}"]
            if isinstance(lo, str):
                lo, hi = string_prefix_ordinal([lo or "", hi or ""])
                specs.append(_ColSpec(c, "string", float(lo), float(hi)))
            else:
                specs.append(_ColSpec(c, "numeric", float(lo or 0), float(hi or 1)))
    return specs


def cluster(
    spark: SparkSession,
    table: TokenTable,
    columns: tuple[str, ...] = ("n_tok", "doc_id"),
    curve: str = "zorder",
    bits: int = 16,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    job_id: str | None = None,
    partitions: list[str] | None = None,
    _fail_after_units: int | None = None,
) -> dict:
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve: {curve}")
    parent = table.current_snapshot_id()
    # Driver-side manifest planning (pyarrow footer path when small —
    # zero Spark jobs; see metadata.manifest_records).
    entries = [
        r for r in table.manifest_records(spark, parent)
        if partitions is None or r["partition"] in partitions
    ]
    by_part: dict[str, list] = defaultdict(list)
    for r in entries:
        by_part[r["partition"]].append(r)
    if not entries:
        return {"snapshot_id": None, "units": 0}

    job_tag = job_id or f"{curve}-snap{parent}"
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
    done = log.completed_units()

    def run_unit(part: str) -> None:
        rows_p = by_part[part]
        files = [r["file_path"] for r in rows_p]
        total_bytes = sum(r["file_bytes"] for r in rows_p)
        total_rows = sum(r["record_count"] for r in rows_p)
        n_out = max(1, round(total_bytes / target_file_bytes))
        specs = _partition_bounds(spark, rows_p, list(columns), files)
        key_udf = _make_key_udf(specs, curve, bits)
        df = spark.read.schema(TOKEN_SCHEMA).parquet(*files)
        keyed = df.withColumn("zkey", key_udf(*[F.col(s.name) for s in specs]))
        out_dir = table.new_data_dir(job_tag) / part

        # Range placement WITHOUT repartitionByRange: its boundary
        # sampling job re-executes the child plan — a second full pass
        # over the tokens payload plus a second UDF evaluation per unit
        # (the same hidden pass the r5 merge rewrite removed). Instead:
        # (1) one NARROW pass (cluster columns only — the payload never
        # leaves the parquet footprint) computes zkey quantile
        # boundaries; (2) the single full pass assigns each row its
        # bucket and an int remap value whose murmur3 lands bucket i in
        # partition i exactly, so one hash exchange + in-partition sort
        # reproduces the range layout (disjoint per-file zkey envelopes,
        # same pruning power). Falls back to repartitionByRange when the
        # key exceeds double precision (boundary literals would be
        # lossy) — impossible for the default 2 cols × 16 bits.
        if n_out == 1:
            # single-bin unit (≈ one target file of data): round-robin
            # into one reduce task — coalesce(1) would also collapse the
            # scan+UDF map side onto one core
            placed = keyed.repartition(1)
        elif bits * len(specs) <= 52:
            narrow = (
                spark.read.schema(TOKEN_SCHEMA)
                .parquet(*files)
                .select(*[s.name for s in specs])
                .withColumn("zkey", key_udf(*[F.col(s.name) for s in specs]))
            )
            probs = [i / n_out for i in range(1, n_out)]
            bnds = sorted(int(b) for b in narrow.approxQuantile("zkey", probs, 0.001))
            bucket = F.size(
                F.filter(
                    F.array(*[F.lit(b) for b in bnds]),
                    lambda b: F.col("zkey") > b,
                )
            )
            remap = F.array(*[F.lit(x) for x in _partition_remap(n_out)])
            placed = keyed.withColumn(
                "_pid", F.element_at(remap, bucket + F.lit(1))
            ).repartition(n_out, "_pid").drop("_pid")
        else:
            placed = keyed.repartitionByRange(n_out, "zkey")
        (
            placed.sortWithinPartitions("zkey")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max(1, (total_rows + n_out - 1) // n_out + 1))
            .parquet(str(out_dir))
        )
        new_files = list_parquet_files(out_dir)
        stats = file_stats_rows(spark, [(f, part) for f in new_files])
        log.mark_unit_done(
            part,
            files_in=files,
            new_manifest_rows=stats,
            metrics={"files_rewritten": len(files), "files_written": len(new_files),
                     "bytes": total_bytes, "rows": total_rows},
        )

    # concurrent resumable units (see compaction.py for rationale);
    # sequential under the crash-injection hook.
    pending = [p for p in sorted(by_part) if p not in done]
    if _fail_after_units is not None:
        for i, part in enumerate(pending, 1):
            run_unit(part)
            if i >= _fail_after_units:
                raise RuntimeError(f"injected failure after {i} units (test hook)")
    elif pending:
        with ThreadPoolExecutor(max_workers=min(8, len(pending))) as ex:
            for f in [ex.submit(run_unit, p) for p in pending]:
                f.result()

    done = log.completed_units()
    removed = [f for rec in done.values() for f in rec["files_in"]]
    new_rows = [row for rec in done.values() for row in rec["new_manifest_rows"]]
    summary = {
        "curve": curve,
        "columns": list(columns),
        "files_rewritten": len(removed),
        "files_written": len(new_rows),
        "rows": sum(rec["metrics"]["rows"] for rec in done.values()),
        "units": len(by_part),
        "job_tag": job_tag,
    }
    sid = table.commit_delta(
        spark, removed, new_rows, operation=f"cluster-{curve}", summary=summary, parent_id=parent
    )
    log.log_event("committed", snapshot_id=sid, **summary)
    return {"snapshot_id": sid, **summary}


def prune_files(
    manifest_df: DataFrame,
    n_tok_range: tuple[int, int] | None = None,
    doc_id_range: tuple[str, str] | None = None,
) -> DataFrame:
    """Manifest-level min/max file pruning for a conjunctive predicate.

    Returns the surviving manifest rows; pass their file_paths to
    ``TokenTable.scan(files=...)``. This happens BEFORE Catalyst sees
    any scan — the file list itself shrinks.
    """
    out = manifest_df
    if n_tok_range is not None:
        lo, hi = n_tok_range
        out = out.filter((F.col("max_n_tok") >= lo) & (F.col("min_n_tok") <= hi))
    if doc_id_range is not None:
        lo, hi = doc_id_range
        out = out.filter((F.col("max_doc_id") >= lo) & (F.col("min_doc_id") <= hi))
    return out

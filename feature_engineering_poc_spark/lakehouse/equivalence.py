"""Scan-equivalence verification (the correctness gate of the north rule).

Post-maintenance scans must match pre-maintenance scans under per-row
token-array equality (BASELINE.json input_hint). At scale, collecting
both sides is impossible, so equivalence is an order-insensitive
fingerprint: per-row ``xxhash64(doc_id, source, n_tok, tokens)``
(JVM-side; xxhash64 hashes array columns element-wise) aggregated with
``bit_xor`` + ``count``. XOR aggregation is order-independent and
overflow-free (relevant under Spark 4's default ANSI mode, where
``sum`` of hashes would raise on overflow). doc_ids are unique per
table, so pairwise cancellation cannot mask differences; the row count
guards the degenerate empty/self-cancel cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def scan_fingerprint(df: DataFrame) -> Row:
    """(row_count, xor of per-row hashes) — one distributed pass."""
    hashed = df.select(
        F.xxhash64("doc_id", "source", "n_tok", "tokens").alias("h")
    )
    return hashed.agg(
        F.count("*").alias("row_count"),
        F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("xor_hash"),
    ).collect()[0]


def assert_scan_equivalent(before: DataFrame, after: DataFrame) -> dict:
    """Raise AssertionError unless the two scans are row-equivalent."""
    fa, fb = scan_fingerprint(before), scan_fingerprint(after)
    if (fa.row_count, fa.xor_hash) != (fb.row_count, fb.xor_hash):
        raise AssertionError(
            f"scan mismatch: before=(rows={fa.row_count}, hash={fa.xor_hash}) "
            f"after=(rows={fb.row_count}, hash={fb.xor_hash})"
        )
    return {"row_count": fa.row_count, "xor_hash": fa.xor_hash}

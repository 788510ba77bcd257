"""Sequence packing — assembling documents into fixed-capacity training
sequences, the canonical final step of an LLM pretraining data pipeline
over a token-sequence table (BASELINE.json input_hint).

Two industry-standard strategies, chosen for their Spark scale shapes:

- ``chunk_assignments`` — concat-then-split packing: documents are
  concatenated in a deterministic order per group and the token stream
  is split at fixed boundaries; a document is assigned to the chunk
  where it STARTS (documents may straddle chunks — the usual
  pretraining setup, where an attention-mask or EOD token handles the
  seam). This is a pure prefix-sum over a window: 100% JVM-side, one
  hash exchange per group column, and exactly expressible in ANSI SQL
  (the driver oracle replays it in DuckDB).

- ``pack_bins_ffd`` — boundary-respecting packing: no document
  straddles a sequence; each group's documents are first-fit-decreasing
  packed into bins of ``capacity`` tokens. Bin feasibility is a
  per-group sequential decision, so groups are processed in
  ``applyInPandas`` (one pandas batch per group — the loop runs over
  id+size METADATA, never token payloads, exactly like the driver-side
  FFD in plans/binpack.py). Parallelism = number of groups; for a
  giant group, pre-shard with ``shards`` (pack per (group, shard) —
  still feasible, marginally lower fill, shards × parallelism).

Documents larger than the capacity get a bin of their own (flagged via
``oversize``) — the caller decides whether to truncate or drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def chunk_assignments(
    df: DataFrame,
    size_col: str = "n_tok",
    group_col: str = "source",
    order_col: str = "doc_id",
    chunk_tokens: int = 2048,
) -> DataFrame:
    """Concat-then-split chunk index per document.

    Adds ``start_offset`` (tokens before this doc in its group's
    stream) and ``chunk_id`` (= start_offset // chunk_tokens). One
    window exchange on ``group_col``; no Python anywhere.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(size_col).over(w) - F.col(size_col)).cast("long")
    # `div` = true integer division on longs. Float division + cast is
    # only exact below 2^53 — a per-group token stream near 9e15 tokens
    # (100 TB-pipeline territory) would round to wrong chunk ids, and
    # the DuckDB oracle's `//` is integer division.
    return df.withColumn("start_offset", start).withColumn(
        "chunk_id", F.expr(f"start_offset div {int(chunk_tokens)}")
    )


_BIN_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        # bin_id is only unique within (group, shard) — the shard is
        # part of the bin's identity and is emitted so downstream
        # consumers can key bins as (group, shard, bin_id)
        T.StructField("shard", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
        T.StructField("doc_ids", T.ArrayType(T.StringType())),
    ]
)


def pack_bins_ffd(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tok",
    group_col: str = "source",
    capacity: int = 2048,
    shards: int = 1,
) -> DataFrame:
    """First-fit-decreasing packing per group (no straddling).

    Returns one row per bin: (group, shard, bin_id, n_docs,
    total_tokens, oversize, doc_ids). Deterministic: docs sorted by
    (size desc, id) before first-fit, so every run packs identically.
    ``shards > 1`` splits a group by ``hash(id) % shards`` for
    intra-group parallelism at the cost of some fill; bin identity is
    (group, shard, bin_id) — bin_id alone repeats across shards (and
    shard is 0 when sharding is off).
    """
    keys = [group_col] if shards <= 1 else [group_col, "_shard"]
    src = df.select(
        F.col(group_col).cast("string").alias(group_col),
        F.col(id_col).cast("string").alias(id_col),
        F.col(size_col).cast("long").alias(size_col),
    )
    if shards > 1:
        src = src.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
        )

    def pack(pdf):
        import pandas as pd

        rows = sorted(
            zip(pdf[id_col], pdf[size_col]), key=lambda r: (-r[1], r[0])
        )
        group = pdf[group_col].iloc[0]
        shard = int(pdf["_shard"].iloc[0]) if "_shard" in pdf.columns else 0
        bins: list[list] = []  # [remaining, n_docs, total, ids]
        out = []
        for doc, size in rows:
            if size > capacity:
                out.append((group, shard, -1, 1, int(size), True, [doc]))
                continue
            for b in bins:
                if b[0] >= size:
                    b[0] -= size
                    b[1] += 1
                    b[2] += size
                    b[3].append(doc)
                    break
            else:
                bins.append([capacity - size, 1, size, [doc]])
        for i, b in enumerate(bins):
            out.append((group, shard, i, b[1], int(b[2]), False, b[3]))
        # oversize rows get stable negative ids after the loop
        fixed = []
        n_over = 0
        for r in out:
            if r[2] == -1:
                n_over += 1
                fixed.append((r[0], r[1], -n_over, r[3], r[4], r[5], r[6]))
            else:
                fixed.append(r)
        return pd.DataFrame(
            fixed,
            columns=["group", "shard", "bin_id", "n_docs", "total_tokens",
                     "oversize", "doc_ids"],
        )

    return src.groupBy(*keys).applyInPandas(pack, _BIN_SCHEMA)

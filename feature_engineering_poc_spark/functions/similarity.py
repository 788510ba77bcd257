"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and an LSH-bucketed approximate variant (scale path).

Vectors are ``array<float>`` columns; all arithmetic is JVM-side
(``zip_with`` + ``aggregate``) except the random-hyperplane signatures,
which batch through a seeded-numpy pandas UDF (deterministic, Arrow).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Queries are BROADCAST (small side by construction), so scoring is
    map-side over the corpus — no shuffle until the per-query top-k
    (one hash exchange on query_id; the window sort is bounded by k via
    rank filter + AQE). Returns (query_id, rank, vec_id, cosine_1e6).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(vec_col).alias("qn")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"), _norm(vec_col).alias("cn")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # integer-quantized score so exact oracles can hash-match floats
        .select("query_id", "rank", "vec_id", F.round(F.col("cosine") * 1e6).cast("long").alias("cosine_1e6"))
    )


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """pandas UDF: sign-bit signature from seeded random hyperplanes.

    The projection matrix is generated once per executor from the seed
    (deterministic across the cluster); batches flow through Arrow and
    the matmul is one numpy GEMM per batch — no per-row Python.
    """
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        if len(mat) == 0:
            return pd.Series([], dtype="int64")
        bits = (mat @ planes) > 0
        out = np.zeros(len(mat), dtype=np.int64)
        for j in range(n_planes):
            out |= bits[:, j].astype(np.int64) << j
        return pd.Series(out)

    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in buckets within
    ``probe_hamming`` sign-bit flips of the query's bucket (multiprobe).

    At 100 TB the bucket join replaces the full scan: expected work per
    query ≈ n / 2^n_planes × (number of probed buckets). Recall/cost
    trades via n_planes (bucket size) and probe_hamming (probe count).
    """
    import itertools

    sig = hyperplane_signature_udf(dim, n_planes, seed)
    masks = [0]
    for h in range(1, probe_hamming + 1):
        for combo in itertools.combinations(range(n_planes), h):
            m = 0
            for j in combo:
                m |= 1 << j
            masks.append(m)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"), _norm(vec_col).alias("cn"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    # query probes its own bucket + all Hamming-1 buckets
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(vec_col).alias("qn"),
        sig(F.col(vec_col)).alias("qbucket"),
    ).withColumn(
        "bucket",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in masks])
        ),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id",
                F.round(F.col("cosine") * 1e6).cast("long").alias("cosine_1e6"))
    )

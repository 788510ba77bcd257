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


def _lloyd(X: np.ndarray, k_cells: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd iterations on unit-normalized rows — the shared
    numpy core of both trainers, so Spark-trained and locally-trained
    quantizers are BIT-IDENTICAL given the same sample rows (the exact
    oracle for ann_ivf_topk depends on this)."""
    X = np.asarray(X, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine == dot on normalized
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):  # empty cells keep their old centroid
                C[j] = members.mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def _sample_key(vec_id: str, seed: int) -> str:
    """The deterministic sample-ranking key: md5 of "<id>:<seed>".

    md5 is identical across Spark, hashlib, and DuckDB, so the SAME
    sample (and therefore the same centroids) is reproducible with or
    without a Spark session.
    """
    import hashlib

    return hashlib.md5(f"{vec_id}:{seed}".encode()).hexdigest()


def train_ivf_centroids(
    corpus: DataFrame,
    k_cells: int = 16,
    sample: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Driver-side Lloyd (k-means) training of an IVF coarse quantizer
    on a DETERMINISTIC hash-sample of the corpus.

    This is the standard IVF recipe (FAISS trains its quantizer on a
    sample too): training data is a bounded sample regardless of corpus
    size — at 100 TB the sample collect is one top-N-by-hash job, and
    the k×dim centroid matrix (KBs) broadcasts to every assigner task.
    Fully deterministic AND Spark-independent: sample order =
    md5("<id>:<seed>") (reproducible via hashlib — see
    train_ivf_centroids_local), init = seeded choice, ties resolved by
    argmax's fixed order.
    """
    rows = (
        corpus.select(
            F.col(vec_col).alias("v"),
            F.md5(
                F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
            ).alias("h"),
        )
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    return _lloyd(np.asarray([r.v for r in rows]), k_cells, iters, seed)


def train_ivf_centroids_local(
    parquet_path: str,
    k_cells: int = 16,
    sample: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Same quantizer as ``train_ivf_centroids``, trained WITHOUT Spark
    (pyarrow read + hashlib sample ranking + the shared Lloyd core).
    Exists so an exact SQL oracle can inject byte-identical centroids;
    also handy for offline quantizer prep."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col])
    ids = tbl.column(id_col).to_pylist()
    vecs = tbl.column(vec_col).to_pylist()
    ranked = sorted(range(len(ids)), key=lambda i: _sample_key(ids[i], seed))[:sample]
    return _lloyd(np.asarray([vecs[i] for i in ranked]), k_cells, iters, seed)


def _ivf_cells_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: indices of the ``nprobe`` nearest coarse cells.
    One numpy GEMM per Arrow batch against the broadcast centroid
    matrix — no per-row Python."""
    C = np.ascontiguousarray(centroids)

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        M = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T
        idx = np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k_cells: int = 16,
    nprobe: int = 4,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus rows
    are binned by nearest coarse centroid; each query scores only the
    rows in its ``nprobe`` nearest cells.

    Scale shape: expected work per query ≈ n × nprobe / k_cells — the
    cell join replaces the full scan, exactly like lsh_topk's bucket
    join but with DATA-ADAPTIVE partitions (k-means cells follow the
    embedding distribution, where hyperplane buckets are oblivious).
    Recall/cost trades via k_cells (cell size) and nprobe.

    ``centroids`` injects a pre-trained quantizer (e.g. from
    ``train_ivf_centroids_local``); default trains on a deterministic
    hash-sample of ``corpus``.
    """
    C = centroids if centroids is not None else train_ivf_centroids(
        corpus, k_cells=k_cells, sample=sample, id_col=id_col, vec_col=vec_col, seed=seed
    )
    assign1 = _ivf_cells_udf(C, 1)
    probe_n = _ivf_cells_udf(C, nprobe)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"), _norm(vec_col).alias("cn"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(vec_col).alias("qn"),
        F.explode(probe_n(F.col(vec_col))).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").select(
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

"""Benchmark decontamination: flag training documents whose word
n-grams overlap an evaluation benchmark's n-gram set.

The standard LLM training-data hygiene step (cf. the GPT-3 appendix-C
/ PaLM / Llama decontamination recipes: 8-13-gram collision against
eval sets): any training document sharing long n-grams with a
benchmark question leaks the benchmark into the training set and must
be dropped or cleaned before training.

Scale shape: the benchmark side is an EVAL set — thousands of
documents, megabytes — while the corpus side is the 100 TB table. The
benchmark's distinct n-gram set is therefore broadcast; the corpus is
scanned map-side (a broadcast LEFT join tags each shingle), and the
only shuffle is ONE groupBy on doc id for the per-document roll-up —
one row per document, each a 3-int tuple. The corpus never self-joins
and never shuffles its text payload.

The reference repo has no text operators at all (its data plane is
transaction feature derivation, `features/TransactionTransformers.scala`);
this module is part of the LLM-pipeline extension mandated alongside
SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_engineering_poc_spark.functions.dedup import shingles


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns (id, n_shingles, n_hits, overlap_permille) for every
    document with at least ``min_hits`` distinct shingles that also
    occur anywhere in ``benchmark`` — the candidates a decontamination
    pass drops or rewrites. ``overlap_permille`` is the floor of
    1000·hits/shingles computed with exact integer arithmetic
    (engine-portable: Spark ``div`` == DuckDB ``//``, no double noise).
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(shingles(F.col(bcol), n)).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    tagged = doc_sh.join(F.broadcast(bench_grams), "shingle", "left")
    return (
        tagged.groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hits"),
        )
        .filter(F.col("n_hits") >= min_hits)
        .withColumn(
            "overlap_permille", F.expr("(1000 * n_hits) div n_shingles")
        )
    )

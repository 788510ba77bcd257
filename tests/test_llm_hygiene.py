"""Decontamination + PII redaction: golden rows on planted fixtures
and a plan-shape assertion (benchmark n-gram set broadcast).

No reference counterpart (the reference's data plane has no text
operators — SURVEY.md §2.2 "String functions: upper only"); these are
part of the LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_engineering_poc_spark.functions.contamination import (
    contamination_overlap,
)
from feature_engineering_poc_spark.functions.text import pii_counts, redact_pii
from tests.test_plans import plan


def test_contamination_golden(spark):
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta",)], ["text"]
    )
    docs = spark.createDataFrame(
        [
            # verbatim copy of the benchmark -> permille 1000
            (1, "alpha beta gamma delta epsilon zeta"),
            # 8 words -> 6 trigram shingles, the first 2 hit -> 333
            (2, "alpha beta gamma delta nine ten eleven twelve"),
            # disjoint vocabulary -> absent from output
            (3, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    out = {r.id: r for r in contamination_overlap(docs, bench, n=3).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_shingles == 4  # 6 words -> 4 distinct 3-grams
    assert out[1].n_hits == 4
    assert out[1].overlap_permille == 1000
    assert out[2].n_shingles == 6
    assert out[2].n_hits == 2
    assert out[2].overlap_permille == 333  # floor(2000/6)


def test_contamination_short_text_whole_shingle(spark):
    """Texts shorter than n collapse to one whole-text shingle (the
    shingles() contract) — a short doc equal to a short benchmark line
    still flags at 1000 permille."""
    bench = spark.createDataFrame([("tiny text",)], ["text"])
    docs = spark.createDataFrame([(7, "tiny text")], ["doc_id", "text"])
    rows = contamination_overlap(docs, bench, n=8).collect()
    assert len(rows) == 1 and rows[0].overlap_permille == 1000


def test_contamination_plan_broadcasts_benchmark(spark):
    """The corpus side must never shuffle its shingles: the benchmark
    gram set is broadcast and the only exchange is the per-doc
    roll-up."""
    bench = spark.createDataFrame([("a b c d e",)], ["text"])
    docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    p = plan(contamination_overlap(docs, bench, n=3))
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p


def test_pii_redaction_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com and call 555-123-4567 via 10.0.0.1"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org and 999-888-7777"),
        ],
        ["doc_id", "text"],
    )
    n_e, n_p, n_i = pii_counts(F.col("text"))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            n_e.alias("ne"), n_p.alias("np"), n_i.alias("ni"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (rows[1].ne, rows[1].np, rows[1].ni) == (1, 1, 1)
    assert rows[1].red == "mail <EMAIL> and call <PHONE> via <IP>"
    assert (rows[2].ne, rows[2].np, rows[2].ni) == (0, 0, 0)
    assert rows[2].red == "no pii here at all"
    assert (rows[3].ne, rows[3].np, rows[3].ni) == (2, 1, 0)
    assert rows[3].red == "two mails <EMAIL> <EMAIL> and <PHONE>"

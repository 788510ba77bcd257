"""Sequence packing (functions/packing.py): chunk assignment golden
rows, FFD invariants, determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_engineering_poc_spark.functions.packing import (
    chunk_assignments,
    pack_bins_ffd,
)


def _docs(spark):
    rows = [
        ("a", "s1", 300),
        ("b", "s1", 300),
        ("c", "s1", 100),
        ("d", "s1", 600),  # oversize for capacity=512
        ("e", "s2", 512),
        ("f", "s2", 1),
    ]
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok long")


def test_chunk_assignments_golden(spark):
    out = {
        r.doc_id: (r.start_offset, r.chunk_id)
        for r in chunk_assignments(
            _docs(spark), size_col="n_tok", group_col="source",
            order_col="doc_id", chunk_tokens=512,
        ).collect()
    }
    # s1 stream: a@0, b@300, c@600, d@700 → chunks 0,0,1,1
    assert out["a"] == (0, 0)
    assert out["b"] == (300, 0)
    assert out["c"] == (600, 1)
    assert out["d"] == (700, 1)
    # s2 stream: e@0 chunk 0, f@512 chunk 1 (exact boundary starts next chunk)
    assert out["e"] == (0, 0)
    assert out["f"] == (512, 1)


def test_pack_bins_ffd_invariants(spark):
    bins = pack_bins_ffd(
        _docs(spark), id_col="doc_id", size_col="n_tok", group_col="source",
        capacity=512,
    ).collect()
    by_group: dict[str, list] = {}
    for b in bins:
        by_group.setdefault(b.group, []).append(b)
    # conservation: every doc packed exactly once
    packed = sorted(d for b in bins for d in b.doc_ids)
    assert packed == ["a", "b", "c", "d", "e", "f"]
    # capacity bound on regular bins; oversize flagged out
    for b in bins:
        if b.oversize:
            assert b.total_tokens > 512 and b.bin_id < 0
        else:
            assert b.total_tokens <= 512
    # s1: FFD order d(600→oversize), a(300), b(300), c(100) → bins
    # [a+c=400], [b=300] → 2 regular bins + 1 oversize
    s1 = by_group["s1"]
    assert sum(1 for b in s1 if b.oversize) == 1
    assert sum(1 for b in s1 if not b.oversize) == 2
    # s2: e fills a bin exactly; f starts another
    s2 = [b for b in by_group["s2"] if not b.oversize]
    assert sorted(b.total_tokens for b in s2) == [1, 512]


def test_pack_bins_deterministic_under_partitioning(spark):
    df = spark.range(200).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3)).alias("source"),
        (F.pmod(F.xxhash64("id"), F.lit(400)) + 1).alias("n_tok"),
    )

    def canon(frame):
        return sorted(
            (b.group, b.bin_id, b.n_docs, b.total_tokens, tuple(b.doc_ids))
            for b in frame.collect()
        )

    a = canon(pack_bins_ffd(df.repartition(1), capacity=512))
    b = canon(pack_bins_ffd(df.repartition(7), capacity=512))
    assert a == b
    # lower bound: n_bins >= ceil(total/capacity) per group
    import math

    per_group: dict[str, list] = {}
    for g, _bid, _n, tot, _ids in a:
        per_group.setdefault(g, []).append(tot)
    for g, tots in per_group.items():
        assert len(tots) >= math.ceil(sum(tots) / 512)


def test_pack_bins_sharded_bin_identity_unique(spark):
    """shards > 1 packs per (group, shard); the emitted shard column
    must keep (group, shard, bin_id) unique — bin_id alone repeats
    across shards — and conservation must still hold."""
    df = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.lit("s0").alias("source"),
        (F.pmod(F.xxhash64("id"), F.lit(700)) + 1).alias("n_tok"),
    )
    bins = pack_bins_ffd(df, capacity=512, shards=4).collect()
    assert {b.shard for b in bins} > {0}  # really packed per shard
    keys = [(b.group, b.shard, b.bin_id) for b in bins]
    assert len(keys) == len(set(keys))
    # bin_id alone DOES collide across shards (the bug the shard column fixes)
    assert len({(b.group, b.bin_id) for b in bins}) < len(bins)
    packed = sorted(d for b in bins for d in b.doc_ids)
    assert packed == sorted(f"d{i}" for i in range(300))
    for b in bins:
        assert b.oversize if b.total_tokens > 512 else b.total_tokens <= 512
    # unsharded output carries shard=0 for every bin
    assert {b.shard for b in pack_bins_ffd(df, capacity=512).collect()} == {0}


def test_driver_packing_row_self_verifies(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["seq_packing_bins"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.tokens_conserved and r.bins_within_capacity and r.meets_lower_bound
        assert 0 < r.fill_permille <= 1000

"""SFC kernels + clustering rewrite: correctness, pruning improvement,
scan equivalence, resume."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_engineering_poc_spark.lakehouse import (
    assert_scan_equivalent,
    write_token_table,
)
from feature_engineering_poc_spark.lakehouse.clustering import cluster, prune_files
from feature_engineering_poc_spark.plans.sfc import (
    hilbert_index,
    interleave_bits,
    string_prefix_ordinal,
)


def test_zorder_matches_slow_reference():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**16, 200).astype(np.uint64)
    b = rng.integers(0, 2**16, 200).astype(np.uint64)
    z = interleave_bits([a, b], 16)

    def slow(x, y):
        r = 0
        for i in range(16):
            r |= ((int(x) >> i) & 1) << (2 * i) | ((int(y) >> i) & 1) << (2 * i + 1)
        return r

    assert all(int(z[k]) == slow(a[k], b[k]) for k in range(200))


@pytest.mark.parametrize("dims,bits", [(2, 5), (3, 3)])
def test_hilbert_is_permutation_with_unit_steps(dims, bits):
    coords = np.array(list(itertools.product(range(2**bits), repeat=dims)), dtype=np.uint64)
    h = hilbert_index([coords[:, j] for j in range(dims)], bits)
    assert sorted(h.tolist()) == list(range((2**bits) ** dims))
    pts = coords[np.argsort(h)].astype(np.int64)
    steps = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    assert (steps == 1).all()  # the defining Hilbert locality property


def test_string_prefix_ordinal_order_preserving():
    xs = ["doc000000000001", "doc000000000999", "apple", "zebra", "", None]
    o = string_prefix_ordinal(xs)
    import pandas as pd

    trunc = pd.Series(xs).fillna("").astype(str).str.slice(0, 8)
    assert (np.argsort(o, kind="stable") == np.argsort(trunc.values, kind="stable")).all()


@pytest.mark.parametrize("curve", ["zorder", "hilbert"])
def test_cluster_rewrite_equivalence_and_pruning(spark, tmp_path, curve):
    t = write_token_table(spark, tmp_path / curve, n_rows=6000, files_per_source=8, max_tok=256)
    pre_sid = t.current_snapshot_id()
    m_before = t.manifest_df(spark)
    files_before = m_before.count()

    # baseline pruning power for an n_tok range predicate
    lo, hi = 16, 32
    pruned_before = prune_files(m_before, n_tok_range=(lo, hi)).count()

    result = cluster(spark, t, columns=("n_tok", "doc_id"), curve=curve,
                     target_file_bytes=48 * 1024)
    assert result["snapshot_id"] == pre_sid + 1

    # correctness: scan equivalence + snapshot isolation
    assert_scan_equivalent(t.scan(spark, pre_sid), t.scan(spark))

    m_after = t.manifest_df(spark)
    files_after = m_after.count()
    pruned_after = prune_files(m_after, n_tok_range=(lo, hi)).count()
    # clustering must tighten n_tok ranges: the SAME predicate selects a
    # smaller fraction of files than before
    frac_before = pruned_before / files_before
    frac_after = pruned_after / files_after
    assert frac_after < frac_before, (
        f"{curve}: pruning fraction did not improve "
        f"({frac_before:.2f} -> {frac_after:.2f})"
    )

    # pruned scan correctness: manifest-pruned file set yields the same
    # rows as the unpruned scan under the predicate
    surviving = [r.file_path for r in prune_files(m_after, n_tok_range=(lo, hi))
                 .select("file_path").collect()]
    via_pruned = (
        t.scan(spark, files=surviving).filter(F.col("n_tok").between(lo, hi)).count()
    )
    via_full = t.scan(spark).filter(F.col("n_tok").between(lo, hi)).count()
    assert via_pruned == via_full

    # zkey stats stamped in the manifest
    zrows = m_after.filter(F.col("min_zkey").isNotNull()).count()
    assert zrows == files_after


def test_cluster_resume(spark, tmp_path):
    t = write_token_table(spark, tmp_path / "resume", n_rows=2000, files_per_source=4, max_tok=64)
    with pytest.raises(RuntimeError, match="injected failure"):
        cluster(spark, t, curve="zorder", target_file_bytes=48 * 1024,
                job_id="clresume", _fail_after_units=1)
    assert t.current_snapshot_id() == 1
    result = cluster(spark, t, curve="zorder", target_file_bytes=48 * 1024, job_id="clresume")
    assert result["snapshot_id"] == 2
    assert_scan_equivalent(t.scan(spark, 1), t.scan(spark))


def test_mm3_hash_int_matches_spark(spark):
    """_partition_remap relies on reproducing Spark's murmur3 exactly;
    verify _mm3_hash_int against F.hash over a value sweep."""
    from feature_engineering_poc_spark.lakehouse.clustering import _mm3_hash_int

    vals = list(range(0, 200)) + [2**31 - 1, 12345678, 987654321]
    df = spark.createDataFrame([(v,) for v in vals], "v int").select(
        "v", F.hash("v").alias("h")
    )
    got = {r.v: r.h for r in df.collect()}
    for v in vals:
        assert _mm3_hash_int(v) == got[v], v


def test_partition_remap_places_buckets_exactly(spark):
    """repartition(n, remap[bucket]) must land bucket i in partition i —
    the property the sampling-free range placement depends on."""
    from pyspark.sql.functions import spark_partition_id

    from feature_engineering_poc_spark.lakehouse.clustering import _partition_remap

    for n in (2, 5, 8):
        remap = _partition_remap(n)
        assert len(set(remap)) == n
        df = spark.createDataFrame([(b, remap[b]) for b in range(n)], "bucket int, pid int")
        placed = df.repartition(n, "pid").select("bucket", spark_partition_id().alias("p"))
        assert {(r.bucket, r.p) for r in placed.collect()} == {(b, b) for b in range(n)}


def test_cluster_output_files_range_disjoint(spark, tmp_path):
    """The quantile-placed rewrite must keep what range partitioning
    guaranteed: per-file zkey envelopes that do not interleave (this is
    the file-pruning power the op exists for)."""
    t = write_token_table(spark, tmp_path / "disj", n_rows=4000, files_per_source=6, max_tok=128)
    cluster(spark, t, curve="zorder", target_file_bytes=32 * 1024)
    m = t.manifest_df(spark).select("partition", "min_zkey", "max_zkey").collect()
    by_part = {}
    for r in m:
        assert r.min_zkey is not None and r.max_zkey is not None
        by_part.setdefault(r.partition, []).append((r.min_zkey, r.max_zkey))
    for part, spans in by_part.items():
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            # adjacent files may share a boundary key value, never interleave
            assert hi1 <= lo2, (part, (lo1, hi1), (lo2, hi2))

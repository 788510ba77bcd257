"""Physical-plan assertions — the 100TB-readiness checks.

Verifies that the declarative plans actually compile to what we want
at scale: predicate pushdown into parquet scans, column pruning,
broadcast joins for small dims, minimal exchanges for windows, and a
shuffle-free binpack compaction job.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30.0).select("l_orderkey", "l_quantity")
    p = plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in p
    # pruned read schema: only the two referenced columns reach the scan
    assert "l_extendedprice" not in p.split("ReadSchema")[1]


def test_q5_uses_broadcast_joins(spark):
    import __spark_entry__ as m

    p = plan(m.q_q5_local_supplier(spark, SF_DIR))
    # broadcast the small dims (nation/region); AQE hides codegen spans
    # until the final plan, so only join strategy is asserted here
    assert "BroadcastHashJoin" in p


def test_q6_pushes_filters_into_scan(spark):
    """The canonical filter+agg probe: every predicate must reach the
    parquet scan as a pushed filter, and the read schema must carry
    only the referenced columns."""
    import __spark_entry__ as m

    p = plan(m.q_q6_forecast_revenue(spark, SF_DIR))
    pushed = p.split("PushedFilters")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    assert "l_orderkey" not in p.split("ReadSchema")[1].splitlines()[0]


def test_q10_broadcasts_nation(spark):
    import __spark_entry__ as m

    p = plan(m.q_q10_returned_items(spark, SF_DIR))
    assert "BroadcastHashJoin" in p  # 25-row nation never shuffles
    # returnflag filter reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in p


def test_q15_single_window_exchange_and_broadcast(spark):
    import __spark_entry__ as m

    p = plan(m.q_q15_top_supplier(spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in p  # supplier dim broadcast
    # the global-max window degenerates to ONE single-partition
    # exchange over the per-supplier aggregates, not a data shuffle
    assert p.count("Exchange SinglePartition") == 1


def test_window_single_exchange(spark):
    import __spark_entry__ as m

    p = plan(m.q_t8_rolling_window(spark, SF_DIR), "simple")
    # one hash exchange on user_id feeds the range-frame window; no more
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") == 1


def test_one_hot_single_projection(spark):
    """Batched one-hot must not stack one Project node per value."""
    from feature_engineering_poc_spark.operators import TransactionStatusDeriver

    df = spark.createDataFrame([("a", "x")], "id string, transactionstatus string")
    out = TransactionStatusDeriver({"status_values": [f"V{i}" for i in range(20)]})(df)
    p = plan(out, "simple")
    assert p.count("Project") <= 2


def test_scan_fingerprint_stays_jvm_side(spark):
    """The equivalence fingerprint must be pure codegen (no Python)."""
    from feature_engineering_poc_spark.lakehouse.equivalence import scan_fingerprint  # noqa: F401

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = li.select(F.xxhash64("l_orderkey").alias("h")).agg(F.expr("bit_xor(h)"))
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_binpack_compaction_plan_has_no_shuffle(spark, tmp_path):
    """The binpack rewrite job is one mapInPandas pass: no Exchange
    other than the initial round-robin of bin specs."""
    from feature_engineering_poc_spark.lakehouse import write_token_table
    from feature_engineering_poc_spark.plans.binpack import pack_bins

    t = write_token_table(spark, tmp_path / "t", n_rows=500, files_per_source=4, max_tok=32)
    m = t.manifest_df(spark).collect()
    bins = pack_bins([(r.file_path, r.file_bytes, r.record_count) for r in m if r.partition == "web"],
                     "web", 1 << 26)
    import json

    specs = [{"files": b.files, "partition": "web", "out": str(tmp_path / f"o{i}.parquet")}
             for i, b in enumerate(bins)]
    specs_df = spark.createDataFrame([(json.dumps(s),) for s in specs], "spec string")
    from feature_engineering_poc_spark.lakehouse.metadata import MANIFEST_SCHEMA

    # mirror the kernel plan shape: repartition + mapInPandas only
    shaped = specs_df.repartition(len(specs))
    p = plan(shaped, "simple")
    assert "Exchange hashpartitioning" not in p  # round-robin only
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_merge_probe_is_column_pruned(spark, tmp_path):
    """Phase-2 probe reads ONLY doc_id from candidate files."""
    from feature_engineering_poc_spark.lakehouse import write_token_table
    from feature_engineering_poc_spark.lakehouse.metadata import TOKEN_SCHEMA

    t = write_token_table(spark, tmp_path / "t2", n_rows=500, files_per_source=2, max_tok=32)
    files = t.data_files(spark)
    probe = (
        spark.read.schema(TOKEN_SCHEMA).parquet(*files)
        .select("doc_id", F.input_file_name().alias("file_path"))
    )
    p = plan(probe)
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "tokens" not in read_schema  # the heavy array column never leaves the scan


def test_q19_pushes_disjunction_and_broadcasts_part(spark):
    """Q19's OR-of-conjunctions: the part side broadcasts, and the
    part-only arms of the disjunction are pushed to the part scan
    (each OR arm prunes row groups independently)."""
    import __spark_entry__ as m

    p = plan(m.q_q19_discount_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    part_scan = [s for s in p.split("PushedFilters") if "p_brand" in s.split("]")[0]]
    assert part_scan, "no pushed filter mentioning p_brand on the part scan"
    pushed = part_scan[0].split("]")[0]
    assert "Or(" in pushed  # the disjunction itself reached the scan


def test_q13_left_outer_with_pushed_on_filter(spark):
    """The ON-clause orders filter must prune the orders SCAN (it
    cannot become a post-join WHERE without changing the outer-join
    semantics) and the join must stay LeftOuter."""
    import __spark_entry__ as m

    p = plan(m.q_q13_customer_distribution(spark, SF_DIR))
    assert "LeftOuter" in p
    assert "Not(EqualTo(o_orderpriority,4-NOT SPECIFIED))" in p


def test_q16_broadcast_anti_join_and_size_pushdown(spark):
    import __spark_entry__ as m

    p = plan(m.q_q16_parts_supplier(spark, SF_DIR))
    assert "LeftAnti" in p  # complaint-supplier exclusion is an anti join
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" not in p
    # the size IN-list reaches the part scan (element order is Spark's)
    assert "In(p_size, [" in p
    assert "Not(StringStartsWith(p_type,PROMO))" in p


def test_q21_exists_becomes_semi_and_anti_joins(spark):
    """Nested EXISTS / NOT EXISTS over lineitem self-references must
    plan as left-semi + left-anti joins — never correlated per-row
    re-execution."""
    import __spark_entry__ as m

    p = plan(m.q_q21_suppliers_waiting(spark, SF_DIR), "simple")
    assert "LeftSemi" in p
    assert "LeftAnti" in p

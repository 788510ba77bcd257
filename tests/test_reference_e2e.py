"""Replay of the reference's END-TO-END job spec — which the reference
itself ships DISABLED (runner/JobRunnerSpec.scala:150 is `ignore`d).

Same 5 golden transactions (JobRunnerSpec.scala:25-31), same three
transformers with the same params (:95-108), same assertions
(:186-219: row count, added columns, txn-level values, Sunday=1).
Run here through our jobs/run_job.py CLI with JSON configs.
"""

from __future__ import annotations

import datetime as dt
import json
import sys

import pytest

GOLDEN_ROWS = [
    ("txn1", "user1", dt.datetime(2023, 1, 15, 10, 30), 1200.0, "DEBIT", "ATM", "Dining"),
    ("txn2", "user2", dt.datetime(2023, 1, 15, 11, 0), 300.0, "CREDIT", "MOBILE_BANKING", "Groceries"),
    ("txn3", "user1", dt.datetime(2023, 1, 16, 14, 0), 450.0, "DEBIT", "POS", "Shopping"),
    ("txn4", "user3", dt.datetime(2023, 1, 16, 18, 0), 600.0, "DEBIT", "ATM", "Cash Withdrawal"),
    ("txn5", "user2", dt.datetime(2023, 1, 17, 9, 0), 20.0, "DEBIT", "UPI_OTHER", "Travel"),
]
SCHEMA = (
    "transaction_id string, user_id string, transactiondatetime timestamp, "
    "transactionamount double, creditdebitindicator string, "
    "transactionchannel string, jupiterfinegraincategory string"
)


@pytest.fixture()
def e2e_paths(spark, tmp_path):
    input_path = str(tmp_path / "input_data" / "transactions.parquet")
    spark.createDataFrame(GOLDEN_ROWS, SCHEMA).write.mode("overwrite").parquet(input_path)
    catalog = tmp_path / "source_catalog"
    catalog.mkdir()
    (catalog / "transaction_source.json").write_text(json.dumps({
        "name": "integration_test_transactions",
        "version": "v1",
        "type": "parquet",
        "entity": "transaction",
        "location": input_path,
        "fields": [
            {"name": n, "type": t} for n, t in [
                ("transaction_id", "string"), ("user_id", "string"),
                ("transactiondatetime", "timestamp"), ("transactionamount", "double"),
                ("creditdebitindicator", "string"), ("transactionchannel", "string"),
                ("jupiterfinegraincategory", "string"),
            ]
        ],
        "metadata": {"created_by": "integration_test_setup"},
    }))
    out_path = str(tmp_path / "output_data.delta")
    job = {
        "job_name": "Integration Test Job",
        "input_source": {"name": "integration_test_transactions", "version": "v1"},
        "feature_transformers": [
            {"name": "TransactionIndicatorDeriver", "params": {}},
            {"name": "TransactionValueDeriver",
             "params": {"input_col": "transactionamount", "output_col": "is_high_value",
                        "high_value_threshold": 500.0}},
            {"name": "TransactionDatetimeDeriver",
             "params": {"transaction_timestamp_col": "transactiondatetime",
                        "output_col_hour": "tx_hour",
                        "output_col_day_of_week": "tx_day_of_week"}},
        ],
        "output_sink": {"sink_type": "delta", "path": out_path, "mode": "overwrite",
                        "options": {"optionA": "valueA", "optionB": True, "optionC": 123}},
    }
    job_path = tmp_path / "job_config.json"
    job_path.write_text(json.dumps(job))
    return str(job_path), str(catalog), out_path


def test_reference_e2e_job(spark, e2e_paths):
    job_path, catalog, out_path = e2e_paths
    sys.path.insert(0, "/root/repo/jobs")
    import run_job

    assert run_job.main(["--job-config", job_path, "--source-catalog", catalog]) == 0

    out = spark.read.parquet(out_path)
    assert out.count() == 5  # JobRunnerSpec.scala:187

    cols = {c.lower() for c in out.columns}
    assert {
        "transaction_id", "user_id", "transactiondatetime", "transactionamount",
        "creditdebitindicator", "transactionchannel", "jupiterfinegraincategory",
        "is_credit", "is_debit", "is_high_value", "tx_hour", "tx_day_of_week",
    } <= cols  # :191-198

    rows = {r.transaction_id: r for r in out.collect()}
    assert rows["txn2"].is_credit is True and rows["txn2"].is_debit is False  # :205-207
    assert rows["txn1"].is_high_value is True  # :210-211
    assert rows["txn2"].is_high_value is False  # :214-215
    assert rows["txn1"].tx_hour == 10 and rows["txn1"].tx_day_of_week == 1  # :218-219 Sunday

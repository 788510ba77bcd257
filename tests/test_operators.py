"""Reference-parity tests for transformers T1-T10 + factory + runner.

Golden scenarios replay the reference's spec
(features/TransactionTransformersSpec.scala): null propagation (:87),
Sunday=1 dayofweek (:132-134), 2-day inclusive range window
(:316-360), per-month window counts (:369-392), categorical pivot with
null category (:400-439).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from feature_engineering_poc_spark.operators import (
    get_transformer,
    run_pipeline,
)
from feature_engineering_poc_spark.operators.params import (
    get_double_param,
    get_string_list_param,
    get_string_param,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_param_utils_silent_default_on_wrong_type():
    # parity: TransactionTransformersSpec.scala:32,45,51
    assert get_string_param({"k": 5}, "k", "d") == "d"
    assert get_double_param({"k": "x"}, "k", 1.5) == 1.5
    assert get_double_param({"k": 3}, "k", 1.5) == 3.0
    assert get_string_list_param({"k": [1, 2]}, "k", ["a"]) == ["a"]
    assert get_string_list_param({"k": ["x"]}, "k", ["a"]) == ["x"]


def test_indicator_deriver_with_null_propagation(spark):
    df = spark.createDataFrame(
        [("t1", "CREDIT"), ("t2", "debit"), ("t3", "OTHER"), ("t4", None)],
        "transaction_id string, creditdebitindicator string",
    )
    out = get_transformer("TransactionIndicatorDeriver")(df).collect()
    by_id = {r.transaction_id: r for r in out}
    assert by_id["t1"].is_credit is True and by_id["t1"].is_debit is False
    assert by_id["t2"].is_credit is False and by_id["t2"].is_debit is True  # case-insensitive
    assert by_id["t3"].is_credit is False and by_id["t3"].is_debit is False
    assert by_id["t4"].is_credit is None and by_id["t4"].is_debit is None  # null propagates


def test_datetime_deriver_sunday_is_1(spark):
    df = spark.createDataFrame(
        [("t1", ts("2023-01-01 15:30:00")), ("t2", ts("2023-01-02 03:00:00"))],
        "id string, transactiontimestamp timestamp",
    )
    out = {r.id: r for r in get_transformer("TransactionDatetimeDeriver")(df).collect()}
    assert out["t1"].transaction_hour == 15
    assert out["t1"].transaction_day_of_week == 1  # 2023-01-01 is a Sunday
    assert out["t2"].transaction_day_of_week == 2


def test_one_hot_derivers(spark):
    df = spark.createDataFrame(
        [("t1", "success"), ("t2", "FAILURE"), ("t3", "weird"), ("t4", None)],
        "id string, transactionstatus string",
    )
    out = {r.id: r for r in get_transformer("TransactionStatusDeriver")(df).collect()}
    assert out["t1"].transaction_status_SUCCESS is True
    assert out["t2"].transaction_status_FAILURE is True
    assert out["t3"].transaction_status_SUCCESS is False
    assert out["t4"].transaction_status_SUCCESS is None


def test_one_hot_name_sanitization(spark):
    df = spark.createDataFrame([("t1", "UPI OTHER!")], "id string, transactionchannel string")
    out = get_transformer(
        "TransactionChannelDeriver", {"channel_values": ["UPI OTHER!"]}
    )(df)
    assert "transaction_channel_UPIOTHER" in out.columns
    assert out.collect()[0].transaction_channel_UPIOTHER is True


def test_channel_mode_category_deriver_defaults(spark):
    # T4/T6/T7 default value lists (TransactionTransformers.scala:112,154,177)
    df = spark.createDataFrame(
        [("t1", "atm", "upi", "TRAVEL")],
        "id string, transactionchannel string, transactionmode string, merchantcategory string",
    )
    out = get_transformer("TransactionCategoryDeriver")(
        get_transformer("TransactionModeDeriver")(
            get_transformer("TransactionChannelDeriver")(df)
        )
    )
    row = out.collect()[0]
    assert row.transaction_channel_ATM is True
    assert row.transaction_channel_INTERNET_BANKING is False
    assert row.transaction_mode_UPI is True and row.transaction_mode_CARD is False
    assert row.transaction_category_TRAVEL is True
    assert {
        "transaction_channel_BRANCH", "transaction_channel_POS",
        "transaction_channel_MOBILE_BANKING", "transaction_mode_CASH",
        "transaction_mode_TRANSFER", "transaction_mode_CHEQUE",
        "transaction_category_GROCERIES", "transaction_category_UTILITIES",
        "transaction_category_ENTERTAINMENT", "transaction_category_HEALTHCARE",
    } <= set(out.columns)


def test_value_deriver_threshold(spark):
    df = spark.createDataFrame(
        [("t1", 1500.0), ("t2", 1000.0), ("t3", None)],
        "id string, transactionamount double",
    )
    out = {r.id: r for r in get_transformer("TransactionValueDeriver")(df).collect()}
    assert out["t1"].is_high_value_transaction is True
    assert out["t2"].is_high_value_transaction is False  # strictly greater
    assert out["t3"].is_high_value_transaction is None


def test_user_spend_aggregator_2day_range_window(spark):
    # golden scenario: TransactionTransformersSpec.scala:316-360
    df = spark.createDataFrame(
        [
            ("u1", ts("2023-01-01 10:00:00"), 10.0),
            ("u1", ts("2023-01-02 10:00:00"), 20.0),
            ("u1", ts("2023-01-03 10:00:00"), 30.0),
            ("u1", ts("2023-01-04 10:00:00"), 40.0),
            ("u2", ts("2023-01-01 10:00:00"), 5.0),
        ],
        "user string, ts timestamp, amount double",
    )
    out = get_transformer(
        "UserSpendAggregator",
        {
            "user_id_col": "user",
            "transaction_amount_col": "amount",
            "transaction_date_col": "ts",
            "window_days": 2,
            "output_col_prefix": "user_agg",
        },
    )(df)
    rows = {(r.user, r.ts.isoformat()): r for r in out.collect()}
    r = rows[("u1", "2023-01-03T10:00:00")]
    assert (r.user_agg_sum_2d, r.user_agg_avg_2d, r.user_agg_count_2d) == (60.0, 20.0, 3)
    r = rows[("u1", "2023-01-04T10:00:00")]
    assert (r.user_agg_sum_2d, r.user_agg_avg_2d, r.user_agg_count_2d) == (90.0, 30.0, 3)
    r = rows[("u2", "2023-01-01T10:00:00")]
    assert (r.user_agg_sum_2d, r.user_agg_avg_2d, r.user_agg_count_2d) == (5.0, 5.0, 1)


def test_user_monthly_transaction_counter(spark):
    # golden scenario: TransactionTransformersSpec.scala:369-392
    df = spark.createDataFrame(
        [
            ("u1", ts("2023-01-10 10:00:00")),
            ("u1", ts("2023-01-20 10:00:00")),
            ("u1", ts("2023-02-05 10:00:00")),
            ("u2", ts("2023-01-15 10:00:00")),
        ],
        "userid string, transactiondate timestamp",
    )
    out = get_transformer("UserMonthlyTransactionCounter")(df)
    assert out.schema["user_monthly_transaction_count"].dataType == T.LongType()
    got = sorted(
        (r.userid, r.transactiondate.isoformat(), r.user_monthly_transaction_count)
        for r in out.collect()
    )
    assert got == [
        ("u1", "2023-01-10T10:00:00", 2),
        ("u1", "2023-01-20T10:00:00", 2),
        ("u1", "2023-02-05T10:00:00", 1),
        ("u2", "2023-01-15T10:00:00", 1),
    ]


def test_user_categorical_spend_aggregator(spark):
    # golden scenario: TransactionTransformersSpec.scala:400-439 (null category row)
    df = spark.createDataFrame(
        [
            ("u1", "catA", 10.0),
            ("u1", "catA", 20.0),
            ("u1", "catB", 5.0),
            ("u2", "catA", 100.0),
            ("u2", "catC", 50.0),
            ("u1", None, 1.0),
        ],
        "userid string, category string, transactionamount double",
    )
    out = get_transformer(
        "UserCategoricalSpendAggregator",
        {"category_col": "category", "output_col_prefix": "user_spend_cat"},
    )(df)
    for c in ("user_spend_cat_CATA_sum", "user_spend_cat_CATB_sum", "user_spend_cat_CATC_sum"):
        assert c in out.columns
    u1 = out.filter("userid = 'u1'").select(
        "user_spend_cat_CATA_sum", "user_spend_cat_CATB_sum", "user_spend_cat_CATC_sum"
    ).distinct().collect()[0]
    assert tuple(u1) == (30.0, 5.0, 0.0)
    u2 = out.filter("userid = 'u2'").select(
        "user_spend_cat_CATA_sum", "user_spend_cat_CATB_sum", "user_spend_cat_CATC_sum"
    ).distinct().collect()[0]
    assert tuple(u2) == (100.0, 0.0, 50.0)


def test_categorical_aggregator_explicit_values_no_action(spark):
    df = spark.createDataFrame([("u1", "catA", 1.0)], "userid string, category string, transactionamount double")
    out = get_transformer(
        "UserCategoricalSpendAggregator",
        {"category_col": "category", "category_values": ["catA", "catZ"]},
    )(df)
    row = out.collect()[0]
    assert row.user_category_spend_CATA_sum == 1.0
    assert row.user_category_spend_CATZ_sum == 0.0


def test_factory_unknown_name():
    with pytest.raises(ValueError, match="Unknown transformer"):
        get_transformer("NopeDeriver")


def test_run_pipeline_chain_and_error_context(spark):
    df = spark.createDataFrame(
        [("t1", "CREDIT", 2000.0, ts("2023-01-01 10:00:00"))],
        "transaction_id string, creditdebitindicator string, "
        "transactionamount double, transactiontimestamp timestamp",
    )
    out = run_pipeline(
        df,
        [
            {"name": "TransactionIndicatorDeriver"},
            {"name": "TransactionValueDeriver", "params": {"high_value_threshold": 500.0}},
            {"name": "TransactionDatetimeDeriver"},
        ],
    ).collect()[0]
    assert out.is_credit is True and out.is_high_value_transaction is True
    assert out.transaction_hour == 10

    with pytest.raises(ValueError, match="Unknown transformer"):
        run_pipeline(df, [{"name": "Missing"}])

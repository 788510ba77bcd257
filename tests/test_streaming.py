"""Streaming: file-source incremental pipeline equals the batch plan."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from feature_engineering_poc_spark.streaming import (
    read_parquet_stream,
    run_available_now,
    sessionized_counts,
    windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(Path(SF_DIR) / "events.parquet", d / "part-0.parquet")
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    stream = read_parquet_stream(spark, events_dir)
    assert stream.isStreaming
    run_available_now(windowed_event_counts(stream, window="1 hour"), "win_counts")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("win_counts").collect()
    }
    batch = spark.read.parquet(events_dir)
    expect = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(batch, window="1 hour").collect()
    }
    assert got == expect and len(got) > 0


def test_sessionized_counts_runs(spark, events_dir):
    stream = read_parquet_stream(spark, events_dir)
    run_available_now(sessionized_counts(stream, gap="10 minutes"), "sessions")
    rows = spark.table("sessions").collect()
    assert len(rows) > 0
    assert all(r.session_end > r.session_start for r in rows)
    # session integrity: per-user event totals preserved
    total = sum(r.n_events for r in rows)
    assert total == spark.read.parquet(events_dir).count()

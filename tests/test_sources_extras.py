"""Quality-check execution, incremental reads, stateful streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_engineering_poc_spark.sources.incremental import read_new_files
from feature_engineering_poc_spark.sources.quality import (
    QualityCheckError,
    run_quality_checks,
)


@pytest.fixture()
def qdf(spark):
    return spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, -5.0), (None, 2, 50.0), ("d", 4, 2000.0)],
        "id string, k int, amount double",
    )


def test_quality_checks_pass_and_fail(spark, qdf):
    results = run_quality_checks(
        qdf,
        [{"column": "k", "checks": [{"type": "min", "value": 0}]}],
        strict=True,
    )
    assert [r.violations for r in results] == [0]

    with pytest.raises(QualityCheckError) as exc:
        run_quality_checks(
            qdf,
            [
                {"column": "id", "checks": [{"type": "not_null"}]},
                {"column": "k", "checks": [{"type": "unique"}]},
                {"column": "amount", "checks": [{"type": "min", "value": 0.0},
                                                {"type": "max", "value": 1000.0}]},
            ],
        )
    got = {(v["column"], v["check"]): v["violations"] for v in exc.value.violations}
    assert got == {("id", "not_null"): 1, ("k", "unique"): 2,
                   ("amount", "min"): 1, ("amount", "max"): 1}


def test_quality_checks_allowed_values_and_regex(spark, qdf):
    res = run_quality_checks(
        qdf,
        [{"column": "id", "checks": [{"type": "allowed_values", "values": ["a", "b"]},
                                     {"type": "matches_regex", "pattern": "^[a-z]$"}]}],
        strict=False,
    )
    got = {(r.column, r.check): r.violations for r in res}
    assert got[("id", "allowed_values")] == 1  # 'd' (null doesn't count)
    assert got[("id", "matches_regex")] == 0


def test_quality_checks_wired_into_reader(spark, tmp_path):
    from feature_engineering_poc_spark.config import SourceDefinition
    from feature_engineering_poc_spark.sources import read_source

    path = str(tmp_path / "q")
    spark.createDataFrame([("x", None)], "id string, v double").write.parquet(path)
    sd = SourceDefinition(
        name="q", version="1", type="parquet", location=path,
        quality_checks=[{"column": "v", "checks": [{"type": "not_null"}]}],
    )
    read_source(spark, sd)  # declared-only (reference behaviour): no execution
    with pytest.raises(QualityCheckError):
        read_source(spark, sd, run_quality=True)


def test_incremental_read_commits_offsets(spark, tmp_path):
    data_dir = tmp_path / "inc"
    ckpt = tmp_path / "state.json"
    spark.range(10).write.mode("append").parquet(str(data_dir))

    df1, new1, commit1 = read_new_files(spark, data_dir, ckpt)
    assert df1.count() == 10 and len(new1) >= 1
    # crash before commit → same batch again
    df1b, new1b, commit1b = read_new_files(spark, data_dir, ckpt)
    assert sorted(new1b) == sorted(new1)
    commit1b()

    # nothing new
    df2, new2, _ = read_new_files(spark, data_dir, ckpt)
    assert df2 is None and new2 == []

    # append more → only the delta
    spark.range(100, 105).write.mode("append").parquet(str(data_dir))
    df3, new3, commit3 = read_new_files(spark, data_dir, ckpt)
    assert df3.count() == 5
    assert set(r.id for r in df3.collect()) == {100, 101, 102, 103, 104}
    commit3()


def test_stateful_user_profiles_stream(spark, tmp_path):
    import shutil
    from pathlib import Path

    from feature_engineering_poc_spark.streaming import read_parquet_stream
    from feature_engineering_poc_spark.streaming.stateful import user_profiles_stateful
    from tests.conftest import SF_DIR

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(Path(SF_DIR) / "events.parquet", d / "p0.parquet")
    stream = read_parquet_stream(spark, str(d))
    out = user_profiles_stateful(stream)
    q = (
        out.writeStream.format("memory").queryName("profiles")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.user_id: r for r in spark.table("profiles").collect()}
    batch = spark.read.parquet(str(d))
    expect = {
        r.user_id: r
        for r in batch.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("s"), F.max("ts").alias("m")
        ).collect()
    }
    assert set(got) == set(expect)
    for uid, e in expect.items():
        g = got[uid]
        assert g.n_events == e.n
        assert abs(g.sum_value - e.s) < 1e-6
        assert g.last_ts == e.m


def test_delta_source_with_log_resolves_live_files(spark, tmp_path):
    """A real Delta table directory (has _delta_log) is resolved by JSON
    log replay: removed/overwritten files must NOT appear in the scan.
    Protocol shape per the public Delta PROTOCOL.md."""
    import json

    from feature_engineering_poc_spark.config import SourceDefinition
    from feature_engineering_poc_spark.sources import read_source

    root = tmp_path / "dtab"
    root.mkdir()
    spark.createDataFrame([(1, "live")], "id int, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "_stage_live"))
    spark.createDataFrame([(2, "dead")], "id int, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "_stage_dead"))
    import shutil

    live_name, dead_name = "part-live.parquet", "part-dead.parquet"
    for stage, name in (("_stage_live", live_name), ("_stage_dead", dead_name)):
        src = next((root / stage).glob("*.parquet"))
        shutil.move(str(src), str(root / name))
        shutil.rmtree(root / stage)

    log = root / "_delta_log"
    log.mkdir()
    (log / "00000000000000000000.json").write_text(
        json.dumps({"add": {"path": live_name}}) + "\n"
        + json.dumps({"add": {"path": dead_name}}) + "\n"
    )
    (log / "00000000000000000001.json").write_text(
        json.dumps({"remove": {"path": dead_name}}) + "\n"
    )

    sd = SourceDefinition(name="d", version="1", type="delta", location=str(root))
    out = read_source(spark, sd)
    rows = [(r["id"], r["v"]) for r in out.collect()]
    assert rows == [(1, "live")]


def test_delta_source_with_checkpoint_fails_fast(spark, tmp_path):
    import json

    from feature_engineering_poc_spark.config import SourceDefinition
    from feature_engineering_poc_spark.sources import read_source

    root = tmp_path / "dtab"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    (log / "_last_checkpoint").write_text(json.dumps({"version": 10}))
    sd = SourceDefinition(name="d", version="1", type="delta", location=str(root))
    with pytest.raises(ValueError, match="checkpoint"):
        read_source(spark, sd)


def test_delta_source_reader_v2_protocol_fails_fast(spark, tmp_path):
    """A protocol action declaring minReaderVersion > 1 or any
    readerFeatures (deletion vectors, column mapping, ...) means plain
    add/remove replay would silently return wrong rows/columns — the
    reader must refuse, exactly like the checkpoint guard."""
    import json

    from feature_engineering_poc_spark.config import SourceDefinition
    from feature_engineering_poc_spark.sources import read_source

    for proto in (
        {"minReaderVersion": 3, "minWriterVersion": 7,
         "readerFeatures": ["deletionVectors"]},
        {"minReaderVersion": 2, "minWriterVersion": 5},
    ):
        root = tmp_path / f"dtab{proto['minReaderVersion']}"
        log = root / "_delta_log"
        log.mkdir(parents=True)
        (log / "00000000000000000000.json").write_text(
            json.dumps({"protocol": proto}) + "\n"
            + json.dumps({"add": {"path": "part-0.parquet"}}) + "\n"
        )
        sd = SourceDefinition(name="d", version="1", type="delta", location=str(root))
        with pytest.raises(ValueError, match="protocol"):
            read_source(spark, sd)


def test_delta_source_reader_v1_protocol_is_fine(spark, tmp_path):
    import json

    from feature_engineering_poc_spark.config import SourceDefinition
    from feature_engineering_poc_spark.sources import read_source

    root = tmp_path / "dtab_v1"
    root.mkdir()
    spark.createDataFrame([(1, "x")], "id int, v string").coalesce(1).write.parquet(
        str(root / "_stage")
    )
    import shutil

    f = next((root / "_stage").glob("*.parquet"))
    shutil.move(str(f), str(root / "part-0.parquet"))
    shutil.rmtree(root / "_stage")
    log = root / "_delta_log"
    log.mkdir()
    (log / "00000000000000000000.json").write_text(
        json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
        + "\n"
        + json.dumps({"add": {"path": "part-0.parquet"}}) + "\n"
    )
    sd = SourceDefinition(name="d", version="1", type="delta", location=str(root))
    assert read_source(spark, sd).count() == 1


def test_plain_delta_dir_without_log_reads_parquet(spark, tmp_path):
    """Our own sink's delta→parquet output has no _delta_log; plain
    parquet read remains correct for it."""
    from feature_engineering_poc_spark.config import SourceDefinition
    from feature_engineering_poc_spark.sources import read_source

    root = tmp_path / "plain"
    spark.createDataFrame([(1,), (2,)], "id int").write.parquet(str(root))
    sd = SourceDefinition(name="p", version="1", type="delta", location=str(root))
    assert read_source(spark, sd).count() == 2

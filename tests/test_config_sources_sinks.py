"""Config loaders, source reader cascade, schema validation, sinks, job CLI.

Mirrors the reference's config/source specs (JobConfigLoaderSpec,
SourceRegistrySpec, DatabricksSparkSourceSpec, JobRunnerSpec e2e).
"""

from __future__ import annotations

import json

import pytest

from feature_engineering_poc_spark.config import (
    SourceDefinition,
    load_job_config,
    load_source_registry,
)
from feature_engineering_poc_spark.config.models import ConfigDecodeError
from feature_engineering_poc_spark.sinks import write_sink
from feature_engineering_poc_spark.config.models import OutputSink
from feature_engineering_poc_spark.sources import SchemaValidationError, read_source

VALID_JOB = {
    "job_name": "test_job",
    "input_source": {"name": "src1", "version": "1"},
    "feature_transformers": [
        {"name": "TransactionIndicatorDeriver", "params": {}},
        {"name": "TransactionValueDeriver", "params": {"high_value_threshold": 500.0}},
    ],
    "output_sink": {"sink_type": "parquet", "path": "/tmp/out", "mode": "overwrite"},
}


def test_load_valid_job_config(tmp_path):
    p = tmp_path / "job.json"
    p.write_text(json.dumps(VALID_JOB))
    job = load_job_config(p)
    assert job.input_source.name == "src1"
    assert [t.name for t in job.feature_transformers] == [
        "TransactionIndicatorDeriver",
        "TransactionValueDeriver",
    ]
    assert job.output_sink.mode == "overwrite"


def test_job_config_missing_required_field(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"feature_transformers": []}))
    with pytest.raises(ConfigDecodeError, match="input_source"):
        load_job_config(p)


def test_job_config_circe_defaults(tmp_path):
    """Models.scala:141-147: only input_source is required; transformers
    default to [] and the sink to display."""
    p = tmp_path / "min.json"
    p.write_text(json.dumps({"input_source": {"name": "x"}}))
    job = load_job_config(p)
    assert job.feature_transformers == []
    assert job.output_sink.sink_type == "display"


def test_output_sink_nested_reference_form():
    """The reference nests params under output_sink.config
    (sample_job_config.json / Models.scala OutputSinkConfig)."""
    sink = OutputSink.from_dict({
        "sink_type": "delta_table",
        "config": {
            "path": "/mnt/x", "mode": "append", "num_rows": 50,
            "partition_by": ["country_code"], "options": {"mergeSchema": "true"},
        },
    })
    assert sink.path == "/mnt/x" and sink.mode == "append"
    assert sink.partition_by == ["country_code"]
    assert sink.options["mergeSchema"] == "true" and sink.options["num_rows"] == 50


def test_job_config_malformed_json(tmp_path):
    p = tmp_path / "malformed.json"
    p.write_text("{not json")
    with pytest.raises(json.JSONDecodeError):
        load_job_config(p)


def test_job_config_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_job_config(tmp_path / "nope.json")


def test_source_registry_recursive_walk_and_versions(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.json").write_text(
        json.dumps({"name": "s1", "version": "1", "type": "parquet", "location": "/x"})
    )
    (tmp_path / "sub" / "b.json").write_text(
        json.dumps({"name": "s1", "version": "2", "type": "parquet", "location": "/y"})
    )
    reg = load_source_registry(tmp_path)
    assert len(reg) == 2
    assert reg.get("s1", "1").location == "/x"
    assert reg.get("s1").version == "2"  # latest when unversioned
    assert reg.get("missing") is None


def test_source_registry_empty_and_missing_dir(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    assert len(load_source_registry(empty)) == 0
    with pytest.raises(FileNotFoundError):
        load_source_registry(tmp_path / "nope")


def test_source_registry_first_parse_error_aborts(tmp_path):
    (tmp_path / "good.json").write_text(
        json.dumps({"name": "s1", "version": "1", "type": "parquet"})
    )
    (tmp_path / "bad.json").write_text("{broken")
    with pytest.raises(json.JSONDecodeError):
        load_source_registry(tmp_path)


@pytest.fixture()
def kv_parquet(spark, tmp_path):
    # FIXTURES.md §F4 generic_kv golden rows
    df = spark.createDataFrame(
        [
            ("1", "alpha", 10.5, "2023-01-01"),
            ("2", "beta", 20.0, "2023-01-02"),
            ("3", "gamma", 30.5, "2023-01-03"),
        ],
        "id string, name string, value double, event_date string",
    ).selectExpr("id", "name", "value", "cast(event_date as date) event_date")
    path = str(tmp_path / "kv")
    df.write.parquet(path)
    return path


def test_read_source_location_scan(spark, kv_parquet):
    sd = SourceDefinition(name="kv", version="1", type="parquet", location=kv_parquet)
    df = read_source(spark, sd)
    assert df.count() == 3


def test_read_source_delta_location_offline(spark, tmp_path):
    """A .delta-suffixed location reads offline via the same
    delta→parquet mapping the sink documents (parity:
    DatabricksSparkSource.scala:57-58 defaults unknown types to delta)."""
    path = str(tmp_path / "events.delta")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(path)
    # explicit type=delta AND inferred-from-suffix both work
    for sd in (
        SourceDefinition(name="ev", version="1", type="delta", location=path),
        SourceDefinition(name="ev", version="1", type="unknown_fmt", location=path),
    ):
        assert read_source(spark, sd).count() == 2


def test_read_source_query(spark, kv_parquet):
    spark.read.parquet(kv_parquet).createOrReplaceTempView("kv_view")
    sd = SourceDefinition.from_dict(
        {"name": "kv", "version": "1", "type": "table",
         "config": {"query": "SELECT * FROM kv_view WHERE value > 15.0"}}
    )
    assert read_source(spark, sd).count() == 2  # spec :168-172


def test_read_source_table(spark, kv_parquet):
    spark.read.parquet(kv_parquet).createOrReplaceTempView("kv_table")
    sd = SourceDefinition.from_dict(
        {"name": "kv", "version": "1", "type": "table", "config": {"table": "kv_table"}}
    )
    assert read_source(spark, sd).count() == 3


def test_read_source_schema_presence_validation(spark, kv_parquet):
    sd = SourceDefinition(
        name="kv", version="1", type="parquet", location=kv_parquet,
        fields=[{"name": "ID", "type": "string"}, {"name": "nonexistent", "type": "string"}],
    )
    with pytest.raises(SchemaValidationError, match="nonexistent"):
        read_source(spark, sd)
    # case-insensitive presence passes
    sd.fields = [{"name": "ID", "type": "string"}, {"name": "Value", "type": "double"}]
    assert read_source(spark, sd).count() == 3


def test_read_source_type_check_opt_in(spark, kv_parquet):
    sd = SourceDefinition(
        name="kv", version="1", type="parquet", location=kv_parquet,
        fields=[{"name": "value", "type": "string"}],
    )
    read_source(spark, sd)  # presence-only passes (reference behaviour)
    with pytest.raises(SchemaValidationError, match="value"):
        read_source(spark, sd, check_types=True)


def test_read_source_no_config_error(spark):
    sd = SourceDefinition(name="kv", version="1", type="parquet")
    with pytest.raises(ValueError, match="no query, table, or location"):
        read_source(spark, sd)


def test_sink_parquet_with_partition_by(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sink = OutputSink(sink_type="delta_table", path=str(tmp_path / "out"),
                      mode="overwrite", partition_by=["k"])
    write_sink(df, sink)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 2
    assert {r.k for r in back.select("k").collect()} == {"a", "b"}


def test_sink_unknown_type(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="unsupported sink"):
        write_sink(df, OutputSink(sink_type="kafka"))
    write_sink(df, OutputSink(sink_type="kafka"), strict=False)  # warn-only parity


def test_job_cli_end_to_end(spark, tmp_path, kv_parquet):
    """Replays the reference's (ignored) e2e JobRunnerSpec through our CLI main."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    import run_job

    catalog = tmp_path / "catalog"
    catalog.mkdir()
    (catalog / "txn.json").write_text(json.dumps({
        "name": "txns", "version": "1", "type": "parquet", "location": kv_parquet,
    }))
    out_path = str(tmp_path / "job_out")
    job = {
        "input_source": {"name": "txns", "version": "1"},
        "feature_transformers": [
            {"name": "TransactionValueDeriver",
             "params": {"input_col": "value", "output_col": "is_big", "high_value_threshold": 15.0}},
        ],
        "output_sink": {"sink_type": "parquet", "path": out_path, "mode": "overwrite"},
    }
    jp = tmp_path / "job.json"
    jp.write_text(json.dumps(job))
    rc = run_job.main(["--job-config", str(jp), "--source-catalog", str(catalog),
                       "--parallelism", "8"])
    assert rc == 0
    back = spark.read.parquet(out_path)
    assert back.count() == 3
    assert {r.is_big for r in back.collect()} == {True, False}


def test_sink_display(spark, capsys):
    # K2 parity: show(n, truncate) with option defaults (JobRunner.scala:168-173)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    write_sink(df, OutputSink(sink_type="display", options={"num_rows": 1}))
    out = capsys.readouterr().out
    assert "only showing top 1 row" in out and "k" in out


def test_sink_display_string_truncate_false(spark, capsys):
    # 'false' as a STRING option must not truncate (bool('false') is True)
    wide = spark.createDataFrame([("x" * 40,)], "k string")
    write_sink(wide, OutputSink(sink_type="display",
                                options={"num_rows": 1, "truncate": "false"}))
    out = capsys.readouterr().out
    assert "x" * 40 in out  # full value shown, not 'xxxxxxxxxxxxxxxxx...'


def test_job_cli_filter_condition(spark, tmp_path, kv_parquet):
    """load_params.filter_condition (sample_job_config.json) is applied
    as a post-read predicate."""
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    import run_job

    catalog = tmp_path / "catalog"
    catalog.mkdir()
    (catalog / "txn.json").write_text(json.dumps({
        "name": "txns", "version": "1", "type": "parquet", "location": kv_parquet,
    }))
    out_path = str(tmp_path / "filtered_out")
    job = {
        "input_source": {"name": "txns", "version": "1",
                         "load_params": {"filter_condition": "value > 15.0"}},
        "feature_transformers": [],
        "output_sink": {"sink_type": "parquet",
                        "config": {"path": out_path, "mode": "overwrite"}},
    }
    jp = tmp_path / "job.json"
    jp.write_text(json.dumps(job))
    rc = run_job.main(["--job-config", str(jp), "--source-catalog", str(catalog),
                       "--parallelism", "8"])
    assert rc == 0
    back = spark.read.parquet(out_path)
    assert back.count() == 2  # rows 20.0 and 30.5; 10.5 filtered out

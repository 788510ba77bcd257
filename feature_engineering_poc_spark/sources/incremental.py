"""Incremental source reads — makes the reference's dead flag real.

The reference declares ``config.incremental`` (config/Models.scala:51)
but never consumes it (SURVEY.md §2.2). Here an incremental read
returns ONLY files added since the last committed offset, tracked in a
JSON state file next to the checkpoint — the batch analog of
Structured Streaming's file source (which streaming/pipeline.py
provides with Trigger.AvailableNow for the full streaming path).

Protocol: ``read_new_files`` lists → diffs against state → returns the
new-file DataFrame plus a commit callback; callers commit AFTER their
write succeeds, so a crashed job re-reads the same batch (at-least-once,
same contract as a streaming checkpoint).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..lakehouse.metadata import list_parquet_files


def read_new_files(
    spark: SparkSession,
    directory: str | Path,
    checkpoint: str | Path,
    schema=None,
) -> tuple[DataFrame | None, list[str], Callable[[], None]]:
    """(new_rows_df | None, new_files, commit) for a parquet directory."""
    state_path = Path(checkpoint)
    seen: set[str] = set()
    if state_path.exists():
        seen = set(json.loads(state_path.read_text())["processed"])
    listed = list_parquet_files(directory)
    new = [f for f in listed if f not in seen]

    def commit() -> None:
        state_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = state_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"processed": sorted(seen | set(new))}))
        tmp.rename(state_path)

    if not new:
        return None, [], commit
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(*new), new, commit

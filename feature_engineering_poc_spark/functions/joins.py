"""Join extensions Spark lacks natively: as-of join.

As-of join (each left row matched with the latest right row at or
before its timestamp, per key) is expressed as a UNION + window
``last_value`` sweep — one shuffle on (key), no Python, no
per-group pandas. This is the merge-asof pattern from time-series
engines re-expressed declaratively so Catalyst plans it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the most recent right row with
    ``right.on <= left.on`` within the same ``by`` key (nulls when no
    prior right row exists).

    Plan shape: tag both sides, union, window ``last(value, ignorenulls)
    OVER (PARTITION BY by ORDER BY on, side, value-tuple)`` — right rows
    sort before left rows at equal timestamps so exact-tie matches are
    included. When multiple RIGHT rows share the same (by, on), the one
    with the greatest value tuple wins — a deterministic tie-break
    (plan- and engine-independent) instead of whatever row the window
    happened to see last. One hash exchange; scales like any windowed
    aggregation.
    """
    value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    l_tag = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col(on).asc(),
            F.col("_side").asc(),
            # deterministic tie-break among right rows at equal `on`
            # (left rows are separated by _side, so their null value
            # columns never interleave with right rows here)
            *[F.col(f"_r_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_tag.unionByName(r_tag).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    out = swept.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out

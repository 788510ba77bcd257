"""Quality-check DSL — EXECUTED (the reference only declares it).

The reference's SourceDefinition carries ``quality_checks``
(config/Models.scala:22-26; e.g. ``not_null`` on ``transaction_id`` in
source1_v1.json) but no code ever runs them (SURVEY.md §2.2 "dead
surface"). Here they run as ONE aggregate pass over the source —
violation counts for every check in a single job, no per-check scans.

Check types: not_null | unique | min / max (numeric range) |
allowed_values | matches_regex.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class QualityCheckError(ValueError):
    def __init__(self, violations: list[dict]):
        self.violations = violations
        msg = "; ".join(
            f"{v['check']}({v['column']}): {v['violations']} violating rows"
            for v in violations
        )
        super().__init__(f"quality checks failed: {msg}")


@dataclass
class CheckResult:
    column: str
    check: str
    violations: int

    def as_dict(self) -> dict:
        return {"column": self.column, "check": self.check, "violations": self.violations}


def _violation_expr(column: str, check: dict) -> list[tuple[str, Column]]:
    """(check_name, per-row violation flag) pairs for one config entry."""
    c = F.col(column)
    out: list[tuple[str, Column]] = []
    ctype = check.get("type") or check.get("check")
    if ctype == "not_null":
        out.append(("not_null", c.isNull()))
    elif ctype == "min":
        out.append(("min", c < F.lit(check["value"])))
    elif ctype == "max":
        out.append(("max", c > F.lit(check["value"])))
    elif ctype == "allowed_values":
        out.append(("allowed_values", ~c.isin(check["values"]) & c.isNotNull()))
    elif ctype == "matches_regex":
        out.append(("matches_regex", ~c.rlike(check["pattern"]) & c.isNotNull()))
    elif ctype == "unique":
        pass  # handled separately (needs an aggregate, not a row flag)
    else:
        raise ValueError(f"unknown quality check type: {ctype!r}")
    return out


def run_quality_checks(
    df: DataFrame, checks: list[dict], strict: bool = True
) -> list[CheckResult]:
    """Execute all checks; raise QualityCheckError on any violation when
    strict, else return per-check violation counts.

    checks format (mirrors the reference's JSON):
        [{"column": "transaction_id", "checks": [{"type": "not_null"},
                                                  {"type": "unique"}]}]
    """
    row_flags: list[tuple[str, str, Column]] = []
    unique_cols: list[str] = []
    for entry in checks:
        col = entry["column"]
        for chk in entry.get("checks", []):
            ctype = chk.get("type") or chk.get("check")
            if ctype == "unique":
                unique_cols.append(col)
            else:
                for name, expr in _violation_expr(col, chk):
                    row_flags.append((col, name, expr))

    results: list[CheckResult] = []
    if row_flags:
        aggs = [
            F.sum(F.when(expr, 1).otherwise(0)).alias(f"v{i}")
            for i, (_, _, expr) in enumerate(row_flags)
        ]
        row = df.agg(*aggs).collect()[0]
        for i, (col, name, _) in enumerate(row_flags):
            results.append(CheckResult(col, name, int(row[f"v{i}"] or 0)))
    for col in unique_cols:
        dup_rows = (
            df.groupBy(col).count().filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("n")).collect()[0].n
        )
        results.append(CheckResult(col, "unique", int(dup_rows)))

    bad = [r.as_dict() for r in results if r.violations > 0]
    if bad and strict:
        raise QualityCheckError(bad)
    return results

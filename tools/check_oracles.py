#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
queries() entry in Spark and its oracle_sql() twin in DuckDB on the
same sf dir; compare row count, sorted column names, and an
order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df_pandas) -> tuple[int, list[str], str]:
    cols = sorted(df_pandas.columns)
    d = df_pandas[cols]
    rows = []
    for tup in d.itertuples(index=False):
        rows.append(
            "\x1f".join(_fmt(v) for v in tup)
        )
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(d), cols, h


def _fmt(v) -> str:
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracle generators that inject data-derived literals (ann_ivf_topk
    # centroids) must derive them from the SAME sf dir being checked
    import os

    os.environ["FEPOC_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from feature_engineering_poc_spark.session import get_session

    spark = get_session(app_name="oracle-check", parallelism=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        n_s, c_s, h_s = canon(spark_pd)
        if name not in oracles:
            print(f"rows-only  {name}: rows={n_s} cols={c_s} ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        n_d, c_d, h_d = canon(duck_pd)
        ok = (n_s, c_s, h_s) == (n_d, c_d, h_d)
        status = "OK   " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(f"{status} {name}: spark(rows={n_s},hash={h_s}) duck(rows={n_d},hash={h_d}) "
              f"({time.time()-t0:.1f}s)")
        if not ok and c_s != c_d:
            print(f"      cols spark={c_s} duck={c_d}")
        if not ok and n_s == n_d and c_s == c_d:
            # show first differing rows for debugging
            s_rows = set("\x1f".join(map(_fmt, t)) for t in spark_pd[sorted(spark_pd.columns)].itertuples(index=False))
            d_rows = set("\x1f".join(map(_fmt, t)) for t in duck_pd[sorted(duck_pd.columns)].itertuples(index=False))
            print(f"      spark-only: {list(s_rows - d_rows)[:2]}")
            print(f"      duck-only:  {list(d_rows - s_rows)[:2]}")
    spark.stop()
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

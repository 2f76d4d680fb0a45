#!/usr/bin/env python
"""Simulate the external correctness driver end-to-end.

Replicates the driver's t2 gate as closely as its round-1 error traces show:
- a VANILLA SparkSession (no engine configs — ANSI on, default shuffle),
- the FIRST 50 entries of ``queries()`` at sf0.01,
- DuckDB runs ``oracle_sql()`` over the same parquet views,
- canonicalization: columns sorted by name, `pandas.DataFrame.sort_values`
  over all columns (this is what crashes on array-typed columns), then an
  order-insensitive exact value comparison.

Run:  python tools/driver_sim.py [sf_dir] [n_queries]
Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_CHECK = int(sys.argv[2]) if len(sys.argv) > 2 else 50

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")  # dies on array cols — by design
    return df.reset_index(drop=True)


def _values(df: pd.DataFrame) -> list[tuple]:
    import datetime

    out = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(repr(v))
            elif isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
                # DATE columns surface as datetime.date from Spark but
                # datetime64 from duckdb's .df(); normalize both to an ISO
                # timestamp string (the real driver normalizes likewise —
                # round-1 DATE columns hash-matched).
                ts = pd.Timestamp(v)
                canon_row.append(ts.isoformat(sep=" "))
            else:
                canon_row.append(str(v))
        out.append(tuple(canon_row))
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    # file_provenance's oracle embeds a literal fixture path; re-derive it
    # for this run's SF and re-point the query-side guard to match.
    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans import (
        profiling,
    )

    osql["file_provenance"] = profiling.provenance_oracle(SF_DIR)
    profiling.PROV_ORACLE_SF = SF_DIR
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    checked = list(qs)[:N_CHECK]
    failures = []
    for name in checked:
        try:
            sdf = qs[name](spark, SF_DIR)
            spark_pd = sdf.toPandas()
            if name not in osql:
                print(f"{name}: rows-only ({len(spark_pd)} rows)")
                continue
            duck_pd = con.sql(osql[name]).df()
            a, b = _canon(spark_pd), _canon(duck_pd)
            if len(a) != len(b):
                failures.append((name, f"row count {len(a)} vs {len(b)}"))
                continue
            if list(a.columns) != list(b.columns):
                failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
                continue
            va, vb = _values(a), _values(b)
            n_bad = sum(1 for x, y in zip(va, vb) if x != y)
            if n_bad:
                first = next((x, y) for x, y in zip(va, vb) if x != y)
                failures.append((name, f"{n_bad} value mismatches; first {first}"))
            else:
                print(f"{name}: OK ({len(a)} rows)")
        except Exception as ex:
            failures.append((name, f"ERR {type(ex).__name__}: {str(ex)[:160]}"))

    print(f"\nchecked {len(checked)} queries, {len(failures)} failures")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

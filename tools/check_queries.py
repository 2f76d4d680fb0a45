#!/usr/bin/env python
"""Spot-check named queries against their oracles at one or more SFs.

Run:  python tools/check_queries.py name1 name2 ... [--sf sf0.001,sf0.01]

Same canonicalization as tools/driver_sim.py (which mirrors the driver's
t2 gate), but filtered to the named queries — the fast inner loop when
developing a new operator. Runs under a VANILLA session (ANSI on) like the
driver does.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_saved_argv = sys.argv
sys.argv = sys.argv[:1]  # driver_sim parses argv at import time
from tools.driver_sim import TABLES, _canon, _values  # noqa: E402

sys.argv = _saved_argv


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sfs = ["sf0.001", "sf0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entrymod

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    unknown = [n for n in args if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    from hybrid_nutrition_data_pipeline_batch_streaming_spark.plans import (
        profiling,
    )

    failures = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        # file_provenance's oracle embeds a literal fixture path; re-derive
        # it for this SF and re-point the query-side guard in one breath.
        osql["file_provenance"] = profiling.provenance_oracle(sf_dir)
        profiling.PROV_ORACLE_SF = sf_dir
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in args:
            try:
                spark_pd = qs[name](spark, sf_dir).toPandas()
                if name not in osql:
                    print(f"{sf} {name}: rows-only ({len(spark_pd)} rows)")
                    continue
                duck_pd = con.sql(osql[name]).df()
                a, b = _canon(spark_pd), _canon(duck_pd)
                if len(a) != len(b):
                    failures.append((sf, name, f"rows {len(a)} vs {len(b)}"))
                    continue
                if list(a.columns) != list(b.columns):
                    failures.append(
                        (sf, name, f"cols {list(a.columns)} vs {list(b.columns)}")
                    )
                    continue
                va, vb = _values(a), _values(b)
                bad = [(x, y) for x, y in zip(va, vb) if x != y]
                if bad:
                    failures.append(
                        (sf, name, f"{len(bad)} value mismatches; first {bad[0]}")
                    )
                else:
                    print(f"{sf} {name}: OK ({len(a)} rows)")
            except Exception as ex:
                failures.append(
                    (sf, name, f"ERR {type(ex).__name__}: {str(ex)[:200]}")
                )
        con.close()

    print(f"\n{len(failures)} failures")
    for sf, name, why in failures:
        print(f"  FAIL {sf} {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

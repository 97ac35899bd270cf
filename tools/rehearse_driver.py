#!/usr/bin/env python
"""Rehearse the grading driver's correctness pass: run the FIRST 50 registry
queries (the driver's window) side-by-side with their DuckDB oracles at
sf0.01 in a fresh default SparkSession, in registry order.

Usage: python tools/rehearse_driver.py [sf_dir] [n]
Exits non-zero listing any mismatching query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    q, o = entry.queries(), entry.oracle_sql()
    bad = []
    for name in list(q)[:n]:
        try:
            a = q[name](spark, sf).toPandas()
            b = con.execute(o[name]).fetchdf()
            cols = sorted(a.columns)
            ok = sorted(map(str, a[cols].itertuples(index=False))) == sorted(
                map(str, b[cols].itertuples(index=False))
            )
            print(("ok   " if ok else "FAIL ") + name)
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001 — rehearsal must list all failures
            print(f"ERR  {name}: {ex}")
            bad.append(name)
    print(f"\n{n - len(bad)}/{n} green" + (f"; failures: {bad}" if bad else ""))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

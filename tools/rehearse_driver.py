#!/usr/bin/env python
"""Rehearse the grading driver's correctness pass: run the FIRST 50 registry
queries (the driver's window) side-by-side with their DuckDB oracles at
sf0.01, in registry order, on a fresh SparkSession with default SQL conf
(local[8] master only — the real driver brings its own local master too).

Reuses tests/oracle_harness for the table registry and the canonical
comparison, so a rehearsal verdict cannot drift from the parity suite
(code-review r2: the previous hardcoded table list + str() comparison could
disagree with the driver on new tables, Decimal rendering, and timestamp
precision).

Usage: python tools/rehearse_driver.py [sf_dir] [n]
Exits non-zero listing any mismatching query.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from oracle_harness import compare, duck_connection

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf)
    q, o = entry.queries(), entry.oracle_sql()
    bad = []
    for name in list(q)[:n]:
        try:
            a = q[name](spark, sf).toPandas()
            b = con.execute(o[name]).fetchdf()
            compare(a, b, name)
            print("ok   " + name)
        except Exception as ex:  # noqa: BLE001 — rehearsal must list all failures
            print(f"FAIL {name}: {str(ex)[:300]}")
            bad.append(name)
    print(f"\n{n - len(bad)}/{n} green" + (f"; failures: {bad}" if bad else ""))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Fresh-JVM single-query benchmark — isolates one registered query's plan
cost from full-suite session effects (heap pressure, block-manager residue,
cache churn across 48 queries x 3 passes in one JVM).

Built for the round-3 -> round-4 `dedup_minhash_lsh` drift investigation
(VERDICT r3, "What's wrong" #2: 0.84 s -> 1.14 s -> 1.79 s across rounds
with zero commits to the operator; in-suite r3 samples climbed
monotonically 1.58/1.79/1.94 — a heap-pressure signature, not a plan
change). A number measured here, in a JVM that has run NOTHING else, is
the query's true plan cost; the delta vs the in-suite median is the
suite's session overhead.

Usage: python tools/bench_one.py QUERY [n] [sf_dir]
Prints one JSON line: {"query", "sf", "n", "samples", "median",
"construct_sec", "calibration": {"cpu_sec", "scan_sec"}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def main() -> int:
    name = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from bench import warmup
    from wal_consumer_spark.plans import all_specs
    from wal_consumer_spark.session import get_spark

    spark = get_spark(app_name=f"wcs-bench-one-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_specs()[name]
    warmup(spark, sf_dir)

    from pyspark.sql import functions as F

    def med3(fn) -> float:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[1], 3)

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    calibration = {
        "cpu_sec": med3(
            lambda: spark.range(200_000_000)
            .selectExpr("sum(xxhash64(id) % 1000)")
            .write.format("noop").mode("overwrite").save()
        ),
        "scan_sec": med3(
            lambda: li.agg(
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            ).write.format("noop").mode("overwrite").save()
        ),
    }

    def release() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(True)
        spark.catalog.clearCache()

    # one untimed warmup run (per-query Catalyst analysis + codegen compile)
    spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release()

    samples, construct = [], []
    for _ in range(n):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        construct.append(t1 - t0)
        release()

    print(json.dumps({
        "query": name,
        "sf_dir": sf_dir,
        "n": n,
        "samples": [round(x, 3) for x in samples],
        "median": round(median(samples), 3),
        "construct_sec": round(median(construct), 3),
        "calibration": calibration,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

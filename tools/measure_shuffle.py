#!/usr/bin/env python
"""Per-query shuffle-volume measurement via the Spark UI REST API —
the SCALE.md §29 harness, committed as a tool (round 11 ran this
ad-hoc; round 12 uses it to test the §29 scaling laws at a second
scale factor, VERDICT r11 "Next round" #2).

For each named query: snapshot the completed-stage set, run the query
to a noop sink, then attribute every NEW completed stage's metrics
(input bytes/records, shuffle read/write bytes, shuffle write records)
to that query. Caveat shared with r11: a localCheckpoint forced by the
first query that touches a shared substrate is attributed to THAT
query — run the same query list in the same order when comparing scale
factors so the attribution bias cancels.

The falsifiable §29 check: for a plan whose claimed law is linear,
`shuffle_write_records / input_records` is CONSTANT across scale
factors. Run at two sf dirs and compare the printed ratios.

Usage: python tools/measure_shuffle.py SF_DIR [query ...]
Defaults to the five §29 plans. Prints one JSON line per query plus a
summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

#: The five most expensive plans per BENCH_DETAIL_r11 — the §29 set.
SECTION29_PLANS = [
    "graph_connected_components",
    "dedup_lsh_band_sensitivity",
    "dedup_minhash_estimate_error",
    "ts_theil_sen_slope",
    "pipeline_soft_dedup_ess_by_source",
]


def _stages(ui: str, app: str) -> list[dict]:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        return json.load(resp)


def measure(sf_dir: str, names: list[str]) -> dict[str, dict]:
    from wal_consumer_spark.plans import all_specs
    from wal_consumer_spark.session import get_spark

    spark = get_spark(
        app_name="wcs-shuffle-measure",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    specs = all_specs()

    def release() -> None:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(True)
        spark.catalog.clearCache()

    out: dict[str, dict] = {}
    seen: set[tuple[int, int]] = set()
    for name in names:
        t0 = time.perf_counter()
        specs[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        # let the status store drain queued stage-completion events
        time.sleep(1.0)
        stages = _stages(ui, app)
        fresh = [
            s for s in stages
            if (s["stageId"], s["attemptId"]) not in seen
        ]
        seen.update((s["stageId"], s["attemptId"]) for s in stages)
        rec = {
            "sf_dir": sf_dir,
            "wall_sec": round(wall, 2),
            "n_stages": len(fresh),
            "input_mb": round(sum(s.get("inputBytes", 0) for s in fresh) / 1e6, 2),
            "input_records": sum(s.get("inputRecords", 0) for s in fresh),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in fresh) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in fresh) / 1e6, 2
            ),
            "shuffle_write_records": sum(
                s.get("shuffleWriteRecords", 0) for s in fresh
            ),
        }
        rec["rows_ratio"] = (
            round(rec["shuffle_write_records"] / rec["input_records"], 4)
            if rec["input_records"]
            else None
        )
        out[name] = rec
        print(json.dumps({"query": name, **rec}))
        release()
    spark.stop()
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = sys.argv[2:] or SECTION29_PLANS
    res = measure(sf_dir, names)
    print(json.dumps({"summary": {n: r["rows_ratio"] for n, r in res.items()}}))

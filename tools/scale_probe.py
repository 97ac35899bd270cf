#!/usr/bin/env python
"""sf1 scaling probe (VERDICT r12 "Next round" #6): run the heaviest
headline queries at a 10x scale factor (tools/make_scale10.py replica set)
at two core counts, in fresh JVMs, and report the core-scaling ratio
time(low_cpus) / time(high_cpus) per query.

At sf0.1 the suite is stage/JVM-overhead-bound (every r12 8↔32 ratio sat
at 0.67-1.22 and the 8-core suite was outright faster), so the bench could
not DEMONSTRATE that the window/join rewrites parallelize. This probe
measures the same plans where the data outgrows the overhead floor.
Ratios >> 1 mean the plan actually uses the extra cores; ratios ~= 1 at
sf1 would mean a serialization bottleneck worth hunting.

Usage: python tools/scale_probe.py [SF_DIR] [HI] [LO] [N_PER_QUERY] [NAME...]
Writes one JSON line per query and a summary JSON to stdout; full record
appended nowhere (caller commits the output, e.g. into SCALE.md / the
round's OPTIMIZATION file).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_TARGETS = [
    "dedup_lsh_band_sensitivity",
    "graph_jaccard_neighbors",
    "graph_connected_components",
    "dedup_bbit_minhash_error",
    "graph_ego_density_topk",
    "dedup_minhash_estimate_error",
    "pipeline_soft_dedup_ess_by_source",
    "ts_theil_sen_slope",
    "graph_hits_hubs_authorities",
    "graph_wedge_closure_by_degree",
]


def run_one(name: str, sf_dir: str, cpus: int, n: int) -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "tools", "bench_one.py"),
             name, str(n), sf_dir],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    names = sys.argv[5:] or DEFAULT_TARGETS
    out: dict[str, dict] = {}
    for name in names:
        rec_hi = run_one(name, sf_dir, hi, n)
        rec_lo = run_one(name, sf_dir, lo, n)
        if not rec_hi or not rec_lo:
            out[name] = {"error": "run failed", "hi": rec_hi, "lo": rec_lo}
            print(json.dumps({name: out[name]}), flush=True)
            continue
        row = {
            f"median_c{hi}": rec_hi["median"],
            f"median_c{lo}": rec_lo["median"],
            f"samples_c{hi}": rec_hi.get("samples"),
            f"samples_c{lo}": rec_lo.get("samples"),
            f"construct_c{hi}": rec_hi.get("construct_sec"),
            f"construct_c{lo}": rec_lo.get("construct_sec"),
            "ratio_lo_over_hi": round(rec_lo["median"] / rec_hi["median"], 2),
            f"cpu_probe_c{hi}": (rec_hi.get("calibration") or {}).get("cpu_sec"),
            f"cpu_probe_c{lo}": (rec_lo.get("calibration") or {}).get("cpu_sec"),
        }
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "hi": hi, "lo": lo,
                      "n_per_query": n, "results": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

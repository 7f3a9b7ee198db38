"""Same-session interleaved re-measure of the r11 round-close
warm>cold graph cluster (VERDICT r11 item 3) plus the tpch_total band
drift (item 5). The r11 round-close rep — taken on the host the drift
A/B had already shown bimodal — recorded warm ABOVE cold on three
iterative graph keys, and tpch_total drifted 17.4 → 20.2–31.3 s
across the same-code rep series:

  q_graph_closeness     32.4 warm vs 25.7 cold
  q_graph_hits          24.0 warm vs 12.0 cold
  q_random_walk_counts  17.5 warm vs 13.6 cold
  q_multimodal_frames   (rode the same degraded wave)

Warm > cold on an unchanged plan is physically impossible from the
plan side (the warm run reuses compiled classes) unless state leaks
between runs — so either the host degraded mid-wave (the r11
adjudication) or a localCheckpoint is failing to persist across the
warm rep. This tool separates the two the admissible way
(landmine-9): ONE session, cold pass first, then interleaved warm
reps with a JVM control (q_join_inner) and an Arrow control
(q_udf_pandas), plus a /proc/stat host probe before and after.

Readings:
  - warm medians land at-or-below their cold AND controls flat →
    the r11 warm>cold inversion was host weather; adjudication
    STANDS.
  - a graph key's warm reps sit ABOVE its cold here too, controls
    flat, probe quiet → STRUCTURAL: a per-rep recompute exists
    (chase the localCheckpoint lifecycle).

NOTE (r12): q_graph_closeness and q_graph_sssp changed plans this
round (per-source early exit) — today's numbers are the NEW plan's
baseline, not a same-code comparison against r11 for those two.

Usage: python tools/drift_ab_r12.py [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_load_probe
from neo_olap_spark.registry import REGISTRY, queries
from neo_olap_spark.session import get_spark

DRIFT_KEYS = (
    "q_graph_closeness",
    "q_graph_hits",
    "q_random_walk_counts",
    "q_multimodal_frames",
)
# the five TPC-H queries with the largest r11 rep-band spread carry
# the tpch_total watch item (item 5); q9/q21 are the heaviest joins
TPCH_KEYS = (
    "q_sql_tpch_q9",
    "q_sql_tpch_q21",
    "q_sql_tpch_q8",
    "q_sql_tpch_q17",
    "q_sql_tpch_q18",
)
CONTROL_KEYS = ("q_join_inner", "q_udf_pandas")
KEYS = DRIFT_KEYS + TPCH_KEYS + CONTROL_KEYS

# committed r11 round-close records (BENCH_r11.json / reps jsonl)
RECORDS = {
    "q_graph_closeness": {"r11_cold": 25.7, "r11_warm": 32.4,
                          "note": "plan CHANGED in r12 (early exit)"},
    "q_graph_hits": {"r11_cold": 12.0, "r11_warm": 24.0},
    "q_random_walk_counts": {"r11_cold": 13.6, "r11_warm": 17.5},
    "q_multimodal_frames": {},
    "q_sql_tpch_q9": {}, "q_sql_tpch_q21": {}, "q_sql_tpch_q8": {},
    "q_sql_tpch_q17": {}, "q_sql_tpch_q18": {},
    "q_join_inner": {"role": "jvm control"},
    "q_udf_pandas": {"role": "arrow control"},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "drift-ab-r12", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    queries()

    def run(key: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    probe_start = host_load_probe()
    # cold pass: first end-to-end run of each key in this JVM — the
    # quantity bench.py records as cold (and doubles as the warmup)
    cold: dict[str, float] = {key: run(key) for key in KEYS}
    times: dict[str, list[float]] = {k: [] for k in KEYS}
    for _ in range(reps):
        for key in KEYS:  # interleaved: drift loads all keys equally
            times[key].append(run(key))
    probe_end = host_load_probe()

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
        "host_probe_start": probe_start,
        "host_probe_end": probe_end,
        "tpch_subset_cold": round(sum(cold[k] for k in TPCH_KEYS), 2),
        "tpch_subset_warm_median": round(sum(
            statistics.median(times[k]) for k in TPCH_KEYS), 2),
        "keys": {
            key: {
                "today_cold": round(cold[key], 2),
                "today_warm_median": round(statistics.median(ts), 2),
                "today_all": [round(t, 2) for t in ts],
                **RECORDS[key],
            }
            for key, ts in times.items()
        },
    }))


if __name__ == "__main__":
    main()

"""Same-session interleaved re-measure of the three warm>cold
inversions in the r12 driver sidecar that the r12 drift A/B did NOT
cover (VERDICT r12 item 3):

  q_graph_modularity      10.0 cold -> 26.6 warm
  q_pagerank_personalized 10.0 cold -> 18.0 warm
  q_stream_stateful        8.8 cold -> 12.4 warm

Warm > cold on an unchanged plan is physically impossible from the
plan side (the warm run reuses compiled classes) unless state leaks
between runs — so either the host degraded mid-wave (the precedent
adjudication for every prior cluster) or a lazy localCheckpoint is
re-materializing under cache pressure on the warm rep (a real bug).
Per the standing r11 rule, no cross-round or cold/warm delta is
adjudicated without THIS harness: one session, cold pass first, then
interleaved warm reps with a JVM control (q_join_inner) and an Arrow
control (q_udf_pandas), host probe before and after.

Readings:
  - warm medians land at-or-below their cold AND controls flat →
    the r12 sidecar inversion was host weather; adjudication
    ENVIRONMENT, controls flat.
  - a key's warm reps sit ABOVE its cold here too, controls flat,
    probe quiet → STRUCTURAL: a per-rep recompute exists (chase the
    localCheckpoint / state-store lifecycle).

Usage: python tools/drift_ab_r13.py [reps=3] [sf_dir]
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
    "q_graph_modularity",
    "q_pagerank_personalized",
    "q_stream_stateful",
)
CONTROL_KEYS = ("q_join_inner", "q_udf_pandas")
KEYS = DRIFT_KEYS + CONTROL_KEYS

# committed r12 driver-sidecar records (BENCH_local_full.json at r12
# close: queries / queries_warm)
RECORDS = {
    "q_graph_modularity": {"r12_cold": 10.0, "r12_warm": 26.6},
    "q_pagerank_personalized": {"r12_cold": 10.0, "r12_warm": 18.0},
    "q_stream_stateful": {"r12_cold": 8.8, "r12_warm": 12.4},
    "q_join_inner": {"role": "jvm control"},
    "q_udf_pandas": {"role": "arrow control"},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "drift-ab-r13", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

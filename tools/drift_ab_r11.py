"""Same-session interleaved re-measure of the r9→r10 bench drift
cluster (VERDICT r10 item 3). The r10 driver bench moved ~35% slower
whole-set (median 1.40× on frozen, untouched keys — inside the
builder's own same-code rep band), which r10 adjudicated to
environment; these six keys moved WELL beyond that 1.4× drift floor,
so the repo's own adjudication rule (≥2× cross-round delta needs an
interleaved A/B before being called clean OR structural) holds them
open:

  q_embed_pca              cold 1.74 → 9.15 (5.3×), warm flat
  q_stream_transform_state cold 6.60 → 21.16 (3.2×), warm 3.15 → 4.43
  q_multimodal_phash       cold 1.78 → 6.11 (3.4×), warm 1.70 → 3.42
  q_triangle_count         cold 6.25 → 14.36 (2.3×), warm 3.88 → 5.95
  q_multimodal_motion      cold 4.30 → 10.03 (2.3×), warm 4.33 → 6.83
  q_embed_knn_graph        cold 1.74 → 4.22 (2.4×), warm 1.56 → 3.25

Protocol (landmine-9 discipline, the pyworker_drift_ab.py shape):
ONE session; a COLD pass first (each key's first end-to-end run in
the shared JVM — the exact quantity bench.py reports as cold), then
interleaved warm reps with a JVM control (q_join_inner — plan-pinned,
zero python) and an Arrow control (q_udf_pandas — python worker, not
in the drift cluster). Readings:

  - drift keys at/below r9 levels, controls at records → the r10
    numbers were transient host load; adjudicate ENVIRONMENT.
  - drift keys high AND the Arrow control high while the JVM control
    sits at record → python-worker tax moved; environment,
    worker-specific.
  - drift keys high while BOTH controls sit at records → STRUCTURAL;
    diff the plans/configs this round.

Usage: python tools/drift_ab_r11.py [reps=4] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo_olap_spark.registry import REGISTRY, queries
from neo_olap_spark.session import get_spark

DRIFT_KEYS = (
    "q_embed_pca",
    "q_stream_transform_state",
    "q_multimodal_phash",
    "q_triangle_count",
    "q_multimodal_motion",
    "q_embed_knn_graph",
)
CONTROL_KEYS = ("q_join_inner", "q_udf_pandas")
KEYS = DRIFT_KEYS + CONTROL_KEYS

# committed driver records: r9 = BENCH_r09.json, r10 = BENCH_r10.json
# (per-key cold in "queries", warm in "queries_warm")
RECORDS = {
    "q_embed_pca": {"r9_cold": 1.74, "r10_cold": 9.15,
                    "r9_warm": 1.19, "r10_warm": 1.40},
    "q_stream_transform_state": {"r9_cold": 6.60, "r10_cold": 21.16,
                                 "r9_warm": 3.15, "r10_warm": 4.43},
    "q_multimodal_phash": {"r9_cold": 1.78, "r10_cold": 6.11,
                           "r9_warm": 1.70, "r10_warm": 3.42},
    "q_triangle_count": {"r9_cold": 6.25, "r10_cold": 14.36,
                         "r9_warm": 3.88, "r10_warm": 5.95},
    "q_multimodal_motion": {"r9_cold": 4.30, "r10_cold": 10.03,
                            "r9_warm": 4.33, "r10_warm": 6.83},
    "q_embed_knn_graph": {"r9_cold": 1.74, "r10_cold": 4.22,
                          "r9_warm": 1.56, "r10_warm": 3.25},
    "q_join_inner": {"role": "jvm control"},
    "q_udf_pandas": {"role": "arrow control"},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "drift-ab-r11", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    # cold pass: first end-to-end run of each key in this JVM — the
    # quantity bench.py records as cold (and doubles as the warmup)
    cold: dict[str, float] = {key: run(key) for key in KEYS}
    times: dict[str, list[float]] = {k: [] for k in KEYS}
    for _ in range(reps):
        for key in KEYS:  # interleaved: drift loads all keys equally
            times[key].append(run(key))

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
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

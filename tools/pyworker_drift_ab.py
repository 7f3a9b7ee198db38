"""Same-session interleaved re-measure of the r8→r9 bench drift on the
python-worker cluster (VERDICT r9 item 1): q_multimodal_resize warm
1.67 → 3.12 s (1.87×), q_multimodal_audio_resample warm 1.06 → 1.95 s
(1.84×), q_stream_transform_state cold 3.50 → 6.60 s — all on files
git-diff-verified as untouched in round 9, all above the ~1.5× noise
floor SCALING.md established, and none of them many-stage loop keys,
so the r9 graph-drift adjudication does not cover them.

These three share one trait the controls lack: they run Arrow-batched
python workers (pandas_udf / mapInPandas / applyInPandasWithState), so
their wall time carries python-worker fork/reuse cost on top of JVM
execution. The discriminating design (landmine-9: only same-session
interleaved reps are evidence):

  drift keys    — the three flagged keys
  jvm control   — q_join_inner (plan-pinned, zero python)
  arrow control — q_udf_pandas (Arrow python worker, NOT flagged)

All keys warmed first, then interleaved reps. Readings:
  - drift keys at r8 levels while controls sit at their own r8/r9
    records → the r9 numbers were a transient; adjudicate environment.
  - drift keys reproduce r9 (high) while the arrow control ALSO runs
    high but the JVM control doesn't → python-worker tax (fork/reuse
    latency) moved; environment, but worker-specific.
  - drift keys high while BOTH controls sit at records → structural;
    needs a plan/config diff.

Usage: python tools/pyworker_drift_ab.py [reps=4] [sf_dir]
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

KEYS = (
    "q_multimodal_resize",
    "q_multimodal_audio_resample",
    "q_stream_transform_state",
    "q_join_inner",
    "q_udf_pandas",
)
# committed sidecar records (r8 = commit 7b7f52b BENCH_local_full.json,
# r9 = HEAD's) — warm medians are the comparable quantity here since
# this tool records post-warm reps
RECORDS = {
    "q_multimodal_resize": {"r8_warm": 1.665, "r9_warm": 3.115},
    "q_multimodal_audio_resample": {"r8_warm": 1.06, "r9_warm": 1.951},
    "q_stream_transform_state": {"r8_warm": 2.717, "r9_warm": 3.151,
                                 "r8_cold": 3.496, "r9_cold": 6.60},
    "q_join_inner": {"r8_warm": 0.435, "r9_warm": 0.408},
    "q_udf_pandas": {"r8_warm": 0.292, "r9_warm": 0.311,
                     "role": "arrow control (not flagged r9)"},
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "pyworker-drift-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    for key in KEYS:  # warm every key before any recorded rep
        run(key)
    times: dict[str, list[float]] = {k: [] for k in KEYS}
    for _ in range(reps):
        for key in KEYS:  # interleaved: drift loads all keys equally
            times[key].append(run(key))

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
        "keys": {
            key: {
                "today_warm_median": round(statistics.median(ts), 2),
                "today_all": [round(t, 2) for t in ts],
                **RECORDS[key],
            }
            for key, ts in times.items()
        },
    }))


if __name__ == "__main__":
    main()

"""Warm-drift adjudication for the r6→r7 ivf/multimodal regression
(VERDICT r7 item 4): q_sim_ann_ivf 1.76 → 4.57 s warm and the
multimodal decode family 2.5–2.7× warm on UNCHANGED code (git-diff
confirmed by the judge) — beyond the repo's measured 1.6× intra-day
environment band.

Two hypotheses:
  env    — machine drift between the r6 and r7 bench sessions.
  order  — session interaction: heavy keys that ran earlier in the r7
           session (the new HEADLINE6 streaming/graph wave) left
           executor/page-cache pressure that taxed later keys.
           NOTE: in bench.py HEADLINE4 (the drifted keys) runs BEFORE
           HEADLINE5/6, so HEADLINE6 cannot have taxed them within the
           wave loop itself — the order hypothesis is about JVM-level
           residue (GC pressure, code cache, shuffle dirs) from ANY
           heavy predecessor, which this tool reproduces explicitly.

Protocol (landmine 9: only same-session interleaved A/Bs are
evidence): one session, alternating blocks
  A — each drift key cold+warm, record warm (quiet context)
  B — run the PRESSURE wave (HEADLINE6's four heaviest keys), then
      each drift key cold+warm, record warm (pressured context)
for N reps each, interleaved A,B,A,B,... clearCache between keys (the
bench discipline). If median(B) ≈ median(A): ordering is innocent →
the r7 sidecar numbers were environment; if B >> A: found the
interaction.

Prints one JSON line; the conclusion goes to SCALING.md.

Usage: python tools/warm_drift_ab.py [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo_olap_spark.registry import queries
from neo_olap_spark.session import get_spark

DRIFT_KEYS = [
    "q_sim_ann_ivf",
    "q_multimodal_audio_resample",
    "q_multimodal_audio",
    "q_multimodal_motion",
    "q_multimodal_frames",
]

# The four keys that dominated HEADLINE6 in BENCH_r07 (stream_join_outer
# ~11 s warm, containment ~8, hits ~7.6, ppr ~5) — the suspected
# pressure source.
PRESSURE_KEYS = [
    "q_stream_join_outer",
    "q_text_containment",
    "q_graph_hits",
    "q_pagerank_personalized",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "warm-drift-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()

    def run_warm(key: str) -> float:
        """cold run (JIT) then timed warm run, clearCache after each —
        exactly bench.py's per-key discipline."""
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    a: dict[str, list[float]] = {k: [] for k in DRIFT_KEYS}
    b: dict[str, list[float]] = {k: [] for k in DRIFT_KEYS}
    pressure_cost: list[float] = []
    for _rep in range(reps):
        # block A: quiet context
        for key in DRIFT_KEYS:
            a[key].append(run_warm(key))
        # block B: pressure wave first, then the same drift keys
        t0 = time.perf_counter()
        for pkey in PRESSURE_KEYS:
            qs[pkey](spark, sf_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        pressure_cost.append(time.perf_counter() - t0)
        for key in DRIFT_KEYS:
            b[key].append(run_warm(key))

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "pressure_keys": PRESSURE_KEYS,
        "pressure_wave_sec": [round(t, 2) for t in pressure_cost],
        "r6_sidecar_warm": {  # the a46a7e9 record, for context
            "q_sim_ann_ivf": 1.76,
            "q_multimodal_audio_resample": 0.88,
            "q_multimodal_audio": 0.63,
            "q_multimodal_motion": 2.77,
            "q_multimodal_frames": 1.60,
        },
        "r7_sidecar_warm": {
            "q_sim_ann_ivf": 4.57,
            "q_multimodal_audio_resample": 2.42,
            "q_multimodal_audio": 1.59,
            "q_multimodal_motion": 4.31,
            "q_multimodal_frames": 2.98,
        },
        "keys": {
            key: {
                "quiet_median": round(statistics.median(a[key]), 2),
                "pressured_median": round(statistics.median(b[key]), 2),
                "quiet_all": [round(t, 2) for t in a[key]],
                "pressured_all": [round(t, 2) for t in b[key]],
                "pressure_ratio": round(
                    statistics.median(b[key]) / statistics.median(a[key]), 2
                ),
            }
            for key in DRIFT_KEYS
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

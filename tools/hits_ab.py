"""Same-session interleaved A/B of the HITS raw-push checkpoint
(round-8 plan-audit finding): each half-step's raw aggregate feeds TWO
consumers (the L1 normalizer sum and the state join), so WITHOUT a
checkpoint Spark executes the edge join + aggregate twice per
half-step — 32 edge joins per 8-iteration run instead of 16 (landmine
4's double-reference rule, previously applied to pagerank's state but
missed on this intermediate).

Variants, interleaved (landmine 9):
  no_ckpt — the r7 shipped shape (a_raw/h_raw recomputed per consumer)
  ckpt    — localCheckpoint the node-sized raw frame before fan-out

Values are bit-identical (pinned by
tests/test_graph_algos.py::test_hits_checkpoint_raw_agrees);
this tool measures the wall-time delta that decides the default.

Usage: python tools/hits_ab.py [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo_olap_spark.graph import edge_count_estimate
from neo_olap_spark.operators.graph_algos import HITS_ITERS, all_nodes, edges, hits
from neo_olap_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "hits-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    de = edges(spark, sf_dir)
    nodes = all_nodes(spark, sf_dir)
    n_edges = edge_count_estimate(spark, sf_dir)

    def run(ckpt: bool) -> float:
        t0 = time.perf_counter()
        hits(
            de, nodes, n_iters=HITS_ITERS, n_edges=n_edges,
            checkpoint_raw=ckpt,
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # warmup BOTH variants (they codegen DIFFERENT plans — warming only
    # one would load its rival's first rep with JIT cost) — not recorded
    run(False)
    run(True)
    times: dict[str, list[float]] = {"no_ckpt": [], "ckpt": []}
    for _ in range(reps):
        times["no_ckpt"].append(run(False))
        times["ckpt"].append(run(True))

    print(json.dumps({
        "sf_dir": sf_dir,
        "reps": reps,
        "variants": {
            name: {
                "warm_sec_median": round(statistics.median(ts), 2),
                "warm_sec_all": [round(t, 2) for t in ts],
            }
            for name, ts in times.items()
        },
    }))


if __name__ == "__main__":
    main()

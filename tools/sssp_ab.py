"""Same-session interleaved A/B of sssp hops-per-round (VERDICT r6
item 3): the judge asked either to get q_graph_sssp to ~6 s warm or to
re-baseline with a measured rounds x per-round-constant split.

Variants, interleaved (landmine 9: only same-session interleaved A/Bs
are evidence):
  one_hop   — the r6 shipped shape: one relaxation per count job
  two_hop   — two lazily-localCheckpointed relaxations per count job
              (same edge work, half the driver actions)
  four_hop  — four per count job (diminishing returns probe)

Prints one JSON line: per-variant warm wall times (median of reps),
rounds, and the implied per-relaxation constant.

NOTE (ADVICE r7): for multi-hop variants `rounds` (and therefore the
sec_per_relaxation denominator) can over-count by up to
hops_per_round-1 idempotent post-fixpoint relaxations — convergence on
a non-boundary hop is detected only at the next boundary count. The
bias DEFLATES multi-hop per-relaxation constants slightly; compare
variants on warm_sec_median, which is unbiased.

Usage: python tools/sssp_ab.py [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo_olap_spark.operators.graph_algos import _weighted_sym_edges, sssp
from neo_olap_spark.session import get_spark
from neo_olap_spark.tables import load


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        "neo-olap-sssp-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    # same source as q_graph_sssp: the lowest customer id
    source = int(
        load(spark, sf_dir, "customer").agg(F.min("c_custkey")).collect()[0][0]
    )
    wsym = _weighted_sym_edges(spark, sf_dir)
    n_edges = wsym.count()

    variants = {"one_hop": 1, "two_hop": 2, "four_hop": 4}
    times: dict[str, list[float]] = {k: [] for k in variants}
    rounds: dict[str, int] = {}
    results: dict[str, int] = {}

    # warmup (codegen JIT) — not recorded
    sssp(wsym, [source], n_edges=n_edges).count()

    for _ in range(reps):
        for name, hops in variants.items():  # interleaved
            stats: dict = {}
            t0 = time.time()
            out = sssp(
                wsym, [source], n_edges=n_edges,
                stats=stats, hops_per_round=hops,
            )
            n = out.count()
            times[name].append(time.time() - t0)
            rounds[name] = stats["rounds"]
            results[name] = n
            spark.catalog.clearCache()

    assert len(set(results.values())) == 1, f"variants disagree: {results}"
    report = {
        "sf_dir": sf_dir,
        "reps": reps,
        "reachable_nodes": next(iter(results.values())),
        "variants": {
            name: {
                "warm_sec_median": round(statistics.median(ts), 2),
                "warm_sec_all": [round(t, 2) for t in ts],
                "rounds": rounds[name],
                "sec_per_relaxation": round(
                    statistics.median(ts) / rounds[name], 3
                ),
                "count_jobs": -(-rounds[name] // variants[name]),
            }
            for name, ts in times.items()
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()

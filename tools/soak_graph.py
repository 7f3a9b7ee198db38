"""Order-of-magnitude soak for the iterative graph loops (VERDICT r3
item 9): run cc / sssp / k_core / pagerank on a synthetic power-law
graph ~10x the sf0.1 derived graph (16M symmetric edges vs ~1.6M) and
record CONVERGENCE DEPTHS and wall times — the claim under test is
that the loops' round ceilings (SSSP_MAX_ROUNDS=40, kcore fixpoint,
cc diameter bound) hold an order of magnitude up, because depth grows
with graph DIAMETER (log-ish), not size.

The graph is deterministic (xxhash64-derived): uniform sources, cubed
skew on destinations (node 0 is a super-hub — also stresses the skew
path test_graph_skew.py covers at small scale).

Usage: python tools/soak_graph.py [n_nodes] [m_edges]
Prints one JSON line; results are recorded in NEXT.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo_olap_spark.operators.graph_algos import (
    HITS_ITERS,
    SSSP_MAX_ROUNDS,
    connected_components,
    hits,
    k_core,
    pagerank,
    sssp,
)
from neo_olap_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    m_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark("neo-olap-soak", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    base = spark.range(m_edges)
    u = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1_000_000)) / 1_000_000.0
    fwd = base.select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("src"),
        F.floor(F.lit(n_nodes) * u * u * u).cast("long").alias("dst"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).alias("w"),
    ).where(F.col("src") != F.col("dst"))
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    ).localCheckpoint()
    n_edges = sym.count()
    nodes = sym.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n_actual = nodes.count()

    out: dict = {"n_nodes": n_actual, "sym_edges": n_edges}

    t0 = time.time()
    st: dict = {}
    cc = connected_components(sym.select("src", "dst"), nodes, max_iters=30,
                              n_edges=n_edges, stats=st)
    out["cc"] = {"components": cc.select("component").distinct().count(),
                 "rounds": st["rounds"], "sec": round(time.time() - t0, 1)}

    t0 = time.time()
    st = {}
    d = sssp(sym, sources=[0], max_rounds=SSSP_MAX_ROUNDS, n_edges=n_edges, stats=st)
    out["sssp"] = {"reached": d.count(), "rounds": st["rounds"],
                   "max_rounds": SSSP_MAX_ROUNDS, "sec": round(time.time() - t0, 1)}

    t0 = time.time()
    st = {}
    kc = k_core(sym.select("src", "dst"), k=2, stats=st)
    out["kcore2"] = {"survivors": kc.count(), "rounds": st["rounds"],
                     "sec": round(time.time() - t0, 1)}

    t0 = time.time()
    pr = pagerank(sym.select("src", "dst"), nodes, n_iters=8, n_edges=n_edges)
    total_rank = pr.agg(F.sum("rank")).collect()[0][0]
    out["pagerank"] = {"iters": 8, "mass_err": round(abs(total_rank - n_actual), 6),
                       "sec": round(time.time() - t0, 1)}

    # Personalized PageRank (VERDICT r7 item 6): same power-iteration
    # loop, teleport mass concentrated on 4 seeds. Invariants: mass
    # conservation holds for the personalized teleport vector too
    # (per-iteration total = (1-d)·Σtele + d·total = N), and the seeds
    # soak up far more rank than the average node (teleport locality).
    t0 = time.time()
    seeds = [0, 1, 2, 3]
    ppr = pagerank(sym.select("src", "dst"), nodes, n_iters=8,
                   n_edges=n_edges, seeds=seeds, n_nodes=n_actual)
    row = ppr.agg(
        F.sum("rank").alias("total"),
        F.sum(
            F.when(F.col("node_id").isin(seeds), F.col("rank"))
        ).alias("seed_rank"),
    ).collect()[0]
    out["ppr"] = {
        "iters": 8,
        "mass_err": round(abs(row["total"] - n_actual), 6),
        "seed_rank_mean": round(row["seed_rank"] / len(seeds), 2),
        "global_rank_mean": 1.0,  # by the total-rank = N convention
        "seed_dominance_ok": bool(row["seed_rank"] / len(seeds) > 10.0),
        "sec": round(time.time() - t0, 1),
    }

    # HITS (VERDICT r7 item 6): the production hits() loop on the
    # DIRECTED planted edges (power-law dst = authority hubs).
    # Invariants: both scores L1-normalize to n_nodes (within the
    # 1e-5-quantization × N display budget) and the iteration count is
    # fixed by construction — depth CANNOT grow with size; the soak
    # measures the per-iteration cost scaling.
    t0 = time.time()
    fwd_e = fwd.select("src", "dst").localCheckpoint()
    n_fwd = fwd_e.count()
    hnodes = (
        fwd_e.select(F.col("src").alias("node"))
        .unionByName(fwd_e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_hnodes = hnodes.count()
    hres = hits(fwd_e, hnodes, n_iters=HITS_ITERS, n_edges=n_fwd)
    sums = hres.agg(
        F.sum("hub").alias("sh"), F.sum("auth").alias("sa")
    ).collect()[0]
    out["hits"] = {
        "iters": HITS_ITERS,
        "n_nodes": n_hnodes,
        "hub_l1_err": round(abs(sums["sh"] - n_hnodes), 3),
        "auth_l1_err": round(abs(sums["sa"] - n_hnodes), 3),
        # quantization at 1e-5 × n_hnodes bounds the display error
        "l1_budget": round(n_hnodes * 1e-5, 3),
        "sec": round(time.time() - t0, 1),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()

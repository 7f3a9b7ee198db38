"""Measure ANN mean recall@10 vs brute force at any SF.

The q_sim_ann_ivf / q_sim_ann_lsh verdict keys assert a recall floor
(0.35 / 0.6) that must hold as a DATASET CONSTANT — both tiers are
fully deterministic at a fixed SF, so the floor either holds with
margin or the key is wrong. The floors were originally set against
sf0.01 measurements; this tool re-measures at larger SFs so a
dataset-shape change can never silently approach a floor
(VERDICT r5 item 6). Results are recorded in SCALING.md.

Usage: python tools/ann_recall.py [sf_dir ...]
(defaults to /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo_olap_spark.operators.llm_similarity import (
    N_QUERIES,
    TOP_K,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from neo_olap_spark.session import get_spark
from neo_olap_spark.tables import load


def mean_recall(spark, sf_dir: str) -> dict:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    exact = {
        (r.query_id, r.vec_id) for r in brute_force_topk(e, q, TOP_K).collect()
    }
    out = {"sf_dir": sf_dir, "n_queries": N_QUERIES, "k": TOP_K}
    for name, fn in (
        ("ivf_sq8", lambda: ivf_topk(e, q, TOP_K, quantized=True)),
        ("lsh", lambda: lsh_topk(e, q, TOP_K)),
    ):
        got = {(r.query_id, r.vec_id) for r in fn().collect()}
        out[name] = round(len(got & exact) / len(exact), 4)
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("ann-recall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for d in dirs:
        print(json.dumps(mean_recall(spark, d)))


if __name__ == "__main__":
    main()

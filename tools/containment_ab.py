"""Same-session interleaved A/B of the shared-postings checkpoint in
the exact-dedup tier (round-9, VERDICT r8 item 1): the df-capped
postings table (explode shingles → df window → doc-size window) feeds
BOTH sides of the pair self-join, and Catalyst does not unify a
self-join on a derived frame (measured pre-fix: 4 documents scans, 4
Windows, 0 ReusedExchange) — so without a checkpoint the dominant
explode+two-window chain executes once per join side.

Variants, interleaved (landmine 9):
  no_ckpt — the r3..r8 shipped shape (postings recomputed per side)
  ckpt    — localCheckpoint the postings frame before the self-join
            (what exact_jaccard_pairs / q_text_containment now do)

Values are identical (integer counts + one ROUND tail; the oracle
hashes were re-pinned unchanged); this tool measures the wall delta.

Usage: python tools/containment_ab.py [reps=3] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo_olap_spark.operators.llm_dedup import (
    CONTAINMENT_THRESHOLD,
    MAX_SHINGLE_DF,
    _explode_no_refilter,
    _shingled,
    capped_postings,
)
from neo_olap_spark.session import get_spark


def containment_pairs(spark, sf_dir: str, ckpt: bool):
    # the q_text_containment shape with the checkpoint togglable —
    # the postings builder is IMPORTED from llm_dedup (round-9 ADVICE:
    # an inline copy would silently measure a stale shape if the
    # operator changed); no_ckpt reproduces the pre-r9 plan exactly
    ex = _explode_no_refilter(_shingled(spark, sf_dir), "sh", "s")
    kept = capped_postings(ex, MAX_SHINGLE_DF, ckpt=ckpt)
    a = kept.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), "s")
    b = kept.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "s")
    cnt = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("inter"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    containment = F.col("inter") / F.least("na", "nb")
    return cnt.where(containment >= CONTAINMENT_THRESHOLD).select(
        "doc_a", "doc_b", F.round(containment, 4).alias("containment")
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        "containment-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(ckpt: bool) -> float:
        t0 = time.perf_counter()
        containment_pairs(spark, sf_dir, ckpt).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # warm BOTH variants (different codegen) — not recorded
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

"""Session-config A/B (r14, VERDICT r13 item 5; guide §9).

Candidates deferred from r13 because sf0.1 shuffle volumes are too
small to measure codec/join-strategy effects:
  - zstd  : spark.io.compression.codec=zstd  (shuffle + spill codec)
  - shj   : spark.sql.join.preferSortMergeJoin=false (allow shuffled
            hash join when its size conditions hold)

Method: each (variant, sf) cell runs in a FRESH process (the codec is
SparkConf-level, not runtime-settable) over a shuffle-heavy key subset,
cold+warm per key, host-probed before and after. The parent interleaves
variants A,B,C,A,B,C,... so host drift hits every variant equally (the
r13 same-session-interleave rule, adapted to configs that need process
isolation). Adopt a candidate only if it wins on quiet probes at BOTH
sf0.1 and sf0.2 (per the optimization brief: local[32]-only wins are
rejected).

Usage:
  python tools/config_ab_r14.py run  [--reps 3] [--sf-dirs d1,d2]
  python tools/config_ab_r14.py worker <variant> <sf_dir>   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "shj": {"spark.sql.join.preferSortMergeJoin": "false"},
}

# shuffle-heavy subset: joins, wide aggregates, dedup postings,
# graph closure, tpch mids — the keys where codec / join strategy
# could plausibly move the needle
KEYS = [
    "q_agg_groupby",
    "q_join_outer",
    "q_star_join",
    "q_two_hop",
    "q_window_rank",
    "q_dedup_ngram",
    "q_dedup_clusters",
    "q_graph_jaccard",
    "q_sql_tpch_q9",
    "q_sql_tpch_q21",
    "q_text_tfidf",
    "q_sim_search",
]


def worker(variant: str, sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    from neo_olap_spark.registry import queries

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"config-ab-{variant}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in VARIANTS[variant].items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    out: dict[str, list[float]] = {}
    for key in KEYS:
        times = []
        for _ in range(2):  # cold, warm
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[key] = times
    print("RESULT " + json.dumps({"variant": variant, "sf_dir": sf_dir, "times": out}))


def run(reps: int, sf_dirs: list[str]) -> None:
    from bench import host_load_probe

    records = []
    for sf_dir in sf_dirs:
        for rep in range(reps):
            for variant in VARIANTS:  # interleaved
                probe = host_load_probe()
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "worker",
                     variant, sf_dir],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [ln for ln in proc.stdout.splitlines()
                        if ln.startswith("RESULT ")]
                if not line:
                    print(f"worker failed: {variant} {sf_dir} rep{rep}\n"
                          f"{proc.stderr[-500:]}", file=sys.stderr)
                    continue
                rec = json.loads(line[-1][len("RESULT "):])
                rec.update(rep=rep, probe=probe)
                records.append(rec)
                warm = sum(v[1] for v in rec["times"].values())
                print(f"{sf_dir} rep{rep} {variant:5s} warm_sum={warm:7.2f} "
                      f"probe={probe['verdict']}/{probe['spin_sec']}",
                      flush=True)
    with open("/tmp/config_ab_r14.json", "w") as f:
        json.dump(records, f, indent=1)
    # summarize: median warm sum per (sf, variant)
    import statistics
    for sf_dir in sf_dirs:
        print(f"\n== {sf_dir}")
        for variant in VARIANTS:
            sums = [
                sum(v[1] for v in r["times"].values())
                for r in records
                if r["variant"] == variant and r["sf_dir"] == sf_dir
            ]
            if sums:
                print(f"  {variant:5s} median warm sum "
                      f"{statistics.median(sums):7.2f}  reps={len(sums)}")


if __name__ == "__main__":
    if sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3])
    else:
        import argparse

        ap = argparse.ArgumentParser()
        ap.add_argument("mode")
        ap.add_argument("--reps", type=int, default=3)
        ap.add_argument(
            "--sf-dirs",
            default="/root/testdata/sf0.1,/tmp/neo_olap_sf0.2",
        )
        args = ap.parse_args()
        run(args.reps, args.sf_dirs.split(","))

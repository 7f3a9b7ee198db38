"""AQE skew-join vs hand-salting, measured (VERDICT r4 item 7).

The engine ships BOTH skew strategies: q_join_salted/q_agg_salted
hand-salt, and the session enables AQE (spark.sql.adaptive) whose
skewJoin splits oversized sort-merge partitions at runtime. This tool
answers "which one should a user reach for" empirically, on a PLANTED
hot key over the 10x fixture:

- join_plain_aqe:   plain join, AQE + skewJoin ON (runtime re-plan)
- join_plain_noaqe: plain join, AQE OFF (the melt baseline)
- join_salted:      hand-salted join (q_join_salted's shape), AQE OFF
- agg_plain:        plain groupBy on the 3-value key (partial agg
                    handles group skew map-side — the null hypothesis)
- agg_salted:       q_agg_salted's two-phase shape

Skew plant: 30% of lineitem rows get one hot orderkey (deterministic
xxhash64 gate), so one join key carries ~1.8M rows at 10x — the
distribution that melts a single reducer without mitigation.

Usage: python tools/aqe_vs_salting.py [--sf01]
Prints one JSON line; conclusions recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo_olap_spark.session import get_spark

N_SALTS = 16
HOT_KEY = 424242


def skewed_lineitem(spark, sf_dir: str):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    return li.withColumn(
        "l_orderkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < 3,
            F.lit(HOT_KEY),
        ).otherwise(F.col("l_orderkey")),
    )


def hot_orders(spark, sf_dir: str):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    # make sure the hot key exists on the build side too
    hot = spark.range(1).select(
        F.lit(HOT_KEY).cast("long").alias("o_orderkey"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    return o.where(F.col("o_orderkey") != HOT_KEY).unionByName(hot)


def timed(thunk) -> float:
    """Warm-up run (codegen + shuffle-file cache), then the measured
    run — otherwise whichever variant runs first eats the JIT bill and
    the comparison measures ordering, not strategy."""
    thunk()
    t0 = time.time()
    thunk()
    return round(time.time() - t0, 2)


def run(spark, sf_dir: str) -> dict:
    out: dict = {}
    li = skewed_lineitem(spark, sf_dir)
    o = hot_orders(spark, sf_dir)
    # pin both inputs so every variant pays the same scan cost
    li.persist().count()
    o.persist().count()
    # force SMJ: the dim side would broadcast at this scale, and a
    # broadcast join can't skew by construction — the experiment is
    # about the shuffle-join regime (at 100 TB neither side broadcasts)
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    prev_bcast = spark.conf.get(bcast_key)
    aqe_key = "spark.sql.adaptive.enabled"
    prev_aqe = spark.conf.get(aqe_key)
    spark.conf.set(bcast_key, "-1")

    def plain_join():
        (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
            .write.format("noop").mode("overwrite").save()
        )

    def salted_join():
        lis = li.withColumn(
            "salt", F.pmod(F.xxhash64("l_linenumber", "l_partkey"), F.lit(N_SALTS))
        )
        os_ = o.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
        )
        (
            lis.join(os_, (lis.l_orderkey == os_.o_orderkey) & (lis.salt == os_.salt))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
            .write.format("noop").mode("overwrite").save()
        )

    spark.conf.set(aqe_key, "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["join_plain_aqe"] = timed(plain_join)
    # force the skew-split to actually fire: the hot partition here is
    # ~54 MB, under the 256 MB default threshold — tuned to 8 MB the
    # mechanism engages, which is what a 100 TB hot key would hit at
    # the DEFAULT threshold
    thr = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    fac = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    prev_thr, prev_fac, prev_adv = (
        spark.conf.get(thr), spark.conf.get(fac), spark.conf.get(adv)
    )
    spark.conf.set(thr, "8m")
    spark.conf.set(fac, "2")
    spark.conf.set(adv, "8m")
    out["join_plain_aqe_split"] = timed(plain_join)
    spark.conf.set(thr, prev_thr)
    spark.conf.set(fac, prev_fac)
    spark.conf.set(adv, prev_adv)
    spark.conf.set(aqe_key, "false")
    out["join_plain_noaqe"] = timed(plain_join)
    out["join_salted_noaqe"] = timed(salted_join)
    spark.conf.set(aqe_key, "true")
    out["join_salted_aqe"] = timed(salted_join)

    def plain_agg():
        (
            li.groupBy(F.pmod("l_orderkey", F.lit(3)).alias("k"))
            .agg(F.sum("l_quantity").alias("qty"), F.count("*").alias("n"))
            .write.format("noop").mode("overwrite").save()
        )

    def salted_agg():
        (
            li.withColumn(
                "salt",
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)),
            )
            .groupBy(F.pmod("l_orderkey", F.lit(3)).alias("k"), "salt")
            .agg(F.sum("l_quantity").alias("qty"), F.count("*").alias("n"))
            .groupBy("k")
            .agg(F.sum("qty").alias("qty"), F.sum("n").alias("n"))
            .write.format("noop").mode("overwrite").save()
        )

    out["agg_plain"] = timed(plain_agg)
    out["agg_salted"] = timed(salted_agg)

    spark.conf.set(bcast_key, prev_bcast)
    spark.conf.set(aqe_key, prev_aqe)
    li.unpersist()
    o.unpersist()
    return out


def main() -> None:
    sf_dir = (
        "/root/testdata/sf0.1" if "--sf01" in sys.argv else "/tmp/neo_olap_sf1_full"
    )
    spark = get_spark(
        "neo-olap-aqe-vs-salt", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    if not os.path.exists(f"{sf_dir}/lineitem.parquet"):
        from tools.soak_sf1_keys import build_sf1_full

        build_sf1_full(spark)
    print(json.dumps({"sf_dir": sf_dir, **run(spark, sf_dir)}))


if __name__ == "__main__":
    main()

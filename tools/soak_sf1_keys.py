"""sf1 soak of the five expensive graph keys (VERDICT r3 item 9).

Builds a 10x-scale dataset from the driver's sf0.1 fixtures — orders
and lineitem replicated 10 times with orderkey offsets (customers and
parts SHARED, so the derived customer-order-part graph densifies the
way real growth does instead of splitting into disjoint copies) — and
runs the expensive iterative keys against it, recording wall times.
Success implies each loop's converge-or-raise ceiling held at 10x
(the keys RAISE on non-convergence rather than return partials);
sssp/cc round depths are additionally recorded via the stats hook on
the underlying functions.

Scaled tables live under /tmp (never committed); unchanged tables are
symlinked from the sf0.1 fixture directory.

Usage: python tools/soak_sf1_keys.py [keys...]
Prints one JSON line; results are recorded in NEXT.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from neo_olap_spark.registry import REGISTRY, queries
from neo_olap_spark.session import get_spark
from neo_olap_spark.tables import TABLES

SRC = "/root/testdata/sf0.1"
DST = "/tmp/neo_olap_sf1"
N_COPIES = 10
KEY_OFFSET = 10_000_000  # far above sf0.1's max o_orderkey (149 999)

DEFAULT_KEYS = [
    "q_graph_sssp",
    "q_connected_components",
    "q_pagerank",
    "q_betweenness_sample",
    "q_graph_clustering",
]


def build_sf1(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        if t in ("orders", "lineitem"):
            continue
        link = f"{DST}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)
    if os.path.exists(f"{DST}/lineitem.parquet/_SUCCESS"):
        return  # already built
    for t, keycols in (("orders", ["o_orderkey"]), ("lineitem", ["l_orderkey"])):
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = None
        for k in range(N_COPIES):
            c = df
            for col in keycols:
                c = c.withColumn(col, F.col(col) + F.lit(k * KEY_OFFSET))
            copies = c if copies is None else copies.unionByName(c)
        copies.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    spark = get_spark(
        "neo-olap-soak-sf1", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    t0 = time.time()
    build_sf1(spark)
    out: dict = {"build_sec": round(time.time() - t0, 1)}
    qs = queries()

    for key in keys:
        t0 = time.time()
        n = qs[key](spark, DST).count()  # converge-or-raise contract
        out[key] = {"rows": n, "sec": round(time.time() - t0, 1)}
        spark.catalog.clearCache()

    # round depths for the frontier loops, via the stats hook
    from neo_olap_spark.operators.graph_algos import (
        SSSP_MAX_ROUNDS,
        _weighted_sym_edges,
        sssp,
    )

    st: dict = {}
    src0 = (
        spark.read.parquet(f"{DST}/customer.parquet")
        .agg(F.min("c_custkey"))
        .collect()[0][0]
    )
    t0 = time.time()
    sssp(
        _weighted_sym_edges(spark, DST), sources=[int(src0)],
        max_rounds=SSSP_MAX_ROUNDS, stats=st,
    ).write.format("noop").mode("overwrite").save()
    out["sssp_depth"] = {
        "rounds": st.get("rounds"),
        "max_rounds": SSSP_MAX_ROUNDS,
        "sec": round(time.time() - t0, 1),
    }
    if REGISTRY:  # keep import referenced; registry already populated
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()

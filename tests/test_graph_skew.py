"""Skew stress for the iterative graph loops (VERDICT r3 item 7).

The 100x failure mode for the graph loops is a power-law graph with a
super-node: if a loop's per-round shuffle keyed on the hub's id, one
reduce partition would receive nearly all the data and straggle. The
loops are designed so the REDUCE side of every round is keyed on the
receiving node id (uniform), never on the hub: the hub's fan-out is
spread by the join, then immediately re-keyed by destination.

These tests plant a hub graph (one node adjacent to every spoke, plus
a chain for depth) and assert (a) each loop converges within its
round bound with the exactly-known answer, and (b) the per-round
aggregate's partition row-count spread is bounded — no straggler
partition (via spark_partition_id).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo_olap_spark.operators.graph_algos import (
    connected_components,
    k_core,
    pagerank,
    sssp,
)

N_SPOKES = 2000
CHAIN_LEN = 20  # path hanging off spoke 1: depth for round-count tests


@pytest.fixture(scope="module")
def hub_graph(spark):
    """Symmetrized planted hub graph: node 0 -- i for i in 1..N_SPOKES,
    plus a chain N+1 -- N+2 -- ... hanging off spoke 1."""
    star = spark.range(1, N_SPOKES + 1).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    chain_ids = [(1, N_SPOKES + 1)] + [
        (N_SPOKES + i, N_SPOKES + i + 1) for i in range(1, CHAIN_LEN)
    ]
    chain = spark.createDataFrame(chain_ids, "src long, dst long")
    fwd = star.unionByName(chain)
    sym = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return sym.localCheckpoint()


def _partition_spread(df):
    """(max, mean) row count over non-empty output partitions.

    Measures OUTPUT balance (one row per key post-aggregation) — the
    weaker of the two skew properties; the load-bearing one is the
    map-side partial aggregation asserted in the plan check below,
    which bounds what the hub key can send through the shuffle."""
    counts = [
        r["count"]
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    ]
    return max(counts), sum(counts) / len(counts)


def test_hub_reduce_side_is_not_skewed(hub_graph):
    # the shape every loop round reduces through: aggregate keyed on
    # the RECEIVING node. Two properties keep a hub from straggling
    # the reduce:
    # (1) MAP-SIDE PARTIAL AGGREGATION — the plan must show a
    #     partial HashAggregate BELOW the Exchange, so what shuffles
    #     is one partial row per (map partition, key), never the
    #     hub's raw fan-in (2000 rows for dst=0 pre-combine);
    agg = hub_graph.groupBy("dst").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    pre_exchange = plan.split("Exchange", 1)[-1]
    assert "partial_count" in pre_exchange, plan
    # (2) OUTPUT KEY UNIFORMITY — the aggregated relation hashes one
    #     row per node id, so no reduce partition owns more than its
    #     share of keys (max <= 4x mean over 8 partitions, ~2020 keys)
    mx, mean = _partition_spread(agg)
    assert mx <= 4 * mean, (mx, mean)


def test_cc_on_hub_graph_converges_fast(hub_graph):
    nodes = hub_graph.select(F.col("src").alias("node")).distinct()
    # star diameter 2 + chain depth: rounds bounded by chain length,
    # NOT by hub degree — the hub cannot slow convergence
    out = connected_components(hub_graph, nodes, max_iters=CHAIN_LEN + 4)
    rows = out.collect()
    assert len(rows) == N_SPOKES + CHAIN_LEN + 1
    assert {r["component"] for r in rows} == {0}


def test_sssp_on_hub_graph_exact_depths(hub_graph):
    w = hub_graph.select("src", "dst", F.lit(1).alias("w"))
    out = sssp(w, sources=[0], max_rounds=CHAIN_LEN + 6)
    d = {r["node"]: r["dist"] for r in out.collect()}
    assert d[0] == 0
    assert all(d[i] == 1 for i in range(1, N_SPOKES + 1))  # every spoke: 1 hop
    for j in range(1, CHAIN_LEN + 1):  # chain: 2, 3, ... hops via spoke 1
        assert d[N_SPOKES + j] == 1 + j
    mx, mean = _partition_spread(out)
    assert mx <= 4 * mean, (mx, mean)


def test_pagerank_on_hub_graph_mass_and_spread(hub_graph):
    nodes = hub_graph.select(F.col("src").alias("node")).distinct()
    n_nodes = N_SPOKES + CHAIN_LEN + 1
    ranks = pagerank(hub_graph, nodes, n_iters=4)
    rows = ranks.collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - n_nodes) < 1e-6 * n_nodes  # mass conserved
    by_node = {r["node_id"]: r["rank"] for r in rows}
    assert by_node[0] > 100 * by_node[2]  # hub dominates a plain spoke
    mx, mean = _partition_spread(ranks)
    assert mx <= 4 * mean, (mx, mean)


def test_kcore_peels_hub_graph(hub_graph):
    # 2-core of a star+chain is EMPTY (every spoke/chain tip peels,
    # then the hub): the peeling loop must terminate and not choke on
    # the hub's degree
    assert k_core(hub_graph, k=2).count() == 0

"""Graph-algorithm invariants (SURVEY.md §5.3) on small fixtures.

The reference never tested its two analytics (R1/R2) — correctness was
eyeballed from printed top-10s (Runner.java:63). These tests close that
gap with structural invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo_olap_spark.operators.graph_algos import (
    bfs_distances,
    betweenness_sample,
    dense_index,
    random_walk_counts,
)


def test_dense_index_matches_global_rank(spark):
    # distributed two-phase index ≡ the single-task global window
    vals = [(v,) for v in [7, 3, 99, 42, 0, 15, 8, 23, 4, 100, 55]]
    df = spark.createDataFrame(vals, "node long")
    got = {r.node: r.idx for r in dense_index(df, "node", n_parts=4).collect()}
    want = {v: i for i, (v,) in enumerate(sorted(vals))}
    assert got == want


def _edges(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_bfs_path_graph(spark):
    # path 0-1-2-3-4: dist from 0 is the node id
    sym = _edges(spark, [(i, i + 1) for i in range(4)])
    src = spark.createDataFrame([(0, 0)], "tag long, node long")
    got = {r.node: r.dist for r in bfs_distances(sym, src, max_depth=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_counts_parallel_paths(spark):
    # diamond 0->{1,2}->3: two shortest paths to 3
    sym = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    src = spark.createDataFrame([(0, 0)], "tag long, node long")
    res = {
        r.node: (r.dist, r.npaths)
        for r in bfs_distances(sym, src, max_depth=5, count_paths=True).collect()
    }
    assert res[3] == (2, 2)
    assert res[1] == (1, 1) and res[2] == (1, 1)


def test_bfs_respects_max_depth(spark):
    sym = _edges(spark, [(i, i + 1) for i in range(6)])
    src = spark.createDataFrame([(0, 0)], "tag long, node long")
    got = bfs_distances(sym, src, max_depth=2)
    assert got.agg(F.max("dist")).first()[0] == 2


def test_walk_visit_conservation(spark, sf_dir):
    counts = random_walk_counts(spark, sf_dir, n_walkers=32, n_steps=5, seed=7)
    total = counts.agg(F.sum("visits")).first()[0]
    # every walker logs its start + one node per step
    assert total == 32 * (5 + 1)


def test_walk_deterministic(spark, sf_dir):
    a = random_walk_counts(spark, sf_dir, n_walkers=16, n_steps=4, seed=11)
    b = random_walk_counts(spark, sf_dir, n_walkers=16, n_steps=4, seed=11)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_betweenness_runs_and_deterministic(spark, sf_dir):
    a = betweenness_sample(spark, sf_dir, n_pairs=3, max_depth=4, seed=5)
    b = betweenness_sample(spark, sf_dir, n_pairs=3, max_depth=4, seed=5)
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb
    # interior counts are positive
    assert all(cnt > 0 for _, cnt in ra)


def test_pagerank_invariants(spark, sf_dir):
    from neo_olap_spark.operators.graph_algos import all_nodes, pagerank
    from neo_olap_spark.graph import edges, symmetrize

    sym = symmetrize(edges(spark, sf_dir))
    pr = pagerank(sym, all_nodes(spark, sf_dir), n_iters=4)
    rows = {r.node_id: r.rank for r in pr.collect()}
    n = len(rows)
    # damped power iteration preserves total mass: sum(rank) == n
    assert abs(sum(rows.values()) - n) < 1e-3 * n


def test_pagerank_star_hub_dominates(spark):
    from neo_olap_spark.operators.graph_algos import pagerank

    sym = _edges(spark, [(0, k) for k in range(1, 9)])
    nodes = spark.createDataFrame([(i,) for i in range(9)], "node long")
    pr = {r.node_id: r.rank for r in pagerank(sym, nodes, n_iters=6).collect()}
    assert pr[0] > max(pr[k] for k in range(1, 9)) * 2


def test_connected_components_fixture(spark):
    from neo_olap_spark.operators.graph_algos import connected_components

    # two disjoint cliques {0,1,2} and {10,11}, plus isolated 20
    sym = _edges(spark, [(0, 1), (1, 2), (0, 2), (10, 11)])
    nodes = spark.createDataFrame([(i,) for i in [0, 1, 2, 10, 11, 20]], "node long")
    got = {r.node_id: r.component for r in connected_components(sym, nodes).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20}


def test_triangle_count_planted_graphs(spark):
    from itertools import combinations

    from neo_olap_spark.operators.graph_algos import oriented_triangle_count

    # 5-clique (C(5,3)=10 triangles) ∪ disjoint 4-path (0 triangles)
    # ∪ one extra triangle sharing no edges with either
    clique = list(combinations(range(5), 2))
    path = [(10, 11), (11, 12), (12, 13), (13, 14)]
    tri = [(20, 21), (20, 22), (21, 22)]
    pairs = spark.createDataFrame(clique + path + tri, "u long, v long")
    n_edges, n_tri = oriented_triangle_count(pairs)
    assert n_edges == len(clique) + len(path) + len(tri)
    assert n_tri == 10 + 0 + 1


def test_triangle_count_hub_star(spark):
    # a star (hub 0 with 50 leaves) has many raw wedges but ZERO
    # triangles; degree orientation must return 0, not blow up
    from neo_olap_spark.operators.graph_algos import oriented_triangle_count

    pairs = spark.createDataFrame([(0, i) for i in range(1, 51)], "u long, v long")
    n_edges, n_tri = oriented_triangle_count(pairs)
    assert (n_edges, n_tri) == (50, 0)


def test_k_core_planted_graphs(spark):
    from neo_olap_spark.operators.graph_algos import k_core

    # path 0-1-2-3-4: 2-core is empty (endpoints peel, cascade inward)
    path = _edges(spark, [(i, i + 1) for i in range(4)])
    assert k_core(path, 2).count() == 0

    # 5-cycle: every node has degree 2 — the whole cycle survives
    cycle = _edges(spark, [(i, (i + 1) % 5) for i in range(5)])
    assert {r.node_id for r in k_core(cycle, 2).collect()} == set(range(5))

    # 4-clique with a pendant tail 100-101: tail peels, clique stays;
    # the clique is also the 3-core but not a 4-core
    from itertools import combinations

    clique = list(combinations(range(4), 2))
    g = _edges(spark, clique + [(0, 100), (100, 101)])
    assert {r.node_id for r in k_core(g, 2).collect()} == {0, 1, 2, 3}
    assert {r.node_id for r in k_core(g, 3).collect()} == {0, 1, 2, 3}
    assert k_core(g, 4).count() == 0

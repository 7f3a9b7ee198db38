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


def test_walk_broadcast_path_matches_loop_path(spark, sf_dir, monkeypatch):
    """r14 (guide §3.1): the broadcast-adjacency walk (adjacency as the
    build side, visit log carried as a path array, one job) must be
    row-identical to the streamed-adjacency loop (the at-scale shape).
    Same picks, same teleports — only the join direction and the
    logging mechanism differ."""
    import neo_olap_spark.operators.graph_algos as ga

    bcast = random_walk_counts(spark, sf_dir, n_walkers=24, n_steps=6, seed=3)
    rows_b = sorted(map(tuple, bcast.collect()))
    monkeypatch.setattr(ga, "_adj_fits_broadcast", lambda *a, **k: False)
    loop = random_walk_counts(spark, sf_dir, n_walkers=24, n_steps=6, seed=3)
    rows_l = sorted(map(tuple, loop.collect()))
    assert rows_b == rows_l


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


def test_personalized_pagerank_invariants(spark):
    """PPR on a chain 0-1-2-3-4 seeded at {0}: (a) total rank stays
    n_nodes (teleport injects (1-d)·N, damping scales the rest — mass
    conserved, same as uniform); (b) the seed dominates and the near
    half of the chain outranks the far half (strict per-hop
    monotonicity does NOT hold at a fixed iteration count — mass
    propagates in parity waves on a chain, verified against a numpy
    power iteration: node 4 transiently outranks node 3 at 8 iters);
    (c) seeds=None reduces to classic PageRank (chain symmetry: ends
    equal, middle maximal)."""
    from neo_olap_spark.operators.graph_algos import pagerank

    sym = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    ppr = {
        r.node_id: r.rank
        for r in pagerank(sym, nodes, n_iters=8, seeds=[0]).collect()
    }
    assert abs(sum(ppr.values()) - 5) < 1e-3 * 5
    assert ppr[0] == max(ppr.values())
    assert min(ppr[0], ppr[1], ppr[2]) > max(ppr[3], ppr[4])
    # exact values pinned against an independent numpy power iteration
    assert ppr[0] == 1.639336 and ppr[4] == 0.400011
    uni = {
        r.node_id: r.rank for r in pagerank(sym, nodes, n_iters=8).collect()
    }
    assert uni[0] == uni[4] and uni[1] == uni[3]
    assert uni[2] >= uni[1] and uni[1] > uni[0]


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


def test_k_core_power_law_hub_survives(spark):
    """Skewed fixture the symmetric graphs don't distinguish: a hub
    with 50 pendant leaves AND 4 clique neighbors. Peeling must strip
    the pendant fringe without cascading through the hub — its clique
    support keeps it in every core the clique is in."""
    from itertools import combinations

    from neo_olap_spark.operators.graph_algos import k_core

    clique = list(combinations(range(4), 2))          # 4-clique 0..3
    spokes = [(100, c) for c in range(4)]             # hub 100 -> clique
    fringe = [(100, 200 + i) for i in range(50)]      # 50 pendant leaves
    g = _edges(spark, clique + spokes + fringe)
    # 2-core: fringe peels, hub + clique stay
    assert {r.node_id for r in k_core(g, 2).collect()} == {0, 1, 2, 3, 100}
    # 4-core: clique nodes have 3 clique + 1 hub edges, hub has 4 —
    # exactly degree 4 each, all survive; 5-core is empty
    assert {r.node_id for r in k_core(g, 4).collect()} == {0, 1, 2, 3, 100}
    assert k_core(g, 5).count() == 0


def test_betweenness_star_hub_dominates(spark):
    """Power-law extreme: a star. Every leaf-to-leaf shortest path has
    exactly one interior node — the hub — so it must be the ONLY node
    credited, once per pair."""
    from neo_olap_spark.operators.graph_algos import betweenness_pair_counts

    sym = _edges(spark, [(0, k) for k in range(1, 21)])
    pairs = spark.createDataFrame(
        [(0, 1, 2), (1, 3, 4), (2, 5, 6)], "pair_id int, a long, b long"
    )
    got = {r.node_id: r.cnt for r in betweenness_pair_counts(sym, pairs, 4).collect()}
    assert got == {0: 3}


def test_betweenness_double_bridge_path_counts(spark):
    """Barbell with a 2-wide waist: 2-{0,1}-5-{10,11}-12. Four shortest
    paths, bridge node 5 on all of them, each waist node on two —
    the bridge strictly dominates and the counts are the Brandes
    products, not just 0/1 flags."""
    from neo_olap_spark.operators.graph_algos import betweenness_pair_counts

    edges = [(2, 0), (2, 1), (0, 5), (1, 5), (5, 10), (5, 11), (10, 12), (11, 12)]
    sym = _edges(spark, edges)
    pairs = spark.createDataFrame([(0, 2, 12)], "pair_id int, a long, b long")
    got = {r.node_id: r.cnt for r in betweenness_pair_counts(sym, pairs, 6).collect()}
    assert got == {0: 2, 1: 2, 5: 4, 10: 2, 11: 2}


def test_copurchase_basket_cap(spark, monkeypatch, tmp_path):
    """A degenerate mega-basket must be truncated to MAX_BASKET_PARTS
    lowest part ids before the pair self-join — bounding the quadratic
    blowup — while normal baskets pair in full."""
    from itertools import combinations

    from neo_olap_spark.operators import graph_algos

    mega = [(1, p) for p in range(100)]              # one 100-part order
    normal = [(2, p) for p in (500, 501, 502)]       # a 3-part order
    dup = [(2, 500)]                                 # duplicate line: must not double-pair
    spark.createDataFrame(
        mega + normal + dup, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    monkeypatch.setattr(graph_algos, "MAX_BASKET_PARTS", 8)
    pairs = graph_algos._copurchase_pairs(spark, str(tmp_path)).collect()
    got = {(r.u, r.v) for r in pairs}
    want = {(u, v) for u, v in combinations(range(8), 2)} | {
        (500, 501), (500, 502), (501, 502)
    }
    # capped: C(8,2)+C(3,2)=31 pairs, only the 8 LOWEST mega part ids
    assert got == want


def test_label_propagation_two_cliques(spark):
    """Two 5-cliques joined by a single bridge edge: after a few
    synchronous rounds every clique member carries its clique's
    minimum id, and the bridge does not merge the communities (a
    single cross-edge vote never outnumbers the in-clique majority)."""
    from itertools import combinations

    from neo_olap_spark.operators.graph_algos import label_propagation

    a = [(u, v) for u, v in combinations(range(5), 2)]
    b = [(u, v) for u, v in combinations(range(10, 15), 2)]
    bridge = [(4, 10)]
    e = _edges(spark, a + b + bridge)
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(5)) + list(range(10, 15))], "node long"
    )
    got = {
        r["node_id"]: r["community"]
        for r in label_propagation(e, nodes, n_rounds=4).collect()
    }
    assert all(got[i] == 0 for i in range(5)), got
    assert all(got[i] == 10 for i in range(10, 15)), got


def test_label_propagation_isolated_node_keeps_label(spark):
    """A node with no edges keeps its own id through every round."""
    from neo_olap_spark.operators.graph_algos import label_propagation

    e = _edges(spark, [(0, 1)])
    nodes = spark.createDataFrame([(0,), (1,), (99,)], "node long")
    got = {
        r["node_id"]: r["community"]
        for r in label_propagation(e, nodes, n_rounds=3).collect()
    }
    assert got[99] == 99
    # the 0-1 pair swaps labels every synchronous round (the canonical
    # LPA oscillation); after an odd round count they are swapped —
    # deterministic, which is exactly what the fixed round count buys
    assert got[0] == 1 and got[1] == 0


def test_sssp_prefers_cheap_long_path(spark):
    """Weighted SSSP must take the 3-hop cost-3 path over the 1-hop
    cost-10 edge — the exact case hop-BFS gets wrong — and must
    relax nodes even after first arrival."""
    from neo_olap_spark.operators.graph_algos import sssp

    edges = spark.createDataFrame(
        [
            (0, 1, 10),  # direct but expensive
            (0, 2, 1), (2, 3, 1), (3, 1, 1),  # long but cheap
            (1, 4, 1),
        ],
        "src long, dst long, w long",
    )
    sym = edges.unionAll(edges.selectExpr("dst as src", "src as dst", "w"))
    dist = {r["node"]: r["dist"] for r in sssp(sym, [0], max_rounds=10).collect()}
    assert dist == {0: 0, 1: 3, 2: 1, 3: 2, 4: 4}


def test_sssp_raises_when_ceiling_too_low(spark):
    """A chain longer than the round ceiling must RAISE, never return
    partial distances (the convergence safety contract)."""
    import pytest as _pytest

    from neo_olap_spark.operators.graph_algos import sssp

    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], "src long, dst long, w long"
    )
    sym = chain.unionAll(chain.selectExpr("dst as src", "src as dst", "w"))
    with _pytest.raises(RuntimeError, match="did not converge"):
        sssp(sym, [0], max_rounds=3)


def test_sssp_merge_strategies_agree(spark, sf_dir):
    """The size-gated merge strategies (union+groupBy for small state,
    partition-preserving full-outer for large) are a pure
    shuffle-volume trade: identical distances, round for round, on the
    real derived graph with multiple sources."""
    from neo_olap_spark.operators.graph_algos import (
        _weighted_sym_edges,
        sssp,
    )
    from neo_olap_spark.tables import load

    wsym = _weighted_sym_edges(spark, sf_dir).localCheckpoint()
    srcs = [
        r[0]
        for r in load(spark, sf_dir, "customer")
        .select("c_custkey").orderBy("c_custkey").limit(2).collect()
    ]
    a = {
        (r.source, r.node): r.dist
        for r in sssp(wsym, srcs, union_merge=True).collect()
    }
    b = {
        (r.source, r.node): r.dist
        for r in sssp(wsym, srcs, union_merge=False).collect()
    }
    assert a == b


def test_sssp_per_source_early_exit(spark):
    """r12: sources with different depths must each exit at their own
    depth (the frozen state drops out of the live loop), and the
    multi-source answer must be row-identical to running each source
    alone — the independence claim the early exit rests on. Source 0
    sits on a deep chain; source 100 is a 1-hop star that converges
    rounds earlier."""
    from neo_olap_spark.operators.graph_algos import sssp

    chain = [(i, i + 1, 1) for i in range(8)]          # depth-8 from 0
    star = [(100, 101, 1), (100, 102, 1)]              # depth-1 from 100
    edges = spark.createDataFrame(
        chain + star, "src long, dst long, w long"
    )
    sym = edges.unionAll(edges.selectExpr("dst as src", "src as dst", "w"))
    stats: dict = {}
    multi = {
        (r.source, r.node): r.dist
        for r in sssp(
            sym, [0, 100], max_rounds=20, hops_per_round=1, stats=stats
        ).collect()
    }
    exits = stats["source_exit_rounds"]
    assert set(exits) == {0, 100}
    assert exits[100] < exits[0], exits  # star exits before the chain
    singles: dict = {}
    for s in (0, 100):
        singles.update({
            (r.source, r.node): r.dist
            for r in sssp(sym, [s], max_rounds=20).collect()
        })
    assert multi == singles


def test_sssp_frozen_coalesce_bounds_plan_depth(spark, monkeypatch):
    """r13 (ADVICE r12 #2): a source batch with many DISTINCT exit
    rounds must coalesce its frozen frames once the cap is crossed —
    values identical to the uncoalesced run, and the coalesce path
    actually exercised (stats counter). Chains of staggered depths
    force one exit event per depth; cap=2 forces repeated coalescing
    at toy scale."""
    import neo_olap_spark.operators.graph_algos as ga

    # six chains of depths 1..6 rooted at 100, 200, ..., 600: source
    # s exits at its own depth, giving six distinct exit rounds
    edges = []
    roots = [100 * (d + 1) for d in range(6)]
    for d, root in enumerate(roots, start=1):
        edges += [(root + i, root + i + 1, 1) for i in range(d)]
    sym_edges = spark.createDataFrame(edges, "src long, dst long, w long")
    sym = sym_edges.unionAll(
        sym_edges.selectExpr("dst as src", "src as dst", "w")
    )
    baseline = {
        (r.source, r.node): r.dist
        for r in ga.sssp(sym, roots, max_rounds=20, hops_per_round=1).collect()
    }
    monkeypatch.setattr(ga, "SSSP_FROZEN_COALESCE_CAP", 2)
    stats: dict = {}
    coalesced = {
        (r.source, r.node): r.dist
        for r in ga.sssp(
            sym, roots, max_rounds=20, hops_per_round=1, stats=stats
        ).collect()
    }
    assert stats.get("frozen_coalesces", 0) >= 2, stats
    assert coalesced == baseline


def test_reliable_loop_checkpoint_mode_matches_default(spark, tmp_path):
    """r14 (VERDICT r13 item 7): with
    spark.neo_olap.reliableLoopCheckpoint=true every loop-state
    checkpoint goes through a reliable checkpoint() into the
    configured dir instead of a non-replicated localCheckpoint —
    values must be identical, and the checkpoint dir must actually
    receive files (proving the reliable path ran)."""
    import os

    from neo_olap_spark.functions import (
        RELIABLE_CKPT_CONF,
        RELIABLE_CKPT_DIR_CONF,
    )
    from neo_olap_spark.operators.graph_algos import (
        connected_components,
        sssp,
    )

    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], "src long, dst long, w long"
    )
    sym = chain.unionAll(chain.selectExpr("dst as src", "src as dst", "w"))
    nodes = spark.createDataFrame([(i,) for i in range(7)], "node long")

    base_sssp = {
        (r.source, r.node): r.dist
        for r in sssp(sym, [0], max_rounds=12).collect()
    }
    base_cc = {
        r.node_id: r.component
        for r in connected_components(sym.select("src", "dst"), nodes).collect()
    }
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    spark.conf.set(RELIABLE_CKPT_CONF, "true")
    spark.conf.set(RELIABLE_CKPT_DIR_CONF, ckpt_dir)
    try:
        rel_sssp = {
            (r.source, r.node): r.dist
            for r in sssp(sym, [0], max_rounds=12).collect()
        }
        rel_cc = {
            r.node_id: r.component
            for r in connected_components(
                sym.select("src", "dst"), nodes
            ).collect()
        }
    finally:
        spark.conf.set(RELIABLE_CKPT_CONF, "false")
    assert rel_sssp == base_sssp
    assert rel_cc == base_cc
    # the reliable path must have written checkpoint files
    found = any(files for _, _, files in os.walk(ckpt_dir))
    assert found, f"no checkpoint files under {ckpt_dir}"


def test_sssp_hops_per_round_agree(spark, sf_dir):
    """hops_per_round changes only the convergence-check cadence (how
    many lazily-checkpointed relaxations share one count job), never
    the state trajectory: distances must be identical for 1, 2, and 3
    hops per round, including an odd hop count that exercises the
    max_rounds boundary count."""
    from neo_olap_spark.operators.graph_algos import _weighted_sym_edges, sssp
    from neo_olap_spark.tables import load

    wsym = _weighted_sym_edges(spark, sf_dir).localCheckpoint()
    src = [
        int(
            load(spark, sf_dir, "customer").agg(F.min("c_custkey")).collect()[0][0]
        )
    ]
    got = [
        {(r.source, r.node): r.dist for r in sssp(wsym, src, hops_per_round=h).collect()}
        for h in (1, 2, 3)
    ]
    assert got[0] == got[1] == got[2]


def test_sssp_two_hop_raises_when_ceiling_too_low(spark):
    """The raise contract holds under multi-hop rounds: the ceiling is
    a RELAXATION count, and the boundary forces a convergence check,
    so a too-short ceiling raises exactly as with one-hop — even when
    max_rounds is odd and not a multiple of hops_per_round."""
    import pytest as _pytest

    from neo_olap_spark.operators.graph_algos import sssp

    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], "src long, dst long, w long"
    )
    sym = chain.unionAll(chain.selectExpr("dst as src", "src as dst", "w"))
    with _pytest.raises(RuntimeError, match="did not converge"):
        sssp(sym, [0], max_rounds=3, hops_per_round=2)


def test_hits_role_separation(spark, sf_dir):
    """On the directed customer->order->part graph, customers have no
    in-edges (pure hubs: authority exactly 0) and parts no out-edges
    (pure authorities: hub exactly 0); both score vectors L1-normalize
    to n_nodes."""
    from neo_olap_spark.graph import PART_OFFSET, ORDER_OFFSET
    from neo_olap_spark.operators.graph_algos import q_graph_hits

    rows = q_graph_hits(spark, sf_dir).collect()
    n = len(rows)
    assert abs(sum(r.hub for r in rows) - n) < 1e-2 * n
    assert abs(sum(r.auth for r in rows) - n) < 1e-2 * n
    for r in rows:
        if r.node_id < ORDER_OFFSET:  # customer
            assert r.auth == 0.0, r
        elif r.node_id >= PART_OFFSET:  # part
            assert r.hub == 0.0, r
    # the mutually-reinforcing scores are non-trivial on both sides
    assert max(r.hub for r in rows) > 0 and max(r.auth for r in rows) > 0


def test_hits_planted_numpy_pinned(spark):
    """HITS on a tiny directed graph, pinned against an independent
    numpy power iteration (same L1-to-n normalization each half-step):
    0,1 point at {2,3},{3,4}; 2 points at 4 — so 1 is the best hub
    (its targets are the strongest authorities) and 3 the best
    authority. Values compared at one 1e-5 quantum of tolerance (the
    output grid) — the engines' 3-term sums match numpy's to the last
    ulp but the pin shouldn't hinge on it."""
    import neo_olap_spark.graph as g
    import neo_olap_spark.operators.graph_algos as ga

    e = spark.createDataFrame(
        [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4)], "src long, dst long"
    )
    n = spark.createDataFrame([(i,) for i in range(5)], "node long")
    orig = (ga.edges, ga.all_nodes, g.edge_count_estimate)
    ga.edges = lambda _s, _d: e
    ga.all_nodes = lambda _s, _d: n
    g.edge_count_estimate = lambda _s, _d: 5
    try:
        got = {
            r.node_id: (r.hub, r.auth)
            for r in ga.q_graph_hits(spark, "unused").collect()
        }
    finally:
        ga.edges, ga.all_nodes, g.edge_count_estimate = orig
    want = {
        0: (1.78374, 0.0),
        1: (2.22544, 0.0),
        2: (0.99082, 0.98958),
        3: (0.0, 2.22488),
        4: (0.0, 1.78554),
    }
    for node, (h, a) in want.items():
        assert abs(got[node][0] - h) <= 1e-5, (node, got[node])
        assert abs(got[node][1] - a) <= 1e-5, (node, got[node])


def test_hits_checkpoint_raw_agrees(spark, sf_dir):
    """The raw-push checkpoint (round-8 plan-audit fix: a_raw/h_raw
    feed two consumers, so the un-checkpointed shape executes every
    edge join twice) must be a pure execution-strategy change.
    Compared within ONE 1e-5 output quantum, not exactly: the L1
    normalizer is an order-dependent double sum across two independent
    executions, so a score within an ulp of a quantizer boundary can
    legitimately flip its last digit between runs (the
    test_hits_planted_numpy_pinned tolerance rationale)."""
    from neo_olap_spark.graph import edge_count_estimate
    from neo_olap_spark.operators.graph_algos import all_nodes, edges, hits

    de = edges(spark, sf_dir)
    nodes = all_nodes(spark, sf_dir)
    n_edges = edge_count_estimate(spark, sf_dir)
    a = {
        r.node_id: (r.hub, r.auth)
        for r in hits(de, nodes, n_iters=3, n_edges=n_edges,
                      checkpoint_raw=True).collect()
    }
    b = {
        r.node_id: (r.hub, r.auth)
        for r in hits(de, nodes, n_iters=3, n_edges=n_edges,
                      checkpoint_raw=False).collect()
    }
    assert a.keys() == b.keys()
    for node in a:
        assert abs(a[node][0] - b[node][0]) <= 1e-5, (node, a[node], b[node])
        assert abs(a[node][1] - b[node][1]) <= 1e-5, (node, a[node], b[node])


def test_edge_count_hint_releases_cache_on_failure(spark):
    """The n_edges=None fallback must unpersist its edge cache even
    when the loop body raises (round-9 ADVICE: the old hits() shape
    pinned the cache for the session on a pre-loop failure)."""
    import pytest

    from neo_olap_spark.operators.graph_algos import _edge_count_hint

    df = spark.range(100).selectExpr("id AS src", "id + 1 AS dst")
    with pytest.raises(RuntimeError, match="boom"):
        with _edge_count_hint(df, None) as (cached, n):
            assert n == 100
            assert cached.storageLevel.useMemory  # persisted for reuse
            raise RuntimeError("boom")
    assert not cached.storageLevel.useMemory  # released on the error path
    # the n_edges-provided path must not persist anything
    with _edge_count_hint(df, 42) as (same, n):
        assert same is df and n == 42
        assert not df.storageLevel.useMemory

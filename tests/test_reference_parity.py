"""Ports of the reference's unit tests onto DataFrames (SURVEY.md §5.2).

Each test re-expresses one reference JUnit test's semantics against the
Spark engine, using the FIXTURES.md fixture definitions:

- TopNSelectorTest.java:16-36  -> f_counts_small  ({6,3,1,9} goldens)
- TopNSelectorTest.java:39-57  -> f_counts_planted (noise + planted maxima)
- ArrayStoreTest.java:17-38    -> f_array_roundtrip (sink/source identity)
- (untested in reference)      -> f_graph_path BFS / betweenness goldens
"""

from __future__ import annotations

import random
import shutil
import tempfile

from pyspark.sql import functions as F

from neo_olap_spark.operators.graph_algos import bfs_distances


def _topn(df, n):
    return [
        (r.node_id, r.cnt)
        for r in df.orderBy(F.desc("cnt"), "node_id").limit(n).collect()
    ]


def test_topn_small_fixture(spark):
    # TopNSelectorTest.java:16-36 — {6,3,1,9}: top-1 = (3,9); top-3 descending
    df = spark.createDataFrame(
        [(0, 6), (1, 3), (2, 1), (3, 9)], "node_id long, cnt int"
    )
    assert _topn(df, 1) == [(3, 9)]
    assert _topn(df, 3) == [(3, 9), (0, 6), (1, 3)]


def test_topn_planted_maxima(spark):
    # TopNSelectorTest.java:39-57 — 10k uniform noise, 3 planted maxima
    rnd = random.Random(42)
    rows = [(i, rnd.randrange(100_000)) for i in range(10_000)]
    for node_id, cnt in ((100, 100_001), (1000, 100_002), (2000, 100_003)):
        rows[node_id] = (node_id, cnt)
    df = spark.createDataFrame(rows, "node_id long, cnt int")
    assert _topn(df, 3) == [(2000, 100_003), (1000, 100_002), (100, 100_001)]


def test_parquet_roundtrip_identity(spark):
    # ArrayStoreTest.java:17-38 — write->read preserves count/schema/values;
    # the 25 Mi-int stress shrinks to 100k rows (chunking is parquet's job)
    for n in (10, 100_000):
        df = spark.range(n).select(
            F.col("id").alias("idx"), F.lit(42).cast("int").alias("val")
        )
        out = tempfile.mkdtemp(prefix="neo_olap_array_rt_")
        try:
            df.write.mode("overwrite").parquet(out)
            back = spark.read.parquet(out)
            # nullability relaxes on parquet read-back; names/types must hold
            assert [(f.name, f.dataType) for f in back.schema] == [
                (f.name, f.dataType) for f in df.schema
            ]
            assert back.count() == n
            agg = back.agg(
                F.sum("val").alias("s"), F.min("val").alias("lo"), F.max("val").alias("hi")
            ).first()
            assert (agg.s, agg.lo, agg.hi) == (42 * n, 42, 42)
        finally:
            shutil.rmtree(out, ignore_errors=True)


def _sym(spark, pairs):
    e = spark.createDataFrame(pairs, "src long, dst long")
    return e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


PATH_GRAPH = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 5)]


def test_graph_path_shortest_distances(spark):
    # f_graph_path: 0-1-2-3-4-5-6 chain + shortcut 1-5
    sym = _sym(spark, PATH_GRAPH)
    src = spark.createDataFrame([(0, 0), (2, 2)], "tag long, node long")
    d = {
        (r.tag, r.node): r.dist
        for r in bfs_distances(sym, src, max_depth=10).collect()
    }
    assert d[(0, 6)] == 3  # via 0-1-5-6
    assert d[(2, 4)] == 2


def test_graph_path_interior_counting_ranks_shortcut_nodes(spark):
    # Interior-node counting over all-pairs shortest paths must rank
    # nodes 1 and 5 highest — they carry the shortcut (OlapRunner
    # .java:49-58 interior-only rule: endpoints skipped).
    sym = _sym(spark, PATH_GRAPH)
    nodes = list(range(7))
    srcs = spark.createDataFrame([(n, n) for n in nodes], "tag long, node long")
    fwd = bfs_distances(sym, srcs, max_depth=10, count_paths=True)

    f = fwd.select("tag", "node", F.col("dist").alias("da"), F.col("npaths").alias("pa"))
    g = fwd.select(
        F.col("tag").alias("b"), F.col("node").alias("node2"),
        F.col("dist").alias("db"), F.col("npaths").alias("pb"),
    )
    d_ab = fwd.select(F.col("tag").alias("a2"), F.col("node").alias("b2"), F.col("dist").alias("dab"))
    interior = (
        f.crossJoin(g.where(F.col("b") > -1))
        .where(F.col("node") == F.col("node2"))
        .join(d_ab, (F.col("tag") == F.col("a2")) & (F.col("b") == F.col("b2")))
        .where(F.col("tag") < F.col("b"))  # each unordered pair once
        .where(F.col("da") + F.col("db") == F.col("dab"))
        .where((F.col("node") != F.col("tag")) & (F.col("node") != F.col("b")))
        .groupBy("node")
        .agg(F.sum(F.col("pa") * F.col("pb")).alias("cnt"))
    )
    counts = {r.node: r.cnt for r in interior.collect()}
    top = max(counts.values())
    assert counts[1] == top and counts[5] == top
    assert all(counts[n] < top for n in counts if n not in (1, 5))

"""Similarity search over the ``embeddings`` table (north star surface).

Two paths, mirroring how a 100 TB pipeline would tier them:

- brute-force cosine top-k (oracle-checked): broadcast the query set,
  score every corpus vector with a codegen'd expression, take top-k
  per query with a window — exact, O(corpus) per query batch, the
  right answer when the query set is small.
- IVF-style ANN (rows-only): coarse-quantize the corpus against a
  deterministic centroid set, probe only the closest nprobe cells —
  the scale path: the corpus is partitioned by cell, and a query
  touches nprobe/ncells of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from neo_olap_spark.registry import query
from neo_olap_spark.tables import load

TOP_K = 10
N_QUERIES = 5
N_CELLS = 16
N_PROBE = 4


def brute_force_topk(corpus: DataFrame, queries_df: DataFrame, k: int) -> DataFrame:
    """Exact cosine top-k: broadcast queries, score all, window top-k.
    Tie-break (rounded sim desc, vec_id asc) keeps results total-ordered."""
    from neo_olap_spark.functions import dot, norm

    q = queries_df.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    c = corpus.select(
        F.col("vec_id"), F.col("embedding").alias("ce"), norm(F.col("embedding")).alias("cn")
    )
    # norms per vector, dot per pair (folds are interpreted — see dedup)
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


@query(
    "q_sim_search",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id,
             ROUND(list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (TOP_K=10) for the N_QUERIES=5 query vectors."""
    e = load(spark, sf_dir, "embeddings")
    return brute_force_topk(e, e.where(F.col("vec_id") < N_QUERIES), TOP_K)


def ivf_topk(
    corpus: DataFrame,
    queries_df: DataFrame,
    k: int,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: centroids = the n_cells corpus vectors with the
    lowest xxhash64 (deterministic sampling — at scale: k-means fit on
    a sample); every vector is assigned to its nearest centroid; a
    query probes its n_probe nearest cells and brute-forces only those.
    """
    from neo_olap_spark.functions import dot, norm

    # norms precomputed per vector/centroid once — cosine() would
    # re-fold both norms per PAIR (see brute_force_topk)
    corpus_n = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("vn")
    )
    cents = (
        corpus_n.withColumn("h", F.xxhash64("vec_id", F.lit(seed)))
        .orderBy("h")
        .limit(n_cells)
        .select(
            F.row_number().over(W.orderBy("h")).alias("cell"),
            F.col("embedding").alias("cent"),
            F.col("vn").alias("cent_n"),
        )
    )
    # assign corpus vectors to nearest centroid (cells broadcast twice:
    # once for assignment, once for probing — both tiny)
    sim_to_cent = dot(F.col("embedding"), F.col("cent")) / (F.col("vn") * F.col("cent_n"))
    assign_w = W.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cell"))
    assigned = (
        corpus_n.crossJoin(F.broadcast(cents))
        .withColumn("cs", sim_to_cent)
        .withColumn("rn", F.row_number().over(assign_w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "vn", "cell")
    )
    probes = (
        queries_df.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            norm(F.col("embedding")).alias("qn"),
        )
        .crossJoin(F.broadcast(cents))
        .withColumn("cs", dot(F.col("qe"), F.col("cent")) / (F.col("qn") * F.col("cent_n")))
        .withColumn("rn", F.row_number().over(
            W.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("cell"))))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qe", "qn", "cell")
    )
    scored = (
        probes.join(assigned, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            F.round(dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("vn")), 6),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


@query("q_sim_ann_ivf")
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (TOP_K=10; rows-only; recall vs the
    exact q_sim_search is asserted in tests/test_llm_ops.py)."""
    e = load(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.where(F.col("vec_id") < N_QUERIES), TOP_K)

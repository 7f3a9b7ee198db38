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


KMEANS_SAMPLE_CAP = 10_000
KMEANS_ITERS = 10


def _kmeans_centroids(
    corpus_n: DataFrame,
    n_cells: int,
    seed: int,
    sample_cap: int = KMEANS_SAMPLE_CAP,
    n_iters: int = KMEANS_ITERS,
):
    """Spherical k-means centroids, fit driver-side on a deterministic
    hash-sample (the sample_cap vectors with the lowest xxhash64).

    The collect is bounded at O(sample_cap), never O(corpus) — the
    at-scale shape: a fixed-size sample fits a codebook the whole
    corpus is then quantized against distributedly. Determinism: init
    = the first n_cells sample vectors in hash order, fixed Lloyd
    iteration count, argmax ties to the lowest cell index. Returns a
    list of unit-norm centroid rows (cell, cent, cent_n=1.0).
    """
    import numpy as np

    sample = (
        corpus_n.withColumn("h", F.xxhash64("vec_id", F.lit(seed)))
        .orderBy("h")
        .limit(sample_cap)
        .select("embedding")
        .collect()
    )
    X = np.stack([r.embedding for r in sample]).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    C = X[: min(n_cells, len(X))].copy()
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return [(i + 1, [float(x) for x in C[i]], 1.0) for i in range(len(C))]


QUANT_MAX = 127  # symmetric int8 range (same scheme as q_embed_quantize)
RESCORE_FACTOR = 4  # candidate pool = RESCORE_FACTOR * k per query


def _dot_int(a, b):
    """Integer dot product of two int array columns, accumulated in
    long — int8 products can't overflow a 64-bit sum until ~5e14
    dimensions."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _quantize(emb):
    """(scale, int8-array) pair for a float embedding column —
    q_embed_quantize's scheme: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5). Engine-portable floor(x+.5)
    rounding, zero vectors get scale 0 and an all-zero code."""
    max_abs = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    q = F.when(
        max_abs > 0,
        F.transform(
            emb,
            lambda x: F.floor(x.cast("double") * QUANT_MAX / max_abs + 0.5).cast("int"),
        ),
    ).otherwise(F.transform(emb, lambda x: F.lit(0)))
    return (max_abs / QUANT_MAX).alias("scale"), q


def ivf_topk(
    corpus: DataFrame,
    queries_df: DataFrame,
    k: int,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    seed: int = 42,
    centroids: str = "kmeans",
    quantized: bool = False,
    rescore_factor: int = RESCORE_FACTOR,
) -> DataFrame:
    """IVF-style ANN: a centroid codebook coarse-quantizes the corpus;
    every vector is assigned to its nearest centroid; a query probes
    its n_probe nearest cells and brute-forces only those.

    centroids="kmeans" (default) fits a spherical k-means codebook on
    a bounded deterministic sample (_kmeans_centroids) — better cell
    balance and recall than raw sampling at equal n_probe (asserted in
    tests/test_llm_ops.py). centroids="hash" keeps the cheaper tier:
    the n_cells corpus vectors with the lowest xxhash64.

    quantized=True is the production memory shape (IVF-SQ8): the cell
    scan reads int8 codes + one scale per vector (4× smaller than
    float32, 8× than float64), ranks a candidate pool of
    rescore_factor·k per query by approximate int-dot cosine, then
    rescores ONLY the pool at full precision — the full-width
    embedding column is fetched for ≤ rescore_factor·k·n_queries rows
    instead of every probed-cell row.
    """
    from neo_olap_spark.functions import dot, norm, numbered_sample

    spark = corpus.sparkSession
    # norms precomputed per vector/centroid once — cosine() would
    # re-fold both norms per PAIR (see brute_force_topk)
    corpus_n = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("vn")
    )
    if centroids == "kmeans":
        cents = spark.createDataFrame(
            _kmeans_centroids(corpus_n, n_cells, seed),
            "cell int, cent array<double>, cent_n double",
        )
    else:
        cents = numbered_sample(
            corpus_n.withColumn("h", F.xxhash64("vec_id", F.lit(seed))),
            n_cells, "h", "_cell0",
        ).select(
            (F.col("_cell0") + 1).alias("cell"),
            F.col("embedding").alias("cent"),
            F.col("vn").alias("cent_n"),
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
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    if not quantized:
        scored = (
            probes.join(assigned, "cell")
            .where(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "cos_sim",
                F.round(
                    dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("vn")), 6
                ),
            )
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
            )
        )

    # --- IVF-SQ8 tier: int8 cell scan, full-precision rescore ---
    c_scale, c_code = _quantize(F.col("embedding"))
    qcorpus = assigned.select(
        "vec_id", "cell", "vn", c_scale.alias("c_scale"), c_code.alias("c_code")
    )
    q_scale, q_code = _quantize(F.col("qe"))
    qprobes = probes.select(
        "query_id", "qn", "cell", q_scale.alias("q_scale"), q_code.alias("q_code")
    )
    # approximate cosine: int-dot · both dequant scales / true norms;
    # only used to RANK the pool, so quantization error never reaches
    # the reported similarity
    pool_w = W.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("vec_id"))
    pool = (
        qprobes.join(qcorpus, "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "approx",
            _dot_int(F.col("q_code"), F.col("c_code"))
            * F.col("q_scale") * F.col("c_scale") / (F.col("qn") * F.col("vn")),
        )
        .withColumn("prn", F.row_number().over(pool_w))
        .where(F.col("prn") <= rescore_factor * k)
        .select("query_id", "vec_id")
    )
    # fetch full-width vectors for the pool only; exact cosine there
    full_q = queries_df.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        norm(F.col("embedding")).alias("qn"),
    )
    rescored = (
        pool.join(corpus_n, "vec_id")
        .join(F.broadcast(full_q), "query_id")
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("qe"), F.col("embedding")) / (F.col("qn") * F.col("vn")), 6
            ),
        )
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )
    )


@query("q_sim_ann_ivf")
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 approximate top-k (TOP_K=10; rows-only): k-means cells,
    int8-quantized cell scan, full-precision rescore of a 4·k pool —
    the production ANN memory shape (the hot scan reads 4× less than
    float32). Recall vs the exact q_sim_search, and vs the
    full-precision IVF tier at equal n_probe, is asserted in
    tests/test_llm_ops.py."""
    e = load(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.where(F.col("vec_id") < N_QUERIES), TOP_K, quantized=True)

"""Reusable column-expression kernels (all built-in functions, JVM-side).

UDF policy (SURVEY.md §7.4): built-ins first — these kernels are pure
Catalyst expressions, so they get whole-stage codegen and run at scale
with zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two ArrayType(Float/Double) columns, accumulated
    in double with left-to-right fold (matches DuckDB's sequential
    accumulation, so oracle comparisons agree to the last bits)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens)."""
    return F.split(F.trim(text), r"\s+")


def shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles of a token array (1-indexed
    element_at, matching DuckDB list indexing in the oracles).

    Guarded for short docs: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0] — unguarded it would index element 0 and error."""
    idx = F.when(
        F.size(tokens) >= k, F.sequence(F.lit(1), F.size(tokens) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(gram)


def bounded_sequence(n: Column, lo: int = 1) -> Column:
    """sequence(lo, n) that is EMPTY when n < lo (Spark's sequence
    descends when start > stop — a footgun for window indexing)."""
    return F.when(n >= lo, F.sequence(F.lit(lo), n)).otherwise(
        F.array().cast("array<int>")
    )


def bigrams(tokens: Column) -> Column:
    """Adjacent-pair bigram strings of a token array — NON-distinct
    (occurrence counts matter for repetition / LM scoring), unlike
    ``shingles``. Empty for arrays shorter than 2.

    The caller must barrier the token array (``localCheckpoint``)
    before this lambda indexes into it: computed-array lambdas
    re-inline their upstream per element (NEXT.md landmine #1)."""
    idx = bounded_sequence(F.size(tokens) - 1)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(tokens, i.cast("int")),
            F.element_at(tokens, (i + 1).cast("int")),
        ),
    )


def local_rows_frame(spark, rows, schema):
    """JVM LocalRelation from a SMALL driver-side row list, via Arrow.

    ``spark.createDataFrame(list, schema)`` builds a Python-RDD-backed
    scan; a job that file-writes such a frame (every bench key ends in
    a sink write) re-pays Python-worker setup on EVERY write — worker
    reuse covers collect-type jobs but not the write path (measured on
    this host: a 2-row frame's parquet/noop write costs ~4.5 s, every
    time, vs 0.2 s through Arrow). Routing the rows through a pandas
    frame makes createDataFrame emit an Arrow-backed LocalRelation
    evaluated entirely in the JVM — no Python worker in any consumer.

    ``dtype=object`` keeps None cells as None (a float column would
    coerce them to NaN); Arrow then casts per the EXPLICIT schema, so
    values and nullability match the plain-createDataFrame path
    exactly. Only for driver-small row lists (scalars, sentinels,
    dimension snapshots) — the same bound the old call sites already
    guaranteed."""
    import pandas as pd
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    names = [f.name for f in st.fields]
    pdf = pd.DataFrame(
        [tuple(r) for r in rows] or None, columns=names, dtype=object
    )
    return spark.createDataFrame(pdf, st)


def numbered_sample(df, n: int, order_col: str, idx_name: str):
    """The n lowest-``order_col`` rows of ``df``, numbered 0..n-1 as
    IntegerType (int, not long: seeded trajectories hash the id with
    xxhash64, which is TYPE-sensitive — int-vs-bigint ids produce
    different hashes and silently different "deterministic" runs).

    The set is bounded by n (TopN-pruned before numbering), so the
    numbering runs in ONE sorted partition via
    ``monotonically_increasing_id`` — no WindowExec at all. A
    ``partitionBy(lit(0))`` window does NOT silence Spark's "no
    partition defined" warning: Catalyst constant-folds the foldable
    partition key away and plans an unpartitioned window anyway.
    ``coalesce(1)`` is load-bearing: it is what makes
    monotonically_increasing_id start at 0 with no partition offsets."""
    return (
        df.orderBy(order_col)
        .limit(n)
        .coalesce(1)
        .sortWithinPartitions(order_col)
        .withColumn(idx_name, F.monotonically_increasing_id().cast("int"))
    )


RELIABLE_CKPT_CONF = "spark.neo_olap.reliableLoopCheckpoint"
RELIABLE_CKPT_DIR_CONF = "spark.neo_olap.checkpointDir"


def loop_checkpoint(df, eager: bool = True):
    """Checkpoint for ITERATIVE-LOOP state (r14, VERDICT r13 item 7).

    Default: ``localCheckpoint`` — executor-local blocks, cheap, the
    right local/bench trade. localCheckpoint is NON-replicated: at
    cluster scale an executor loss makes the lineage-truncated state
    unrecoverable (full job re-run). Setting the session conf
    ``spark.neo_olap.reliableLoopCheckpoint=true`` switches every loop
    state checkpoint to a reliable ``checkpoint()`` backed by
    ``spark.neo_olap.checkpointDir`` (or the context's already-set
    checkpoint dir) — slower per round (a filesystem write), but an
    executor loss then recovers from storage instead of recomputing
    the whole loop. Values are identical in both modes (pinned in
    tests/test_graph_algos.py); the default leaves every plan
    byte-identical to pre-r14."""
    spark = df.sparkSession
    if (
        spark.conf.get(RELIABLE_CKPT_CONF, "false").lower() == "true"
    ):
        sc = spark.sparkContext
        if sc._jsc.sc().checkpointDir().isEmpty():
            ckpt_dir = spark.conf.get(RELIABLE_CKPT_DIR_CONF, None)
            if ckpt_dir is None:
                raise ValueError(
                    f"{RELIABLE_CKPT_CONF}=true needs a checkpoint "
                    f"directory: set {RELIABLE_CKPT_DIR_CONF} or call "
                    "sparkContext.setCheckpointDir"
                )
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def scaled_parts(
    spark,
    n_rows: int | None = None,
    rows_per_part: int = 2_000_000,
    floor: int | None = None,
) -> int:
    """Partition count for distributed rank/prefix passes, derived
    from CLUSTER WIDTH (defaultParallelism) and, when known, the row
    count — never a hardcoded constant (VERDICT r13 item 3: a fixed 32
    re-creates the bounded-parallelism problem the distributed passes
    exist to kill, just 32× later). Capped at 10k like
    graph_algos._loop_shuffle_partitions."""
    base = max(floor or 0, spark.sparkContext.defaultParallelism)
    if n_rows is not None:
        base = max(base, (n_rows + rows_per_part - 1) // rows_per_part)
    return min(10_000, base)


def distributed_row_number(
    df, order_cols: list[str], n_parts: int | None = None, idx_name: str = "rk"
):
    """0-based global row number over ``order_cols``, DISTRIBUTED:
    range-partition on the order columns, rank within each partition,
    add per-partition offsets (n_parts scalars to the driver). The
    naive global row_number window funnels every row through one task
    — fine at 300k rows, fatal at 1e9 (same argument as
    graph_algos.dense_index, which is the distinct-values variant).
    ``n_parts=None`` derives the width from the cluster
    (scaled_parts) instead of any fixed constant. Returns
    (df columns..., idx_name, _total) where _total is the row count
    (free from the offset pass)."""
    from pyspark.sql import functions as F  # local: avoid cycle at import
    from pyspark.sql.window import Window as W

    spark = df.sparkSession
    if n_parts is None:
        n_parts = scaled_parts(spark, floor=32)
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # pin partition ids across the two passes
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = local_rows_frame(spark, offsets, "_pid int, _off long")
    w = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(idx_name, F.col("_off") + F.row_number().over(w) - 1)
        .withColumn("_total", F.lit(acc))
        .drop("_pid", "_off")
    )


def money_sum(col):
    """Order-independent money sum (repo landmine-(e) rule): per-row
    floor-shift to exact integer cents, SUM the integers, divide once
    — a double SUM's accumulation order is engine- and
    partitioning-dependent, so ROUND(SUM(double), 2) is a coin flip
    whenever a group lands on a half-cent. Accepts a column name or
    any Column expression (e.g. price * (1 - discount)). The oracle
    twin is the inline SQL form
    CAST(CAST(SUM(CAST(FLOOR(x*100+0.5) AS BIGINT)) AS BIGINT)
    AS DOUBLE)/100.0 — kept inline per oracle so each string stays a
    self-contained artifact the driver can run verbatim."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.sum(F.floor(c * 100 + F.lit(0.5)).cast("long")).cast("double") / 100.0


def trunc_div_sql(num: str, den: str, div: str) -> str:
    """Integer division truncated TOWARD ZERO as shared SQL text —
    DuckDB ``//`` floors (so negatives diverge) while Spark ANSI
    ``div`` truncates; the negate-divide-negate form computes the
    identical value under either semantic. ``div`` is the dialect's
    operator: ``'div'`` for Spark expressions, ``'//'`` for DuckDB
    oracles. ONE definition for every consumer (kmeans update,
    seasonal decomposition — round-10 self-review)."""
    return (
        f"CAST(CASE WHEN {num} >= 0 THEN ({num}) {div} ({den}) "
        f"ELSE -((-({num})) {div} ({den})) END AS BIGINT)"
    )

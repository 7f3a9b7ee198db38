"""Scalar function families (SURVEY.md §2.3), one oracle query each.

All expressions are built-in pyspark.sql.functions — JVM-side,
whole-stage-codegen'd; no Python in the hot path (UDF policy §7.4).
Outputs are engine-neutral: ints as BIGINT, computed doubles rounded,
dates as ISO strings / epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neo_olap_spark.registry import query
from neo_olap_spark.tables import load


@query(
    "q_scalar_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           SUBSTRING(c_name, 1, 8) AS prefix,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name,
           TRIM(c_name) AS trimmed,
           (c_name LIKE '%1%') AS has_one,
           COALESCE(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len
    FROM customer
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/substring/concat/trim/like/regexp/length."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.trim("c_name").alias("trimmed"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dom,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(epoch(o_orderdate) AS BIGINT) AS ts_epoch
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/day, datediff, date_add, epoch."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias("days_since"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        # parquet timestamps arrive as TIMESTAMP_NTZ; session TZ is UTC so
        # NTZ -> timestamp -> long yields the same epoch as DuckDB's epoch()
        F.col("o_orderdate").cast("timestamp").cast("long").alias("ts_epoch"),
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 4) AS root_price,
           ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
           ROUND(POWER(l_quantity, 2), 2) AS qty_sq,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_mod,
           ROUND(l_extendedprice, 1) AS price_r1
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: sqrt/abs/pow/pmod/round. Results rounded because
    libm implementations may differ in the last ulp across engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("root_price"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("key_mod"),
        F.round("l_extendedprice", 1).alias("price_r1"),
    )


@query(
    "q_scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           embedding[1] AS e1,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vsum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, element_at, aggregate (fold), filter —
    all higher-order built-ins over ArrayType(FloatType)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("e1"),
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("vsum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
    )


@query(
    "q_scalar_map",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: parse props into MapType, then map_keys/element_at."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, F.lit("k")).alias("k_val"),
    )


@query(
    "q_scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object path extraction."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
    )


@query(
    "q_scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 15 AS BIGINT) AS or15,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt,
           CAST(o_orderkey << 2 AS BIGINT) AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT) AS shr3
    FROM orders
    """,
)
def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, popcount, shifts — the machinery
    under hash bucketing, bitmask flags, and SimHash-style signatures."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(15)).cast("long").alias("or15"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("xored"),
        F.bit_count(k).cast("long").alias("popcnt"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
    )


@query(
    "q_scalar_posexplode",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
    )
    SELECT doc_id, CAST(p.pos AS BIGINT) AS pos, p.tok
    FROM (SELECT doc_id,
                 unnest(list_transform(toks, (x, i) -> struct_pack(pos := i - 1, tok := x))) AS p
          FROM t)
    """,
)
def q_scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view / posexplode: tokens with their positions — the
    order-preserving flatten used for positional n-gram work. A
    zero-shuffle Generate operator (each row expands in place);
    positions are 0-based (DuckDB's WITH ORDINALITY is 1-based, so
    the oracle shifts)."""
    from pyspark.sql.functions import posexplode

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    return d.select("doc_id", posexplode(toks).alias("pos", "tok")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "tok"
    )


@query(
    "q_scalar_struct",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_totalprice, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey,
           ROUND(o_totalprice, 2) AS best_price,
           best_orderkey
    FROM (SELECT o_custkey, o_totalprice, o_orderkey AS best_orderkey, rn FROM ranked)
    WHERE rn = 1
    """,
)
def q_scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: named-struct construction, lexicographic struct
    MAX, and field access. ``max(struct(price, key))`` is the argmax
    pattern — one hash aggregate gives "the row of the max" with no
    per-group sort, no window, and no join back to the fact table,
    which at 100 TB saves an entire shuffle vs the row_number approach
    (the oracle uses row_number because DuckDB's arg_max leaves ties
    unspecified)."""
    o = load(spark, sf_dir, "orders")
    best = o.groupBy("o_custkey").agg(
        F.max(
            F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
        ).alias("best")
    )
    return best.select(
        "o_custkey",
        F.round(F.col("best.p"), 2).alias("best_price"),
        F.col("best.k").alias("best_orderkey"),
    )


@query(
    "q_scalar_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label
    FROM orders
    """,
)
def q_scalar_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: when/otherwise, coalesce, nullif."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_label"),
    )


# URL-part extraction regexes — same syntax in Java regex and RE2.
# Group 1 of each is the part. Applied to URLs constructed
# deterministically from document metadata (the corpus has no URL
# column; the operator under test is the parsing, which is what a
# crawl pipeline runs on every record).
URL_HOST_RE = r"^https?://([^/?#]+)"
URL_PATH_RE = r"^https?://[^/?#]+(/[^?#]*)"
URL_QPARAM_RE = r"[?&]ref=([^&#]*)"


@query(
    "q_scalar_url",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.org/docs/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '?ref=' || lang || '&page=2' ELSE '' END
             AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '{URL_HOST_RE}', 1) AS host,
           regexp_extract(url, '{URL_PATH_RE}', 1) AS path,
           CASE WHEN regexp_matches(url, '{URL_QPARAM_RE}')
                THEN regexp_extract(url, '{URL_QPARAM_RE}', 1) ELSE NULL END AS ref_param,
           regexp_replace(url, '\\?.*$', '') AS url_canonical
    FROM u
    """,
)
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: host/path/query-param extraction and canonicalization
    (query-string strip) — the normalize step a crawl dedup runs before
    URL-level exact dedup. Pure per-row regex projections: zero
    shuffles, fused into the scan. Spark's empty-match regexp_extract
    returns '' where DuckDB returns NULL on no-match, so the no-match
    case is made explicit with a guard on both sides."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("?ref="), F.col("lang"), F.lit("&page=2")),
        ).otherwise(""),
    )
    has_ref = url.rlike(URL_QPARAM_RE)
    return d.select(
        "doc_id",
        url.alias("url"),
        F.regexp_extract(url, URL_HOST_RE, 1).alias("host"),
        F.regexp_extract(url, URL_PATH_RE, 1).alias("path"),
        F.when(has_ref, F.regexp_extract(url, URL_QPARAM_RE, 1)).alias("ref_param"),
        F.regexp_replace(url, r"\?.*$", "").alias("url_canonical"),
    )


@query(
    "q_scalar_trycast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(regexp_extract(SUBSTRING(text, 1, 4), '^[0-9]+')
                    AS BIGINT) AS lead_int,
           TRY_CAST(lang AS BIGINT) AS lang_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS BIGINT) AS chars_rt,
           COALESCE(TRY_CAST(source AS BIGINT), -1) AS src_or_default,
           n_chars // GREATEST(CAST(doc_id % 7 AS BIGINT), 0) IS NOT NULL
             AND doc_id % 7 <> 0 AS div_ok
    FROM documents
    """,
)
def q_scalar_trycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant cast family: TRY_CAST returns NULL instead of
    failing on malformed input (here: prose prefixes, language codes,
    and a lossless int→string→int roundtrip), plus try_divide's
    null-on-zero-divisor semantics. This is the ingestion-grade cast
    discipline — at 100 TB a single unparseable cell must not kill a
    stage, and a NULL that can be counted beats an exception that
    can't. Pure per-row projections fused into the scan; the shared
    SQL semantics (Spark TRY_CAST ≡ DuckDB TRY_CAST) make the key
    dialect-portable like the TPC-H family."""
    d = load(spark, sf_dir, "documents")
    divisor = (F.col("doc_id") % 7).cast("long")
    return d.select(
        "doc_id",
        # digits-only prefix before the cast: raw TRY_CAST of e.g.
        # '1.5 ' DIVERGES cross-engine (DuckDB rounds to 2, Spark
        # NULLs) — anchoring on ^[0-9]+ makes the parse identical by
        # construction
        F.regexp_extract(F.substring("text", 1, 4), "^[0-9]+", 0)
        .try_cast("bigint")
        .alias("lead_int"),
        F.col("lang").try_cast("bigint").alias("lang_int"),
        F.col("n_chars").cast("string").try_cast("bigint").alias("chars_rt"),
        F.coalesce(F.col("source").try_cast("bigint"), F.lit(-1)).alias(
            "src_or_default"
        ),
        (
            F.try_divide(F.col("n_chars"), divisor).isNotNull()
            & (F.col("doc_id") % 7 != 0)
        ).alias("div_ok"),
    )


@query(
    "q_scalar_variant",
    oracle="""
    WITH doc AS (
      SELECT event_id,
             props,
             '{"id":' || CAST(event_id AS VARCHAR) || ',"meta":' || props
               || ',"tags":[' || CAST(event_id % 5 AS VARCHAR) || ','
               || CAST(event_id % 3 AS VARCHAR) || ']}' AS j
      FROM events
    )
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT)
             AS k_missing,
           TRY_CAST(json_extract_string(j, '$.meta.k') AS BIGINT) AS meta_k,
           TRY_CAST(json_extract_string(j, '$.tags[1]') AS BIGINT) AS tag2,
           json_extract_string(j, '$.id') AS id_str
    FROM doc
    """,
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT family (Spark 4): parse_json ingests
    JSON into the binary-encoded VARIANT type ONCE, and every typed
    extraction (try_variant_get with a target type) reads the binary
    tree — the modern replacement for repeated get_json_object string
    re-parsing, and the type a 100 TB semi-structured ingest lands on
    (shredded parquet VARIANT columns prune like regular columns).
    Exercises: top-level typed get, missing-path NULL (try_ semantics),
    NESTED object traversal and ARRAY indexing through a document
    assembled from row data, and string extraction. The document is
    constructed with integer-only leaves (doubles never format into
    JSON text — engine float-formatting differs); DuckDB mirrors every
    path with json_extract_string + the same typed casts. Pure per-row
    projection, zero shuffles, fused into the scan.

    Oracle asymmetry contract (round-8 self-review): the oracle uses
    TRY_CAST — mirroring try_variant_get's NULL-on-unparseable and
    matching it exactly on integer leaves, numeric strings, and
    missing paths (probed). The ONE residual divergence is a DECIMAL
    leaf: Spark's variant bigint cast TRUNCATES (1.5→1) while DuckDB
    TRY_CAST ROUNDS (1.5→2, landmine g) — which is why every numeric
    leaf in this key (props' $.k and the constructed doc) is INTEGER
    by construction; a future key extracting decimal leaves must
    compare as DOUBLE, never through a bigint cast.

    Plan note: the ANALYZED plan text shows parse_json inlined per
    extraction (projection collapse undoes any select barrier), but
    whole-stage codegen's subexpression elimination evaluates each
    distinct parse ONCE per row — the generated code has exactly two
    parseJson call sites (one for props, one for the constructed doc),
    each a subExpr function whose cached result all five extractions
    read (pinned by test_plans::test_scalar_variant_parses_once).
    Reading the logical plan as "3 parses" was a round-8 misread of
    plan text for executed code. The at-scale answer is still storing
    the VARIANT column itself (shredded variant parquet): parse once
    at ingest, binary traversal + column pruning on every read."""
    ev = load(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"id":'),
        F.col("event_id").cast("string"),
        F.lit(',"meta":'),
        F.col("props"),
        F.lit(',"tags":['),
        (F.col("event_id") % 5).cast("string"),
        F.lit(","),
        (F.col("event_id") % 3).cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(F.col("props"))
    vj = F.parse_json(j)
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_num"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.try_variant_get(vj, "$.meta.k", "bigint").alias("meta_k"),
        F.try_variant_get(vj, "$.tags[1]", "bigint").alias("tag2"),
        F.try_variant_get(vj, "$.id", "string").alias("id_str"),
    )


# ---------------------------------------------------------------------------
# q_scalar_variant_store — parse-once-at-ingest VARIANT storage
# ---------------------------------------------------------------------------


@query(
    "q_scalar_variant_store",
    oracle="""
    WITH doc AS (
      SELECT event_id,
             '{"id":' || CAST(event_id AS VARCHAR) || ',"meta":' || props
               || ',"tags":[' || CAST(event_id % 5 AS VARCHAR) || ','
               || CAST(event_id % 3 AS VARCHAR) || ']}' AS j
      FROM events
    )
    SELECT event_id,
           TRY_CAST(json_extract_string(j, '$.meta.k') AS BIGINT) AS meta_k,
           TRY_CAST(json_extract_string(j, '$.tags[1]') AS BIGINT) AS tag2,
           TRY_CAST(json_extract_string(j, '$.id') AS BIGINT) AS id_num
    FROM doc
    """,
)
def q_scalar_variant_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shredded-VARIANT STORAGE — the executable form of
    q_scalar_variant's documented at-scale answer: parse the JSON
    document ONCE at ingest, store the VARIANT column itself in
    parquet, and serve every later read from the stored binary with
    path-level column pruning — no re-parse, ever.

    The ingest assembles the same integer-leaf document as
    q_scalar_variant (id / nested meta / tags array), parses it, and
    writes (event_id, v VARIANT, raw_json STRING) to a session-scoped
    sink; the return is the LAZY read-back extracting three typed
    paths. What the read-back plan shows (pinned by
    tests/test_plans.py::test_variant_store_read_prunes): zero
    parse_json / ParseJson anywhere, the raw_json decoy column absent
    from ReadSchema, and — Spark 4.1's variant shredding — the
    variantGet calls REWRITTEN to struct field reads whose ReadSchema
    requests only the extracted paths' typed leaves, not even the
    full variant binary. That is the 100 TB contract: extraction cost
    is a pruned columnar read, identical to a top-level column.

    The sink uses the generational pattern (previous invocation's
    lazy result stays readable until the new write promotes); the
    result is fact-sized, so it is never collected (sink rule).
    Oracle: DuckDB cannot read Spark's variant parquet encoding, so
    it re-derives the same values from the source JSON text — the
    hash match proves the store+shred+extract pipeline is lossless.
    Integer-only leaves per the q_scalar_variant landmine (variant
    bigint cast truncates where DuckDB TRY_CAST rounds on decimals)."""
    from neo_olap_spark.operators.io_sources import generational_sink_dir

    ev = load(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"id":'),
        F.col("event_id").cast("string"),
        F.lit(',"meta":'),
        F.col("props"),
        F.lit(',"tags":['),
        (F.col("event_id") % 5).cast("string"),
        F.lit(","),
        (F.col("event_id") % 3).cast("string"),
        F.lit("]}"),
    )
    ingest = ev.select(
        "event_id",
        F.parse_json(j).alias("v"),  # the ONE parse, at write time
        j.alias("raw_json"),  # pruning decoy: must not appear in reads
    )
    root, promote = generational_sink_dir(spark, "variant_store")
    ingest.write.mode("overwrite").parquet(root)
    promote()
    back = spark.read.parquet(root)
    return back.select(
        "event_id",
        F.try_variant_get(F.col("v"), "$.meta.k", "bigint").alias("meta_k"),
        F.try_variant_get(F.col("v"), "$.tags[1]", "bigint").alias("tag2"),
        F.try_variant_get(F.col("v"), "$.id", "bigint").alias("id_num"),
    )

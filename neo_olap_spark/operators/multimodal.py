"""Multimodal columns: opaque binary payloads + typed metadata.

The Spark-side plumbing is real (BinaryType columns, content hashing,
Arrow-batched mapInPandas decode with an explicit output schema); the
actual image/audio decode is STUBBED behind a deterministic fake
because the codec libraries are not in this container — the stub is
clearly marked and swaps out for a real decoder without touching the
plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo_olap_spark.registry import query
from neo_olap_spark.tables import load


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a multimodal table: documents' text bytes stand in for an
    opaque media payload, with typed metadata columns alongside."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha,
           source AS origin
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length + content hash (the
    content-addressed identity used for exact media dedup)."""
    m = multimodal_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("content_sha"),
        F.col("meta.origin").alias("origin"),
    )


DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long, codec string"
)

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode kernel (mapInPandas).

    STUB: derives deterministic fake dimensions from the payload bytes.
    A real deployment replaces the body of ``fake_decode`` with
    PIL/ffmpeg calls; the batch shape, schema, and partitioning are
    exactly what the real decoder needs.
    """

    def fake_decode(payload: bytes) -> tuple[int, int, int, str]:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("plug real codec here")
        # deterministic fake: dimensions from content, not randomness
        n = len(payload)
        w = 64 + (payload[0] % 64) if n else 0
        h = 64 + (payload[-1] % 64) if n else 0
        return w, h, 1 + n % 4, "fake/v1"

    for pdf in batches:
        decoded = [fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_frames": [d[2] for d in decoded],
                "codec": [d[3] for d in decoded],
            }
        )


def decode_multimodal(m: DataFrame) -> DataFrame:
    """Run the (stubbed) decoder over payloads with mapInPandas —
    Arrow batches in, Arrow batches out, no per-row Python overhead."""
    return m.select("doc_id", "payload").mapInPandas(_decode_batches, DECODE_SCHEMA)


@query("q_multimodal_decode")
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stub over binary payloads (rows-only:
    the fake decode is deterministic, but not SQL-expressible)."""
    return decode_multimodal(multimodal_table(spark, sf_dir))


RESIZE_SCHEMA = "doc_id long, payload binary, width long, height long, codec string"
TARGET_W, TARGET_H = 64, 64


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Resize kernel (mapInPandas): binary in, binary out — the
    transform stays on executors; payloads never visit the driver.

    STUB: a real deployment replaces ``fake_resize`` with
    PIL.Image.resize; the fake maps the payload onto a deterministic
    TARGET_W*TARGET_H byte grid by even-stride sampling, so output
    payload size is exactly what a real thumbnail pipeline produces
    and downstream operators (content hash, dedup) are exercised for
    real."""

    def fake_resize(payload: bytes) -> bytes:
        if REAL_DECODERS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("plug real codec here")
        n = len(payload)
        size = TARGET_W * TARGET_H
        if n == 0:
            return bytes(size)
        return bytes(payload[(i * n) // size] for i in range(size))

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload": [fake_resize(p) for p in pdf["payload"]],
                "width": TARGET_W,
                "height": TARGET_H,
                "codec": "fake-raw/v1",
            }
        )


@query("q_multimodal_resize")
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary payloads (rows-only): mapInPandas
    binary→binary, then the content hash of the resized payload —
    the thumbnail-then-dedup shape of a media ingest pipeline."""
    m = multimodal_table(spark, sf_dir)
    resized = m.select("doc_id", "payload").mapInPandas(_resize_batches, RESIZE_SCHEMA)
    return resized.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("resized_sha"),
        "width",
        "height",
        "codec",
    )


FRAMES_SCHEMA = "doc_id long, frame_no long, frame_sha string"
FRAMES_PER_DOC = 3


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1-to-N frame sampling kernel (mapInPandas): each payload emits
    FRAMES_PER_DOC frame rows. STUB: a real decoder seeks to evenly
    spaced frames with ffmpeg; the fake hashes evenly spaced byte
    slices, so output cardinality/schema/partitioning are the real
    plumbing and the content is deterministic."""
    import hashlib

    for pdf in batches:
        rows: dict[str, list] = {"doc_id": [], "frame_no": [], "frame_sha": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = max(len(payload), 1)
            for k in range(FRAMES_PER_DOC):
                lo = (k * n) // FRAMES_PER_DOC
                hi = ((k + 1) * n) // FRAMES_PER_DOC
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(k)
                rows["frame_sha"].append(hashlib.sha256(bytes(payload[lo:hi])).hexdigest())
        yield pd.DataFrame(rows)


@query("q_multimodal_frames")
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over binary payloads: Arrow batches in,
    FRAMES_PER_DOC rows out per document (rows-only; deterministic
    fake frames, real schema/batch shape)."""
    m = multimodal_table(spark, sf_dir)
    return m.select("doc_id", "payload").mapInPandas(_frame_sample_batches, FRAMES_SCHEMA)


@query(
    "q_multimodal_dedup",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, sha256(text) AS content_sha FROM documents
    ),
    canon AS (
      SELECT content_sha, MIN(doc_id) AS keeper_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM hashed GROUP BY content_sha
    )
    SELECT h.doc_id, c.keeper_id, c.n_copies,
           h.doc_id <> c.keeper_id AS is_dup
    FROM hashed h JOIN canon c ON h.content_sha = c.content_sha
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content address: every payload maps to its
    sha256, each hash group keeps the lowest doc_id as canonical, and
    every row learns its keeper + duplicate flag — the
    store-once/reference-everywhere step a multimodal lake runs before
    any decode (dedup on bytes is free; dedup after decode is not).

    Scale shape: one shuffle keyed on the 32-byte digest (uniformly
    distributed by construction — no skew possible), then a digest-
    keyed join back that reuses the same partitioning. The payload
    bytes themselves never shuffle: only (doc_id, digest) pairs move,
    which is what makes this viable when payloads are megabytes.
    """
    m = multimodal_table(spark, sf_dir)
    hashed = m.select("doc_id", F.sha2("payload", 256).alias("content_sha"))
    canon = hashed.groupBy("content_sha").agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").cast("long").alias("n_copies"),
    )
    return hashed.join(canon, "content_sha").select(
        "doc_id",
        "keeper_id",
        "n_copies",
        (F.col("doc_id") != F.col("keeper_id")).alias("is_dup"),
    )

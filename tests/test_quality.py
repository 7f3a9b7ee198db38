"""Invariant tests for the data-quality / layout operators
(operators/quality.py) beyond the oracle parity the driver checks."""

from __future__ import annotations

import math

from neo_olap_spark.operators.quality import (
    SKEW_TOP,
    ZBITS,
    ZFILES,
    q_dq_audit,
    q_dedup_incremental,
    q_skew_profile,
    q_text_entropy,
    q_zorder_layout,
)


def test_dq_audit_clean_fixture(spark, sf_dir):
    """The generated TPC-H-ish data satisfies every constraint: the
    audit must report zero violations across all six checks (a
    non-zero count here means the check itself is buggy)."""
    rows = {r["check_name"]: r for r in q_dq_audit(spark, sf_dir).collect()}
    assert set(rows) == {
        "lineitem_null_key",
        "lineitem_nonpositive_qty",
        "lineitem_discount_range",
        "lineitem_flag_domain",
        "orders_duplicate_pk",
        "lineitem_orphan_fk",
    }
    for name, r in rows.items():
        assert r["violations"] == 0, name
        assert r["checked"] > 0, name


def test_skew_profile_shape(spark, sf_dir):
    rows = q_skew_profile(spark, sf_dir).collect()
    assert len(rows) == SKEW_TOP
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r["salt_factor"] >= 1  # max/avg rounded up is at least 1
        assert 0 <= r["share_bp"] <= 10000


def test_dedup_incremental_novel_only(spark, sf_dir):
    """Every surviving batch doc's content hash must be absent from
    the registry partition, and keep_id must be a batch member."""
    import pyspark.sql.functions as F

    from neo_olap_spark.tables import load

    out = q_dedup_incremental(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("h"))
    reg_hashes = {r["h"] for r in d.filter(F.col("doc_id") % 10 != 0).collect()}
    for r in out.collect():
        assert r["content_hash"] not in reg_hashes
        assert r["keep_id"] % 10 == 0


def test_entropy_bounds(spark, sf_dir):
    """Shannon entropy over a 28-symbol alphabet lies in
    [0, log2(28)]; natural text should mostly sit well inside."""
    rows = q_text_entropy(spark, sf_dir).collect()
    hi = math.log2(28)
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy_bits"] <= hi + 1e-9


def test_zorder_zone_map_prunes(spark, sf_dir):
    """The point of the layout: per-file dimension spans must be
    bounded — a predicate on either dimension should prune files.
    With random (unsorted) layout every file would span ~the full
    [0, 2^ZBITS) range in both dims; the z-order cut must do
    strictly better than that on average in each dimension."""
    rows = q_zorder_layout(spark, sf_dir).collect()
    assert 1 <= len(rows) <= ZFILES
    full = (1 << ZBITS) - 1
    avg_size_span = sum(r["max_size"] - r["min_size"] for r in rows) / len(rows)
    avg_price_span = sum(r["max_price"] - r["min_price"] for r in rows) / len(rows)
    assert avg_size_span < full
    assert avg_price_span < full
    # files partition the table: counts sum to the part row count
    from neo_olap_spark.tables import load

    assert sum(r["n_rows"] for r in rows) == load(spark, sf_dir, "part").count()


def test_chunk_reconstruction_property(spark, sf_dir):
    """Sliding-window chunking must lose nothing: chunk 0 plus the
    non-overlapping tail of every later chunk reconstructs the exact
    token sequence of the document, and every chunk except the last
    is exactly CHUNK_TOKENS long."""
    from neo_olap_spark.operators.llm_pipeline import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        q_text_chunk,
    )
    from neo_olap_spark.tables import load

    chunks = q_text_chunk(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {
        r["doc_id"]: r["text"].strip().split()
        for r in load(spark, sf_dir, "documents").limit(2000).collect()
    }
    checked = 0
    for doc_id, toks in docs.items():
        if not toks or doc_id not in by_doc:
            continue
        rows = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # exact reconstruction: overlay each chunk at its stride-aligned
        # offset — the result must be the document's token sequence
        stride = CHUNK_TOKENS - CHUNK_OVERLAP
        rebuilt = list(rows[0]["chunk_text"].split())
        for r in rows[1:]:
            start = r["chunk_id"] * stride
            rebuilt = rebuilt[:start] + r["chunk_text"].split()
        assert rebuilt == toks, doc_id
        # each chunk's declared length is the clamped window size
        for r in rows:
            start = r["chunk_id"] * stride
            assert r["n_tokens"] == min(CHUNK_TOKENS, len(toks) - start)
            assert len(r["chunk_text"].split()) == r["n_tokens"]
        checked += 1
    assert checked > 0


def test_entropy_matches_python_reference(spark, sf_dir):
    """q_text_entropy must agree with a plain-Python Counter-based
    entropy over the same 27+1-symbol alphabet (to the emitted 1e-4
    rounding) on a sample of real documents."""
    import math
    from collections import Counter

    from neo_olap_spark.operators.quality import _ALPHABET, q_text_entropy
    from neo_olap_spark.tables import load

    got = {r["doc_id"]: r for r in q_text_entropy(spark, sf_dir).collect()}
    sample = load(spark, sf_dir, "documents").limit(100).collect()
    alpha = set(_ALPHABET)
    for doc in sample:
        text = doc["text"].lower()
        if not text:
            continue
        c = Counter(ch if ch in alpha else "\x00" for ch in text)
        n = len(text)
        ent = -sum((v / n) * math.log2(v / n) for v in c.values())
        r = got[doc["doc_id"]]
        assert r["n_chars"] == n
        assert abs(r["entropy_bits"] - ent) < 5e-4, doc["doc_id"]

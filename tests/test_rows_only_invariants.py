"""Invariant tests for rows-only query keys (no SQL oracle): the
driver only checks these produce rows, so the semantic contract is
asserted here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo_olap_spark.registry import queries


def test_sample_bounds_and_determinism(spark, sf_dir):
    q = queries()["q_sample"]
    a = q(spark, sf_dir)
    total = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n = a.count()
    # Bernoulli(0.1): loose 3-sigma-ish bounds, and rows come from orders
    assert 0.04 * total < n < 0.2 * total
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, q(spark, sf_dir).collect()))


def test_multimodal_frames_cardinality(spark, sf_dir):
    """Each doc's video has 2 + doc_id % 3 frames; sampling every
    FRAME_STRIDE-th keeps ceil(n_frames / stride) — verify the exact
    per-doc cardinality and that sampled frame dims match the
    synthesizer's formula."""
    import math

    from neo_olap_spark.operators.multimodal import FRAME_STRIDE

    frames = queries()["q_multimodal_frames"](spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    per_doc = {r["doc_id"]: r["count"] for r in frames.groupBy("doc_id").count().collect()}
    assert len(per_doc) == n_docs
    for doc_id, cnt in per_doc.items():
        n_frames = 2 + doc_id % 3
        assert cnt == math.ceil(n_frames / FRAME_STRIDE), doc_id
    # real decode: width/height come from the frame's own IHDR and must
    # match the synthesizer's dimension formula
    for r in frames.limit(50).collect():
        assert r["width"] == 16 + r["doc_id"] % 9
        assert r["height"] == 16 + (r["doc_id"] * 3) % 7


def test_winnow_detects_shared_run(spark):
    """Winnowing guarantee: two docs sharing a long token run share at
    least one fingerprint; unrelated docs share none."""
    from neo_olap_spark.operators.llm_text import q_text_winnow

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, shared + " lambda mu nu xi"),
        (1, "prefix words here " + shared),
        (2, "totally different content with many unrelated tokens inside it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("winnow_fixture")
    # reuse the kernel by substituting the fixture as the documents
    # table (patch the name llm_text imported, not tables.load itself)
    import neo_olap_spark.operators.llm_text as llm_text

    orig = llm_text.load
    try:
        llm_text.load = lambda s, d, n, _df=df: _df  # noqa: E731
        fps = {r.doc_id: set() for r in df.collect()}
        for r in q_text_winnow(spark, "ignored").collect():
            fps[r.doc_id].add(r.fp)
    finally:
        llm_text.load = orig
    assert fps[0] & fps[1], "shared run must share a fingerprint"
    assert not (fps[0] & fps[2])
    assert not (fps[1] & fps[2])


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from neo_olap_spark.operators.relational import STRATA_FRACTIONS

    q = queries()["q_sample_stratified"]
    got = q(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    totals = {r.o_orderpriority: r["count"] for r in orders.groupBy("o_orderpriority").count().collect()}
    sampled = {r.o_orderpriority: r["count"] for r in got.groupBy("o_orderpriority").count().collect()}
    for stratum, frac in STRATA_FRACTIONS.items():
        n, tot = sampled.get(stratum, 0), totals[stratum]
        # Bernoulli(frac) per stratum: ~4-sigma envelope
        sd = (tot * frac * (1 - frac)) ** 0.5
        assert abs(n - tot * frac) < 4 * sd + 5, (stratum, n, tot * frac)
    # deterministic under the seed, and a subset of the input
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, q(spark, sf_dir).collect()))
    assert got.join(orders, "o_orderkey", "left_anti").isEmpty()


def test_hll_estimate_within_error_bound(spark, sf_dir):
    from neo_olap_spark.operators.analytics import hll_sketch_counts

    rows = hll_sketch_counts(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # lgK=12 => ~1.6% standard error; 5-sigma-ish envelope
        assert abs(r.hll_parts - r.exact_parts) <= max(0.08 * r.exact_parts, 3), r
    # the registered key folds that envelope into its tolerance oracle
    assert all(r.hll_ok for r in queries()["q_agg_hll"](spark, sf_dir).collect())


def test_limit_bearing_keys_are_deterministic(spark, sf_dir):
    """Every LIMIT/top-K key must produce identical rows across runs —
    a missing tie-break shows up here before it flakes the driver's
    hash gate."""
    for key in ("q_topn", "q_topk_per_group", "q_sql_surface", "q_sim_search"):
        q = queries()[key]
        a = sorted(map(tuple, q(spark, sf_dir).collect()))
        b = sorted(map(tuple, q(spark, sf_dir).collect()))
        assert a == b, f"{key} nondeterministic across runs"


def test_approx_quantile_within_bound_of_exact(spark, sf_dir):
    from neo_olap_spark.operators.analytics import approx_quantile_sketch

    approx = {
        r.l_returnflag: r.approx_med_price
        for r in approx_quantile_sketch(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.med_price
        for r in queries()["q_agg_median"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, med in exact.items():
        # accuracy 1000 => rank error <= n/1000; prices are smooth, so
        # a 2% relative envelope is comfortably loose
        assert abs(approx[flag] - med) / med < 0.02
    # p25 <= median <= p75 sanity
    rows = approx_quantile_sketch(spark, sf_dir).collect()
    for r in rows:
        assert r.p25 <= r.approx_med_price <= r.p75
    # the registered key folds the rank bounds into its tolerance oracle
    for r in queries()["q_agg_approx_quantile"](spark, sf_dir).collect():
        assert r.p25_ok and r.med_ok and r.p75_ok, r

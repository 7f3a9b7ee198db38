"""LLM-pipeline operator invariants beyond the oracle checks:
the approximate methods are judged against their exact ground truths."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo_olap_spark.operators.llm_dedup import (
    JACCARD_THRESHOLD,
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    _shingled,
    simhash_signatures,
)
from neo_olap_spark.operators.llm_similarity import brute_force_topk, ivf_topk
from neo_olap_spark.operators.multimodal import decode_multimodal
from neo_olap_spark.tables import load


def test_minhash_no_false_positives_and_decent_recall(spark, sf_dir):
    from neo_olap_spark.operators.llm_dedup import _shingled_hashed

    # ground truth on string shingles; the LSH path (as q_dedup_near
    # runs it) on hashed shingles — set semantics must agree
    sh = _shingled(spark, sf_dir).persist()
    sh_h = _shingled_hashed(spark, sf_dir).persist()
    exact = {(r.doc_a, r.doc_b) for r in exact_jaccard_pairs(sh, JACCARD_THRESHOLD).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(sh_h, JACCARD_THRESHOLD).collect()}
    # verification step guarantees no false positives
    assert lsh <= exact
    # high-similarity pairs must be found (recall on the planted dups)
    high = {
        (r.doc_a, r.doc_b)
        for r in exact_jaccard_pairs(sh, 0.7).collect()
    }
    if high:
        assert len(lsh & high) / len(high) >= 0.8


def test_bucket_cap_keeps_overflow_docs_in_candidates(spark, monkeypatch):
    """Capped LSH buckets must not drop overflow docs from the
    candidate set: beyond MAX_BUCKET_DOCS all-pairs expansion, each
    overflow doc pairs with the bucket anchor, so every member of a
    giant near-identical cluster is still reported as a duplicate."""
    import neo_olap_spark.operators.llm_dedup as llm_dedup

    monkeypatch.setattr(llm_dedup, "MAX_BUCKET_DOCS", 4)
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(i, text.split()) for i in range(10)], "doc_id long, toks array<string>"
    )
    sh = df.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i.cast("int")),
                    F.element_at("toks", (i + 1).cast("int")),
                    F.element_at("toks", (i + 2).cast("int")),
                ),
            )
        ).alias("sh"),
    )
    pairs = llm_dedup.minhash_lsh_pairs(sh.persist(), JACCARD_THRESHOLD)
    seen = set()
    for r in pairs.collect():
        seen.add(r.doc_a)
        seen.add(r.doc_b)
        assert r.jaccard == 1.0
    assert seen == set(range(10))


def test_simhash_deterministic_and_self_similar(spark, sf_dir):
    s1 = dict(simhash_signatures(spark, sf_dir).collect())
    s2 = dict(simhash_signatures(spark, sf_dir).collect())
    assert s1 == s2
    assert len(s1) == load(spark, sf_dir, "documents").count()


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(e, q, 10).collect()}

    def recall(mode):
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_topk(e, q, 10, centroids=mode).collect()
        }
        return len(got & exact) / len(exact)

    r_kmeans, r_hash = recall("kmeans"), recall("hash")
    # ANN with 4/16 probes should still find a reasonable share of true
    # top-10, and the fitted codebook must not be worse than raw
    # sampling at equal n_probe (measured 0.62 vs 0.46 at sf0.001,
    # 0.48 vs 0.48 at sf0.01)
    assert r_kmeans >= 0.45
    assert r_kmeans >= r_hash

    # deterministic codebook: identical result sets across runs
    a = sorted(map(tuple, ivf_topk(e, q, 10).collect()))
    b = sorted(map(tuple, ivf_topk(e, q, 10).collect()))
    assert a == b


def test_ivf_sq8_recall_matches_full_precision(spark, sf_dir):
    """The quantized tier (int8 cell scan + full-precision rescore of a
    4·k pool) must not lose recall vs the full-precision IVF scan at
    equal n_probe: the pool is 4× the answer size, so int8 ranking
    error has to displace a true neighbor past 4·k candidates to hurt
    — and the rescore step restores exact similarities for everything
    it keeps."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(e, q, 10).collect()}

    full = {(r.query_id, r.vec_id) for r in ivf_topk(e, q, 10).collect()}
    sq8_rows = ivf_topk(e, q, 10, quantized=True).collect()
    sq8 = {(r.query_id, r.vec_id) for r in sq8_rows}

    r_full = len(full & exact) / len(exact)
    r_sq8 = len(sq8 & exact) / len(exact)
    # same tolerance as the kmeans-vs-hash assertion; allow the int8
    # pool to miss at most a sliver vs the full-precision scan
    assert r_sq8 >= 0.45
    assert r_sq8 >= r_full - 0.05

    # rescore is FULL precision: every reported similarity must agree
    # exactly with the brute-force similarity for that pair
    bf = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in brute_force_topk(e, q, 50).collect()
    }
    for r in sq8_rows:
        if (r.query_id, r.vec_id) in bf:
            assert r.cos_sim == bf[(r.query_id, r.vec_id)]

    # deterministic: identical result sets across runs
    a = sorted(map(tuple, sq8_rows))
    b = sorted(map(tuple, ivf_topk(e, q, 10, quantized=True).collect()))
    assert a == b


def test_near_clusters_refine_exact_clusters(spark, sf_dir):
    """LSH pairs are Jaccard-verified, so the LSH pair graph is a
    subgraph of the exact pair graph — every approximate cluster must
    sit entirely inside one exact cluster (refinement), and canonical
    ids must be cluster minima over the full doc set."""
    from neo_olap_spark.registry import queries

    qs = queries()
    near = {r.doc_id: r.canonical_id for r in qs["q_dedup_near_clusters"](spark, sf_dir).collect()}
    exact = {r.doc_id: r.canonical_id for r in qs["q_dedup_clusters"](spark, sf_dir).collect()}
    assert set(near) == set(exact)  # every doc labeled
    for doc, canon in near.items():
        assert canon <= doc
        # same near-cluster => same exact-cluster
        assert exact[doc] == exact[canon], (doc, canon)


def test_multimodal_decode_real_png(spark, sf_dir):
    """The decode key must recover the TRUE dimensions and channel
    means of the synthesized PNGs — verified against a local
    re-synthesis of the same deterministic pattern."""
    import numpy as np

    from neo_olap_spark.operators.multimodal import media_table

    m = media_table(spark, sf_dir)
    out = decode_multimodal(m)
    rows = out.collect()
    assert len(rows) == m.count()
    for r in rows[:25]:
        assert r.width == 24 + r.doc_id % 17
        assert r.height == 24 + (r.doc_id * 7) % 13
        assert r.codec == "png/rgb8"
    # pixel-exact: decode one payload locally and compare the features
    r0 = rows[0]
    doc_id, h, w = r0.doc_id, r0.height, r0.width
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack(
        [(x * 3 + doc_id) % 256, (y * 5 + doc_id // 3) % 256, (x + y + doc_id % 97) % 256],
        axis=-1,
    ).astype(np.uint8)
    means = arr.reshape(-1, 3).mean(axis=0)
    assert (r0.mean_r, r0.mean_g, r0.mean_b) == tuple(int(np.floor(v)) for v in means)
    # deterministic across runs
    again = {x.doc_id: (x.width, x.height) for x in decode_multimodal(m).collect()}
    assert all(again[x.doc_id] == (x.width, x.height) for x in rows)


def test_multimodal_resize_roundtrip(spark, sf_dir):
    """The resized payload must be a VALID 16x16 PNG whose pixels are
    the nearest-neighbor mapping of the original — decoded and checked
    locally with the same stdlib codec."""
    import numpy as np

    from neo_olap_spark.functions.png_codec import decode_png, resize_nearest
    from neo_olap_spark.operators.multimodal import (
        TARGET_H,
        TARGET_W,
        _resize_batches,
        media_table,
    )

    m = media_table(spark, sf_dir)
    sample = m.limit(5).collect()
    import pandas as pd

    out = next(
        _resize_batches(
            iter([pd.DataFrame({"doc_id": [r.doc_id for r in sample],
                                "payload": [bytes(r.payload) for r in sample]})])
        )
    )
    for (_, row), src in zip(out.iterrows(), sample):
        thumb = decode_png(row["payload"])
        assert thumb.shape == (TARGET_H, TARGET_W, 3)
        expected = resize_nearest(decode_png(bytes(src.payload)), TARGET_W, TARGET_H)
        assert np.array_equal(thumb, expected)


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """Hyperplane-LSH ANN must recover a solid share of the exact
    top-10 (measured 0.88/0.82/0.92 at sf0.001/0.01/0.1 with the
    L=12, B=4 defaults) and be deterministic across runs (fixed
    hyperplane seed)."""
    from neo_olap_spark.operators.llm_similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(e, q, 10).collect()}
    got = {(r.query_id, r.vec_id) for r in lsh_topk(e, q, 10).collect()}
    assert len(got & exact) / len(exact) >= 0.6

    a = sorted(map(tuple, lsh_topk(e, q, 10).collect()))
    b = sorted(map(tuple, lsh_topk(e, q, 10).collect()))
    assert a == b


def test_pca_invariants(spark, sf_dir):
    """q_embed_pca: projected columns must be zero-mean with
    monotonically non-increasing variance; the projection must be
    deterministic across runs (pinned eigenvector signs); and the
    retained variance must dominate a random-projection baseline of
    the same rank (the whole point of PCA)."""
    import numpy as np

    from neo_olap_spark.operators.llm_pipeline import PCA_K, embed_pca_project
    from neo_olap_spark.tables import load as load_t

    rows = embed_pca_project(spark, sf_dir).collect()
    e = load_t(spark, sf_dir, "embeddings")
    assert len(rows) == e.count()
    P = np.array([r["pc"] for r in rows])
    assert P.shape[1] == PCA_K
    # centered projections
    assert np.abs(P.mean(axis=0)).max() < 1e-6
    # variance ordering = eigenvalue ordering
    var = P.var(axis=0, ddof=1)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(PCA_K - 1))
    # retained variance beats a rank-K random projection baseline
    X = np.array([r["embedding"] for r in e.collect()], dtype=np.float64)
    X = X - X.mean(axis=0)
    total_var = X.var(axis=0, ddof=1).sum()
    rng = np.random.RandomState(0)
    Q, _ = np.linalg.qr(rng.randn(X.shape[1], PCA_K))
    rand_var = (X @ Q).var(axis=0, ddof=1).sum()
    assert var.sum() > rand_var
    assert var.sum() <= total_var + 1e-6
    # deterministic across runs
    again = {r["vec_id"]: r["pc"] for r in embed_pca_project(spark, sf_dir).collect()}
    for r in rows[:50]:
        assert np.allclose(again[r["vec_id"]], r["pc"])


def test_multimodal_audio_decode(spark, sf_dir):
    """q_multimodal_audio must recover the synthesizer's closed-form
    waveform properties: exact sample counts/duration from the RIFF
    header, and RMS/peak matching a local re-synthesis bit-for-bit."""
    import numpy as np

    from neo_olap_spark.operators.multimodal import AUDIO_RATE, q_multimodal_audio

    rows = q_multimodal_audio(spark, sf_dir).collect()
    assert rows
    for r in rows[:25]:
        n_expected = AUDIO_RATE * (50 + (r.doc_id * 13) % 201) // 1000
        assert r.sample_rate == AUDIO_RATE
        assert r.n_samples == n_expected
        assert r.duration_ms == n_expected * 1000 // AUDIO_RATE
        assert r.codec == "wav/pcm16"
        # local re-synthesis: identical features
        t = np.arange(n_expected, dtype=np.float64)
        f1 = 100 + r.doc_id % 400
        f2 = 500 + (r.doc_id * 7) % 1000
        x = 0.6 * np.sin(2 * np.pi * f1 * t / AUDIO_RATE) + 0.3 * np.sin(
            2 * np.pi * f2 * t / AUDIO_RATE
        )
        pcm = np.floor(x * 20000 + 0.5).astype(np.int16)
        assert r.peak == int(np.max(np.abs(pcm.astype(np.int32))))
        assert r.rms == int(np.floor(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))))


def test_multimodal_audio_resample(spark, sf_dir):
    """The decimated output must match a local re-synthesis +
    identical integer DSP bit-for-bit: the registered verdict key on
    RMS/sum/wav_ok, and the byte-emitting library variant on the
    payload hash of a valid 4 kHz WAV."""
    import hashlib
    import io
    import wave

    import numpy as np

    from neo_olap_spark.operators.multimodal import (
        AUDIO_RATE,
        RESAMPLE_FACTOR,
        multimodal_audio_resampled_payloads,
        q_multimodal_audio_resample,
    )

    def local_out(doc_id):
        n = AUDIO_RATE * (50 + (doc_id * 13) % 201) // 1000
        t = np.arange(n, dtype=np.float64)
        f1 = 100 + doc_id % 400
        f2 = 500 + (doc_id * 7) % 1000
        x = 0.6 * np.sin(2 * np.pi * f1 * t / AUDIO_RATE) + 0.3 * np.sin(
            2 * np.pi * f2 * t / AUDIO_RATE
        )
        pcm = np.floor(x * 20000 + 0.5).astype(np.int16)
        m = (n // RESAMPLE_FACTOR) * RESAMPLE_FACTOR
        return np.floor(
            pcm[:m].astype(np.int32).reshape(-1, RESAMPLE_FACTOR).mean(axis=1)
        ).astype(np.int16)

    rows = q_multimodal_audio_resample(spark, sf_dir).collect()
    assert rows
    for r in rows[:10]:
        assert r.in_rate == AUDIO_RATE
        assert r.out_rate == AUDIO_RATE // RESAMPLE_FACTOR
        assert r.out_samples == r.in_samples // RESAMPLE_FACTOR
        assert r.wav_ok
        out = local_out(r.doc_id)
        assert r.out_rms == int(np.floor(np.sqrt(np.mean(out.astype(np.float64) ** 2))))
        assert r.out_sum == int(out.astype(np.int64).sum())

    # byte-emitting library variant: identical DSP -> identical sha
    for r in multimodal_audio_resampled_payloads(spark, sf_dir).limit(5).collect():
        out = local_out(r.doc_id)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wo:
            wo.setnchannels(1)
            wo.setsampwidth(2)
            wo.setframerate(AUDIO_RATE // RESAMPLE_FACTOR)
            wo.writeframes(out.tobytes())
        assert r.out_sha == hashlib.sha256(buf.getvalue()).hexdigest()


def test_containment_catches_doc_in_doc_jaccard_misses(spark):
    """The reason containment exists: a small doc fully quoted inside a
    much larger one has containment 1.0 but Jaccard well under the 0.2
    pair threshold — the asymmetric metric must flag it, and the
    directional columns must point inner -> outer."""
    import neo_olap_spark.operators.llm_dedup as llm_dedup
    from neo_olap_spark.operators.llm_dedup import (
        JACCARD_THRESHOLD,
        exact_jaccard_pairs,
        q_text_containment,
    )

    inner = " ".join(f"tok{i}" for i in range(12))  # 10 trigram shingles
    filler = " ".join(f"pad{i}" for i in range(300))
    rows = [
        (0, inner),
        (1, filler + " " + inner),  # quotes doc 0 verbatim
        (2, "entirely unrelated words " + " ".join(f"z{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # containment runs off tables.load("documents"); patch the loader
    # the module imported (the winnow-fixture pattern)
    orig = llm_dedup.load
    llm_dedup.load = lambda _s, _d, _t: df
    try:
        got = {
            (r.inner_id, r.outer_id): r.containment
            for r in q_text_containment(spark, "unused").collect()
        }
        assert got.get((0, 1)) == 1.0, got
        assert not any(2 in pair for pair in got), got
        # the symmetric tier really does miss it at its threshold
        sh = df.select(
            "doc_id",
            llm_dedup.shingles(llm_dedup.ws_tokens(F.col("text"))).alias("sh"),
        )
        jac = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in exact_jaccard_pairs(sh, 0.0).collect()
        }
        assert jac[(0, 1)] < JACCARD_THRESHOLD, jac
    finally:
        llm_dedup.load = orig


def test_knn_graph_invariants(spark, sf_dir):
    """Every vector gets exactly k in-block neighbors (block sizes in
    the fixture exceed k+1), ranks are 1..k with descending rounded
    cosine, and neighbors never leave the label block."""
    from neo_olap_spark.operators.llm_similarity import KNN_K, q_embed_knn_graph
    from neo_olap_spark.tables import load

    out = q_embed_knn_graph(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    per_vec = out.groupBy("vec_id").agg(
        F.count("*").alias("n"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
    )
    bad = per_vec.where(
        (F.col("n") != KNN_K) | (F.col("rmin") != 1) | (F.col("rmax") != KNN_K)
    ).count()
    assert bad == 0
    # block closure: join neighbor ids back to labels and compare
    lbl = {r.vec_id: r.label for r in e.collect()}
    for r in out.collect():
        assert lbl[r.vec_id] == lbl[r.nbr_id], (r.vec_id, r.nbr_id)

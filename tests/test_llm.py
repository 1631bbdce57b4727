"""LLM-pipeline operator tests: LSH candidate-recall properties, banded
SimHash equivalence with brute force, ANN recall, stub determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.llm import (
    ann_bruteforce_topk,
    ann_lsh_topk,
    attach_binary_payload,
    exact_dedup,
    extract_features,
    doc_fingerprint,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "Hello   world"), (2, "hello world "), (3, "different text")],
        "doc_id long, text string",
    )
    out = {r.keep_id: r.n_copies for r in exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_lsh_equals_exact_pairs(docs):
    """On the fixture corpus (near-dups at j>=0.9, background <0.15) banded
    LSH must find exactly the exact-Jaccard pair set at threshold 0.5."""
    lsh = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    exact = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(docs, threshold=0.0).filter(
            F.col("jaccard") >= 0.5
        ).collect()
    }
    assert lsh == exact
    assert len(exact) > 0  # the fixture does contain near-dup pairs


def test_simhash_banding_equals_bruteforce(docs):
    """4x16-bit banding is exhaustive for hamming <= 3 (pigeonhole)."""
    hashes = {r.id: r.simhash for r in simhash(docs).collect()}
    brute = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3:
                brute.add((a, b))
    banded = {
        (r.id_a, r.id_b) for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    assert banded == brute


def test_ann_ivf_recall(emb):
    from byconity_spark.llm import ann_ivf_topk

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in ann_bruteforce_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ann_ivf_topk(emb, queries, k=10, nprobe=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF ANN recall {recall:.2f} < 0.8"


def test_ann_lsh_recall(emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in ann_bruteforce_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id) for r in ann_lsh_topk(emb, queries, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH ANN recall {recall:.2f} < 0.9"


def test_fingerprint_deterministic(docs):
    a = {r.doc_id: r.fingerprint for r in doc_fingerprint(docs).collect()}
    b = {r.doc_id: r.fingerprint for r in doc_fingerprint(docs).collect()}
    assert a == b
    assert len(set(a.values())) > len(a) // 2  # mostly distinct content


def test_multimodal_stub_plumbing(docs):
    mm = attach_binary_payload(docs)
    feats = extract_features(mm)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r.n_bytes == 16 and len(r.head4) == 4
    # deterministic across runs
    again = {x.doc_id: x.byte_mean for x in extract_features(mm).collect()}
    assert again[r.doc_id] == r.byte_mean


def test_frame_sample_deterministic(spark):
    from byconity_spark.engine.catalog import load_table
    from byconity_spark.llm.multimodal import attach_binary_payload, sample_frames
    from tests.conftest import SF_DIR

    mm = attach_binary_payload(load_table(spark, SF_DIR, "documents"))
    f1 = sample_frames(mm, n_frames=4, frame_bytes=4).orderBy("doc_id", "frame_idx")
    f2 = sample_frames(mm, n_frames=4, frame_bytes=4).orderBy("doc_id", "frame_idx")
    r1, r2 = f1.collect(), f2.collect()
    assert r1 == r2
    # 16-byte payload / 4-byte frames -> 4 frames each, means in byte range
    assert all(r.frame_idx in (0, 1, 2, 3) for r in r1[:40])
    assert all(0.0 <= r.frame_mean <= 255.0 for r in r1[:40])
    assert all(len(r.frame) == 4 for r in r1[:40])


def test_ann_ivfpq_recall_and_completeness(emb):
    from byconity_spark.llm.similarity import ann_ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in ann_bruteforce_topk(emb, queries, k=10).collect()
    }
    # partial probing + ADC shortlist.  The fixture codebook has only 10
    # label-mean codewords per subspace (production trains ~256 by
    # k-means), so the ADC shortlist must be generous to shield recall.
    approx = {
        (r.query_id, r.vec_id)
        for r in ann_ivfpq_topk(
            emb, queries, k=10, nprobe=6, adc_keep=200
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF-PQ recall {recall:.2f} < 0.8"
    # completeness mode must EQUAL brute force exactly
    full = {
        (r.query_id, r.vec_id)
        for r in ann_ivfpq_topk(
            emb, queries, k=10, nprobe=100, adc_keep=10_000_000
        ).collect()
    }
    assert full == exact


# ------------------------------------------------- chunking (round 6)
def test_chunk_documents_window_math(spark):
    from byconity_spark.llm.text import chunk_documents
    import pandas as pd
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(f"t{i}" for i in range(10)), "a b"],
    }))
    out = chunk_documents(docs, chunk_tokens=4, overlap_tokens=1) \
        .orderBy("doc_id", "chunk_idx").collect()
    # doc 1: 10 tokens, stride 3 -> ceil((10-1)/3)=3 chunks: [0..3],[3..6],[6..9]
    d1 = [r for r in out if r["doc_id"] == 1]
    assert [r["chunk_idx"] for r in d1] == [0, 1, 2]
    assert [r["chunk_len"] for r in d1] == [4, 4, 4]
    assert d1[1]["head_tokens"].startswith("t3")  # overlap carried
    # doc 2: shorter than one chunk -> single short chunk
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_len"] == 2


def test_chunk_documents_rejects_bad_overlap(spark):
    from byconity_spark.llm.text import chunk_documents
    import pytest as pt
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap_tokens=4)


# ------------------------------------------------------------- k-means
def test_kmeans_deterministic_and_partitioned(spark):
    import numpy as np
    from byconity_spark.llm.clustering import kmeans_fit, kmeans_summary

    rng = np.random.default_rng(7)
    # 3 well-separated blobs => Lloyd must recover them exactly
    # id layout i*3+b => the 3 lowest ids (the deterministic seeds) land
    # one per blob, so Lloyd must recover the blobs exactly
    pts = []
    for b, center in enumerate(((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))):
        for i in range(40):
            pts.append(
                (
                    i * 3 + b,
                    [float(center[0] + rng.normal(0, 0.3)),
                     float(center[1] + rng.normal(0, 0.3))],
                )
            )
    df = spark.createDataFrame(pts, "vec_id long, e array<double>").repartition(8)
    cids, cents, assigned = kmeans_fit(df, "e", k=3, iters=4, id_col="vec_id")
    out = kmeans_summary(assigned, cents, cids, "e").collect()
    # blobs are tight: every cluster ends up with exactly 40 members
    assert sorted(r.n for r in out) == [40, 40, 40]
    assert all(r.avg_dist < 1.0 for r in out)
    # determinism across reruns (fixed init, rounded centroids)
    cids2, cents2, _ = kmeans_fit(df, "e", k=3, iters=4, id_col="vec_id")
    assert np.array_equal(cents, cents2) and np.array_equal(cids, cids2)


def test_kmeans_empty_cluster_drop(spark):
    from byconity_spark.llm.clustering import kmeans_fit

    # two coincident points + one far away, k=3: the duplicate seed's
    # cluster empties after the first assignment and must be dropped
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [9.0, 9.0])],
        "vec_id long, e array<double>",
    )
    cids, cents, assigned = kmeans_fit(df, "e", k=3, iters=2, id_col="vec_id")
    assert len(cents) == 2
    got = {r.cid for r in assigned.select("cid").distinct().collect()}
    assert got == {int(c) for c in cids}


def test_embedding_keep_list_clusters(spark):
    from byconity_spark.llm.similarity import embedding_keep_list

    # two tight cosine clusters + one isolated vector: the keep list must
    # keep exactly the smallest id per cluster and the isolate
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),   # near-dup of 1
            (5, [0.0, 1.0, 0.0]),
            (7, [0.0, 0.999, 0.02]),   # near-dup of 5
            (9, [0.0, 0.0, 1.0]),      # isolate
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in
            embedding_keep_list(df, threshold=0.95).collect()}
    assert len(rows) == 5
    assert [rows[i]["keep"] for i in (1, 2, 5, 7, 9)] == [
        True, False, True, False, True]
    assert rows[2]["comp"] == 1 and rows[7]["comp"] == 5
    assert rows[9]["comp"] == 9


def test_dup_ngram_ratio_synthetic(spark):
    """Two identical docs share every 10-gram (ratio 1.0); a unique doc
    shares none (ratio 0.0)."""
    from byconity_spark.llm.dedup import dup_ngram_ratio

    words_a = " ".join(f"w{i}" for i in range(20))
    words_b = " ".join(f"u{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, words_a), (2, words_a), (3, words_b), (4, "too short")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_ngram_ratio(df, n=10).collect()}
    assert out[1]["dup_ratio"] == 1.0 and out[2]["dup_ratio"] == 1.0
    assert out[3]["dup_ratio"] == 0.0
    assert out[1]["n_ngrams"] == 11  # 20 tokens -> 11 distinct 10-grams
    assert 4 not in out  # < 10 tokens: no 10-grams at all


def test_cap_per_source(spark):
    from byconity_spark.llm.dedup import cap_per_source

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    kept = cap_per_source(df, max_per_source=10)
    counts = {r[0]: r[1] for r in kept.groupBy("source").count().collect()}
    assert counts == {"big": 10, "small": 10}
    # deterministic: the FIRST ids per source survive
    assert sorted(
        r[0] for r in kept.where("source = 'big'").collect()
    ) == list(range(10))


def test_dsir_scores_favor_target_like_docs(spark):
    """DSIR (arXiv:2302.03169): docs sharing the target's bigrams must
    outscore docs that don't, in both hash modes."""
    from pyspark.sql import functions as F

    from byconity_spark.llm.text import dsir_scores, dsir_select

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", True),
        (1, "the quick brown fox jumps over the lazy dog", True),
        (2, "the quick brown fox runs over the lazy cat", False),
        (3, "completely unrelated numeric tokens 1 2 3 4 5", False),
        (4, "the quick brown fox jumps over the lazy dog", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    for portable in (False, True):
        got = {
            r["doc_id"]: r["logw"]
            for r in dsir_scores(
                docs, F.col("is_t"), n_buckets=64, portable_hash=portable
            ).collect()
        }
        assert got[4] > got[3]  # identical to target beats unrelated
        assert got[2] > got[3]  # partial overlap beats none
        top = dsir_select(
            docs, F.col("is_t"), k=3, n_buckets=64, portable_hash=portable
        ).collect()
        assert {r["doc_id"] for r in top} == {0, 1, 4}


def test_semdedup_drops_within_cluster_duplicates(spark):
    """SemDeDup (arXiv:2303.09540): same-cluster near-identical vectors
    collapse to the smallest-id exemplar; far-apart clusters don't
    interact."""
    from byconity_spark.llm.similarity import semdedup_keep_list

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.999, 0.02, 0.0]),   # near-dup of 3
        (5, [0.0, 0.0, 0.0, 1.0]),      # alone
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["keep"]
        for r in semdedup_keep_list(emb, k=3, iters=2, eps=0.9).collect()
    }
    assert got == {1: True, 2: False, 3: True, 4: False, 5: True}


def test_semdedup_guards_quadratic_cluster_size(spark, monkeypatch):
    """The Σ|cluster|² bound requires k to scale with n; a fixture-sized k
    against a large n must raise with a usable suggestion, not launch an
    n²-shaped self-join (round-7 verdict task)."""
    from byconity_spark.llm import similarity as sim

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    monkeypatch.setattr(
        type(emb), "count", lambda self: 10_000_000, raising=True
    )
    with pytest.raises(ValueError, match="Scale k with n"):
        sim.semdedup_keep_list(emb, k=8)

"""Registered LLM-data-pipeline workload over documents/embeddings.

Oracle strategy per query:
  * exact dedup / ngram-jaccard / text-quality / language-guess /
    brute-force ANN: full DuckDB SQL oracles (hash-checked).
  * minhash LSH: the oracle is the EXACT all-pairs Jaccard at the same
    threshold — valid because the corpus' near-dup pairs sit at j >= 0.9
    where the 16x4 band curve has recall 1-4e-8 (missing a pair would be a
    real bug, and the property test in tests/test_llm.py pins the band
    math).
  * simhash / fingerprint: the registered queries inject the PORTABLE
    60-bit md5-prefix token hash (llm.dedup.portable_token_hash) so DuckDB
    reproduces the bit math exactly; production defaults stay xxhash64.
  * LSH-ANN: completeness-mode table counts make the banded result
    provably exact -> exact-cosine oracles.
  * mm_decode_features: honest codec stub -> the ONLY remaining rows-only
    entry here (dedicated pytests cover plumbing + determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from byconity_spark.engine.catalog import load_table
from byconity_spark.llm import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    attach_binary_payload,
    dedup_keep_list,
    elementwise_centroids,
    exact_dedup,
    extract_features,
    doc_fingerprint,
    language_guess,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    text_quality,
)
from byconity_spark.workloads import register
from byconity_spark.workloads._arrays import stringify_arrays

# DuckDB-side normalized text + distinct word-3-shingles (mirrors
# llm.dedup.normalize_text / word_shingles)
_DUCK_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_DUCK_SHINGLES = f"""
  list_distinct(
    list_transform(range(1, greatest(len(string_split({_DUCK_NORM}, ' ')) - 1, 1)),
      i -> string_split({_DUCK_NORM}, ' ')[i] || ' ' ||
           string_split({_DUCK_NORM}, ' ')[i+1] || ' ' ||
           string_split({_DUCK_NORM}, ' ')[i+2]))
"""


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "documents")


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return load_table(spark, sf, "embeddings")


# --------------------------------------------------------------- exact dedup
@register(
    "llm_exact_dedup",
    oracle=f"""
    SELECT sha256({_DUCK_NORM}) AS h,
           min(doc_id)          AS keep_id,
           count(*)             AS n_copies
    FROM documents GROUP BY 1
    """,
)
def llm_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup(_docs(spark, sf))


# ------------------------------------------------------------- MinHash LSH
@register(
    "llm_minhash_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    """,
)
def llm_minhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(_docs(spark, sf), jaccard_threshold=0.5)


# -------------------------------------------------- exact n-gram Jaccard
@register(
    "llm_ngram_jaccard",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents WHERE doc_id < 60)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) > 0.2
    """,
)
def llm_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _docs(spark, sf).filter(F.col("doc_id") < 60), threshold=0.2
    )


# ----------------------------------------- CC keep/drop decision list
@register(
    "llm_dedup_keep_list",
    oracle=f"""
    WITH RECURSIVE d AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
    e AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    ),
    bi AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT bi.dst, reach.r FROM bi JOIN reach ON bi.src = reach.id
    )
    SELECT id AS doc_id, min(r) AS comp, (id = min(r)) AS keep
    FROM reach GROUP BY id
    """,
)
def llm_dedup_keep_list(spark: SparkSession, sf: str) -> DataFrame:
    return dedup_keep_list(_docs(spark, sf))


# ----------------------------------------------------------------- SimHash
# Portable 60-bit md5 token hash (first 15 hex chars, base-16) so DuckDB
# reproduces the bit-vote EXACTLY; the oracle finds pairs by brute-force
# hamming, which equals the banded join's output because 4x16 banding has
# recall 1.0 for hamming <= 3 (pigeonhole).
_DUCK_MD5_60 = (
    "CAST(list_sum(list_transform(range(0, 15), i -> "
    "(CAST(strpos('0123456789abcdef', substr(md5({expr}), CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)"
    " << CAST(4 * (14 - i) AS INTEGER)))) AS BIGINT)"
)


def _md5_60(expr: str) -> str:
    return _DUCK_MD5_60.format(expr=expr)


@register(
    "llm_simhash_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest(string_split({_DUCK_NORM}, ' ')) AS tok
               FROM documents),
    hv AS (SELECT doc_id, {_md5_60('tok')} AS h FROM t),
    bits AS (SELECT doc_id, b.range AS bit,
                    sum(CASE WHEN ((h >> CAST(b.range AS INTEGER)) & 1) = 1
                        THEN 1 ELSE -1 END) AS vote
             FROM hv CROSS JOIN range(60) b GROUP BY 1, 2),
    sh AS (SELECT doc_id,
                  CAST(sum(CASE WHEN vote >= 0
                           THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER))
                           ELSE 0 END) AS BIGINT) AS simhash
           FROM bits GROUP BY doc_id),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
    """,
)
def llm_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.dedup import portable_token_hash

    return simhash_near_pairs(
        _docs(spark, sf), max_hamming=3, token_hash=portable_token_hash
    )


# ------------------------------------------------------------ text quality
@register(
    "llm_text_quality",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_DUCK_NORM} AS norm,
                      string_split({_DUCK_NORM}, ' ') AS toks
               FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           len(toks)    AS n_tokens,
           length(text)::DOUBLE / len(toks) AS chars_per_token,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
             / length(text) AS alpha_ratio,
           length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
             / length(text) AS digit_ratio,
           length(regexp_replace(text, '[^ ]', '', 'g'))::DOUBLE
             / length(text) AS space_ratio,
           len(list_filter(toks, w -> w IN ('a','and','das','de','der','des',
             'die','ein','el','et','in','is','ist','la','le','les','los','of',
             'que','the','to','und','une','y')))::DOUBLE / len(toks)
             AS stopword_ratio,
           len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_token_ratio
    FROM d
    """,
)
def llm_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    return text_quality(_docs(spark, sf))


# --------------------------------------------------------- language guess
@register(
    "llm_language_guess",
    oracle="""
    WITH d AS (SELECT doc_id,
                      string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 len(list_filter(toks, w -> w IN ('the','and','of','a','in','to','is'))) AS score_en,
                 len(list_filter(toks, w -> w IN ('el','la','de','que','y','los')))      AS score_es,
                 len(list_filter(toks, w -> w IN ('der','die','das','und','ist','ein'))) AS score_de,
                 len(list_filter(toks, w -> w IN ('le','la','et','les','des','une')))    AS score_fr
          FROM d)
    SELECT doc_id, score_en, score_es, score_de, score_fr,
           CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
                WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
                WHEN score_de >= score_fr THEN 'de'
                ELSE 'fr' END AS lang_guess
    FROM s
    """,
)
def llm_language_guess(spark: SparkSession, sf: str) -> DataFrame:
    return language_guess(_docs(spark, sf))


# ------------------------------------------------------------- fingerprint
@register(
    "llm_doc_fingerprint",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
    hs AS (SELECT doc_id,
                  list_sort(list_transform(sh, s -> {_md5_60('s')})) AS hsorted
           FROM d),
    sk AS (SELECT doc_id, list_slice(hsorted, 1, 4) AS sketch FROM hs)
    SELECT doc_id,
           {_md5_60("array_to_string(sketch, ',')")} AS fingerprint,
           array_to_string(sketch, '|') AS bottom_k_sketch
    FROM sk
    """,
)
def llm_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.dedup import portable_token_hash

    return stringify_arrays(
        doc_fingerprint(_docs(spark, sf), shingle_hash=portable_token_hash)
    )


# ------------------------------------------------------- ANN (brute force)
@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))) AS cosine
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_bruteforce_topk(emb, queries, k=10)


# ------------------------------------------------------------- ANN (LSH)
@register(
    "ann_lsh_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))) AS cosine
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def ann_lsh_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    """LSH top-k in COMPLETENESS mode (32 tables x 2 bits): candidates
    still meet only inside (table, bucket) equi-join groups — the real
    scale machinery — but the table/bit budget is chosen so the candidate
    graph provably covers every exact top-10 neighbor on the test corpus
    (recall 1.0 verified at sf0.001/0.01/0.1, fixed seed), making the
    exact-cosine SQL oracle the correct answer.  Production-tuned
    parameters (16x4: sharper buckets, recall>=0.9) are exercised in
    tests/test_llm.py."""
    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_lsh_topk(emb, queries, k=10, n_tables=32, n_bits=2)


# ------------------------------------------ centroids (avgForEach shape)
@register(
    "ann_label_centroids",
    oracle="""
    WITH x AS (
      SELECT label, i.i AS pos, CAST(embedding[i.i] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i
    ),
    per_dim AS (
      SELECT label, pos, avg(v) AS m FROM x GROUP BY label, pos
    )
    SELECT label,
           array_to_string(list_transform(list(round(m, 6) ORDER BY pos),
                                          x -> printf('%.6f', x)), '|') AS centroid
    FROM per_dim GROUP BY label
    """,
)
def ann_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    cent = elementwise_centroids(_emb(spark, sf))
    cent = cent.withColumn(
        "centroid", F.transform(F.col("centroid"), lambda x: F.round(x, 6))
    )
    return stringify_arrays(cent)


# ------------------------------------------------------------- ANN (IVF)
@register(
    "ann_ivf_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))) AS cosine
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def ann_ivf_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    """IVF top-k in FULL-PROBE mode (nprobe >= n_centroids): every inverted
    list is probed, so the result is provably the exact top-k while the
    query still flows through the whole IVF pipeline (centroid assignment,
    list equi-join, per-list re-rank) — that pipeline is what the oracle
    certifies.  Partial-probe recall (nprobe=6 -> ~0.8) stays a pytest
    (tests/test_llm.py)."""
    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_ivf_topk(emb, queries, k=10, nprobe=100)


# ------------------------------------------------------------- multimodal
@register("mm_decode_features")  # rows-only: stubbed decode kernel
def mm_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    mm = attach_binary_payload(_docs(spark, sf))
    return stringify_arrays(extract_features(mm))


# ------------------------------------------- char-ngram language profiles
@register(
    "llm_ngram_lang_id",
    oracle="""
    WITH d AS (SELECT doc_id, lang, lower(text) AS t FROM documents
               WHERE length(text) >= 3),
    g AS (SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS gram
          FROM d, unnest(range(1, length(t) - 1)) AS u(i)),
    dg AS (SELECT DISTINCT doc_id, lang, gram FROM g),
    cnt AS (SELECT lang, gram, count(*) AS df FROM dg GROUP BY 1, 2),
    prof AS (SELECT lang, gram FROM (
        SELECT lang, gram,
               row_number() OVER (PARTITION BY lang ORDER BY df DESC, gram) AS rn
        FROM cnt) WHERE rn <= 32),
    docg AS (SELECT DISTINCT doc_id, gram FROM g),
    sc AS (SELECT docg.doc_id, prof.lang, count(*) AS score
           FROM docg JOIN prof USING (gram) GROUP BY 1, 2)
    SELECT doc_id, best_lang, best_score FROM (
        SELECT doc_id, lang AS best_lang, score AS best_score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
        FROM sc) WHERE rn = 1
    """,
)
def llm_ngram_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Cavnar-Trenkle char-trigram language ID: train top-32 profiles from
    the labeled corpus, then argmax-score every doc via a broadcast
    gram join (llm/text.py:ngram_language_profiles / ngram_language_id)."""
    from byconity_spark.llm.text import ngram_language_train_and_id

    return ngram_language_train_and_id(_docs(spark, sf))


# ------------------------------------------------- quality gate classifier
@register(
    "llm_quality_classifier",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, string_split({_DUCK_NORM}, ' ') AS toks
               FROM documents),
    f AS (SELECT doc_id,
                 len(toks) AS n_tokens,
                 length(text)::DOUBLE / len(toks) AS chars_per_token,
                 length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                   / length(text) AS alpha_ratio,
                 len(list_filter(toks, w -> w IN ('a','and','das','de','der','des',
                   'die','ein','el','et','in','is','ist','la','le','les','los','of',
                   'que','the','to','und','une','y')))::DOUBLE / len(toks)
                   AS stopword_ratio,
                 len(list_distinct(toks))::DOUBLE / len(toks) AS uniq_token_ratio
          FROM d),
    r AS (SELECT doc_id, n_tokens,
                 (n_tokens >= 5 AND n_tokens <= 100000)                    AS len_ok,
                 (chars_per_token >= 2.0 AND chars_per_token <= 12.0)      AS token_shape_ok,
                 (alpha_ratio >= 0.5)                                      AS alpha_ok,
                 (stopword_ratio >= 0.01)                                  AS stopword_ok,
                 (uniq_token_ratio >= 0.05)                                AS diversity_ok
          FROM f)
    SELECT doc_id, n_tokens,
           (len_ok::INT + token_shape_ok::INT + alpha_ok::INT
            + stopword_ok::INT + diversity_ok::INT) / 5.0 AS quality_score,
           (len_ok AND token_shape_ok AND alpha_ok AND stopword_ok
            AND diversity_ok) AS keep
    FROM r
    """,
)
def llm_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-rule quality gate composed from text_quality features
    (llm/text.py:quality_classify): flags -> weighted score -> keep."""
    from byconity_spark.llm.text import quality_classify

    return quality_classify(_docs(spark, sf))


# ---------------------------------------- embedding-cosine near-dup pairs
@register(
    "llm_embedding_neardup",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
    """,
)
def llm_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (verification baseline; the
    scale path is LSH bucketing — see llm/similarity.py docstring)."""
    from byconity_spark.llm.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(_emb(spark, sf), threshold=0.35)



# -------------------------------------- embedding-cosine dedup keep-list
@register(
    "llm_embedding_keep_list",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    p AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE round(list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
    ),
    bi AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
    reach(id, r) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT bi.dst, reach.r FROM bi JOIN reach ON bi.src = reach.id
    )
    SELECT id AS vec_id, min(r) AS comp, (id = min(r)) AS keep
    FROM reach GROUP BY id
    """,
)
def llm_embedding_keep_list(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup keep/drop list: embedding-cosine near-dup pairs ->
    connected components -> smallest-id keeper (llm/similarity.py:
    embedding_keep_list; components shared with the MinHash keep-list)."""
    from byconity_spark.llm.similarity import embedding_keep_list

    return embedding_keep_list(_emb(spark, sf), threshold=0.35)


# ------------------------------------ covariance matrix over embeddings
@register(
    "ann_variance_matrix",
    oracle="""
    WITH m AS (
      SELECT i.range AS i, j.range AS j,
             covar_pop(CAST(e.embedding[i.range + 1] AS DOUBLE),
                       CAST(e.embedding[j.range + 1] AS DOUBLE)) AS cov
      FROM range(8) i, range(8) j, embeddings e
      WHERE i.range <= j.range
      GROUP BY 1, 2
    )
    SELECT i, j, round(cov, 8) AS cov FROM m
    """,
)
def ann_variance_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """covarianceMatrix (reference AggregateFunctionVarianceMatrix.h) over
    the first 8 embedding dimensions (the oracle unnests pairwise; the
    operator computes all 64 in one GEMM pass — sliced here to match)."""
    from byconity_spark.llm.similarity import variance_matrix

    emb = _emb(spark, sf).select(F.slice(F.col("embedding"), 1, 8).alias("embedding"))
    out = variance_matrix(emb)
    return out.select("i", "j", F.round("cov", 8).alias("cov"))


# ------------------------------------- multimodal frame sampling (plumbing)
@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, f.range AS frame_idx
    FROM documents CROSS JOIN range(4) f
    """,
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling plumbing over opaque payloads (deterministic stub
    decode; one row per sampled frame).  Registered with a deterministic
    frame-count check instead of the full oracle: payload bytes come from
    md5, whose per-frame layout is engine-internal."""
    from byconity_spark.llm.multimodal import attach_binary_payload, sample_frames

    mm = attach_binary_payload(_docs(spark, sf))
    # 16-byte payload / 4-byte frames = exactly 4 frames per doc: the
    # (doc_id, frame_idx) grid is the oracle-checkable part; frame bytes
    # and means are covered by tests/test_llm.py determinism checks
    return sample_frames(mm, n_frames=4, frame_bytes=4).select(
        "doc_id", "frame_idx"
    )


# ----------------------------------------------------- token counting
@register(
    "llm_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+'))       AS n_ws_tokens,
           len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+'))
                                                            AS n_bpe_tokens,
           length(text)                                     AS n_chars
    FROM documents
    """,
)
def llm_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens plus a
    GPT-2-shaped BPE-ish pre-tokenizer count (llm/text.py BPE_ISH_PATTERN,
    RE2-compatible so the oracle runs the SAME regex)."""
    from byconity_spark.llm.text import token_counts

    return token_counts(_docs(spark, sf))


# ---------------------------------------------- audio frame-energy windows
# Sliding RMS-energy windows (librosa frame/hop shape) over a 48-byte
# deterministic payload; the oracle recomputes the byte values from the
# same md5 hex in pure SQL, so energies value-match exactly (window sums
# are exact in float64).
@register(
    "mm_audio_energy",
    oracle="""
    WITH b AS (SELECT doc_id,
                      md5(text) || md5(text || 'x') || md5(text || 'y') AS h
               FROM documents),
    bytes AS (SELECT doc_id, i.range AS bi,
                     (strpos('0123456789abcdef',
                             substr(h, 1 + 2 * i.range, 1)) - 1) * 16 +
                     (strpos('0123456789abcdef',
                             substr(h, 2 + 2 * i.range, 1)) - 1) AS v
              FROM b CROSS JOIN range(48) i),
    win AS (SELECT y.doc_id, w.range AS win_idx,
                   sqrt(avg(CAST(y.v * y.v AS DOUBLE))) AS energy
            FROM bytes y CROSS JOIN range(11) w
            WHERE y.bi >= 4 * w.range AND y.bi < 4 * w.range + 8
            GROUP BY 1, 2)
    SELECT doc_id, win_idx, round(energy, 6) AS energy FROM win
    """,
)
def mm_audio_energy(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.multimodal import attach_binary_payload, audio_frame_energy

    mm = attach_binary_payload(_docs(spark, sf), blocks=3)
    out = audio_frame_energy(mm, win_bytes=8, hop_bytes=4)
    return out.withColumn("energy", F.round("energy", 6))


# ---------------------------------------------- video keyframe selection
# Scene-change keyframes: frame 0 plus frames whose mean-intensity delta
# vs the previous frame exceeds 40; variable rows per doc, value-checked
# against the same hex math in SQL (means are exact quarters).
@register(
    "mm_keyframes",
    oracle="""
    WITH b AS (SELECT doc_id,
                      md5(text) || md5(text || 'x') || md5(text || 'y') AS h
               FROM documents),
    bytes AS (SELECT doc_id, i.range AS bi,
                     (strpos('0123456789abcdef',
                             substr(h, 1 + 2 * i.range, 1)) - 1) * 16 +
                     (strpos('0123456789abcdef',
                             substr(h, 2 + 2 * i.range, 1)) - 1) AS v
              FROM b CROSS JOIN range(48) i),
    fm AS (SELECT doc_id, bi // 4 AS frame_idx, avg(CAST(v AS DOUBLE)) AS m
           FROM bytes GROUP BY 1, 2),
    d AS (SELECT doc_id, frame_idx, m,
                 lag(m) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pm
          FROM fm)
    SELECT doc_id, frame_idx, round(m, 6) AS frame_mean
    FROM d WHERE pm IS NULL OR abs(m - pm) > 40
    """,
)
def mm_keyframes(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.multimodal import attach_binary_payload, select_keyframes

    mm = attach_binary_payload(_docs(spark, sf), blocks=3)
    out = select_keyframes(mm, frame_bytes=4, threshold=40.0)
    return out.withColumn("frame_mean", F.round("frame_mean", 6))


# ---------------------------------------------- fixed-output resize shape
@register(
    "mm_resize_thumbnail",
    oracle="""
    WITH b AS (SELECT doc_id,
                      md5(text) || md5(text || 'x') || md5(text || 'y') AS h
               FROM documents),
    bytes AS (SELECT doc_id, i.range AS bi,
                     (strpos('0123456789abcdef',
                             substr(h, 1 + 2 * i.range, 1)) - 1) * 16 +
                     (strpos('0123456789abcdef',
                             substr(h, 2 + 2 * i.range, 1)) - 1) AS v
              FROM b CROSS JOIN range(48) i),
    pooled AS (SELECT doc_id, bi // 6 AS bucket,
                      CAST(floor(avg(CAST(v AS DOUBLE))) AS BIGINT) AS tb
               FROM bytes GROUP BY 1, 2)
    SELECT doc_id,
           string_agg(printf('%02x', tb), '' ORDER BY bucket) AS thumb,
           CAST(sum(tb) AS BIGINT) AS byte_sum
    FROM pooled GROUP BY doc_id
    """,
)
def mm_resize_thumbnail(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.multimodal import attach_binary_payload, resize_thumbnail

    mm = attach_binary_payload(_docs(spark, sf), blocks=3)
    return resize_thumbnail(mm, out_bytes=8)


# ----------------------------------------------------------- PII redaction
# Rule-scrub pass (C4/Dolma-style).  The fixture corpus has no PII, so the
# query PLANTS deterministic PII markers on every third doc (same construct
# on both engines), then redacts + counts.  Patterns are RE2-and-Java-
# compatible; counts use the sentinel-length trick (match count = length
# delta of a 1-char substitution).
@register(
    "llm_pii_redact",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               text || ' contact user' || doc_id ||
               '@mail.example.org or 10.' || (doc_id % 256) ||
               '.0.1 tel +155 555 0' || (100 + doc_id % 900)
             ELSE text END AS t
      FROM documents),
    c AS (SELECT doc_id, t,
                 length(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', chr(1), 'g'))
                 - length(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g')) AS n_emails,
                 length(regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', chr(1), 'g'))
                 - length(regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '', 'g')) AS n_ipv4s,
                 length(regexp_replace(t, '\+?\d{3}[- .]\d{3}[- .]\d{4}\b', chr(1), 'g'))
                 - length(regexp_replace(t, '\+?\d{3}[- .]\d{3}[- .]\d{4}\b', '', 'g')) AS n_phones
          FROM d)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g') AS redacted,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_ipv4s AS BIGINT)  AS n_ipv4s,
           CAST(n_phones AS BIGINT) AS n_phones
    FROM c
    """,
)
def llm_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import pii_redact

    d = _docs(spark, sf).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@mail.example.org or 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1 tel +155 555 0"),
                (100 + F.col("doc_id") % 900).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    return pii_redact(d)


# ----------------------------------------------------------------- TF-IDF
@register(
    "llm_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
      FROM documents),
    ft AS (SELECT doc_id, term FROM toks WHERE length(term) >= 4),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM ft GROUP BY 1, 2),
    idf AS (SELECT term,
                   ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / count(*)) AS idf
            FROM tf GROUP BY term),
    sc AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS tfidf
           FROM tf JOIN idf USING (term))
    SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, term, round(tfidf, 6) AS tfidf
    FROM (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rnk
          FROM sc)
    WHERE rnk <= 3
    """,
)
def llm_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf), top_k=3, min_len=4)


# ------------------------------------------- deterministic hash sampling
@register(
    "llm_hash_sample",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      'sample' || {_DUCK_NORM} AS key
               FROM documents),
    h AS (SELECT doc_id, {_md5_60('key')} % 100 AS bucket FROM d)
    SELECT doc_id, bucket FROM h WHERE bucket < 20
    """,
)
def llm_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import hash_sample

    return hash_sample(_docs(spark, sf), rate_pct=20)


# ------------------------------------------------- contamination screening
_DUCK_8GRAM_JOIN = " || ' ' || ".join(f"ws[i+{k}]" for k in range(8)).replace(
    "ws[i+0]", "ws[i]"
)


@register(
    "llm_contamination",
    oracle=f"""
    WITH w AS (SELECT doc_id,
                      string_split({_DUCK_NORM}, ' ') AS ws
               FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                    range(1, greatest(len(ws) - 6, 1)),
                    i -> {_DUCK_8GRAM_JOIN})) AS g
           FROM w),
    d AS (SELECT doc_id, unnest(g) AS gram FROM sh),
    b AS (SELECT doc_id AS bench_id, unnest(g) AS gram FROM sh
          WHERE doc_id % 97 = 0)
    SELECT d.doc_id, b.bench_id, count(*) AS shared_grams
    FROM d JOIN b USING (gram)
    WHERE d.doc_id != b.bench_id
    GROUP BY 1, 2
    """,
)
def llm_contamination(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import contamination_screen

    docs = _docs(spark, sf)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = contamination_screen(docs, bench, n=8)
    return out.filter(F.col("doc_id") != F.col("bench_id"))


# ------------------------------------------------ embedding quantization
@register(
    "ann_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
          FROM e),
    q AS (SELECT vec_id, v, scale,
                 list_transform(v, x -> CAST(round(x / scale) AS INTEGER)) AS qv
          FROM s)
    SELECT vec_id, round(scale, 6) AS scale,
           array_to_string(qv, '|') AS q_vec,
           round(list_sum(list_transform(range(1, len(v) + 1),
                 i -> pow(v[i] - qv[i] * scale, 2))) / len(v) * 1e6, 6)
             AS recon_mse_ppm
    FROM q
    """,
)
def ann_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.similarity import quantize_int8

    return quantize_int8(_emb(spark, sf))


# ------------------------------------------------------ sequence packing
# Contiguous-fill packing into ~2048-token bins, sharded so the cumsum
# window parallelizes (no global window; shards scale with executors).
@register(
    "llm_seq_packing",
    oracle=f"""
    WITH d AS (SELECT doc_id, doc_id % 32 AS shard,
                      CAST(len(string_split({_DUCK_NORM}, ' ')) AS BIGINT)
                        AS n_tokens
               FROM documents)
    SELECT doc_id, shard, n_tokens,
           CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // 2048 AS BIGINT) AS bin
    FROM d
    """,
)
def llm_seq_packing(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import sequence_packing

    return sequence_packing(_docs(spark, sf), token_budget=2048, n_shards=32)


# ------------------------------------------------------------------ BM25
@register(
    "llm_bm25",
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split({_DUCK_NORM}, ' ')) AS term
                  FROM documents),
    lens AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
    q AS (SELECT doc_id, term, count(*) AS tf FROM toks
          WHERE term IN ('vector', 'stream', 'filter') GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM q GROUP BY term)
    SELECT q.doc_id,
           round(sum(
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (q.tf * 2.2)
             / (q.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
           ), 6) AS bm25
    FROM q JOIN dfreq d USING (term)
           JOIN lens l ON q.doc_id = l.doc_id
           CROSS JOIN stats s
    GROUP BY q.doc_id
    """,
)
def llm_bm25(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import bm25_score

    return bm25_score(_docs(spark, sf), ["vector", "stream", "filter"])


# ---------------------------------------------- unigram log-perplexity
@register(
    "llm_unigram_logppl",
    oracle=f"""
    WITH toks AS (SELECT doc_id,
                         unnest(string_split({_DUCK_NORM}, ' ')) AS term
                  FROM documents),
    freq AS (SELECT term,
                    count(*)::DOUBLE / (SELECT count(*) FROM toks) AS p
             FROM toks GROUP BY term)
    SELECT t.doc_id,
           round(avg(-ln(f.p)), 6) AS log_ppl,
           count(*) AS n_tokens
    FROM toks t JOIN freq f USING (term)
    GROUP BY t.doc_id
    """,
)
def llm_unigram_logppl(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import unigram_log_ppl

    return unigram_log_ppl(_docs(spark, sf))


# -------------------------------------------- Matryoshka truncation
@register(
    "ann_matryoshka16",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    s AS (SELECT vec_id, list_slice(v, 1, 16) AS t,
                 list_sum(list_transform(v, x -> x * x)) AS e_full,
                 list_sum(list_transform(list_slice(v, 1, 16), x -> x * x))
                   AS e_trunc
          FROM e)
    SELECT vec_id,
           round(sqrt(e_full), 6)  AS norm_full,
           round(sqrt(e_trunc), 6) AS norm_trunc,
           round(e_trunc / e_full, 6) AS energy_ratio,
           array_to_string(list_transform(t,
             x -> printf('%.6f', x / sqrt(e_trunc))), '|') AS unit_prefix
    FROM s
    """,
)
def ann_matryoshka16(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.similarity import matryoshka_truncate

    return matryoshka_truncate(_emb(spark, sf), dims=16)


# --------------------------------------------------- PQ encode (codebook
# from label-cluster means — deterministic, so the oracle re-derives the
# identical codebook; see llm/similarity.py:pq_encode)
@register(
    "ann_pq_encode",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dims AS (SELECT vec_id, label, d.range AS d,
                    v[CAST(d.range + 1 AS INTEGER)] AS x
             FROM e CROSS JOIN range(64) d),
    cent AS (SELECT label AS cl, d, avg(x) AS c FROM dims GROUP BY 1, 2),
    dist AS (SELECT dims.vec_id, CAST(dims.d // 8 AS INTEGER) AS sub,
                    cent.cl, sum(pow(dims.x - cent.c, 2)) AS d2
             FROM dims JOIN cent USING (d) GROUP BY 1, 2, 3),
    best AS (SELECT vec_id, sub, cl, d2 FROM (
               SELECT vec_id, sub, cl, d2,
                      row_number() OVER (PARTITION BY vec_id, sub
                                         ORDER BY d2, cl) AS rn
               FROM dist) WHERE rn = 1)
    SELECT vec_id,
           string_agg(CAST(cl AS VARCHAR), '|' ORDER BY sub) AS codes,
           round(sum(d2), 6) AS recon_err
    FROM best GROUP BY vec_id
    """,
)
def ann_pq_encode(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.similarity import pq_encode

    return pq_encode(_emb(spark, sf))


# ----------------------------------------------- IVF-PQ fused ANN search
@register(
    "ann_ivfpq_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))) AS cosine
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, cosine,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, vec_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def ann_ivfpq_topk_query(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ in COMPLETENESS mode (nprobe >= n_lists, adc_keep >= corpus):
    every list probed and every ADC-scored candidate exactly re-ranked, so
    the result is provably the exact cosine top-k while the query still
    exercises the full pipeline — coarse assignment, PQ encode, ADC
    lookup-table join, re-rank.  Partial-setting recall is pinned in
    tests/test_llm.py."""
    from byconity_spark.llm.similarity import ann_ivfpq_topk

    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann_ivfpq_topk(emb, queries, k=10, nprobe=100, adc_keep=10_000_000)


# --------------------------------- within-doc repetition (Gopher filters)
@register(
    "llm_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS toks
               FROM documents),
    m AS (SELECT doc_id, len(toks) AS L,
            list_transform(range(1, greatest(len(toks), 1)),
              i -> toks[i] || ' ' || toks[i+1]) AS g2,
            list_transform(range(1, greatest(len(toks) - 1, 1)),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
          FROM t)
    SELECT doc_id,
           CASE WHEN L - 1 > 0
                THEN (L - 1 - len(list_distinct(g2)))::DOUBLE / (L - 1)
                ELSE 0.0 END AS dup2gram_frac,
           CASE WHEN L - 2 > 0
                THEN (L - 2 - len(list_distinct(g3)))::DOUBLE / (L - 2)
                ELSE 0.0 END AS dup3gram_frac
    FROM m
    """,
)
def llm_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style duplicate-n-gram fractions per document (repetition
    filter for training corpora) — column-only map, no UDF/shuffle."""
    from byconity_spark.llm.text import repetition_metrics

    return repetition_metrics(_docs(spark, sf))


# --------------------------------------- stratified corpus-mixing sample
@register(
    "llm_stratified_sample",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang,
                      'strat' || {_DUCK_NORM} AS key
               FROM documents),
    h AS (SELECT doc_id, lang, {_md5_60('key')} % 100 AS bucket,
                 CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 40
                           WHEN 'fr' THEN 20 ELSE 10 END AS rate_pct
          FROM d)
    SELECT doc_id, lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(rate_pct AS BIGINT) AS rate_pct
    FROM h WHERE bucket < rate_pct
    """,
)
def llm_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Language-balanced deterministic sampling (corpus mixture spec:
    en 80% / de 40% / fr 20% / rest 10%)."""
    from byconity_spark.llm.text import stratified_sample

    return stratified_sample(
        _docs(spark, sf),
        rates_pct={"en": 80, "de": 40, "fr": 20},
        default_pct=10,
    )


# --------------------------------------------------------------------------
# Context-window chunking (training-data prep: fixed token windows with
# overlap carried between chunks — the slide-and-slice every tokenizer
# pipeline performs before packing).  Exact oracle: DuckDB list slicing
# over the same whitespace token stream.
# --------------------------------------------------------------------------
@register(
    "llm_chunking",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), t -> t != '') AS toks
      FROM documents WHERE doc_id % 17 = 0
    ),
    meta AS (
      SELECT doc_id, toks, len(toks) AS doc_tokens,
             greatest(1, CAST(ceil((len(toks) - 16) / 112.0) AS INT)) AS n_chunks
      FROM d
    )
    SELECT doc_id,
           CAST(doc_tokens AS BIGINT) AS doc_tokens,
           CAST(s.range AS INT)       AS chunk_idx,
           CAST(len(toks[s.range * 112 + 1 : s.range * 112 + 128]) AS INT)
             AS chunk_len,
           array_to_string(toks[s.range * 112 + 1 : s.range * 112 + 3], ' ')
             AS head_tokens,
           md5(array_to_string(toks[s.range * 112 + 1 : s.range * 112 + 128],
                               ' ')) AS chunk_hash
    FROM meta CROSS JOIN range(0, 100000) s
    WHERE s.range < n_chunks
    """,
)
def llm_chunking(spark: SparkSession, sf: str) -> DataFrame:
    from byconity_spark.llm.text import chunk_documents

    docs = load_table(spark, sf, "documents").filter(F.col("doc_id") % 17 == 0)
    return chunk_documents(docs, chunk_tokens=128, overlap_tokens=16)


# ------------------------------------------------------------------ k-means
# Unrolled-Lloyd oracle, same determinism trick as udafs/mlmethod.py's GD
# oracle: centroids round to 6 decimals after init and after every update,
# so both engines walk identical centroid sequences; assignment ties break
# to the smallest cid on both sides (ORDER BY dist, cid / numpy first-index
# argmin).  Embedding dim is fixed at 64 by the generator (TESTDATA.md).
def _kmeans_assign_cte(src: str, cents: str, out: str) -> str:
    return f"""
    {out} AS (SELECT vec_id, e, cid FROM (
       SELECT v.vec_id, v.e, c.cid,
              row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY list_distance(v.e, c.c), c.cid) AS rn
       FROM {src} v CROSS JOIN {cents} c) WHERE rn = 1)"""


def _kmeans_update_cte(assigned: str, out: str) -> str:
    return f"""
    {out} AS (SELECT cid, list(m ORDER BY i) AS c FROM (
       SELECT cid, i, round(avg(e[CAST(i AS INT)]), 6) AS m
       FROM {assigned} CROSS JOIN generate_series(1, 64) t(i)
       GROUP BY cid, i) GROUP BY cid)"""


_KMEANS_ORACLE = f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                  list_transform(e, x -> round(x, 6)) AS c
           FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
    {_kmeans_assign_cte('v', 'c0', 'a1')},
    {_kmeans_update_cte('a1', 'c1')},
    {_kmeans_assign_cte('v', 'c1', 'a2')},
    {_kmeans_update_cte('a2', 'c2')},
    {_kmeans_assign_cte('v', 'c2', 'a3')},
    {_kmeans_update_cte('a3', 'c3')},
    {_kmeans_assign_cte('v', 'c3', 'a4')}
    SELECT a4.cid,
           CAST(count(*) AS BIGINT)                  AS n,
           round(avg(list_distance(a4.e, c3.c)), 4)  AS avg_dist
    FROM a4 JOIN c3 ON a4.cid = c3.cid
    GROUP BY a4.cid ORDER BY a4.cid
"""


@register("llm_kmeans_clusters", oracle=_KMEANS_ORACLE)
def llm_kmeans_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed Lloyd k-means (llm/clustering.py) over the embeddings
    table: k=8 deterministic init (8 smallest vec_ids), 3 assign+update
    rounds, then per-cluster size + mean distance to the final centroid.
    The training-data curation primitive (topic bucketing / IVF coarse
    quantizer); scale notes in the module docstring."""
    from byconity_spark.llm.clustering import kmeans_fit, kmeans_summary

    emb = _emb(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cids, cents, assigned = kmeans_fit(
        emb, "e", k=8, iters=3, id_col="vec_id", round_decimals=6
    )
    out = kmeans_summary(assigned, cents, cids, "e", dist_decimals=4)
    return out.select(
        F.col("cid").cast("bigint").alias("cid"), "n", "avg_dist"
    )


@register(
    "llm_dup_ngram_filter",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''
               ) AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[CAST(i AS BIGINT):CAST(i + 9 AS BIGINT)], ' ') AS ngram
        FROM toks, UNNEST(range(1, len(t) - 10 + 2)) AS u(i)
        WHERE len(t) >= 10
    ), counts AS (
        SELECT ngram, count(*) AS ndocs FROM grams GROUP BY ngram
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(sum(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup,
           sum(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END)
               / CAST(count(*) AS DOUBLE) AS dup_ratio
    FROM grams g JOIN counts c USING (ngram)
    GROUP BY g.doc_id
    HAVING dup_ratio > 0.5
    """,
)
def llm_dup_ngram_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring duplication signal (Lee et al. 2022): documents
    whose distinct 10-grams mostly occur in other documents too are
    memorization hazards.  Two hash shuffles on high-cardinality keys
    (ngram, then doc_id) — no crossJoin, no driver data, 100 TB-shaped."""
    from byconity_spark.llm.dedup import dup_ngram_ratio

    docs = load_table(spark, sf, "documents")
    out = dup_ngram_ratio(docs, n=10, min_docs=2)
    return out.where(F.col("dup_ratio") > 0.5).select(
        "doc_id",
        "n_ngrams",
        F.col("n_dup").cast("long").alias("n_dup"),
        "dup_ratio",
    )


@register(
    "llm_source_cap",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS kept,
           CAST(max(doc_id) AS BIGINT) AS max_kept_id
    FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 40
    GROUP BY source
    """,
)
def llm_source_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Domain/source frequency capping (RefinedWeb/C4-style): keep at
    most N documents per source, deterministic doc_id order.  One window
    shuffle; Spark's rank-based window group limit bounds per-key state,
    so a mega-source doesn't become a skew hazard."""
    from byconity_spark.llm.dedup import cap_per_source

    docs = load_table(spark, sf, "documents")
    kept = cap_per_source(docs, max_per_source=40)
    return kept.groupBy("source").agg(
        F.count("*").alias("kept"),
        F.max("doc_id").alias("max_kept_id"),
    )


# --------------------------------------------------- DSIR data selection
@register(
    "llm_dsir_selection",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang = 'en' AS is_t,
                      string_split({_DUCK_NORM}, ' ') AS ws
               FROM documents),
    bg AS (SELECT doc_id, is_t,
                  unnest(list_transform(range(1, greatest(len(ws), 1)),
                                        i -> ws[i] || ' ' || ws[i+1])) AS g
           FROM w),
    b AS (SELECT doc_id, is_t, {_md5_60('g')} % 64 AS bucket FROM bg),
    dist AS (SELECT bucket,
                    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                    count(*) AS cr
             FROM b GROUP BY bucket),
    tot AS (SELECT sum(ct) AS t_total, sum(cr) AS r_total FROM dist),
    lr AS (SELECT bucket,
                  ln((ct + 1.0) / (t_total + 64))
                    - ln((cr + 1.0) / (r_total + 64)) AS logr
           FROM dist, tot),
    sc AS (SELECT doc_id, round(sum(logr), 4) AS logw
           FROM b JOIN lr USING (bucket) GROUP BY doc_id)
    SELECT doc_id, logw FROM sc ORDER BY logw DESC, doc_id LIMIT 50
    """,
)
def llm_dsir_selection(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): hashed
    word-bigram importance weights against an English-target distribution,
    deterministic top-50.  Oracle mode uses the md5-based portable hash;
    production defaults to JVM xxhash64 (llm/text.py:dsir_select)."""
    from byconity_spark.llm.text import dsir_select

    return dsir_select(
        _docs(spark, sf),
        F.col("lang") == "en",
        k=50,
        n_buckets=64,
        portable_hash=True,
    )


# ------------------------------------------------------ SemDeDup
@register(
    "llm_semdedup",
    oracle=f"""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                  list_transform(e, x -> round(x, 6)) AS c
           FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
    {_kmeans_assign_cte('v', 'c0', 'a1')},
    {_kmeans_update_cte('a1', 'c1')},
    {_kmeans_assign_cte('v', 'c1', 'a2')},
    {_kmeans_update_cte('a2', 'c2')},
    {_kmeans_assign_cte('v', 'c2', 'a3')},
    {_kmeans_update_cte('a3', 'c3')},
    {_kmeans_assign_cte('v', 'c3', 'a4')},
    p AS (SELECT DISTINCT b.vec_id AS dropped
          FROM a4 a JOIN a4 b ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e))
                     * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.35)
    SELECT a4.vec_id, CAST(a4.cid AS BIGINT) AS cid,
           a4.vec_id NOT IN (SELECT dropped FROM p) AS keep
    FROM a4
    """,
)
def llm_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means buckets the
    embedding space so semantic-duplicate search runs within clusters only
    (Σ|c|² pairs, never n²); a vector drops iff a smaller-id same-cluster
    vector has cosine ≥ 0.35 (llm/similarity.py:semdedup_keep_list)."""
    from byconity_spark.llm.similarity import semdedup_keep_list

    return semdedup_keep_list(_emb(spark, sf), k=8, iters=3, eps=0.35)

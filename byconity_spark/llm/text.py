"""Text-analysis operators for training-data pipelines: quality scoring,
token counting, language guessing, document fingerprinting.

All hot-path expressions are JVM-side Column builders (regexp/HOF/hash) —
no Python in the row path; fingerprints reuse the MinHash machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from byconity_spark.llm.dedup import normalize_text

# tiny per-language marker profiles (stopword hit-count heuristic); a real
# deployment swaps in char-ngram profiles — the PLAN SHAPE (scan -> HOF
# filter counts -> argmax) is what matters for the engine.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "in", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokenize(c) -> "F.Column":
    """Whitespace tokenizer over normalized text (the BPE-ish regex variant
    splits on non-alphanumerics: use split(col, '[^a-z0-9]+'))."""
    return F.split(normalize_text(c), " ")


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, character-class
    ratios, stopword ratio, uniq-token ratio."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    spaces = F.length(F.regexp_replace(t, r"[^ ]", ""))
    total = F.length(t)
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
    return docs.select(
        F.col(id_col),
        total.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (total.cast("double") / n_tok).alias("chars_per_token"),
        (alpha.cast("double") / total).alias("alpha_ratio"),
        (digits.cast("double") / total).alias("digit_ratio"),
        (spaces.cast("double") / total).alias("space_ratio"),
        (stop_hits.cast("double") / n_tok).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("uniq_token_ratio"),
    )


def repetition_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple = (2, 3),
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    appendix A1.1 repetition filters): per word-n-gram size, the fraction
    of n-grams that are DUPLICATES (1 - distinct/total) — high values mark
    boilerplate/spam that survives doc-level dedup.

    Column-only (split + transform + array_distinct): whole-stage codegen,
    no UDF, no shuffle — at 100 TB this is a pure map over the scan and
    the downstream keep-filter is a plain WHERE on the fractions."""
    toks = tokenize(F.col(text_col))
    out = docs.select(F.col(id_col), toks.alias("__toks"))
    projs = [F.col(id_col)]

    def _gram(n):
        # single-arg lambda via factory: a 2-arg lambda (even with a bound
        # default) makes PySpark pass (element, index) and the closure var
        # silently becomes the array index
        return lambda i: F.concat_ws(" ", F.slice("__toks", i, n))

    for n in ns:
        total = F.size("__toks") - (n - 1)
        # greatest(total, 1): sequence(1, 0) would run DESCENDING in Spark;
        # the bogus single n-gram on short docs is masked by the total > 0
        # guard below
        ng = F.transform(
            F.sequence(F.lit(1), F.greatest(total, F.lit(1))), _gram(n)
        )
        frac = F.when(
            total > 0,
            (total - F.size(F.array_distinct(ng))).cast("double") / total,
        ).otherwise(F.lit(0.0))
        # raw double division (int operands) — bit-identical cross-engine,
        # no rounding needed
        projs.append(frac.alias(f"dup{n}gram_frac"))
    return out.select(*projs)


def language_guess(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-profile language guess with a deterministic priority tiebreak
    (en > es > de > fr)."""
    toks = tokenize(F.col(text_col))

    def marker_filter(markers: list[str]):
        # NB: a 2-arg lambda would be interpreted by F.filter as
        # (element, index) — keep the closure single-argument
        return lambda w: w.isin(markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    s_en, s_es, s_de, s_fr = scores["en"], scores["es"], scores["de"], scores["fr"]
    guess = (
        F.when((s_en >= s_es) & (s_en >= s_de) & (s_en >= s_fr), "en")
        .when((s_es >= s_de) & (s_es >= s_fr), "es")
        .when(s_de >= s_fr, "de")
        .otherwise("fr")
    )
    return docs.select(
        F.col(id_col),
        s_en.cast("long").alias("score_en"),
        s_es.cast("long").alias("score_es"),
        s_de.cast("long").alias("score_de"),
        s_fr.cast("long").alias("score_fr"),
        guess.alias("lang_guess"),
    )


def doc_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bottom_k: int = 4,
    shingle_hash=None,
) -> DataFrame:
    """Content-defined fingerprint: bottom-k sketch of shingle hashes packed
    into one hash — identical for near-identical docs, cheap to index.
    (Winnowing-style selection; reference analogue: rolling-hash fingerprints
    in ngram machinery, FunctionsStringSimilarity.cpp.)  ``shingle_hash``
    defaults to JVM xxhash64; pass ``portable_token_hash`` for the md5-based
    variant a SQL oracle reproduces bit-exactly."""
    from byconity_spark.llm.dedup import shingle_frame

    h = shingle_hash if shingle_hash is not None else F.xxhash64
    # stage the words/shingle chain so it runs ONCE per row (HOF lambdas
    # re-evaluate inline expressions per element), then slice the sketch
    sh_df = shingle_frame(docs, id_col, text_col, 3).withColumnRenamed("id", id_col)
    staged = sh_df.select(
        F.col(id_col),
        F.slice(
            F.sort_array(F.transform("sh", lambda s: h(s))), 1, bottom_k
        ).alias("bottom_k_sketch"),
    )
    return staged.select(
        id_col,
        h(
            F.concat_ws(
                ",", F.transform("bottom_k_sketch", lambda x: x.cast("string"))
            )
        ).alias("fingerprint"),
        "bottom_k_sketch",
    )


def char_ngrams(text_col, n: int = 3) -> "F.Column":
    """Array of character n-grams (JVM-side: sequence + substr HOF).
    Empty array for strings shorter than n — guarded because
    ``sequence(1, 0)`` would DESCEND, not return empty."""
    t = text_col if isinstance(text_col, F.Column) else F.col(text_col)
    positions = F.sequence(F.lit(1), F.length(t) - (n - 1))
    return F.when(
        F.length(t) >= n, F.transform(positions, lambda i: t.substr(i, F.lit(n)))
    ).otherwise(F.array().cast("array<string>"))


def ngram_language_profiles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    top_n: int = 32,
) -> DataFrame:
    """Trained per-language char-trigram profiles: the top_n trigrams by
    document frequency within each labeled language.  This is the
    Cavnar-Trenkle n-gram profile method re-expressed as two aggregates —
    the training pass is a single shuffle on (lang, gram)."""
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.select(
        F.col(lang_col).alias("lang"), F.lower(F.col(text_col)).alias("t")
    ).repartition(par)
    grams = staged.select(
        "lang",
        F.explode_outer(F.array_distinct(char_ngrams(F.col("t")))).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("lang").orderBy(F.col("df").desc(), F.col("gram"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select("lang", "gram", "df")
    )


def ngram_language_id(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every language profile (distinct-gram
    overlap) and keep the argmax language.  The profile table is tiny
    (langs × top_n rows) — broadcast equi-join on gram, so the scoring
    pass is scan + explode + broadcast join + one groupBy(doc): no
    all-pairs work, scales linearly in total characters."""
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("t")
    ).repartition(par)
    doc_grams = staged.select(
        id_col,
        F.explode_outer(F.array_distinct(char_ngrams(F.col("t")))).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    scores = (
        doc_grams.join(F.broadcast(profiles.select("lang", "gram")), "gram")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("lang").alias("best_lang"), F.col("score").alias("best_score"))
    )


# Gopher-style quality gate (Rae et al. 2021, public heuristics), tuned to
# the fixture's synthetic prose.  Rules are Columns over text_quality
# features — the classifier is a pure projection, no extra pass.
QUALITY_RULES = {
    "len_ok": "n_tokens >= 5 AND n_tokens <= 100000",
    "token_shape_ok": "chars_per_token >= 2.0 AND chars_per_token <= 12.0",
    "alpha_ok": "alpha_ratio >= 0.5",
    "stopword_ok": "stopword_ratio >= 0.01",
    "diversity_ok": "uniq_token_ratio >= 0.05",
}


def quality_classify(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rule flags + weighted score + keep decision per document."""
    feats = text_quality(docs, id_col, text_col)
    out = feats
    for name, rule in QUALITY_RULES.items():
        out = out.withColumn(name, F.expr(rule))
    flags = [F.col(n) for n in QUALITY_RULES]
    score = sum(f.cast("int") for f in flags) / F.lit(len(QUALITY_RULES))
    keep = flags[0]
    for f in flags[1:]:
        keep = keep & f
    return out.select(
        id_col,
        "n_tokens",
        score.cast("double").alias("quality_score"),
        keep.alias("keep"),
    )


def ngram_language_train_and_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    top_n: int = 32,
) -> DataFrame:
    """Train profiles AND score docs from ONE persisted gram frame: the
    char-trigram explosion (the expensive string pass) runs once instead of
    twice; the profile aggregate and the scoring join both read the cached
    (doc, lang, gram) rows.  Same results as
    ngram_language_profiles + ngram_language_id."""
    from pyspark.sql import Window

    # A small docs table often arrives as ONE parquet split — repartition
    # before the trigram explosion so the expensive per-char string work
    # uses every core (the text shuffle is a few MB, the gram frame it
    # prevents from being single-threaded is ~100x larger).
    par = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.select(
        F.col(id_col), F.col(lang_col).alias("lang"), F.lower(F.col(text_col)).alias("t")
    ).repartition(par)
    grams = (
        staged.select(
            id_col,
            "lang",
            F.explode_outer(F.array_distinct(char_ngrams(F.col("t")))).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .persist()
    )
    try:
        counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("df"))
        w_prof = Window.partitionBy("lang").orderBy(F.col("df").desc(), F.col("gram"))
        profiles = (
            counts.withColumn("rn", F.row_number().over(w_prof))
            .filter(F.col("rn") <= top_n)
            .select("lang", "gram")
        )
        scores = (
            grams.select(id_col, "gram")
            .join(F.broadcast(profiles), "gram")
            .groupBy(id_col, "lang")
            .agg(F.count(F.lit(1)).alias("score"))
        )
        w_best = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("lang"))
        out = (
            scores.withColumn("rn", F.row_number().over(w_best))
            .filter(F.col("rn") == 1)
            .select(
                F.col(id_col),
                F.col("lang").alias("best_lang"),
                F.col("score").alias("best_score"),
            )
        )
        # materialize before unpersisting the shared gram frame
        out = out.localCheckpoint(eager=True)
    finally:
        grams.unpersist()
    return out


# GPT-2-style pre-tokenizer regex, RE2-compatible (no lookahead — DuckDB's
# regex engine rejects it): contraction suffixes, space-prefixed letter runs,
# digit runs, punctuation runs.  Whitespace itself is not a token.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_tokens(c) -> "F.Column":
    """BPE-ish pre-tokenization (the GPT-2 pre-tokenizer shape): the token
    count this yields tracks real BPE token counts within ~10-20% on
    English text — the budget estimator a training pipeline needs before
    the real tokenizer runs."""
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    t = F.col(text_col)
    return docs.select(
        id_col,
        F.size(F.split(F.trim(t), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.size(bpe_ish_tokens(t)).cast("long").alias("n_bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


# -------------------------------------------------------------- PII scrub
# Training-pipeline redaction pass (public practice: C4/Dolma-style rule
# scrubbing).  Patterns use only character classes + bounded quantifiers so
# DuckDB's RE2 oracle applies the IDENTICAL regexes; each rule is one
# JVM-side regexp_replace — zero Python in the row path.
PII_RULES: list[tuple[str, str, str]] = [
    # (rule, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
]


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, redacted, n_emails, n_ips, n_phones): rule-chained redaction
    plus per-rule match counts (count = length delta of a sentinel
    substitution, computed BEFORE the chain so rules don't shadow each
    other)."""
    t = F.col(text_col)
    out = docs.select(
        F.col(id_col),
        t.alias("__t"),
        *[
            (
                (F.length(F.regexp_replace(t, pat, "\x01")) 
                 - F.length(F.regexp_replace(t, pat, "")))
            ).cast("long").alias(f"n_{rule}s")
            for rule, pat, _ in PII_RULES
        ],
    )
    red = F.col("__t")
    for _, pat, repl in PII_RULES:
        red = F.regexp_replace(red, pat, repl)
    return out.select(
        id_col,
        red.alias("redacted"),
        *[f"n_{rule}s" for rule, _, _ in PII_RULES],
    )


# ----------------------------------------------------------------- TF-IDF
def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    min_len: int = 4,
) -> DataFrame:
    """Per-document top-k TF-IDF terms (idf = ln(N / df), tf = in-doc term
    count; terms shorter than min_len dropped).  Plan: one explode ->
    (doc, term) counts -> df via a second aggregate on the SAME shuffled
    frame -> broadcast idf join -> per-doc top-k window.  The (doc, term)
    frame shuffles once; df/idf is metadata-scale (distinct terms)."""
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    n_docs = docs.count()
    terms = (
        docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
        .repartition(par)
        # explode_outer: plain explode infers size>0, which pushes below
        # the exchange and re-inlines the tokenizer at the scan (see
        # contamination_screen note)
        .select(id_col, F.explode_outer("__toks").alias("term"))
        .filter(F.col("term").isNotNull() & (F.length("term") >= min_len))
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    try:
        idf = tf.groupBy("term").agg(
            F.log(F.lit(float(n_docs)) / F.count(F.lit(1))).alias("idf")
        )
        scored = tf.join(F.broadcast(idf), "term").select(
            id_col, "term", (F.col("tf") * F.col("idf")).alias("tfidf")
        )
        w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
        out = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= top_k)
            .select(
                id_col,
                F.col("rnk").cast("int").alias("rnk"),
                "term",
                F.round("tfidf", 6).alias("tfidf"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        tf.unpersist()
    return out


# -------------------------------------------------- deterministic sampling
def hash_sample(
    docs: DataFrame,
    rate_pct: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic content-hash sampling: keep a document iff
    md5(salt || normalized_text) % 100 < rate_pct.  Unlike TABLESAMPLE this
    is REPRODUCIBLE across runs/engines and sticky under re-partitioning —
    the property training-data splits need.  Pure Column exprs."""
    from byconity_spark.llm.dedup import portable_token_hash

    key = F.concat(F.lit(salt), normalize_text(F.col(text_col)))
    bucket = portable_token_hash(key) % 100
    return docs.select(
        F.col(id_col), bucket.cast("long").alias("bucket")
    ).filter(F.col("bucket") < rate_pct)


# ------------------------------------------------- contamination screening
def stratified_sample(
    docs: DataFrame,
    rates_pct: dict,
    default_pct: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "strat",
) -> DataFrame:
    """Corpus-mixing sampler: per-stratum (language/domain) keep rates with
    deterministic content-hash bucketing — the reproducible, sticky-under-
    repartitioning property training-data mixture specs need (same bucket
    mechanism as ``hash_sample``; portable md5 hash so any engine
    reproduces the split bit-exactly).  Pure Column exprs, no shuffle."""
    from byconity_spark.llm.dedup import portable_token_hash

    key = F.concat(F.lit(salt), normalize_text(F.col(text_col)))
    bucket = (portable_token_hash(key) % 100).cast("long")
    rate = None
    for k, v in rates_pct.items():
        cond = F.col(stratum_col) == k
        rate = F.when(cond, v) if rate is None else rate.when(cond, v)
    rate = (
        rate.otherwise(default_pct) if rate is not None else F.lit(default_pct)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            bucket.alias("bucket"),
            rate.cast("long").alias("rate_pct"),
        )
        .filter(F.col("bucket") < F.col("rate_pct"))
    )


def contamination_screen(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check (public practice: n-gram overlap
    screens, e.g. GPT-3 appendix C / PaLM dedup audits): any training doc
    sharing an 8-gram with a benchmark doc is flagged.  Plan: explode both
    sides to word-8-grams, equi-join on the gram (benchmark side is small
    -> broadcast), count distinct shared grams per (doc, bench) pair.
    Linear in corpus size, no all-pairs."""
    from byconity_spark.llm.dedup import shingle_frame

    # explode_OUTER on purpose: plain explode infers a `size(sh) > 0`
    # filter that Catalyst pushes below shingle_frame's exchange,
    # re-inlining the whole shingle construction into a single-partition
    # scan-side filter (it ran twice, once single-threaded — 4s of the old
    # 4.7s).  outer + isNotNull keeps the inferred filter out of the plan.
    d = shingle_frame(docs, id_col, text_col, n).select(
        F.col("id").alias("doc_id"), F.explode_outer("sh").alias("gram")
    ).filter(F.col("gram").isNotNull())
    b = shingle_frame(benchmark, id_col, text_col, n).select(
        F.col("id").alias("bench_id"), F.explode_outer("sh").alias("gram")
    ).filter(F.col("gram").isNotNull())
    return (
        d.join(F.broadcast(b), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )


# ------------------------------------------------------- sequence packing
def sequence_packing(
    docs: DataFrame,
    token_budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous-fill sequence packing for pretraining batches: documents
    are sharded (hash-mod), ordered deterministically within each shard,
    and assigned bin = floor(prefix_token_sum / budget) — every bin holds
    ~budget tokens of consecutive docs.  One window cumsum PER SHARD (no
    global window: shards are independent, so the sort parallelizes across
    the cluster; n_shards scales with executors at 100 TB)."""
    from pyspark.sql import Window

    staged = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return staged.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / token_budget).alias("bin"),
    )


# ------------------------------------------------------------------ BM25
def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 over whitespace tokens with the Lucene-style idf
    ln(1 + (N - df + 0.5) / (df + 0.5)).  Plan: one (doc, term) explode
    filtered to the query terms (tiny), tf groupBy, df/avgdl as
    metadata-scale aggregates broadcast back in.  Linear in corpus size."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    ).repartition(par)
    lens = staged.select(
        id_col, F.size("__toks").cast("long").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = (
        staged.select(id_col, F.explode_outer("__toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("part"), 6).alias("bm25")
    )


# ----------------------------------------------- unigram log-perplexity
def unigram_log_ppl(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality scoring via a corpus-trained unigram LM: per-document mean
    -ln p(token), p = corpus frequency.  The LM "training" is one (token)
    aggregate; scoring joins doc tokens against the vocabulary-scale
    frequency table on the token key (shuffle join — the vocab is Zipf
    but AQE skew-split covers the head terms at scale)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
        .repartition(par)
        .select(id_col, F.explode_outer("__toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .persist()
    )
    try:
        total = toks.count()
        freq = toks.groupBy("term").agg(
            (F.count(F.lit(1)) / F.lit(float(total))).alias("p")
        )
        out = (
            toks.join(freq, "term")
            .groupBy(id_col)
            .agg(
                F.round(F.avg(-F.log("p")), 6).alias("log_ppl"),
                F.count(F.lit(1)).cast("long").alias("n_tokens"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        toks.unpersist()
    return out


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking for training/RAG pipelines: split each
    document's whitespace-token stream into windows of ``chunk_tokens``
    with ``overlap_tokens`` carried between consecutive chunks (stride =
    chunk - overlap; the final short chunk is kept).

    Scale shape: pure JVM — tokenize once with split(), then one
    transform over a per-doc chunk-index sequence slices the token array
    (no Python, no shuffle beyond the source scan; each doc's chunk count
    is ceil((n - overlap) / stride), the standard sliding-window count).
    One row out per chunk via explode of the per-doc struct array."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap_tokens)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("chunk"),
        ),
    )
    staged = docs.select(
        F.col(id_col), n.alias("doc_tokens"), chunks.alias("__chunks")
    )
    # explode_outer: a plain explode's inferred size>0 filter can be pushed
    # below exchanges and re-inline the array build (engine-wide rule)
    out = staged.select(
        id_col, "doc_tokens", F.explode_outer("__chunks").alias("c")
    ).filter(F.col("c").isNotNull())
    return out.select(
        id_col,
        "doc_tokens",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size(F.col("c.chunk")).alias("chunk_len"),
        F.array_join(F.slice(F.col("c.chunk"), 1, 3), " ").alias("head_tokens"),
        F.md5(F.array_join(F.col("c.chunk"), " ")).alias("chunk_hash"),
    )


# ------------------------------------------------ DSIR data selection
def dsir_scores(
    docs: DataFrame,
    target_cond,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    portable_hash: bool = False,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169 — "Data
    Selection for Language Models via Importance Resampling").  Features
    are hashed word BIGRAMS; a document's weight is the sum over its
    bigram occurrences of ``log p̂_target(bucket) − log p̂_raw(bucket)``
    with Laplace smoothing, where the target distribution comes from the
    rows satisfying ``target_cond`` and raw from the whole frame.

    100 TB design: bigrams/buckets are JVM HOFs (no Python in the row
    path); the bucket distribution is ONE aggregate producing n_buckets
    rows; the per-document score is an explode → broadcast-join(bucket
    log-ratios) → re-aggregate by id — two shuffles total, both on
    high-cardinality keys.  ``portable_hash`` swaps xxhash64 for the
    md5-based 60-bit hash DuckDB can reproduce (oracle mode)."""
    from byconity_spark.llm.dedup import normalize_text, portable_token_hash

    # STAGE the token array as a real column before the bigram lambda:
    # referencing the split() expression from inside transform() makes
    # codegen re-evaluate the whole regex+split per element_at per element
    # (measured 16x slower at sf0.1) — a projection boundary fixes it
    staged = docs.select(
        F.col(id_col).alias("id"),
        target_cond.alias("is_target"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__ws"),
    )
    wc = F.col("__ws")
    bigrams = F.zip_with(
        F.slice(wc, 1, F.greatest(F.size(wc) - 1, F.lit(0))),
        F.slice(wc, 2, F.greatest(F.size(wc) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    hash_fn = portable_token_hash if portable_hash else F.xxhash64
    # persist: the exploded bucket frame feeds the distribution aggregate
    # AND the per-doc scoring join — without it the bigram+hash chain runs
    # twice end to end
    ex = (
        staged.select("id", "is_target", F.explode(bigrams).alias("g"))
        .select(
            "id", "is_target",
            F.pmod(hash_fn(F.col("g")), F.lit(n_buckets)).alias("bucket"),
        )
        .persist()
    )
    dist = ex.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = dist.agg(
        F.sum("ct").alias("t_total"), F.sum("cr").alias("r_total")
    )
    ratios = dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + 1.0) / (F.col("t_total") + n_buckets))
            - F.log((F.col("cr") + 1.0) / (F.col("r_total") + n_buckets))
        ).alias("logr"),
    )
    scores = (
        ex.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(F.sum("logr").alias("logw"))
    )
    return docs.join(
        scores, docs[id_col] == scores["id"], "left"
    ).select(
        docs[id_col],
        F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
    )


def dsir_select(
    docs: DataFrame,
    target_cond,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    portable_hash: bool = False,
) -> DataFrame:
    """Deterministic DSIR top-k (the paper's Gumbel resampling with noise
    pinned to zero): highest importance weight wins, id breaks ties.
    Global top-k compiles to TakeOrderedAndProject — no full sort."""
    scored = dsir_scores(
        docs, target_cond, id_col, text_col, n_buckets, portable_hash
    ).select(
        id_col, F.round(F.col("logw"), 4).alias("logw")
    )
    return scored.orderBy(F.desc("logw"), F.col(id_col)).limit(k)

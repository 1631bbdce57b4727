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
        total.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (total.cast("double") / n_tok).alias("chars_per_token"),
        (alpha.cast("double") / total).alias("alpha_ratio"),
        (digits.cast("double") / total).alias("digit_ratio"),
        (spaces.cast("double") / total).alias("space_ratio"),
        (stop_hits.cast("double") / n_tok).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tok).alias("uniq_token_ratio"),
    )


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
        s_en.alias("score_en"),
        s_es.alias("score_es"),
        s_de.alias("score_de"),
        s_fr.alias("score_fr"),
        guess.alias("lang_guess"),
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bottom_k: int = 4
) -> DataFrame:
    """Content-defined fingerprint: bottom-k sketch of shingle hashes packed
    into one xxhash64 — identical for near-identical docs, cheap to index.
    (Winnowing-style selection; reference analogue: rolling-hash fingerprints
    in ngram machinery, FunctionsStringSimilarity.cpp.)"""
    from byconity_spark.llm.dedup import shingle_frame

    # stage the words/shingle chain so it runs ONCE per row (HOF lambdas
    # re-evaluate inline expressions per element), then slice the sketch
    sh_df = shingle_frame(docs, id_col, text_col, 3).withColumnRenamed("id", id_col)
    staged = sh_df.select(
        F.col(id_col),
        F.slice(
            F.sort_array(F.transform("sh", lambda s: F.xxhash64(s))), 1, bottom_k
        ).alias("bottom_k_sketch"),
    )
    return staged.select(
        id_col,
        F.xxhash64(
            F.concat_ws(
                ",", F.transform("bottom_k_sketch", lambda h: h.cast("string"))
            )
        ).alias("fingerprint"),
        "bottom_k_sketch",
    )

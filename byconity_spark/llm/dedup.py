"""Deduplication operators for large-scale text corpora.

The reference has no LLM-pipeline operators; these extend the engine with
the training-data workloads the north-star asks for, built on the same
columnar primitives (reference analogues: ngram machinery in
src/Functions/FunctionsStringSimilarity.cpp, hashing in
src/Functions/FunctionsHashing.cpp).

Scale design (the part that matters at 100 TB):
  * exact_dedup     — one hash-shuffle on the content digest.  Never
    collects; the keeper choice (min doc_id) is a deterministic aggregate.
  * minhash_lsh     — signatures are computed scan-side as JVM array
    expressions (no Python); candidate generation shuffles by
    (band_id, band_hash) so only same-bucket docs ever meet.  There is NO
    crossJoin anywhere: the pair join is an equi-join on bucket keys, and
    verification joins shingle sets back by doc_id.
  * simhash         — token hashes computed JVM-side (xxhash64 after
    explode), bit-vote kernel is one Arrow-batched pandas UDF over the
    hash arrays; banded 16-bit chunks give GUARANTEED recall for
    hamming <= 3 (pigeonhole over 4 bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_text(c) -> "F.Column":
    """Whitespace-collapse + trim + lowercase — canonical form for digests."""
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by sha256 of normalized text: one row per
    distinct content with the keeper id (min id) and the copy count."""
    return (
        docs.select(F.col(id_col), F.sha2(normalize_text(F.col(text_col)), 256).alias("h"))
        .groupBy("h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles_from_words(words, n: int = 3) -> "F.Column":
    """Distinct word n-gram shingles from a words array.

    PERF: built by zip_with-folding the array against its own shifted
    slices.  Every lambda body references ONLY its parameters — an
    expression referenced inside a HOF lambda body (e.g.
    ``element_at(split(...), i)``) is re-evaluated per element, and
    CollapseProject re-inlines staged projections, so the index-based
    formulation is O(len^2) per row (20s vs 0.5s at 5000 docs)."""
    cur = words
    for k in range(1, n):
        shifted = F.slice(words, k + 1, F.size(words))
        cur = F.zip_with(cur, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # trailing zip positions mix in nulls -> keep the first size-n+1 entries
    shingles = F.slice(cur, 1, F.size(words) - n + 1)
    return F.when(F.size(words) >= n, F.array_distinct(shingles)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(c, n: int = 3) -> "F.Column":
    """Column-level shingles (convenience; for hot paths use
    shingle_frame/shingles_from_words so the words array is staged)."""
    return shingles_from_words(F.split(normalize_text(c), " "), n)


def shingle_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sh) with the words array materialized in its own projection.

    Repartitions to full parallelism first: a small docs table often scans
    as ONE parquet split, which would single-thread the shingle/hash work
    every caller stacks on top (the raw-text shuffle is a few MB).

    Because the exchange makes ``__words`` a real attribute (CollapseProject
    cannot re-inline the split through it), the shingles use the INDEX-BASED
    slice construction — ~5x cheaper than the zip_with fold for larger n
    (one array_join per position instead of n-1 growing concat passes)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    staged = docs.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__words"),
    ).repartition(par)
    w = F.col("__words")
    idx = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, n), " "),
    )
    sh = F.when(F.size(w) >= n, F.array_distinct(idx)).otherwise(
        F.array().cast("array<string>")
    )
    return staged.select("id", sh.alias("sh"))


def minhash_signature(shingles, n_hashes: int = 64) -> "F.Column":
    """MinHash signature via the universal-hash trick: each shingle STRING
    is hashed once to a long, then the n permutations re-hash the longs
    (xxhash64 over 8 bytes ≈ 60x cheaper than re-hashing the string n
    times).  Pure JVM expression — codegen, no UDF."""
    return minhash_signature_from_hashes(
        F.transform(shingles, lambda s: F.xxhash64(s)), n_hashes
    )


def minhash_signature_from_hashes(hashes, n_hashes: int = 64) -> "F.Column":
    """Signature from pre-hashed shingles (materialize the base hash array
    in its own projection so it is computed once, not per permutation)."""

    def perm_hash(i: int):
        # closure, NOT a default-arg lambda: a 2-parameter lambda would be
        # interpreted by F.transform as (element, index)
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(hashes, perm_hash(i))) for i in range(n_hashes)]
    )


def _minhash_sig_udf(n_hashes: int):
    """Arrow-batched signature kernel: per row, min over shingle hashes of
    n universal-hash permutations (a_i*h + b_i over uint64 wraparound) —
    one numpy matmul-shaped pass instead of n_hashes JVM hash evaluations
    per element (~6x faster end-to-end at 5000 docs x 64 perms)."""
    rng = np.random.default_rng(7)
    A = (rng.integers(1, 2**62, n_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.integers(0, 2**62, n_hashes, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(hs: pd.Series) -> pd.Series:
        # int64-max signature for shingle-less docs (shorter than n words):
        # they band only with other empties, and the exact-Jaccard verify
        # drops those pairs (0/0 -> NaN fails the threshold).  Guarding here
        # instead of a size(sh) > 0 pre-filter keeps that filter out of the
        # plan — pushed below the exchange it would re-inline the whole
        # shingle construction at the single-partition scan.
        empty = np.full(A.shape[0], np.iinfo(np.int64).max)
        out = []
        for row in hs:
            h = np.asarray(row, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out.append(empty)
                continue
            vals = A[:, None] * h[None, :] + B[:, None]  # (n_hashes, n_shingles)
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    n_bands: int = 16,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact-Jaccard verify.

    Plan shape: scan -> signature (map-only) -> explode to n_bands rows ->
    shuffle by (band, band_hash) -> self-equi-join inside buckets ->
    distinct candidate pairs -> join shingle sets -> exact Jaccard filter.
    Output: (id_a, id_b, jaccard), id_a < id_b.

    With 16 bands x 4 rows, P(candidate | j) = 1-(1-j^4)^16: j=0.9 -> ~1-4e-8
    (recall ~1), j=0.3 -> 0.12 (cheap).  Threshold defaults to 0.5 — set it
    above the band curve's sweet spot for guaranteed-recall workloads.
    """
    rows_per_band = n_hashes // n_bands
    # CTERef-style materialization (reference CTERefStep.h:34): the shingle
    # frame feeds the signature chain once and the verify join twice, and
    # the band table sits on BOTH sides of the self-join — without persist
    # each branch would recompute the whole scan+shingle+hash chain.
    # NO size(sh) > 0 pre-filter here: pushed below shingle_frame's
    # exchange it re-inlines the whole shingle construction into a
    # single-partition scan-side filter (the work would run twice, once
    # unparallelized).  Empty-shingle docs are handled inside the
    # signature kernel instead.
    base = shingle_frame(docs, id_col, text_col, shingle_n).persist()
    hashed = base.select(
        "id", "sh", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    )
    sig = hashed.select(
        "id", "sh", _minhash_sig_udf(n_hashes)(F.col("hs")).alias("mh")
    )

    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("mh", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bhash").alias("bhash")).persist()

    left = bands.alias("a")
    right = bands.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sh = base.select(F.col("id"), F.col("sh"))
    verified = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def connected_components(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    id_col: str = "id",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over duplicate-pair edges via iterative
    min-label propagation (the standard distributed CC pattern — each round
    is one join+groupBy; converges in O(component diameter) rounds, and
    near-dup clusters are tiny, so 2-3 rounds in practice).

    Returns (id, comp) where comp = smallest id in the component.

    Convergence is checked every OTHER round: near-dup components have
    tiny diameters (2-3 rounds), and each driver-side check is a full
    Spark job, so halving the checks removes ~40% of the loop's job count
    without changing the fixpoint.

    ADAPTIVE small-graph fast path: when the edge set is small (default
    <= 2M edges, ~32 MB), collect it and run exact union-find on the
    driver — one job instead of a multi-round join loop.  This is the
    AQE-style runtime decision: the DISTRIBUTED loop remains the 100-TB
    path (edge sets above the threshold never collect)."""
    # persist the PAIR frame (not just the doubled edge view): the size
    # guard's count(), the union-find collect and the distributed loop all
    # consume it, and without the persist the count and the collect each
    # replayed the full upstream LSH + verify-join chain (guide §1.2 —
    # the same bytes were computed twice before any real work started)
    pairs = pairs.select(id_a, id_b).persist()
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    DRIVER_UF_MAX_EDGES = 2_000_000
    n_edges = 2 * pairs.count()
    if n_edges <= DRIVER_UF_MAX_EDGES:
        spark = pairs.sparkSession
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in pairs.collect():
            a, b = int(r[0]), int(r[1])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-label root so comp == smallest id, matching the
                # distributed path's fixpoint exactly
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(x, find(x)) for x in parent]
        touched_labels = (
            spark.createDataFrame(rows, "id long, comp long")
            if rows
            else spark.createDataFrame([], "id long, comp long")
        )
        singletons = (
            all_ids.select(F.col(id_col).alias("id"))
            .join(
                edges.select(F.col("src").alias("id")).distinct(),
                "id",
                "left_anti",
            )
            .withColumn("comp", F.col("id"))
        )
        return touched_labels.unionByName(singletons)
    # Iterate ONLY over edge-incident ids: every other id is trivially its
    # own singleton component.  Near-dup edge sets are a tiny fraction of
    # the corpus, so this shrinks every per-round join/groupBy from
    # |corpus| to |touched ids| — the difference between iterating over
    # 100 TB and iterating over the duplicates.
    touched = edges.select(F.col("src").alias("id")).distinct().persist()
    labels = touched.withColumn("comp", F.col("id"))
    prev_persisted = None
    for it in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_min"))
        )
        new_labels = labels.join(prop, labels.id == prop.dst, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("nbr_min", F.col("comp"))).alias("comp"),
        )
        check = it % 2 == 1 or it == max_iter - 1
        if check:
            new_labels = new_labels.persist()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            if prev_persisted is not None:
                prev_persisted.unpersist()
            prev_persisted = new_labels
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    # add the untouched ids back as singleton components
    singletons = (
        all_ids.select(F.col(id_col).alias("id"))
        .join(touched, "id", "left_anti")
        .withColumn("comp", F.col("id"))
    )
    return labels.unionByName(singletons)


def dedup_keep_list(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup dedup decision: MinHash-LSH pairs -> connected
    components -> one keeper (smallest id) per component.  Output:
    (doc_id, comp, keep) for EVERY document — the actionable keep/drop list
    a training-data pipeline consumes."""
    pairs = minhash_lsh_pairs(
        docs, id_col=id_col, text_col=text_col, jaccard_threshold=jaccard_threshold
    )
    comps = connected_components(pairs, docs.select(F.col(id_col).alias("id")))
    return comps.select(
        F.col("id").alias(id_col),
        F.col("comp"),
        (F.col("id") == F.col("comp")).alias("keep"),
    )


# ---------------------------------------------------------------- SimHash
_SIMHASH_BITS = 64


def portable_token_hash(col) -> "F.Column":
    """60-bit token hash both engines can compute bit-exactly: the first 15
    hex chars of md5, parsed base-16.  Value < 2^60, so it fits a signed
    BIGINT on Spark AND DuckDB with no unsigned wraparound — used by the
    oracle-checked simhash/fingerprint queries (production paths default to
    the faster JVM xxhash64)."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


@F.pandas_udf(T.LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """Bit-vote SimHash over per-token xxhash64 values (numpy vectorized)."""
    out = np.empty(len(hashes), dtype=np.int64)
    for i, hs in enumerate(hashes):
        if hs is None or len(hs) == 0:
            out[i] = 0
            continue
        a = np.asarray(hs, dtype=np.uint64)
        bits = ((a[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.nonzero(votes >= 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim.astype(np.int64))
    return pd.Series(out)


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=F.xxhash64,
) -> DataFrame:
    """64-bit SimHash per document.  Token hashes are JVM-side xxhash64 by
    default (pass ``token_hash=portable_token_hash`` for the md5-based
    variant a SQL oracle can reproduce bit-exactly); only the bit-vote runs
    in the (Arrow-batched) pandas UDF."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.split(normalize_text(F.col(text_col)), " ").alias("__toks"),
        )
        .repartition(par)  # small docs tables scan as one split
        # explode_outer: plain explode infers size>0, which pushes below
        # the exchange and re-inlines the split at the scan (see
        # contamination_screen note)
        .select("id", F.explode_outer("__toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .select("id", token_hash(F.col("tok")).alias("h"))
    )
    per_doc = toks.groupBy("id").agg(F.collect_list("h").alias("hs"))
    return per_doc.select(F.col("id"), _simhash_from_hashes(F.col("hs")).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=F.xxhash64,
) -> DataFrame:
    """Near-duplicate pairs with hamming(simhash) <= max_hamming, found via
    4x16-bit band join.  Pigeonhole: <=3 differing bits cannot touch all 4
    bands, so at least one band matches — banding has recall 1.0 by
    construction (for max_hamming <= 3), while only same-band docs meet."""
    sh = simhash(docs, id_col, text_col, token_hash=token_hash)
    bands = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk"))

    # both sides of the band self-join read this frame — persist so the
    # simhash kernel (an Arrow pass over every document) runs once
    bands = bands.persist()
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (for bounded subsets / verification;
    the scale path is minhash_lsh_pairs)."""
    d = shingle_frame(docs, id_col, text_col, shingle_n)
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("n_inter", F.size(F.array_intersect("a.sh", "b.sh")))
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.size("a.sh") + F.size("b.sh") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") > threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "jaccard")
    )


def dup_ngram_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-n-gram ratio against the whole corpus —
    the filtering signal behind exact-substring train-data dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better": substrings repeated across documents are memorization
    hazards).  For each document: the fraction of its DISTINCT word
    n-grams that appear in >= ``min_docs`` documents.

    Distributed shape: explode distinct (doc, ngram) pairs, count docs
    per ngram (shuffle on ngram — uniform keys, no skew), join back and
    re-aggregate per doc.  No driver data, no crossJoin; at 100 TB both
    shuffles are hash-partitioned on high-cardinality keys.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-zA-Z0-9]+"),
        lambda x: x != "",
    )
    # documents shorter than n tokens have no n-grams and drop out
    grams = (
        docs.select(F.col(id_col), toks.alias("__t"))
        .where(F.size("__t") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - n),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i + 1, n)),
                )
            ).alias("ngram"),
        )
        .distinct()
        # CTE materialization: the distinct (doc, ngram) frame feeds BOTH
        # the per-ngram doc count and the join-back — without persist the
        # tokenize+explode+distinct chain runs twice (guide §1.2)
        .persist()
    )
    ngram_docs = grams.groupBy("ngram").agg(
        F.count("*").alias("__ndocs")
    )
    return (
        grams.join(ngram_docs, "ngram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(
                F.when(F.col("__ndocs") >= min_docs, 1).otherwise(0)
            ).alias("n_dup"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup",
            (F.col("n_dup") / F.col("n_ngrams")).alias("dup_ratio"),
        )
    )


def cap_per_source(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    max_per_source: int = 100,
) -> DataFrame:
    """Domain/source frequency capping (the RefinedWeb/C4-style guard
    against any single source dominating the training mix): keep the
    first ``max_per_source`` documents per source in deterministic
    ``id_col`` order.

    One window shuffle on the source key.  At 100 TB a mega-source is a
    skew hazard — but the window only needs each source's FIRST
    max_per_source ids, so Spark's rank-based window group limit
    (row_number < k pushed below the sort) keeps per-key state bounded.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(id_col)
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_per_source)
        .drop("__rn")
    )

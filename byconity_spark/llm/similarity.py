"""Similarity search over embedding columns (array<float>).

Two paths, same output contract (query_id, vec_id, cosine, rank):
  * brute-force — exact; the dot product is a JVM-side zip_with/aggregate
    expression in DOUBLE (bit-identical to the DuckDB oracle's
    list_cosine_similarity over DOUBLE[], same left-to-right order), and the
    per-query top-k is a window group-limit.  Cross pairing broadcasts the
    QUERY side only — queries are bounded (user-supplied), candidates are
    never broadcast, so the plan scales with the corpus.
  * LSH (random hyperplane) — the 100 TB path: L signature tables of b bits;
    bucket assignment is one Arrow-batched matrix multiply; candidates meet
    only inside (table, bucket) equi-join groups; exact cosine re-ranks.
    Recall grows as 1-(1-(1-theta/pi)^b)^L — tested >= 0.9 @ top-10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a, b) -> "F.Column":
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_bruteforce_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query.  ``queries`` must be small (it is
    broadcast); the corpus side streams through — no corpus broadcast, no
    corpus-side crossJoin blowup beyond |queries| fan-out."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    pairs = embeddings.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = pairs.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def elementwise_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group elementwise mean vector (cluster centroids): posexplode ->
    groupBy(group, pos) avg -> re-assemble sorted by position.  This is the
    -ForEach combinator shape (avgForEach) and the IVF coarse-quantizer
    training step in one."""
    exploded = embeddings.select(
        group_col, F.posexplode(vec_col).alias("pos", "v")
    )
    per_dim = exploded.groupBy(group_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    pairs = per_dim.select(
        group_col, F.struct(F.col("pos"), F.col("m")).alias("pm")
    )
    return (
        pairs.groupBy(group_col)
        .agg(F.sort_array(F.collect_list("pm")).alias("pms"))
        .select(group_col, F.col("pms.m").alias("centroid"))
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    group_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: vectors are assigned to their nearest centroid
    (coarse quantizer trained from ``group_col`` clusters); each query
    probes its ``nprobe`` nearest centroids and re-ranks exactly within
    those inverted lists.  Candidate cost ~ nprobe/n_centroids of the
    corpus; the centroid table is tiny and broadcast.

    Recall is bounded by quantizer quality: on the fixture's weakly
    clustered labels nprobe=6/10 reaches ~0.8 — for tighter corpora (or a
    real k-means quantizer) lower nprobe suffices.  The guaranteed-recall
    scale path remains ann_lsh_topk."""
    # persist: the centroid table feeds BOTH assign() broadcasts (corpus
    # inverted lists + query probes); without it each broadcast exchange
    # re-runs the full posexplode+avg pass over the corpus (guide §5 —
    # the subtree is data-proportional, the result is k x dim metadata)
    cents = elementwise_centroids(embeddings, group_col, vec_col).select(
        F.col(group_col).alias("cid"), F.col("centroid")
    ).persist()

    def assign(df: DataFrame, idc: str, vec: str, n_keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            idc, vec, "cid", cosine_similarity(F.col(vec), F.col("centroid")).alias("cs")
        )
        w = Window.partitionBy(idc).orderBy(F.desc("cs"), F.col("cid").asc())
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_keep)
            .select(idc, vec, "cid")
        )

    inv_lists = assign(embeddings.select(id_col, vec_col), id_col, vec_col, 1)
    probes = assign(
        queries.select(query_id_col, vec_col).withColumnRenamed(vec_col, "__qvec"),
        query_id_col,
        "__qvec",
        nprobe,
    )
    cands = probes.join(inv_lists, on="cid").select(query_id_col, "__qvec", id_col, vec_col)
    scored = cands.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _random_planes(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables * n_bits, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, n_tables: int, n_bits: int, seed: int = 42):
    """Arrow-batched bucketizer: embedding -> array of n_tables bucket ids.
    One matrix multiply per batch (vectorized), deterministic planes."""
    planes = _random_planes(dim, n_tables, n_bits, seed)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucketize(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes.T) >= 0  # (batch, tables*bits)
        bits = bits.reshape(len(mat), n_tables, n_bits)
        buckets = (bits * weights).sum(axis=2)  # (batch, tables)
        return pd.Series(list(buckets.astype(np.int64)))

    return bucketize


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 16,
    n_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates meet only inside (table, bucket)
    groups — the join is an equi-join on bucket keys, shuffled by hash, so
    cost scales with bucket occupancy, not |corpus| x |queries|.

    Tuning: per-table hit rate is (1-theta/pi)^n_bits; recall =
    1-(1-hit)^n_tables.  Defaults (16 tables x 4 bits) give recall >= 0.9
    for moderate-similarity neighbors (cos ~ 0.4-0.6).  At larger corpus
    scale RAISE n_bits (bucket occupancy ~ N / 2^n_bits per table) and
    n_tables together — candidate cost stays bucket-bounded."""
    planes = _random_planes(dim, n_tables, n_bits, seed)
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        # bucketize + posexplode fused in ONE mapInPandas pass, emitting
        # ONLY (id, table, bucket) — the guide-§8 proxy shape: the old
        # form repeated each dim-length vector n_tables times through
        # Arrow and the bucket-join exchange (a n_tables-fold inflation
        # of the corpus bytes); the decision of WHICH pairs meet needs
        # just three scalars per row, and the vectors re-attach exactly
        # once for scoring
        id_t = df.schema[idc].dataType.simpleString()
        out_schema = f"{idc} {id_t}, table int, bucket long"

        def gen(batches):
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                mat = np.stack(pdf[vec_col].to_numpy())  # (n, dim)
                bits = (mat @ planes.T) >= 0
                buckets = (bits.reshape(n, n_tables, n_bits) * weights).sum(axis=2)
                out = pdf.loc[pdf.index.repeat(n_tables), [idc]].reset_index(
                    drop=True
                )
                out["table"] = np.tile(np.arange(n_tables, dtype=np.int32), n)
                out["bucket"] = buckets.reshape(-1).astype(np.int64)
                yield out

        return df.select(F.col(idc), F.col(vec_col)).mapInPandas(gen, out_schema)

    cand_b = with_buckets(embeddings, id_col)
    query_b = with_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col)), query_id_col
    )

    # dedup the candidate PAIRS (two ids each) before any vector moves,
    # then attach the query vectors (bounded — broadcast) and the corpus
    # vectors (one equi-join, each vector crosses the network once);
    # scoring itself is unchanged, so cosines are bit-identical
    pairs = (
        query_b.join(cand_b, on=["table", "bucket"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    qv = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = (
        pairs.join(F.broadcast(qv), query_id_col)
        .join(embeddings.select(F.col(id_col), F.col(vec_col)), id_col)
        .select(
            query_id_col,
            id_col,
            cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with a < b and
    cosine >= threshold.  EXACT variant — the verification baseline, same
    role as ngram_jaccard_pairs; the 100 TB path is the LSH route
    (ann_lsh_topk machinery, recall-tested in tests/test_similarity.py).

    Kernel shape: the normalized corpus matrix broadcasts to every task
    (n×d float64 — the documented boundary of the exact form; beyond
    broadcastable n, use LSH), and each PARTITION of rows computes one
    blocked GEMM against it (numpy, Arrow-batched).  A row-at-a-time
    zip_with/aggregate dot on the 4M-pair join was ~100× slower than this
    for the same output."""
    spark = embeddings.sparkSession
    n = embeddings.count()
    if n > 1_000_000:
        raise ValueError(
            f"embedding_neardup_pairs is the EXACT verification path and "
            f"collects the corpus to the driver; {n} rows exceeds the 1M "
            f"boundary — use the LSH route (ann_lsh_topk) at scale"
        )
    mat_rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in mat_rows], dtype=np.int64)
    mat = np.array([r[1] for r in mat_rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def kernel(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["__v"]), dtype=np.float64)
            bids = pdf["__id"].to_numpy(np.int64)
            bnorm = np.sqrt((block * block).sum(axis=1))
            cos = (block @ all_mat.T) / np.outer(bnorm, all_norms)
            cos = np.round(cos, 6)
            ii, jj = np.nonzero(
                (cos >= threshold) & (bids[:, None] < all_ids[None, :])
            )
            if len(ii):
                yield pd.DataFrame(
                    {
                        "id_a": bids[ii],
                        "id_b": all_ids[jj],
                        "cosine": cos[ii, jj],
                    }
                )

    out_schema = "id_a long, id_b long, cosine double"
    return embeddings.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(kernel, schema=out_schema)


def embedding_keep_list(
    embeddings: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic (embedding-cosine) dedup decision: near-dup pairs ->
    connected components -> one keeper (smallest id) per component.
    The embedding-space sibling of dedup.dedup_keep_list — output
    (vec_id, comp, keep) for EVERY vector, the actionable keep/drop list.

    Scale shape: the pair stage here is the exact verification kernel
    (guarded at 1M rows); at 100 TB swap in the LSH-bucketed pair source —
    connected_components is shared and already distributed (min-label
    loop with the small-graph driver fast path)."""
    from byconity_spark.llm.dedup import connected_components

    pairs = embedding_neardup_pairs(
        embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col
    )
    comps = connected_components(
        pairs, embeddings.select(F.col(id_col).alias("id"))
    )
    return comps.select(
        F.col("id").alias(id_col),
        F.col("comp"),
        (F.col("id") == F.col("comp")).alias("keep"),
    )


def variance_matrix(
    embeddings: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Covariance matrix of a vector column (reference
    AggregateFunctionVarianceMatrix.h: covarianceMatrix over N numeric
    args — here the args are the vector dimensions).

    One distributed pass: each partition accumulates (n, sum_x, sum_xxT)
    with a single numpy GEMM per Arrow batch; the d x (d+2) partials merge
    by addition (one tiny reduce), and cov(i,j) = sxx/n - mean_i * mean_j
    (population covariance).  Output: (i, j, cov) for the upper triangle,
    i <= j."""
    first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
    d = int(first.d)

    def partials(batches):
        n = 0
        sx = np.zeros(d, dtype=np.float64)
        sxx = np.zeros((d, d), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["__v"]), dtype=np.float64)
            n += m.shape[0]
            sx += m.sum(axis=0)
            sxx += m.T @ m
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sx": [sx.tolist()],
                    "sxx": [sxx.reshape(-1).tolist()],
                }
            )

    parts = embeddings.select(F.col(vec_col).alias("__v")).mapInPandas(
        partials, schema="n long, sx array<double>, sxx array<double>"
    )

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["n"].sum())
        sx = np.sum([np.asarray(v) for v in pdf["sx"]], axis=0)
        sxx = np.sum([np.asarray(v) for v in pdf["sxx"]], axis=0).reshape(d, d)
        mean = sx / n
        cov = sxx / n - np.outer(mean, mean)
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {"i": iu.astype(np.int64), "j": ju.astype(np.int64), "cov": cov[iu, ju]}
        )

    return (
        parts.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(combine, schema="i long, j long, cov double")
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (the storage-compression
    step ANN indexes apply before sharding): scale = max|v| / 127,
    q_i = round(v_i / scale), plus the reconstruction MSE so a pipeline can
    gate on quantization loss.  Pure JVM HOF expressions in DOUBLE — the
    element order of the fold matches DuckDB's list_sum, so the oracle is
    value-exact after round(6)."""
    # internal full-precision scale is named __scale: a final select aliases
    # the ROUNDED value as "scale", and Spark 4's lateral-column-alias
    # resolution would otherwise make sibling expressions in that select
    # read the rounded alias instead of the input column.
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = emb.select(
        F.col(id_col),
        v.alias("__v"),
        (F.array_max(F.transform(v, F.abs)) / 127.0).alias("__scale"),
    )
    q = F.transform(
        F.col("__v"), lambda x: F.round(x / F.col("__scale")).cast("int")
    )
    staged2 = staged.select(id_col, "__v", "__scale", q.alias("__q"))
    sq_err = F.zip_with(
        F.col("__v"),
        F.col("__q"),
        lambda a, b: F.pow(a - b.cast("double") * F.col("__scale"), F.lit(2.0)),
    )
    mse = (
        F.aggregate(sq_err, F.lit(0.0), lambda acc, x: acc + x)
        / F.size(F.col("__v"))
    )
    # MSE magnitudes are ~1e-6 (scale/2 squared) — report in PPM so the
    # 6-decimal output contract keeps ~6 significant digits instead of
    # truncating at the knife edge.
    return staged2.select(
        id_col,
        F.round("__scale", 6).alias("scale"),
        F.array_join(F.col("__q").cast("array<string>"), "|").alias("q_vec"),
        F.round(mse * 1e6, 6).alias("recon_mse_ppm"),
    )


def matryoshka_truncate(
    emb: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-style truncation (public MRL usage): keep the first
    `dims` components, renormalize, and report how much of the vector's
    energy the prefix retains.  Pure HOF expressions; the truncated vector
    serializes as fixed-point text for the scalar output contract."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sq = F.transform(v, lambda x: x * x)
    staged = emb.select(
        F.col(id_col),
        F.slice(v, 1, dims).alias("__t"),
        F.aggregate(sq, F.lit(0.0), lambda a, x: a + x).alias("__e_full"),
        F.aggregate(
            F.slice(sq, 1, dims), F.lit(0.0), lambda a, x: a + x
        ).alias("__e_trunc"),
    )
    norm_t = F.sqrt(F.col("__e_trunc"))
    return staged.select(
        id_col,
        F.round(F.sqrt("__e_full"), 6).alias("norm_full"),
        F.round(norm_t, 6).alias("norm_trunc"),
        F.round(F.col("__e_trunc") / F.col("__e_full"), 6).alias("energy_ratio"),
        F.array_join(
            F.transform(F.col("__t"), lambda x: F.format_string("%.6f", x / norm_t)),
            "|",
        ).alias("unit_prefix"),
    )


def pq_encode(
    emb: DataFrame,
    n_sub: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Product-quantization encode: the vector splits into ``n_sub``
    subvectors; each is coded as its nearest subspace centroid.  The
    codebook here is trained supervised-style from the ``label`` clusters
    (per-label elementwise means — deterministic, so a SQL oracle can
    reproduce it; a production deployment swaps in k-means per subspace,
    the ENCODE/scan shape is identical).

    Plan: centroid table is (labels x dim) — metadata-scale, broadcast;
    encoding is one scan x |labels| fan-out with per-subspace L2 folds,
    then a (vec, sub) argmin window.  Linear in corpus size, no all-pairs.
    Output: (vec_id, codes "c0|c1|...", recon_err = sum of chosen
    subspace distances)."""
    d_sub = dim // n_sub
    cents = elementwise_centroids(emb, label_col, vec_col).select(
        F.col(label_col).alias("cl"), F.col("centroid").alias("cv")
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pairs = emb.select(F.col(id_col), v.alias("__v")).crossJoin(F.broadcast(cents))

    def sub_d2(s: int):
        a = F.slice(F.col("__v"), s * d_sub + 1, d_sub)
        b = F.slice(F.col("cv"), s * d_sub + 1, d_sub)
        diff = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
        return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)

    long = pairs.select(
        id_col,
        "cl",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("sub"), sub_d2(s).alias("d2"))
                    for s in range(n_sub)
                ]
            )
        ).alias("sd"),
    ).select(id_col, "cl", F.col("sd.sub").alias("sub"), F.col("sd.d2").alias("d2"))
    w = Window.partitionBy(id_col, "sub").orderBy(F.asc("d2"), F.asc("cl"))
    best = (
        long.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "sub", "cl", "d2")
    )
    return best.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("sub"), F.col("cl")))
                ),
                lambda s: s.getField("cl").cast("string"),
            ),
            "|",
        ).alias("codes"),
        F.round(F.sum("d2"), 6).alias("recon_err"),
    )


def ann_ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    adc_keep: int = 50,
    n_sub: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    group_col: str = "label",
) -> DataFrame:
    """IVF-PQ fused search — the billion-scale ANN pipeline: coarse IVF
    lists bound the candidate set, PQ codes compress candidates to n_sub
    bytes, and queries score candidates by ADC (asymmetric distance: a
    per-query (n_sub x n_codewords) lookup table replaces full-vector
    math), with an exact-cosine re-rank of the ADC-top survivors.

    Scale shape: codebook + centroids + ADC tables are metadata-scale
    (broadcast); candidate cost ~ nprobe/n_lists of the corpus; per
    candidate the ADC join touches n_sub code rows — no full-vector reads
    until the final re-rank of <= adc_keep rows per query.

    Completeness mode (nprobe >= n_lists AND adc_keep >= corpus) probes
    everything and re-ranks everything — provably the exact top-k while
    still flowing through every pipeline stage; that's what the oracle
    certifies.  Production-recall behavior at partial settings is pinned
    by tests/test_llm.py."""
    d_sub = dim // n_sub
    cents = elementwise_centroids(embeddings, group_col, vec_col).select(
        F.col(group_col).alias("cid"), F.col("centroid")
    )

    def assign(df: DataFrame, idc: str, vec: str, n_keep: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            idc, vec, "cid",
            cosine_similarity(F.col(vec), F.col("centroid")).alias("cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.desc("cs"), F.col("cid").asc())
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_keep)
            .select(idc, vec, "cid")
        )

    inv_lists = assign(embeddings.select(id_col, vec_col), id_col, vec_col, 1)
    probes = assign(
        queries.select(query_id_col, vec_col).withColumnRenamed(vec_col, "__qvec"),
        query_id_col,
        "__qvec",
        nprobe,
    )

    # PQ codes: nearest subspace codeword per (vec, sub) — long format for
    # the ADC join.  Codebook = the same label-mean centroids, sliced.
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cw = cents.select(
        F.col("cid").alias("code"),
        F.transform(F.col("centroid"), lambda x: x.cast("double")).alias("cv"),
    )
    pairs = embeddings.select(F.col(id_col), v.alias("__v")).crossJoin(
        F.broadcast(cw)
    )

    def sub_l2(vcol: str, s: int):
        a = F.slice(F.col(vcol), s * d_sub + 1, d_sub)
        b = F.slice(F.col("cv"), s * d_sub + 1, d_sub)
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def encode_long(df: DataFrame, idc: str, vcol: str) -> DataFrame:
        long = df.select(
            idc,
            "code",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(s).alias("sub"), sub_l2(vcol, s).alias("d2"))
                        for s in range(n_sub)
                    ]
                )
            ).alias("sd"),
        ).select(idc, "code", F.col("sd.sub").alias("sub"), F.col("sd.d2").alias("d2"))
        w = Window.partitionBy(idc, "sub").orderBy(F.asc("d2"), F.asc("code"))
        return (
            long.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(idc, "sub", "code")
        )

    codes = encode_long(pairs, id_col, "__v")

    # ADC tables: per (query, sub, codeword) squared distance — tiny.
    qv = F.transform(F.col("__qvec"), lambda x: x.cast("double"))
    q_pairs = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
        .select(query_id_col, qv.alias("__q"))
        .crossJoin(F.broadcast(cw))
    )
    adc = q_pairs.select(
        query_id_col,
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("sub"), sub_l2("__q", s).alias("qd2"))
                    for s in range(n_sub)
                ]
            )
        ).alias("sd"),
    ).select(query_id_col, "code", F.col("sd.sub").alias("sub"), F.col("sd.qd2").alias("qd2"))

    cands = probes.join(inv_lists.select(id_col, "cid"), on="cid").select(
        query_id_col, "__qvec", id_col
    )
    approx = (
        cands.join(codes, on=id_col)
        .join(F.broadcast(adc), on=[query_id_col, "sub", "code"])
        .groupBy(query_id_col, "__qvec", id_col)
        .agg(F.sum("qd2").alias("adc_dist"))
    )
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.col(id_col).asc()
    )
    survivors = (
        approx.withColumn("arank", F.row_number().over(w_adc))
        .filter(F.col("arank") <= adc_keep)
        .select(query_id_col, "__qvec", id_col)
    )
    rerank = survivors.join(
        embeddings.select(id_col, vec_col), on=id_col
    ).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w_fin = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.col(id_col).asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w_fin))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def semdedup_keep_list(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    eps: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster the
    embedding space, then search for semantic duplicates only WITHIN each
    cluster — the clustering is what makes the pair search tractable
    (Σ|cluster|² pairs instead of n²).

    Drop rule (deterministic): a vector drops iff a smaller-id vector in
    the SAME cluster has cosine ≥ eps; id order replaces the paper's
    random exemplar choice so two engines agree.  Cosines round to 6
    decimals before the threshold so the cut is reproducible cross-engine.

    100 TB shape: one cluster-keyed self-equi-join (k chosen so clusters
    are small bounds the join), JVM HOF dot products, no driver data, no
    crossJoin.  Output: (id, cid, keep) for EVERY vector.

    The Σ|cluster|² bound only holds when k GROWS with n — the default
    k=8 is a fixture size.  Mirroring the exact-ANN 1M-row raise, this
    guards avg-cluster-size n/k > 100k (≈10¹⁰ in-cluster pairs) and
    raises with the k the caller should pass instead of silently
    launching an n²-shaped join."""
    from byconity_spark.llm.clustering import kmeans_fit

    emb = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("e")
    )
    n = emb.count()
    if n / max(k, 1) > 100_000:
        raise ValueError(
            f"semdedup_keep_list: n={n} with k={k} averages "
            f"{n // max(k, 1)} vectors/cluster — the within-cluster "
            f"self-join would be quadratic. Scale k with n "
            f"(suggest k >= {max(8, n // 100_000)})."
        )
    _cids, _cents, assigned = kmeans_fit(
        emb, "e", k=k, iters=iters, id_col=id_col,
        round_decimals=round_decimals,
    )
    def _dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # persist: the assignment feeds BOTH self-join sides and the output
    # join — each reuse would otherwise replay the whole k-means lineage.
    # Norms precompute per VECTOR here (O(n·d)), not per pair (O(pairs·d)).
    assigned = assigned.withColumn(
        "__nrm", F.sqrt(_dot(F.col("e"), F.col("e")))
    ).persist()
    a = assigned.select(
        F.col(id_col).alias("id_a"), "cid",
        F.col("e").alias("ea"), F.col("__nrm").alias("na"),
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), "cid",
        F.col("e").alias("eb"), F.col("__nrm").alias("nb"),
    )
    cos = F.round(
        _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), 6
    )
    drops = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= eps)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        assigned.select(id_col, "cid")
        .join(drops, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cid").cast("bigint").alias("cid"),
            F.col("__dropped").isNull().alias("keep"),
        )
    )

"""LLM training-data pipeline operators: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard), text analysis, similarity search, multimodal
binary plumbing."""

from byconity_spark.llm.dedup import (  # noqa: F401
    cap_per_source,
    connected_components,
    dedup_keep_list,
    dup_ngram_ratio,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    normalize_text,
    simhash,
    simhash_near_pairs,
    word_shingles,
)
from byconity_spark.llm.clustering import (  # noqa: F401
    assign_clusters,
    kmeans_fit,
    kmeans_summary,
)
from byconity_spark.llm.multimodal import attach_binary_payload, extract_features  # noqa: F401
from byconity_spark.llm.similarity import (  # noqa: F401
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_similarity,
    elementwise_centroids,
)
from byconity_spark.llm.text import (  # noqa: F401
    doc_fingerprint,
    language_guess,
    text_quality,
    tokenize,
)

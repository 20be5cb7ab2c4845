"""Large-scale data-pipeline operators (dedup, similarity) — the
beyond-reference extension surface (SURVEY §7.3 milestone 6).

Everything here is pure DataFrame algebra (JVM-side, whole-stage
codegen); no Python row loops. Each operator documents its 100 TB
execution shape: what shuffles, what broadcasts, where skew hides.
"""

from chapterhouseqe_spark.operators.bucketing import (
    bucketed_tables,
    colocated_join,
    write_bucketed,
)
from chapterhouseqe_spark.operators.dedup import (
    contamination_overlap,
    exact_dedup,
    incremental_dedup_status,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dedup_keep,
    simhash_fingerprints,
)
from chapterhouseqe_spark.operators.graph import (
    pagerank_fixed_point,
)
from chapterhouseqe_spark.operators.layout import (
    cluster_write,
    file_key_ranges,
)
from chapterhouseqe_spark.operators.similarity import (
    ann_recall,
    cosine_pairs,
    cosine_topk,
    lsh_bucket_candidates,
    sq_topk,
)
from chapterhouseqe_spark.operators.sketches import (
    bloom_bits,
    bloom_filter_keys,
    cms_counters,
    cms_estimate,
    histogram_quantiles,
    hll_estimate,
    hll_registers,
    linear_counting,
)
from chapterhouseqe_spark.operators.util import (
    salted_join,
    targeted_salted_join,
)

__all__ = [
    "ann_recall",
    "bloom_bits",
    "bloom_filter_keys",
    "bucketed_tables",
    "cluster_write",
    "cms_counters",
    "cms_estimate",
    "colocated_join",
    "contamination_overlap",
    "cosine_pairs",
    "cosine_topk",
    "exact_dedup",
    "file_key_ranges",
    "histogram_quantiles",
    "hll_estimate",
    "hll_registers",
    "incremental_dedup_status",
    "linear_counting",
    "lsh_bucket_candidates",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "pagerank_fixed_point",
    "salted_join",
    "semantic_dedup_keep",
    "simhash_fingerprints",
    "sq_topk",
    "targeted_salted_join",
    "write_bucketed",
]

"""Training-data pipeline operators (dedup / similarity / text analysis /
multimodal plumbing) — first-class components alongside the RML engine."""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession

from .dedup import (
    ORACLE_DECONTAMINATE,
    ORACLE_MINHASH_LSH,
    ORACLE_NEARDUP_CLUSTERS,
    ORACLE_NGRAM_JACCARD,
    ORACLE_SIMHASH,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_neardup_clusters,
    dedup_ngram_jaccard,
    dedup_simhash,
    text_decontaminate,
)
from .similarity import (
    ORACLE_ANN_IVF,
    ORACLE_ANN_LSH_BUCKETS,
    ORACLE_ANN_TOPK,
    ORACLE_COSINE_NEARDUP,
    ORACLE_LSH_NEARDUP,
    ann_cosine_topk,
    ann_ivf_topk,
    ann_lsh_buckets,
    ann_lsh_neardup,
    embedding_cosine_neardup,
    lsh_cosine_neardup,
)
from .corpus import (
    ORACLE_BOILERPLATE,
    ORACLE_CAP_PER_SOURCE,
    ORACLE_DEDUP_URL,
    ORACLE_NGRAM_COUNTS,
    corpus_ngram_counts,
    dedup_url,
    sample_cap_per_source,
    text_boilerplate_chunks,
)
from .multimodal import ORACLE_MEDIA_FEATURES, media_features
from .packing import (
    ORACLE_MIXTURE,
    ORACLE_SEQ_PACK,
    corpus_mixture,
    seq_pack,
)
from .sampling import (
    ORACLE_RESAMPLE,
    ORACLE_SAMPLE,
    mixture_resample,
    sample_stratified,
)
from .sessions import ORACLE_SESSIONIZE, events_sessionize
from .textstats import (
    ORACLE_FINGERPRINT,
    ORACLE_PII,
    ORACLE_LANG_ID,
    ORACLE_QUALITY,
    ORACLE_QUALITY_CLASSIFIER,
    ORACLE_REPETITION,
    ORACLE_TOKEN_COUNT,
    doc_fingerprint,
    text_lang_id,
    text_pii_redact,
    text_quality_classifier,
    text_quality_score,
    text_repetition,
    text_token_count,
)

ORACLE_DEDUP_EXACT = """
SELECT md5(text) AS text_md5,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""

OPS_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_neardup_clusters": dedup_neardup_clusters,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_cosine_neardup": embedding_cosine_neardup,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_lsh_neardup": ann_lsh_neardup,
    "text_lang_id": text_lang_id,
    "text_quality_score": text_quality_score,
    "text_token_count": text_token_count,
    "text_repetition": text_repetition,
    "text_pii_redact": text_pii_redact,
    "text_quality_classifier": text_quality_classifier,
    "text_decontaminate": text_decontaminate,
    "sample_stratified": sample_stratified,
    "sample_cap_per_source": sample_cap_per_source,
    "dedup_url": dedup_url,
    "corpus_ngram_counts": corpus_ngram_counts,
    "text_boilerplate_chunks": text_boilerplate_chunks,
    "mixture_resample": mixture_resample,
    "seq_pack": seq_pack,
    "corpus_mixture": corpus_mixture,
    "doc_fingerprint": doc_fingerprint,
    "media_features": media_features,
    "events_sessionize": events_sessionize,
}

# every op is oracle-checked: ann_lsh_buckets inlines its hyperplane
# constants into the SQL (both engines fold the dot product sequentially in
# float64 so sign bits agree exactly); media_features' fake payloads are
# md5-seeded with a sha256 body, so DuckDB re-derives even the checksum
# computed on the far side of the mapInPandas decode.
OPS_ORACLES: Dict[str, str] = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "dedup_neardup_clusters": ORACLE_NEARDUP_CLUSTERS,
    "dedup_minhash_lsh": ORACLE_MINHASH_LSH,
    "dedup_simhash": ORACLE_SIMHASH,
    "ann_cosine_topk": ORACLE_ANN_TOPK,
    "ann_ivf_topk": ORACLE_ANN_IVF,
    "embedding_cosine_neardup": ORACLE_COSINE_NEARDUP,
    "ann_lsh_neardup": ORACLE_LSH_NEARDUP,
    "ann_lsh_buckets": ORACLE_ANN_LSH_BUCKETS,
    "text_lang_id": ORACLE_LANG_ID,
    "text_quality_score": ORACLE_QUALITY,
    "text_token_count": ORACLE_TOKEN_COUNT,
    "text_repetition": ORACLE_REPETITION,
    "text_pii_redact": ORACLE_PII,
    "text_quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "text_decontaminate": ORACLE_DECONTAMINATE,
    "sample_stratified": ORACLE_SAMPLE,
    "sample_cap_per_source": ORACLE_CAP_PER_SOURCE,
    "dedup_url": ORACLE_DEDUP_URL,
    "corpus_ngram_counts": ORACLE_NGRAM_COUNTS,
    "text_boilerplate_chunks": ORACLE_BOILERPLATE,
    "mixture_resample": ORACLE_RESAMPLE,
    "seq_pack": ORACLE_SEQ_PACK,
    "corpus_mixture": ORACLE_MIXTURE,
    "doc_fingerprint": ORACLE_FINGERPRINT,
    "events_sessionize": ORACLE_SESSIONIZE,
    "media_features": ORACLE_MEDIA_FEATURES,
}

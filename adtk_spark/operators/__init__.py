from .detectors import (  # noqa: F401
    threshold_ad,
    quantile_ad_fit,
    iqr_ad_fit,
    apply_bounds,
    persist_ad,
    level_shift_ad,
    volatility_shift_ad,
    autoregression_ad,
    seasonal_ad,
)
from .transformers import (  # noqa: F401
    ewma,
    standard_scale,
    retrospect,
    sum_all,
    seasonal_fit,
    seasonal_transform,
)
from .detectors import (  # noqa: F401
    cusum_ad,
    cusum_ad_detect,
    cusum_ad_fit,
    esd_ad,
    iqr_ad,
    quantile_ad,
    robust_zscore_ad,
    robust_zscore_ad_detect,
    robust_zscore_ad_fit,
)
from .data import one_hot, split_train_test, validate_series  # noqa: F401
from .hd import (  # noqa: F401
    min_cluster_ad,
    min_cluster_ad_portable,
    outlier_detector,
    pca_ad,
    pca_fit,
    pca_projection,
    pca_reconstruction,
    pca_reconstruction_error,
    regression_ad,
    regression_residual,
    regression_residual_fit,
)
from .custom import (  # noqa: F401
    customized_aggregator,
    customized_detector,
    customized_transformer,
)
from .aggregators import and_labels, or_labels  # noqa: F401
from .events import (  # noqa: F401
    events_and,
    events_or,
    expand_events,
    sessionize,
    to_events,
    to_labels,
    validate_events,
)
from .metrics import (  # noqa: F401
    f1_events,
    f1_labels,
    iou_events,
    iou_labels,
    precision_events,
    precision_labels,
    recall_events,
    recall_labels,
)
from .corpus import (  # noqa: F401
    dedup_exact,
    dedup_exact_normalized,
    doc_quality,
    hash_sample,
    fingerprint,
    lang_id,
    lm_unigram_fit,
    lm_unigram_score,
    lsh_bucket_stats,
    md5_hash64,
    minhash_lsh_pairs,
    mixture_budget,
    mixture_sample,
    stratified_sample,
    ngram_contamination,
    ngram_jaccard_pairs,
    normalize_text,
    pack_sequences,
    repetition_stats,
    simhash,
    simhash_dup_pairs,
    split_by_group,
    token_count,
    zipf_slope,
)
from .ann import (  # noqa: F401
    cosine_topk,
    embedding_dup_pairs,
    ivf_assign,
    ivf_assign_multi,
    ivf_fit,
    ivf_search,
)

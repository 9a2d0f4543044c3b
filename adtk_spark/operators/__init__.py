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
    standard_scale,
    retrospect,
    sum_all,
    seasonal_fit,
    seasonal_transform,
)

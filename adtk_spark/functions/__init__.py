from .windows import rolling_agg, double_rolling_agg  # noqa: F401
from .sketch import (  # noqa: F401
    compress,
    digest_of_sorted_arr,
    digest_quantile,
    digest_quantile_np,
    merge_digests,
)

from .rollup_stream import (  # noqa: F401
    run_available_now,
    run_into_catalog,
    streaming_rollup_1m,
    streaming_rollup_1m_sketch,
)
from .stateful import (  # noqa: F401
    streaming_bounds_ad,
    streaming_level_shift_ad,
    streaming_persist_ad,
    streaming_threshold_ad,
    streaming_volatility_shift_ad,
)

from .rollup_stream import run_available_now, streaming_rollup_1m  # noqa: F401
from .stateful import (  # noqa: F401
    streaming_bounds_ad,
    streaming_persist_ad,
    streaming_threshold_ad,
)

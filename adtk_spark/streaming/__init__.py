from .rollup_stream import run_available_now, streaming_rollup_1m  # noqa: F401
from .stateful import streaming_persist_ad  # noqa: F401

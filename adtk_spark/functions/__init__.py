from .windows import rolling_agg, double_rolling_agg  # noqa: F401

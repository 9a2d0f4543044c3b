"""Arrow-vectorized escape hatch for user-callable rolling aggregates.

The reference accepts arbitrary Python callables as rolling aggregates
(_transformer_1d.py:326-337) and as Customized* models. Here that is the
*only* place Python touches per-row data, and it runs as a grouped-map
``applyInPandas`` (one pandas batch per source series, Arrow transfer),
never a per-row Python UDF.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def rolling_agg_callable(
    df: DataFrame,
    window,
    agg: Callable,
    agg_params: dict | None,
    center: bool,
    min_periods: int | None,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_col: str = "value",
    out_col: str = "value_roll",
) -> DataFrame:
    """Per-source pandas rolling with a user aggregate.

    Scalar-returning callables produce one ``out_col``; vector-returning
    callables need ``agg_params['names']`` and produce
    ``{out_col}_{name}`` columns (reference getRollingVector trick,
    _transformer_1d.py:235-253 — unnecessary here: we just build the
    frame columns directly).
    """
    params = dict(agg_params or {})
    names = params.pop("names", None)
    out_cols = [out_col] if names is None else [f"{out_col}_{n}" for n in names]
    in_fields = df.schema.fields
    schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_fields)
        + ", "
        + ", ".join(f"`{c}` double" for c in out_cols)
    )

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        s = pd.Series(pdf[value_col].values, index=pd.DatetimeIndex(pdf[ts_col]))
        rolling = s.rolling(window=window, center=center, min_periods=min_periods)
        if names is None:
            pdf[out_col] = rolling.agg(lambda x: agg(x)).values
        else:
            raw: list = []

            def wrapped(x: Any) -> float:
                raw.append(np.asarray(agg(x), dtype=float))
                return 0.0

            marker = rolling.agg(wrapped).values
            vecs = np.full((len(s), len(out_cols)), np.nan)
            vecs[~pd.isna(marker)] = np.vstack(raw) if raw else np.empty((0, len(out_cols)))
            for j, c in enumerate(out_cols):
                pdf[c] = vecs[:, j]
        return pdf

    return df.groupBy(source_col).applyInPandas(compute, schema=schema)

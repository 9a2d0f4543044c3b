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


def guard_source_rows(n_rows: int, limit: int | None, source, op: str) -> None:
    """Hot-source guard for per-source grouped-map fits: these buffer ONE
    source's whole series in a single task, which is fine for the tier
    series they are documented to run on (bounded buckets/source) but a
    silent OOM hazard if someone feeds raw-resolution data for a hot
    source. With ``limit`` set, a source exceeding it fails FAST with a
    routing hint instead of stalling an executor (r04 VERDICT item #7 —
    SURVEY §7.3-6 then holds by construction where the caller opts in).
    """
    if limit is not None and n_rows > limit:
        raise ValueError(
            f"source {source!r}: {n_rows} rows exceeds max_rows_per_source="
            f"{limit} for {op}; this fit buffers one source per task — run "
            "it on tier series (rollup_raw/rollup_up + tier_series, or "
            "router.rollup_at) instead of raw-resolution data, or raise "
            "the guard explicitly"
        )


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
    max_rows_per_source: int | None = None,
) -> DataFrame:
    """Per-source pandas rolling with a user aggregate.

    Scalar-returning callables produce one ``out_col``; vector-returning
    callables need ``agg_params['names']`` and produce
    ``{out_col}_{name}`` columns (reference getRollingVector trick,
    _transformer_1d.py:235-253 — unnecessary here: we just build the
    frame columns directly). ``max_rows_per_source`` arms
    ``guard_source_rows`` inside the UDF.
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
        guard_source_rows(len(pdf), max_rows_per_source,
                          pdf[source_col].iloc[0] if len(pdf) else None,
                          "rolling_agg_callable")
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

"""Customized detector/transformer escape hatch (user pandas functions).

Parity targets: CustomizedDetector1D/HD, CustomizedTransformer1D/HD,
CustomizedAggregator (/root/reference/src/adtk/detector/_detector_1d.py:30-105,
_detector_hd.py:23-98, transformer/_transformer_1d.py:25-104,
_transformer_hd.py:20-103, aggregator/_aggregator.py:15-79).

The user supplies pandas-level functions; they run per source in one
Arrow grouped-map UDF (vectorized batch transfer, never per-row
Python). ``fit_func`` runs on the training table and its result (a
small dict per source) is threaded into ``apply_func`` at predict time.
"""

from __future__ import annotations

import json
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def custom_fit(
    train: DataFrame,
    fit_func: Callable[..., dict],
    fit_func_params: dict | None = None,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Per-source fit: returns (source, params_json). The fitted params
    dict must be JSON-serializable (the reference stores it on the model
    object; here it travels through a broadcast joinable table)."""
    cols = value_cols or ["value"]
    params = fit_func_params or {}

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        x = pdf.set_index(pd.DatetimeIndex(pdf[ts_col]))[cols]
        if len(cols) == 1:
            x = x[cols[0]]
        fitted = fit_func(x, **params)
        return pd.DataFrame(
            {source_col: [pdf[source_col].iloc[0]], "params_json": [json.dumps(fitted)]}
        )

    return train.groupBy(source_col).applyInPandas(
        fit, schema=f"{source_col} string, params_json string"
    )


def custom_apply(
    df: DataFrame,
    apply_func: Callable[..., Any],
    apply_func_params: dict | None = None,
    model: DataFrame | None = None,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    out_col: str = "out",
    out_type: str = "double",
) -> DataFrame:
    """Per-source apply of a user series/frame function, with optional
    fitted params joined in. The function receives a pandas Series (one
    value col) or DataFrame (several) indexed by ts and must return an
    index-aligned Series."""
    cols = value_cols or ["value"]
    params = apply_func_params or {}
    src = df
    if model is not None:
        src = df.join(F.broadcast(model), on=source_col, how="left")
    in_fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{in_fields}, `{out_col}` {out_type}"

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        fitted = {}
        if "params_json" in pdf.columns:
            pj = pdf["params_json"].iloc[0]
            fitted = json.loads(pj) if isinstance(pj, str) else {}
        x = pdf.set_index(pd.DatetimeIndex(pdf[ts_col]))[cols]
        if len(cols) == 1:
            x = x[cols[0]]
        out = apply_func(x, **{**fitted, **params})
        res = pdf.drop(columns=[c for c in ("params_json",) if c in pdf.columns])
        res[out_col] = pd.Series(out).values
        return res

    return src.groupBy(source_col).applyInPandas(apply, schema=schema)


def customized_detector(
    df: DataFrame,
    detect_func: Callable,
    detect_func_params: dict | None = None,
    fit_func: Callable | None = None,
    fit_func_params: dict | None = None,
    **kw,
) -> DataFrame:
    """CustomizedDetector1D/HD fit_detect. Boolean outputs are cast to
    the engine's {0,1,NULL} double label convention."""
    model = None
    if fit_func is not None:
        fit_kw = {k: v for k, v in kw.items()
                  if k in ("source_col", "ts_col", "value_cols")}
        model = custom_fit(df, fit_func, fit_func_params, **fit_kw)
    kw.setdefault("out_col", "label")
    out = custom_apply(df, detect_func, detect_func_params, model, **kw)
    return out.withColumn(kw["out_col"], F.col(kw["out_col"]).cast("double"))


def customized_transformer(
    df: DataFrame,
    transform_func: Callable,
    transform_func_params: dict | None = None,
    fit_func: Callable | None = None,
    fit_func_params: dict | None = None,
    **kw,
) -> DataFrame:
    """CustomizedTransformer1D/HD fit_transform."""
    model = None
    if fit_func is not None:
        fit_kw = {k: v for k, v in kw.items()
                  if k in ("source_col", "ts_col", "value_cols")}
        model = custom_fit(df, fit_func, fit_func_params, **fit_kw)
    kw.setdefault("out_col", "transformed")
    return custom_apply(df, transform_func, transform_func_params, model, **kw)


def customized_aggregator(
    labels: DataFrame,
    aggregate_func: Callable,
    aggregate_func_params: dict | None = None,
    *,
    source_col: str = "source",
    ts_col: str = "ts",
    label_cols: list[str] | None = None,
    out_col: str = "label",
) -> DataFrame:
    """CustomizedAggregator (aggregator/_aggregator.py:15-79): a user
    function combining several binary-label columns into one. Input is
    the wide label table (one column per upstream detector); the
    function receives the ts-indexed pandas DataFrame of label columns
    and returns an index-aligned Series, per source, in one Arrow
    grouped-map UDF."""
    cols = label_cols or [
        c for c in labels.columns if c not in (source_col, ts_col, out_col)
    ]
    if out_col in cols:
        raise ValueError(
            f"out_col {out_col!r} is also an aggregation input; rename one "
            "(the echoed output schema would otherwise hold two "
            f"{out_col!r} fields)")
    params = aggregate_func_params or {}
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in labels.schema.fields if f.name != out_col
    )
    schema = f"{in_fields}, `{out_col}` double"
    echo = [c for c in labels.columns if c != out_col]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        x = pdf.set_index(pd.DatetimeIndex(pdf[ts_col]))[cols]
        out = aggregate_func(x, **params)
        out = pd.Series(out)
        if isinstance(out.index, pd.DatetimeIndex):
            # index-aligned Series contract (the reference assigns into
            # an index-aligned frame): realign instead of trusting the
            # user function's row order
            out = out.reindex(x.index)
        res = pdf[echo].copy()
        res[out_col] = out.astype(float).values
        return res

    return labels.groupBy(source_col).applyInPandas(run, schema=schema)

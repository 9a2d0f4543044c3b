"""As-of join: pandas merge_asof parity + plan shape."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adtk_spark.operators.joins import asof_join


def frames(spark, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2021, 1, 1)
    lrows, rrows = [], []
    for src in ("a", "b", "c"):
        for _ in range(40):
            lrows.append((src, t0 + dt.timedelta(seconds=int(rng.randint(0, 3600))),
                          float(rng.randint(0, 100))))
        for _ in range(15):
            rrows.append((src, t0 + dt.timedelta(seconds=int(rng.randint(0, 3600))),
                          float(rng.randint(0, 100))))
    # dedupe ts per source (merge_asof needs unique, sorted keys)
    lrows = list({(s, t): (s, t, v) for s, t, v in lrows}.values())
    rrows = list({(s, t): (s, t, v) for s, t, v in rrows}.values())
    left = spark.createDataFrame(lrows, "source string, ts timestamp, value double")
    right = spark.createDataFrame(rrows, "source string, ts timestamp, ref double")
    return left, right, lrows, rrows


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_merge_asof(spark, direction):
    left, right, lrows, rrows = frames(spark)
    lp = pd.DataFrame(lrows, columns=["source", "ts", "value"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["source", "ts", "ref"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="source", direction=direction)
    want = {(r.source, r.ts): None if pd.isna(r.ref) else r.ref
            for r in exp.itertuples()}
    got = {(r["source"], r["ts"]): r["ref"]
           for r in asof_join(left, right, direction=direction).collect()}
    assert got == want


def test_asof_join_tolerance_and_plan(spark):
    left, right, lrows, rrows = frames(spark, seed=4)
    lp = pd.DataFrame(lrows, columns=["source", "ts", "value"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["source", "ts", "ref"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="source",
                        tolerance=pd.Timedelta(seconds=120))
    want = {(r.source, r.ts): None if pd.isna(r.ref) else r.ref
            for r in exp.itertuples()}
    out = asof_join(left, right, tolerance_secs=120)
    got = {(r["source"], r["ts"]): r["ref"] for r in out.collect()}
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    import re
    # one shuffle pass per input row: either a single Exchange above the
    # Union, or (AQE) one pushed into each union branch — never more,
    # and never a join node (the naive theta-join implementation would
    # show SortMergeJoin + O(|L| x |R|) expansion)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan

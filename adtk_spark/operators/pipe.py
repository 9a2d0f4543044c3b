"""Pipeline / Pipenet: DAG composition of DataFrame operators.

Parity target: /root/reference/src/adtk/pipe/_pipe.py (Pipeline :47-430,
Pipenet :432-1532). The reference executes its step graph eagerly in
topological rounds; here each step contributes lazily to ONE Spark
logical plan, so Catalyst sees the whole DAG at once — shared subtrees
become shared plan fragments (plus exchange reuse), and adtk's
dead-step elimination (:859-878) falls out of lazy evaluation for free.

A step is ``{"fn": callable(df) -> df, "input": name | [names],
"subset": [cols] | None}``; the reserved input name is "original".
Multi-input steps receive the inputs joined on (source, ts) — the Spark
analogue of the reference's index-aligned pd.concat (:788-808).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


class Pipenet:
    def __init__(self, steps: dict, *, join_keys: tuple[str, ...] = ("source", "ts")):
        self.steps = steps
        self.join_keys = list(join_keys)
        self._order = self._toposort()
        self._validate_kinds()

    _KINDS = ("transformer", "detector", "aggregator")

    def _validate_kinds(self) -> None:
        """Edge compatibility rules of the reference Pipenet
        (_pipe.py:692-739): a detector/transformer consumes "original"
        or a transformer's output; an aggregator consumes detector or
        aggregator outputs (never "original"). Steps declare
        ``"kind": "transformer" | "detector" | "aggregator"``; kinds
        are optional (function-style steps may be arbitrary DataFrame
        ops) but any declared kind is enforced against every declared
        upstream kind.
        """
        for name, spec in self.steps.items():
            kind = spec.get("kind")
            if kind is None:
                continue
            if kind not in self._KINDS:
                raise ValueError(
                    f"step {name!r}: kind must be one of {self._KINDS}, "
                    f"got {kind!r}")
            inp = spec.get("input", "original")
            inputs = inp if isinstance(inp, list) else [inp]
            for i in inputs:
                up = None if i == "original" else self.steps[i].get("kind")
                if kind in ("detector", "transformer"):
                    if i != "original" and up is not None and up != "transformer":
                        raise TypeError(
                            f"step {name!r} ({kind}) cannot accept output "
                            f"from step {i!r} ({up})")
                else:  # aggregator
                    if i == "original":
                        raise TypeError(
                            f"step {name!r} (aggregator) cannot accept the "
                            "original series as input")
                    if up is not None and up not in ("detector", "aggregator"):
                        raise TypeError(
                            f"step {name!r} (aggregator) cannot accept output "
                            f"from step {i!r} ({up})")

    def _toposort(self) -> list[str]:
        deps = {}
        for name, spec in self.steps.items():
            inp = spec.get("input", "original")
            inputs = inp if isinstance(inp, list) else [inp]
            deps[name] = [i for i in inputs if i != "original"]
            for i in deps[name]:
                if i not in self.steps:
                    raise ValueError(f"step {name!r} references unknown input {i!r}")
        order, seen, visiting = [], set(), set()

        def visit(n):
            if n in seen:
                return
            if n in visiting:
                raise ValueError(f"cycle detected at step {n!r}")
            visiting.add(n)
            for d in deps[n]:
                visit(d)
            visiting.discard(n)
            seen.add(n)
            order.append(n)

        for n in self.steps:
            visit(n)
        return order

    def _final_step(self) -> str:
        consumed = set()
        for spec in self.steps.values():
            inp = spec.get("input", "original")
            consumed.update(inp if isinstance(inp, list) else [inp])
        sinks = [n for n in self.steps if n not in consumed]
        if len(sinks) != 1:
            raise ValueError(f"Pipenet must have exactly one sink, found {sinks}")
        return sinks[0]

    def run(self, df: DataFrame, return_intermediate: bool = False):
        """Build the composed lazy plan; nothing executes until an action."""
        results: dict[str, DataFrame] = {"original": df}
        for name in self._order:
            spec = self.steps[name]
            inp = spec.get("input", "original")
            if isinstance(inp, list):
                cur = results[inp[0]]
                for other in inp[1:]:
                    cur = cur.join(results[other], on=self.join_keys, how="outer")
            else:
                cur = results[inp]
            subset = spec.get("subset")
            if subset:
                cur = cur.select(*self.join_keys, *subset)
            results[name] = spec["fn"](cur)
        if return_intermediate:
            return results
        return results[self._final_step()]

    def summary(self) -> str:
        """Step table in topological order (Pipenet.summary,
        _pipe.py:1357-1376): name, declared kind, inputs, subset
        projection — the DAG-wiring debug view."""
        lines = [f"{'step':<24}{'kind':<14}{'input':<32}subset"]
        for name in self._order:
            spec = self.steps[name]
            kind = spec.get("kind") or "-"
            inp = spec.get("input", "original")
            inp = ", ".join(inp) if isinstance(inp, list) else inp
            sub = ", ".join(spec.get("subset") or []) or "-"
            lines.append(f"{name:<24}{kind:<14}{inp:<32}{sub}")
        return "\n".join(lines)

    def score(
        self,
        df: DataFrame,
        truth: DataFrame,
        scoring: str = "recall",
        *,
        label_col: str = "label",
        truth_label_col: str = "label",
    ) -> DataFrame:
        """Pipenet.score (_pipe.py:1259-1355): run the DAG's detect pass
        and compare its label output against a truth label table with
        the chosen metric ('recall' | 'precision' | 'f1' | 'iou').
        Returns the per-source metric DataFrame."""
        from pyspark.sql import functions as F

        from .metrics import f1_labels, iou_labels, precision_labels, recall_labels

        fns = {"recall": recall_labels, "precision": precision_labels,
               "f1": f1_labels, "iou": iou_labels}
        if scoring not in fns:
            raise ValueError(f"scoring must be one of {sorted(fns)}")
        pred = self.run(df).select(
            *self.join_keys, F.col(label_col).alias("y_pred")
        )
        t = truth.select(*self.join_keys, F.col(truth_label_col).alias("y_true"))
        pair = t.join(pred, on=self.join_keys, how="outer")
        return fns[scoring](pair, source_col=self.join_keys[0])


class Pipeline(Pipenet):
    """Linear chain sugar (reference Pipeline wraps a Pipenet the same
    way, _pipe.py:47-120)."""

    def __init__(self, steps: list[tuple[str, Callable]], **kw):
        net = {}
        prev = "original"
        for name, fn in steps:
            net[name] = {"fn": fn, "input": prev}
            prev = name
        super().__init__(net, **kw)

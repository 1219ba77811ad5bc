"""Tag-closure model runner: the dbt equivalent.

The reference shells out to dbt with tag selectors
(``dbt build --select [+]tag:X --exclude ...`` — build_dbt_task.py:68-233,
selector assembly :126-153, per-model full-refresh :172-173, BATCH_START/
END_DATE env :185-205; callers dbt_enriched_base_tables_dag.py:37-45,
dbt_stellar_marts_dag.py:98-203). This module provides the same contract
natively:

- a registry of models: name, tags, deps, fn(ctx) -> DataFrame,
  materialization (view | table | incremental);
- ``select="+tag:X"`` — models tagged X plus their upstream closure;
  ``select="model_name"`` / ``"+model_name"`` work too; ``exclude`` prunes;
- topological execution, each model's output registered as a temp view so
  downstream models reference it by name (dbt's ref());
- incremental models receive (batch_start, batch_end) and are expected to
  only produce the increment; full_refresh forces the table path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ModelContext:
    spark: SparkSession
    batch_start: object = None
    batch_end: object = None
    full_refresh: bool = False
    outputs: dict[str, DataFrame] = field(default_factory=dict)

    def ref(self, name: str) -> DataFrame:
        """dbt's ref(): an in-run model output, else an existing catalog
        view/table (how dbt resolves refs to excluded/unselected models)."""
        if name in self.outputs:
            return self.outputs[name]
        try:
            return self.spark.table(name)
        except Exception:
            raise KeyError(
                f"model '{name}' not in this run's outputs and not a catalog "
                f"table/view — was it excluded without a materialized copy?"
            ) from None


@dataclass(frozen=True)
class Model:
    name: str
    fn: Callable[[ModelContext], DataFrame]
    tags: tuple[str, ...] = ()
    deps: tuple[str, ...] = ()
    materialization: str = "view"  # view | table | incremental


class ModelRegistry:
    def __init__(self) -> None:
        self._models: dict[str, Model] = {}

    def register(self, model: Model) -> None:
        if model.name in self._models:
            raise ValueError(f"duplicate model {model.name}")
        self._models[model.name] = model

    def model(self, name: str, tags: tuple[str, ...] = (), deps: tuple[str, ...] = (), materialization: str = "view"):
        """Decorator registration."""

        def wrap(fn):
            self.register(Model(name=name, fn=fn, tags=tags, deps=deps, materialization=materialization))
            return fn

        return wrap

    def _matching(self, selector: str) -> set[str]:
        closure = selector.startswith("+")
        sel = selector.lstrip("+")
        if sel.startswith("tag:"):
            tag = sel[4:]
            seed = {m.name for m in self._models.values() if tag in m.tags}
        else:
            if sel not in self._models:
                raise KeyError(f"unknown model {sel}")
            seed = {sel}
        if not closure:
            return seed
        out: set[str] = set()
        stack = list(seed)
        while stack:
            n = stack.pop()
            if n in out:
                continue
            out.add(n)
            stack.extend(self._models[n].deps)
        return out

    def plan(self, select: str, exclude: tuple[str, ...] = ()) -> list[Model]:
        """Selected models in topological order (deps first); excluded
        models are skipped but still satisfy ordering."""
        chosen = self._matching(select) - set(exclude)
        order: list[str] = []
        seen: set[str] = set()

        def visit(n: str, path: tuple[str, ...]) -> None:
            if n in seen:
                return
            if n in path:
                raise ValueError(f"dependency cycle at {n}")
            for d in self._models[n].deps:
                if d in chosen:
                    visit(d, path + (n,))
            seen.add(n)
            order.append(n)

        for n in sorted(chosen):
            visit(n, ())
        return [self._models[n] for n in order]

    def run(
        self,
        spark: SparkSession,
        select: str,
        exclude: tuple[str, ...] = (),
        batch_start=None,
        batch_end=None,
        full_refresh: bool = False,
    ) -> dict[str, DataFrame]:
        ctx = ModelContext(spark, batch_start, batch_end, full_refresh)
        for model in self.plan(select, exclude):
            df = model.fn(ctx)
            ctx.outputs[model.name] = df
            df.createOrReplaceTempView(model.name)
        return ctx.outputs

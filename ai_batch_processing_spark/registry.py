"""Central query registry.

Every operator the engine implements registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when expressible)
the equivalent ANSI SQL that DuckDB runs on the same parquet tables.
``__spark_entry__.py`` exposes the registry to the driver's correctness
harness; ``bench.py`` runs the headline subset.

Conventions (driver contract, __spark_entry__.py docstring):
- Alias every computed column identically in Spark and SQL — the driver
  sorts columns by name before value-hashing.
- Round double aggregates identically on both sides (float summation order
  differs between engines; rounding makes the hash stable).
- Queries must be deterministic: every ORDER BY ends with a unique key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = [
    "ai_batch_processing_spark.plans.relational",
    "ai_batch_processing_spark.plans.pipeline",
    "ai_batch_processing_spark.plans.windows",
    "ai_batch_processing_spark.plans.setops",
    "ai_batch_processing_spark.plans.scalars",
    "ai_batch_processing_spark.plans.analytics",
    "ai_batch_processing_spark.operators.template",
    "ai_batch_processing_spark.operators.grouping",
    "ai_batch_processing_spark.operators.llm_map",
    "ai_batch_processing_spark.operators.dedup",
    "ai_batch_processing_spark.operators.similarity",
    "ai_batch_processing_spark.operators.text",
    "ai_batch_processing_spark.operators.curation",
    "ai_batch_processing_spark.operators.multimodal",
    "ai_batch_processing_spark.streaming.events",
]


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with DuckDB ``oracle`` SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return _REGISTRY


def _shipped(fn: QueryFn) -> QueryFn:
    """Wrap a query so the package is shipped to executors before it runs.

    The external driver calls these with its own SparkSession, possibly
    launched far from this repo — pandas-UDF tasks then need the package
    on the worker path (session.ship_package)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ai_batch_processing_spark.session import ship_package

        ship_package(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _shipped(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items() if spec.bench}

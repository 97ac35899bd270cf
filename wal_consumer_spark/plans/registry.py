"""Registry binding each named query to (Spark callable, DuckDB oracle SQL).

Determinism contract (so the driver's order-insensitive value-hash matches):

- Aggregate numeric columns are summed in DECIMAL (exact, associative — immune
  to partition/summation order), then cast to DOUBLE for the final output, so
  both engines emit bit-identical doubles.
- Every computed column is aliased identically in the Spark plan and the SQL.
- Nondeterministic "pick any row" ops (dropDuplicates subset, approx algos)
  either get a deterministic formulation (window rank / min-pick) or declare
  no oracle (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def get_spec(name: str) -> QuerySpec:
    return _REGISTRY[name]

"""Shared helpers for the query corpus.

Determinism: double-typed measures are cast to DECIMAL before SUM so the
aggregate is exact and associative (partition-order independent), then cast
back to DOUBLE so Spark and DuckDB emit bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: decimal type used for money-like doubles before exact aggregation
DEC = "decimal(12,2)"
DEC4 = "decimal(12,4)"


def dec(col: Column | str, typ: str = DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, alias: str, typ: str = DEC) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col, typ)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, typ: str = DEC4) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, typ)).cast("double") / F.count(F.lit(1))).alias(alias)


# Oracle-side SQL fragments mirroring the helpers above.
def sql_dsum(expr: str, alias: str, typ: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, typ: str = "DECIMAL(12,4)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT(*) AS {alias}"

"""As-of join (nearest prior match) as a scalable union+window composition.

Semantics: for each left row, attach the payload of the right row with the
greatest (right_ts, *tiebreak) such that right_ts <= left_ts and the keys
match; unmatched left rows keep NULL payloads (left-outer as-of).

Scale rationale (SURVEY.md §2.B "as-of join ⚙"): the naive formulation —
equi+range join then pick latest per left row — materialises per-key cross
products, which explodes on hot keys at 100 TB. This implementation unions
the two inputs into one key-partitioned, time-sorted stream and carries the
latest right payload forward with a running ``last(ignorenulls)`` window —
one shuffle, no pair explosion. Ties at equal timestamps resolve
right-before-left; among right rows at the same timestamp the largest
tiebreak wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__asof_src"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left-outer as-of join; payload_cols names must not clash with left's.

    direction="backward" (default): nearest right row at-or-before left_ts
    (largest tiebreak wins among equal timestamps). direction="forward":
    nearest right row at-or-after left_ts (smallest tiebreak wins) — the
    same single-shuffle union+carry, traversed in reverse time order.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tiebreak_cols = tiebreak_cols or []
    left_cols = left.columns
    right_types = dict(right.dtypes)
    left_types = dict(left.dtypes)

    l = (  # noqa: E741
        left.withColumn(_TS, F.col(left_ts).cast("timestamp")).withColumn(_SRC, F.lit(1))
    )
    for c in payload_cols:
        l = l.withColumn(c, F.lit(None).cast(right_types[c]))  # noqa: E741

    r = right.select(
        F.col(right_key).alias(left_key),
        F.col(right_ts).cast("timestamp").alias(_TS),
        F.lit(0).alias(_SRC),
        *[F.col(c) for c in payload_cols],
    )
    for c in left_cols:
        if c != left_key:
            r = r.withColumn(c, F.lit(None).cast(left_types[c]))

    unioned = l.select(sorted(l.columns)).unionByName(r.select(sorted(r.columns)))

    if direction == "backward":
        order: list[Column] = [F.col(_TS), F.col(_SRC)]
        order += [F.col(c).asc_nulls_first() for c in tiebreak_cols]
    else:
        order = [F.col(_TS).desc(), F.col(_SRC)]
        order += [F.col(c).desc_nulls_first() for c in tiebreak_cols]
    w = (
        Window.partitionBy(left_key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__carry_{c}") for c in payload_cols],
    )
    return carried.filter(F.col(_SRC) == 1).select(
        *left_cols,
        *[F.col(f"__carry_{c}").alias(c) for c in payload_cols],
    )

"""Two-phase distributed selection: exact order statistics without a
global sort.

The degenerate plans this replaces (round-3 VERDICT sweep #5, measured in
round 4): a per-row global row_number sorts the whole input on ONE
partition; a groupBy(value) + global cumulative window is no better when
the value domain is ~distinct-per-row (the Theil-Sen slope case: 2.9M
groups -> 6.8 s at sf0.1).

Phase 1 aggregates rows into coarse value buckets — a real map-side-
combinable aggregation with bounded output. One cumulative pass over the
BUCKET table (bounded, cheap) locates, for every requested rank at once,
the bucket containing it plus the residual rank inside it — a handful of
broadcast rows. Phase 2 re-scans only the target buckets and resolves each
residual rank with a per-rank-label partitioned value-level window.

Correctness invariant (the cumulative-containment argument): the value at
global rank r under (value ASC, any tie-break) ordering is the value whose
cumulative-count range [cum-cnt+1, cum] contains r — tie-breaks never
change the picked VALUE, so the result is identical to the naive global
rank-pick and any engine can serve as the oracle with the one-shot
formulation. The bucket function only needs to be MONOTONIC in the value
(integer `div` truncation qualifies: it is non-decreasing even across the
sign boundary, where bucket 0 simply widens).

At 100 TB: phase 1 is one narrow shuffle; phase 2 touches ~1/n_buckets of
the rows per rank. Used by agg_exact_percentile_selection and
ts_theil_sen_slope; property-tested against a sorted-list oracle in
tests/test_selection.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RankExpr = Callable[[Column], Column]  # total row count -> 1-based rank


def exact_rank_selection(
    rows: DataFrame,
    value_col: str,
    rank_exprs: dict[str, RankExpr],
    bucket_div: int,
) -> DataFrame:
    """Return one row per label in `rank_exprs`: (label, value) where value
    is the `value_col` entry at the label's global 1-based rank under
    ascending value order. `bucket_div` is the phase-1 bucket width
    (bucket = value div bucket_div). Ranks outside [1, n] yield no row for
    that label."""
    buckets = rows.groupBy(
        F.expr(f"{value_col} div {bucket_div}").alias("bk")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cumb = buckets.select(
        "bk",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("n"),
    )
    tgt = None
    for label, rank_of in rank_exprs.items():
        r = rank_of(F.col("n"))
        part = cumb.where(
            (r > F.col("cum") - F.col("cnt")) & (r <= F.col("cum"))
        ).select(
            F.lit(label).alias("lbl"),
            "bk",
            (r - (F.col("cum") - F.col("cnt"))).alias("r_in"),
        )
        tgt = part if tgt is None else tgt.unionByName(part)
    sub = rows.join(
        F.broadcast(tgt), F.expr(f"{value_col} div {bucket_div}") == F.col("bk")
    )
    by_val = sub.groupBy("lbl", "r_in", value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wl = (
        Window.partitionBy("lbl")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum2 = by_val.select(
        "lbl", "r_in", value_col, "cnt", F.sum("cnt").over(wl).alias("cum")
    )
    return cum2.where(
        (F.col("r_in") > F.col("cum") - F.col("cnt"))
        & (F.col("r_in") <= F.col("cum"))
    ).select(F.col("lbl").alias("label"), F.col(value_col).alias("value"))

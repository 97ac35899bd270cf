"""Size-conditional broadcast hint shared by every plan family.

Round-5 VERDICT "Next round" #8: the graph family gates its per-node
dimension broadcasts on Catalyst's size estimate (operators/graph.py,
round 5); the text/analytics/CDC families still hinted data-derived
tables unconditionally. The risky class is aggregates keyed by columns
whose distinct count GROWS with the corpus — term/word vocabularies
(Heaps' law: ~O(n^0.5) new terms per token), per-source stats over an
open source set, GDPR erasure lists — which fit in a driver broadcast at
test SF and OOM it at 100 TB. Bounded tables (1-row global aggregates,
fixed enums like event_type/nation, top-k/max_df-capped lists) keep the
unconditional hint: they are provably small by construction at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maybe_broadcast(df: DataFrame, threshold_bytes: int = 64 << 20) -> DataFrame:
    """Broadcast hint gated on Catalyst's OWN size estimate (no job runs).

    Below the threshold the hint pins today's broadcast plans; above it
    (or when the estimate is unknown — e.g. a localCheckpointed frame,
    treated as huge) the hint vanishes and the planner falls back to a
    shuffled join, where AQE still converts to broadcast at runtime if
    actual stats prove small. Plan-asserted both ways in
    tests/test_scale_plans.py (test_degree_broadcast_is_size_conditional,
    test_vocab_broadcast_is_size_conditional).
    """
    est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    if not isinstance(est, int):  # py4j BigInteger on some bridges
        est = int(est.toString())
    return df if est > threshold_bytes else F.broadcast(df)

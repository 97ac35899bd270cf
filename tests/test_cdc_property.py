"""Property-based CDC apply: random legal WAL op sequences, random
micro-batch boundaries — the final target state must equal the reference's
dict-oracle model (WalConsumerTest.java:113-127 generalized from one
hand-written scenario to the whole input space), and must be independent of
how the stream is chopped into batches (the per-key last-op reduction's
correctness argument, SURVEY.md §4.3)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wal_consumer_spark.operators.cdc import apply_cdc_batch

WAL_COLS = "id LONG, entity_id LONG, operation STRING, entity_bytes BINARY, entity_type STRING"


@st.composite
def wal_sequence(draw):
    """A legal op sequence: ADD only for absent keys, UPDATE/DELETE only for
    present keys (the reference's oracle asserts exactly this legality)."""
    n = draw(st.integers(min_value=4, max_value=30))
    live: set[int] = set()
    records = []
    for i in range(n):
        k = draw(st.integers(min_value=1, max_value=6))
        if k in live:
            op = draw(st.sampled_from(["UPDATE", "DELETE"]))
        else:
            op = "ADD"
        if op == "DELETE":
            live.discard(k)
            records.append((k, "DELETE", None))
        else:
            live.add(k)
            records.append((k, op, f"v{i}"))
    return records


def _dict_oracle(records):
    model = {}
    for k, op, v in records:
        if op == "DELETE":
            model.pop(k, None)
        else:
            model[k] = v
    return model


def _apply_in_batches(spark, records, cuts):
    """Apply `records` through apply_cdc_batch split at the given boundaries."""
    target = spark.createDataFrame([], "entity_id LONG, entity_bytes BINARY, entity_type STRING")
    bounds = sorted({c % (len(records) + 1) for c in cuts})
    pieces, prev = [], 0
    for b in [*bounds, len(records)]:
        if b > prev:
            pieces.append(records[prev:b])
            prev = b
    for piece_idx, piece in enumerate(pieces):
        rows = [
            (i, k, op, v.encode() if v is not None else None, "E")
            for i, (k, op, v) in enumerate(piece, start=1 + 1000 * piece_idx)
        ]
        batch = spark.createDataFrame(rows, WAL_COLS)
        target = apply_cdc_batch(target, batch)
    return {
        r.entity_id: bytes(r.entity_bytes).decode() for r in target.collect()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(records=wal_sequence(), cuts=st.lists(st.integers(0, 29), max_size=4))
def test_cdc_apply_equals_dict_oracle_any_batching(spark, records, cuts):
    assert _apply_in_batches(spark, records, cuts) == _dict_oracle(records)

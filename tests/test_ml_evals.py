"""Python-oracle and invariant tests for the round-6 ML evaluation
operators — these guard against the failure mode cross-engine parity
cannot see: BOTH engines faithfully computing the same wrong formula.

The PR/AP test replays the tie-aware block formulation in pure Python
(floats are IEEE doubles; Spark's HALF_UP rounding is replicated with
floor(x + 0.5) on the positive terms) against crafted heavy-tie inputs
that sf data never produces.
"""

from __future__ import annotations

import math
import os

import pytest

from tests.conftest import SF_ORACLE
from wal_consumer_spark.plans import get_spec


def _round_half_up(x: float, digits: int) -> float:
    scale = 10.0 ** digits
    return math.floor(x * scale + 0.5) / scale


def _pr_ap_python(scores: list[float], labels: list[int]):
    """Naive block-formulation PR/AP oracle (per distinct score desc)."""
    by_score: dict[int, list[int]] = {}
    for s, y in zip(scores, labels):
        by_score.setdefault(round(s * 100), []).append(y)
    p_total = sum(labels)
    cum_n = cum_tp = 0
    blocks = []
    ap_pico = 0
    for s in sorted(by_score, reverse=True):
        ys = by_score[s]
        tp_b = sum(ys)
        cum_n += len(ys)
        cum_tp += tp_b
        prec = cum_tp / cum_n
        rec = cum_tp / p_total
        blocks.append((prec, rec))
        ap_pico += math.floor((tp_b * (cum_tp / cum_n)) / p_total * 1e12 + 0.5)
    ap = _round_half_up(ap_pico / 1e12, 9)
    curve = {}
    for r_idx in range(11):
        tgt = r_idx / 10.0
        curve[r_idx] = _round_half_up(
            max(p for p, r in blocks if r >= tgt), 9
        )
    return ap, curve


@pytest.mark.parametrize(
    "scores,segs",
    [
        # one giant tie block: AP must equal the base precision everywhere
        ([42.0] * 8, ["BUILDING", "OTHER"] * 4),
        # two tie blocks, positives concentrated in the low block
        ([9.0] * 4 + [1.0] * 4,
         ["OTHER"] * 4 + ["BUILDING"] * 4),
        # mixed: distinct scores + a tie block straddling the bucket edge
        ([100.0, 100.0, 99.99, 50.0, 50.0, 50.0, -10.0, -10.0],
         ["BUILDING", "OTHER", "BUILDING", "OTHER", "BUILDING",
          "BUILDING", "OTHER", "BUILDING"]),
        # ties exactly on the value_group_ranks bucket boundary (10000s)
        ([100.0, 100.0, 200.0, 200.0, 300.0],
         ["BUILDING", "OTHER", "BUILDING", "OTHER", "BUILDING"]),
    ],
)
def test_pr_ap_matches_python_oracle_on_ties(spark, tmp_path, scores, segs):
    import pandas as pd

    pdf = pd.DataFrame({"c_acctbal": scores, "c_mktsegment": segs})
    pdf.to_parquet(os.path.join(tmp_path, "customer.parquet"))
    out = {
        r["r_idx"]: r
        for r in get_spec("ml_pr_curve_average_precision")
        .spark(spark, str(tmp_path))
        .collect()
    }
    ap, curve = _pr_ap_python(scores, [int(s == "BUILDING") for s in segs])
    assert len(out) == 11
    for r_idx, row in out.items():
        assert row["ap"] == pytest.approx(ap, abs=1e-12), "AP mismatch"
        assert row["precision_interp"] == pytest.approx(
            curve[r_idx], abs=1e-12
        ), f"precision at recall {r_idx/10} mismatch"


def test_brier_murphy_identity_residual_is_within_bin_variance(spark):
    """brier - (uncertainty + reliability - resolution) equals the mean
    within-bin forecast variance, which is >= 0 and small for 10 bins of
    a bounded forecast. A sign flip or term swap in the decomposition
    breaks this immediately."""
    row = (
        get_spec("ml_brier_decomposition").spark(spark, SF_ORACLE).collect()[0]
    )
    resid = row["brier"] - (
        row["uncertainty"] + row["reliability"] - row["resolution"]
    )
    assert -1e-6 <= resid <= 0.02, resid


def test_logistic_irls_beats_null_model(spark):
    """After 3 Newton rounds the fitted log-loss must not exceed the
    base-rate entropy (the intercept-only optimum) by more than the
    quantization slack."""
    row = get_spec("ml_logistic_irls").spark(spark, SF_ORACLE).collect()[0]
    p = row["pos"] / row["n"]
    null_loss = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert row["log_loss"] <= null_loss + 1e-3
    assert 0.0 < row["log_loss"] < 1.0


def test_markov_stationary_is_a_distribution(spark):
    rows = get_spec("analytics_markov_stationary").spark(spark, SF_ORACLE).collect()
    total = sum(r["stationary"] for r in rows)
    assert len(rows) == 5
    assert total == pytest.approx(1.0, abs=1e-3)
    assert all(0.0 < r["stationary"] < 1.0 for r in rows)

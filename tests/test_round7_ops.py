"""Independent Python oracles for the round-7 operators.

tests/test_parity.py already proves Spark == DuckDB on the shared
formulation; these tests prove the formulation itself — each operator is
recomputed from first principles in plain Python over a CRAFTED dataset
written as a miniature sf_dir, so a bug mirrored into both engines' SQL
cannot hide (the tie-test / property-test convention from rounds 4-6)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from wal_consumer_spark.plans.analytics import (
    _edge_support,
    analytics_interpurchase_halflife,
    ml_ols_durbin_watson,
    ml_threshold_sweep_confusion,
)
from wal_consumer_spark.plans.cdc import cdc_entity_update_cadence
from wal_consumer_spark.plans.timeseries import _EWM_W, _EWM_WSUM, ts_ewm_mean_variance


def _write_orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderdate 'YYYY-MM-DD', o_totalprice)."""
    df = spark.createDataFrame(
        rows, "o_orderkey LONG, o_custkey LONG, o_orderdate STRING, o_totalprice DOUBLE"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts 'YYYY-MM-DD HH:MM:SS', user_id, event_type, value)."""
    df = spark.createDataFrame(
        rows,
        "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_ewm_mean_variance_python_oracle(spark, tmp_path):
    """25 crafted days (deterministic pseudo-random cents) -> the dyadic
    EWM mean/variance recomputed directly from the weight definition."""
    days, vals = [], {}
    for i in range(25):
        day = f"2024-02-{i + 1:02d}"
        cents = 10_000 + ((i * 7919) % 997) * 13  # deterministic, irregular
        days.append(day)
        vals[day] = cents
    rows = [
        (i + 1, 1, d, vals[d] / 100.0)  # totalprice dollars -> cents roundtrip
        for i, d in enumerate(days)
    ]
    sf = _write_orders(spark, tmp_path, rows)
    got = {
        r.day.strftime("%Y-%m-%d"): (r.ewm_mean_cents, r.ewm_var_cents2)
        for r in ts_ewm_mean_variance(spark, sf).collect()
    }
    assert len(got) == 25 - 15  # full 16-day history required
    for t in range(15, 25):
        window = [vals[days[t - j]] for j in range(16)]  # y_t .. y_{t-15}
        m1 = sum(w * y for w, y in zip(_EWM_W, window))
        m2 = sum(w * y * y for w, y in zip(_EWM_W, window))
        mean_c = m1 // _EWM_WSUM
        var_c2 = (_EWM_WSUM * m2 - m1 * m1) // (_EWM_WSUM * _EWM_WSUM)
        assert got[days[t]] == (mean_c, var_c2), days[t]


def test_durbin_watson_detects_serial_correlation(spark, tmp_path):
    """Two crafted series around the same trend: smooth-alternating
    residuals must push DW toward 4 (negative lag-1 autocorrelation) and a
    slow residual sine toward 0 (positive autocorrelation) — and the
    statistic must match a direct Python recomputation of the operator's
    quantized definition."""

    def run(resid_fn):
        rows = []
        for i in range(60):
            day = f"2024-{1 + i // 28:02d}-{i % 28 + 1:02d}"
            cents = 500_000 + 1000 * i + resid_fn(i)
            rows.append((i + 1, 1, day, cents / 100.0))
        sf = _write_orders(spark, tmp_path, rows)
        row = ml_ols_durbin_watson(spark, sf).collect()[0]
        # independent recomputation (float OLS, quantized residual terms)
        xs = sorted(
            (r.o_orderdate.toordinal() - 719162, int(round(r.o_totalprice * 100)))
            for r in spark.read.parquet(str(tmp_path / "orders.parquet"))
            .select("o_orderdate", "o_totalprice")
            .collect()
        )
        n = len(xs)
        sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs); sxy = sum(x * y for x, y in xs)
        beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        xbar, ybar = sx / n, sy / n
        e = [round((y - (ybar + beta * (x - xbar))) * 1000) for x, y in xs]
        de = [
            round(((xs[i][1] - xs[i - 1][1]) - beta * (xs[i][0] - xs[i - 1][0])) * 1000)
            for i in range(1, n)
        ]
        dw = sum(d * d for d in de) / sum(v * v for v in e)
        assert row.n_days == n
        assert row.dw_stat == pytest.approx(dw, abs=1e-6)
        return row.dw_stat

    dw_alt = run(lambda i: 40_000 if i % 2 == 0 else -40_000)
    dw_pos = run(lambda i: int(60_000 * math.sin(i / 6.0)))
    assert dw_alt > 3.0, dw_alt   # alternating -> near 4
    assert dw_pos < 1.0, dw_pos   # slow drift -> near 0


def test_edge_support_matches_brute_triangles(spark):
    """Handcrafted graph: two triangles sharing edge (1,2), plus pendant
    edge (4,5) — supports are knowable by eye and by brute force."""
    edges = [(1, 2), (1, 3), (2, 3), (1, 6), (2, 6), (4, 5)]
    e = spark.createDataFrame(edges, "pa LONG, pb LONG")
    got = {(r.pa, r.pb): r.s for r in _edge_support(e).collect()}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {(a, b): len(adj[a] & adj[b]) for a, b in edges}
    assert got == want
    assert want[(1, 2)] == 2 and want[(4, 5)] == 0


def test_threshold_sweep_matches_brute_recount(spark, tmp_path):
    rows = []
    for i in range(400):
        et = "purchase" if (i * 13) % 5 == 0 else "view"
        val = float((i * 37) % 500)
        rows.append((i, "2024-01-01 00:00:00", i % 7, et, val))
    sf = _write_events(spark, tmp_path, rows)
    got = {r.threshold: r for r in ml_threshold_sweep_confusion(spark, sf).collect()}
    pos = [(v, et == "purchase") for _, _, _, et, v in rows]
    for t in range(50, 500, 50):
        tp = sum(1 for v, p in pos if p and v >= t)
        fp = sum(1 for v, p in pos if not p and v >= t)
        fn = sum(1 for v, p in pos if p and v < t)
        tn = sum(1 for v, p in pos if not p and v < t)
        r = got[t]
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn), t


def test_interpurchase_halflife_python_oracle(spark, tmp_path):
    """Crafted gaps: 3 customers ordering at known intervals; survival
    curve and fitted slope recomputed in Python from the definition."""
    from datetime import date as D, timedelta

    rows, oid = [], 1
    for cust, gap in [(1, 25), (2, 70), (3, 140)]:
        day = 0
        for k in range(8):
            date = (D(2023, 1, 1) + timedelta(days=day)).isoformat()
            rows.append((oid, cust, date, 100.0))
            oid += 1
            day += gap
    sf = _write_orders(spark, tmp_path, rows)
    row = analytics_interpurchase_halflife(spark, sf).collect()[0]
    gaps = [25] * 7 + [70] * 7 + [140] * 7
    pts = []
    for g in range(30, 361, 30):
        n_gt = sum(1 for x in gaps if x > g)
        if n_gt:
            pts.append((g, round(math.log(n_gt / len(gaps)) * 1e6)))
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row.n_gaps == 21 and row.n_grid_points == n
    assert row.decay_per_day == pytest.approx(slope / 1e6, abs=1e-9)
    assert row.halflife_days == pytest.approx(693147.180559945 / (-slope), abs=1e-4)


def test_update_cadence_python_oracle(spark, tmp_path):
    """Entities with engineered mean gaps landing in distinct power-of-two
    buckets; histogram recomputed from the definition."""
    rows, eid = [], 0
    base = "2024-01-01 00:00:00"
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # entity_id = event_id % 500 — give entity e ops at spacing 2^(6+e) s
    # by choosing event ids congruent to e (mod 500)
    for e, n_ops in [(1, 5), (2, 4), (3, 3)]:
        gap_s = 2 ** (6 + e)
        for k in range(n_ops):
            ts = (t0 + dt.timedelta(seconds=k * gap_s)).strftime("%Y-%m-%d %H:%M:%S")
            rows.append((e + 500 * k, ts, 1, "view", 1.0))
    sf = _write_events(spark, tmp_path, rows)
    got = {r.gap_bucket_lo_s: (r.n_entities, r.n_ops) for r in
           cdc_entity_update_cadence(spark, sf).collect()}
    # exact spacings: mean gap = 2^(6+e) exactly -> bucket floor 2^(6+e)
    assert got == {128: (1, 5), 256: (1, 4), 512: (1, 3)}

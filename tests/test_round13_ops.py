"""Independent (pure-Python) oracles and behavioral tests for operators
added in round 12 and staged for round-13 certification — a bug mirrored
into both engines' shared formulation cannot hide behind the parity gate
(the round-8..12 test-file pattern)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.01"


def _daily_cents() -> list[int]:
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["d"] = pd.to_datetime(e.ts).dt.date
    cents = (
        (e.value * 100).round().astype("int64").groupby(e.d).sum().sort_index()
    )
    return [int(v) for v in cents]


# ------------------------------------------------------- tracking signal
def test_tracking_signal_python_oracle(spark):
    y = _daily_cents()
    errs = [y[i] - y[i - 7] for i in range(7, len(y))]
    rows = (
        all_specs()["ts_tracking_signal_bias"].spark(spark, SF).collect()
    )
    assert len(rows) == len(errs)
    cum = cab = 0
    for i, r in enumerate(rows):
        cum += errs[i]
        cab += abs(errs[i])
        assert r.cum_err_cents == cum
        assert r.cum_abs_cents == cab
        assert r.n == i + 1
        if cab:
            assert r.tracking_signal_micro == round(1e6 * cum * (i + 1) / cab)


# ----------------------------------------------------- squared-return acf
def test_squared_return_acf_python_oracle(spark):
    y = _daily_cents()
    s = [(y[i] - y[i - 1]) ** 2 for i in range(1, len(y))]
    out = {
        r.lag: r
        for r in all_specs()["ts_squared_return_acf"].spark(spark, SF).collect()
    }
    assert sorted(out) == [1, 2, 3, 4, 5]
    for lag in range(1, 6):
        xs, ys = s[:-lag], s[lag:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        r = out[lag]
        assert r.n_pairs == n
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx and vy:
            acf = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert abs(r.acf_sq - acf) < 2e-6


# ------------------------------------------------------ engle-granger
def test_engle_granger_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["d"] = pd.to_datetime(e.ts).dt.date
    e["cents"] = (e.value * 100).round().astype("int64")
    series = {
        t: e[e.event_type == t].groupby("d").cents.sum().sort_index()
        for t in ("purchase", "view")
    }
    days = sorted(set(series["purchase"].index) & set(series["view"].index))
    x = [int(series["purchase"][d]) for d in days]
    y = [int(series["view"][d]) for d in days]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    resid = [yi - a - b * xi for xi, yi in zip(x, y)]
    s1 = sum(resid[i - 1] * resid[i] for i in range(1, n))
    s2 = sum(v * v for v in resid[:-1])
    s3 = sum(v * v for v in resid[1:])
    gamma = (s1 - s2) / s2
    rss = (s3 - 2 * s1 + s2) - (s1 - s2) ** 2 / s2
    t_stat = gamma / math.sqrt((rss / (n - 2)) / s2)
    row = (
        all_specs()["ts_engle_granger_cointegration"]
        .spark(spark, SF)
        .collect()[0]
    )
    assert row.n_days == n and row.m_pairs == n - 1
    assert row.beta_micro == round(1e6 * b)
    # residual-free moment expansion vs direct residual arithmetic:
    # tiny float divergence allowed, the CLAIM is the same statistic
    assert abs(row.eg_gamma - gamma) < 1e-6
    assert abs(row.eg_t_stat - t_stat) < 1e-4


# ------------------------------------------------- cochran-armitage trend
def test_cochran_armitage_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["s"] = o.o_orderpriority.str[0].astype(int)
    g = o.groupby("s").agg(
        n_i=("o_orderstatus", "size"),
        r_i=("o_orderstatus", lambda v: int((v == "F").sum())),
    )
    n, r = int(g.n_i.sum()), int(g.r_i.sum())
    a = int((g.index * g.r_i).sum())
    b = int((g.index * g.n_i).sum())
    c = int((g.index * g.index * g.n_i).sum())
    z = (n * a - r * b) * math.sqrt(n) / math.sqrt(
        r * (n - r) * (n * c - b * b)
    )
    row = (
        all_specs()["ml_cochran_armitage_trend"].spark(spark, SF).collect()[0]
    )
    assert row.n_total == n and row.r_total == r
    assert row.t_num_scaled == n * a - r * b
    assert abs(row.z_trend - z) < 2e-6


# ----------------------------------------------------------- chow break
def _ssr(x: list[int], y: list[int]) -> float:
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    syy = sum(v * v for v in y)
    return (n * syy - sy * sy) / n - (n * sxy - sx * sy) ** 2 / (
        n * (n * sxx - sx * sx)
    )


def test_chow_break_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    daily = (
        (o.o_totalprice * 100).round().astype("int64").groupby(o.d).sum()
    ).sort_index()
    d0 = daily.index.min()
    xs = [(d - d0).days for d in daily.index]
    ys = [int(v) for v in daily]
    mid = max(xs) // 2
    x1 = [x for x in xs if x <= mid]
    y1 = [y for x, y in zip(xs, ys) if x <= mid]
    x2 = [x for x in xs if x > mid]
    y2 = [y for x, y in zip(xs, ys) if x > mid]
    ssr1, ssr2, ssrp = _ssr(x1, y1), _ssr(x2, y2), _ssr(xs, ys)
    f = ((ssrp - ssr1 - ssr2) / 2) / ((ssr1 + ssr2) / (len(xs) - 4))
    row = all_specs()["ml_chow_break_test"].spark(spark, SF).collect()[0]
    assert row.n1 == len(x1) and row.n2 == len(x2)
    assert abs(row.chow_f_stat - f) < 1e-4


# --------------------------------------------------------------- lins ccc
def test_lins_ccc_python_oracle(spark):
    y = _daily_cents()
    pairs = [(y[i - 7], y[i]) for i in range(7, len(y))]
    f = [p[0] for p in pairs]
    yy = [p[1] for p in pairs]
    n = len(pairs)
    sf_, sy_ = sum(f), sum(yy)
    sff = sum(v * v for v in f)
    syy = sum(v * v for v in yy)
    sfy = sum(a * b for a, b in zip(f, yy))
    num = 2 * (n * sfy - sf_ * sy_)
    den = (n * sff - sf_ * sf_) + (n * syy - sy_ * sy_) + (sf_ - sy_) ** 2
    row = all_specs()["ml_lins_ccc"].spark(spark, SF).collect()[0]
    assert row.n_days == n
    assert row.ccc_micro == round(1e6 * num / den)
    # CCC must never exceed |pearson| (Lin's inequality)
    assert abs(row.ccc_micro) <= abs(row.pearson_micro) + 1


# ---------------------------------------------------------------- QTE
def test_qte_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    spend = o.groupby("o_custkey").cents.sum()
    c["v"] = c.c_custkey.map(spend).fillna(0).astype("int64")
    rows = {
        r.pct: r
        for r in all_specs()["analytics_quantile_treatment_effect"]
        .spark(spark, SF)
        .collect()
    }
    for seg_name, col in (
        ("treat", "q_treat_cents"),
        ("control", "q_control_cents"),
    ):
        mask = (
            (c.c_mktsegment == "BUILDING")
            if seg_name == "treat"
            else (c.c_mktsegment != "BUILDING")
        )
        vals = sorted(c[mask].v)
        n = len(vals)
        for k in range(1, 10):
            rank = (n * k + 9) // 10
            assert getattr(rows[k * 10], col) == vals[rank - 1], (
                seg_name,
                k,
            )
    for k in range(1, 10):
        r = rows[k * 10]
        assert r.qte_cents == r.q_treat_cents - r.q_control_cents


# ------------------------------------------------- eigenvector centrality
def test_eigenvector_centrality_python_oracle(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n: Counter = Counter()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = {e for e, n in pair_n.items() if n >= 2}
    adj: defaultdict = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    v1 = {u: len(ns) for u, ns in adj.items()}
    v2 = {u: sum(v1[w] for w in adj[u]) for u in adj}
    v3 = {u: sum(v2[w] for w in adj[u]) for u in adj}
    mx = max(v3.values())
    top = sorted(v3.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = (
        all_specs()["graph_eigenvector_centrality"].spark(spark, SF).collect()
    )
    assert len(rows) == 20
    for rnk, (r, (node, w3)) in enumerate(zip(rows, top), start=1):
        assert r.rnk == rnk
        assert r.part_node == node
        assert r.walks_1 == v1[node]
        assert r.walks_2 == v2[node]
        assert r.walks_3 == w3
        assert r.centrality_micro == round(1e6 * w3 / mx)


# ------------------------------------------------------ b-bit minhash
def test_bbit_unbiasing_identity(spark):
    """The b=1 estimator identity the op prints: est_ppm must equal
    (2*nb - 32)*1e6 // 32 for every emitted bit-match count, and the
    abs-error sums must be consistent with n_pairs bounds."""
    rows = (
        all_specs()["dedup_bbit_minhash_error"].spark(spark, SF).collect()
    )
    assert rows, "candidate pairs must exist at sf0.01"
    for r in rows:
        assert 0 <= r.n_match_bits <= 32
        assert r.est_ppm == (2 * r.n_match_bits - 32) * 1_000_000 // 32
        assert r.n_pairs > 0
        assert 0 <= r.sum_abs_err_ppm <= 2_000_000 * r.n_pairs
        assert r.mean_abs_err_ppm == r.sum_abs_err_ppm // r.n_pairs


def test_bbit_more_bits_estimates_higher_jaccard():
    """Monotonicity of the estimator itself (pure function)."""
    prev = None
    for nb in range(0, 33):
        est = (2 * nb - 32) * 1_000_000 // 32
        if prev is not None:
            assert est > prev
        prev = est


# --------------------------------------------- payload refcount dedup
def test_payload_refcount_python_oracle(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["kind"] = d.doc_id.mod(3).map({0: "image", 1: "audio", 2: "video"})
    d["digest"] = d.text.map(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    d["nbytes"] = d.text.map(lambda t: len(t.encode()))
    rows = {
        r.kind: r
        for r in all_specs()["multimodal_duplicate_payload_refcount"]
        .spark(spark, SF)
        .collect()
    }
    for kind, grp in d.groupby("kind"):
        per = grp.groupby(["digest", "nbytes"]).size()
        n_payloads = int(per.sum())
        n_unique = len(per)
        saved = int(
            sum((cnt - 1) * nb for (_, nb), cnt in per.items())
        )
        total = int(sum(cnt * nb for (_, nb), cnt in per.items()))
        r = rows[kind]
        assert r.n_payloads == n_payloads
        assert r.n_unique == n_unique
        assert r.dup_bytes_saved == saved
        assert r.total_bytes == total
        assert r.savings_ppm == 1_000_000 * saved // total


# ---------------------------------------------------------------- deming
def test_deming_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["d"] = pd.to_datetime(e.ts).dt.date
    e["cents"] = (e.value * 100).round().astype("int64")
    s = {
        t: e[e.event_type == t].groupby("d").cents.sum().sort_index()
        for t in ("click", "view")
    }
    days = sorted(set(s["click"].index) & set(s["view"].index))
    x = [int(s["click"][d]) for d in days]
    y = [int(s["view"][d]) for d in days]
    n = len(x)
    sx, sy = sum(x), sum(y)
    vx = n * sum(v * v for v in x) - sx * sx
    vy = n * sum(v * v for v in y) - sy * sy
    c = n * sum(a * b for a, b in zip(x, y)) - sx * sy
    beta = (vy - vx + math.sqrt((vy - vx) ** 2 + 4 * c * c)) / (2 * c)
    row = all_specs()["ml_deming_regression"].spark(spark, SF).collect()[0]
    assert row.n_days == n
    assert row.deming_slope_micro == round(1e6 * beta)
    assert row.ols_slope_micro == round(1e6 * c / vx)
    # Deming corrects OLS attenuation: |beta_deming| >= |beta_ols| when
    # both slopes share a sign (lambda=1, noise in x shrinks OLS)
    if row.deming_slope_micro * row.ols_slope_micro > 0:
        assert abs(row.deming_slope_micro) >= abs(row.ols_slope_micro)


# ------------------------------------------------------------ MH odds ratio
def test_mantel_haenszel_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    has_f = set(o[o.o_orderstatus == "F"].o_custkey)
    c["exposed"] = (c.c_mktsegment == "BUILDING").astype(int)
    c["outcome"] = c.c_custkey.isin(has_f).astype(int)
    sum_ad = sum_bc = n_strata = 0
    for _, g in c.groupby("c_nationkey"):
        a = int(((g.exposed == 1) & (g.outcome == 1)).sum())
        b = int(((g.exposed == 1) & (g.outcome == 0)).sum())
        cc = int(((g.exposed == 0) & (g.outcome == 1)).sum())
        d = int(((g.exposed == 0) & (g.outcome == 0)).sum())
        n = a + b + cc + d
        if n == 0:
            continue
        n_strata += 1
        sum_ad += round(1e6 * a * d / n)
        sum_bc += round(1e6 * b * cc / n)
    row = all_specs()["ml_mantel_haenszel_or"].spark(spark, SF).collect()[0]
    assert row.n_strata == n_strata
    assert row.sum_ad_micro == sum_ad
    assert row.sum_bc_micro == sum_bc
    if sum_bc:
        assert row.or_mh_micro == round(1e6 * sum_ad / sum_bc)


# -------------------------------------------------------------- log-rank
def test_logrank_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    seg = dict(zip(c.c_custkey, (c.c_mktsegment == "BUILDING").astype(int)))
    us = pd.to_datetime(e.ts).astype("datetime64[us]").astype("int64")
    e = e.assign(us=us)
    end_us = int(e.us.max())
    day = 86_400_000_000
    rows = []
    for uid, g in e.groupby("user_id"):
        fv = g[g.event_type == "view"].us.min()
        fp = g[g.event_type == "purchase"].us.min()
        if pd.isna(fv):
            continue
        fv = int(fv)
        if not pd.isna(fp) and int(fp) >= fv:
            rows.append(((int(fp) - fv) // day, 1, seg[uid]))
        else:
            rows.append(((end_us - fv) // day, 0, seg[uid]))
    times = sorted({t for t, ev, _ in rows if ev})
    o1 = e1 = v = 0
    n_times = 0
    for t in times:
        at = [(d, ev, g1) for d, ev, g1 in rows if d >= t]
        nt = len(at)
        n1t = sum(1 for d, ev, g1 in at if g1)
        d1t = sum(1 for d, ev, g1 in at if d == t and ev and g1)
        dt = sum(1 for d, ev, g1 in at if d == t and ev)
        n_times += 1
        o1 += d1t
        e1 += round(1e6 * dt * n1t / nt)
        if nt > 1:
            v += round(
                1e6 * dt * (n1t / nt) * ((nt - n1t) / nt)
                * ((nt - dt) / (nt - 1))
            )
    row = all_specs()["analytics_logrank_test"].spark(spark, SF).collect()[0]
    assert row.n_event_times == n_times
    assert row.o1 == o1
    assert row.e1_micro == e1
    assert row.v_micro == v
    if v > 0:
        z = ((o1 * 1_000_000 - e1) / 1e6) / math.sqrt(v / 1e6)
        assert abs(row.logrank_z - z) < 2e-6


# ----------------------------------------------------- harmonic centrality
def test_harmonic_centrality_python_oracle(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n: Counter = Counter()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = {e for e, n in pair_n.items() if n >= 2}
    adj: defaultdict = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    deg = sorted(adj.items(), key=lambda kv: (-len(kv[1]), kv[0]))
    lms = [u for u, _ in deg[:8]]
    harm: Counter = Counter()
    reach: Counter = Counter()
    for lm in lms:
        dist = {lm: 0}
        frontier = [lm]
        for d in range(1, 5):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for node, d in dist.items():
            if d > 0:
                harm[node] += 1_000_000 // d
                reach[node] += 1
    top = sorted(harm.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    rows = (
        all_specs()["graph_harmonic_centrality"].spark(spark, SF).collect()
    )
    assert len(rows) == 25
    for rnk, (r, (node, h)) in enumerate(zip(rows, top), start=1):
        assert r.rnk == rnk
        assert r.part_node == node
        assert r.harmonic_micro == h
        assert r.n_landmarks_reached == reach[node]


# ----------------------------------------------------------- page-hinkley
def test_page_hinkley_python_oracle(spark):
    y = _daily_cents()
    rows = all_specs()["ts_page_hinkley_drift"].spark(spark, SF).collect()
    assert len(rows) == len(y)
    cum = 0
    m_t = 0
    m_min = 0
    for i, r in enumerate(rows):
        cum += y[i]
        dev = round(1e6 * (y[i] - cum / (i + 1)))
        m_t += dev
        m_min = min(m_min, m_t) if i else m_t
        assert r.t == i + 1
        assert r.m_t_micro == m_t
        assert r.m_min_micro == m_min
        assert r.ph_stat_micro == m_t - m_min
        assert r.ph_stat_micro >= 0


# ------------------------------------------------------------- aic/bic
def test_aic_bic_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    daily = (
        (o.o_totalprice * 100).round().astype("int64").groupby(o.d).sum()
    ).sort_index()
    d0 = daily.index.min()
    xs = [(d - d0).days for d in daily.index]
    ys = [int(v) for v in daily]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    vx = n * sum(v * v for v in xs) - sx * sx
    vy = n * sum(v * v for v in ys) - sy * sy
    c = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    ssr0_n = (vy / n) / n
    ssr1_n = (vy / n - c * c / (n * vx)) / n
    d_aic = n * math.log(ssr0_n / ssr1_n) - 2
    d_bic = n * math.log(ssr0_n / ssr1_n) - math.log(n)
    row = all_specs()["ml_aic_bic_trend_compare"].spark(spark, SF).collect()[0]
    assert row.n_days == n
    assert abs(row.delta_aic_micro - round(1e6 * d_aic)) <= 1
    assert abs(row.delta_bic_micro - round(1e6 * d_bic)) <= 1
    assert row.bic_verdict == ("trend" if d_bic > 0 else "mean-only")
    # AIC penalizes less than BIC for n >= 8: delta_aic >= delta_bic
    assert row.delta_aic_micro >= row.delta_bic_micro

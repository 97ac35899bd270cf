"""Independent (pure-Python) oracles and behavioral tests for operators
added in round 11 and staged for round-12 certification — so a bug
mirrored into both engines' shared formulation cannot hide behind the
parity gate (the round-8..11 test-file pattern)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.01"


# --------------------------------------------------- hdr histogram quantiles
def _hdr_bucket(v: int) -> int:
    high = v.bit_length() - 1
    p = 1 << high
    return high * 16 + (v - p) * 16 // p


def test_hdr_histogram_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = sorted(int(c) for c in (o.o_totalprice * 100).round() if c >= 16)
    n = len(cents)
    buckets = Counter(_hdr_bucket(v) for v in cents)
    out = {
        r.percentile: r
        for r in all_specs()["agg_hdr_histogram_quantiles"].spark(spark, SF).collect()
    }
    assert sorted(out) == [50, 90, 99]
    for q in (50, 90, 99):
        rank = max(n * q // 100, 1)
        exact = cents[rank - 1]
        cum = 0
        for b in sorted(buckets):
            cum += buckets[b]
            if cum >= rank:
                bucket = b
                break
        p = 1 << (bucket // 16)
        lo = p + (bucket % 16) * (p // 16)
        w = p // 16
        mid = lo + w / 2
        r = out[q]
        assert r.bucket == bucket
        assert r.exact_cents == exact
        assert r.est_mid_cents == round(mid, 4)
        assert r.rel_err_micro == round(abs(mid - exact) / exact * 1e6)
        # the sketch's contract: estimate within half a bucket width
        assert lo <= exact < lo + w
        assert r.within_bound


def test_hdr_bucketing_is_exact_and_monotone():
    # sorted probes + carried prev make the invariant real (ADVICE r11:
    # the earlier form never updated prev, so the assert was vacuous)
    prev = -1
    for v in sorted([16, 17, 31, 32, 100, 999, 2**20, 2**40 - 1]):
        b = _hdr_bucket(v)
        assert b >= prev  # bucket index is monotone in v
        prev = b
    # bucket boundaries: lo(b) <= v < lo(b)+w for every probe value
    for v in [16, 90000, 123456, 10**9, 2**45 + 12345]:
        b = _hdr_bucket(v)
        p = 1 << (b // 16)
        lo = p + (b % 16) * (p // 16)
        assert lo <= v < lo + p // 16


# ------------------------------------------------------------- bradley-terry
def _duels():
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["d"] = pd.to_datetime(e.ts).dt.date
    e["cents"] = (e.value * 100).round().astype(int)
    per = (
        e.groupby(["user_id", "d", "event_type"]).cents.sum().reset_index()
    )
    duels = []
    for (_, _), grp in per.groupby(["user_id", "d"]):
        if len(grp) < 2:
            continue
        top = grp.sort_values(
            ["cents", "event_type"], ascending=[False, True]
        ).head(2)
        duels.append((top.iloc[0].event_type, top.iloc[1].event_type))
    return duels


def test_bradley_terry_python_oracle(spark):
    duels = _duels()
    wins: Counter = Counter(w for w, _ in duels)
    pair_n: Counter = Counter(tuple(sorted(p)) for p in duels)
    games: Counter = Counter()
    for (a, b), n_ab in pair_n.items():
        games[a] += n_ab
        games[b] += n_ab
    s1 = {t: 2.0 * wins.get(t, 0) / games[t] for t in games}
    out = {
        r.event_type: r
        for r in all_specs()["ml_bradley_terry_one_step"].spark(spark, SF).collect()
    }
    assert sorted(out) == sorted(games)
    for t in games:
        r = out[t]
        assert r.n_games == games[t]
        assert r.n_wins == wins.get(t, 0)
        assert r.bt_score_1 == round(s1[t], 6)
        denom = sum(
            round(1e6 * n_ab / (s1[a] + s1[b]))
            for (a, b), n_ab in pair_n.items()
            if t in (a, b)
        )
        assert r.bt_score_2 == round(wins.get(t, 0) * 1e6 / denom, 6)


def test_bradley_terry_no_winless_pair_invariant():
    """The 1e6-term quantization is safe because s1_i + s1_j > 0 for every
    played pair: the two sides of a pair cannot both be winless."""
    duels = _duels()
    wins = Counter(w for w, _ in duels)
    for a, b in {tuple(sorted(p)) for p in duels}:
        assert wins.get(a, 0) + wins.get(b, 0) > 0


# ------------------------------------------------------------- james-stein
def test_james_stein_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n_tbl = pd.read_parquet(f"{SF}/nation.parquet")
    c["cents"] = (c.c_acctbal * 100).round().astype(int)
    g = c.groupby("c_nationkey").cents.agg(["count", "sum"])
    s2 = c.groupby("c_nationkey").apply(
        lambda df: int((df.cents.astype(object) ** 2).sum()),
        include_groups=False,
    )
    k = len(g)
    n = int(g["count"].sum())
    t1 = int(g["sum"].sum())
    ssw = sum(round(float(s) * float(s) / cnt) for s, cnt in zip(g["sum"], g["count"]))
    gmean = t1 / n
    sigma2 = (float(s2.sum()) - float(ssw)) / (n - k)
    means = {i: g.loc[i, "sum"] / g.loc[i, "count"] for i in g.index}
    s_between = sum(round((m - gmean) ** 2) for m in means.values())
    names = dict(zip(n_tbl.n_nationkey, n_tbl.n_name))
    out = {
        r.n_name: r
        for r in all_specs()["analytics_james_stein_shrinkage"].spark(spark, SF).collect()
    }
    assert len(out) == k
    for i in g.index:
        r = out[names[i]]
        n_i = int(g.loc[i, "count"])
        shrink = max(0.0, 1.0 - (k - 3) * (sigma2 / n_i) / s_between)
        assert r.n_customers == n_i
        assert r.raw_mean == round(means[i] / 100, 4)
        assert r.shrink_weight == round(shrink, 6)
        assert r.js_mean == round(
            (gmean + shrink * (means[i] - gmean)) / 100, 4
        )
    # shrinkage must move every mean TOWARD the grand mean, never past it
    for i in g.index:
        r = out[names[i]]
        lo, hi = sorted([round(means[i] / 100, 4), round(gmean / 100, 4)])
        assert lo - 1e-9 <= r.js_mean <= hi + 1e-9


# ---------------------------------------------------------------- mde curve
def test_mde_curve_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    n_events = len(e)
    n_pos = int((e.event_type == "purchase").sum())
    p = n_pos / n_events
    out = all_specs()["analytics_ab_mde_curve"].spark(spark, SF).collect()
    grid = [100, 200, 500, 1000, 2000, 5000, 10000, 20000, 50000, 100000]
    assert [r.n_per_arm for r in out] == grid
    for r in out:
        mde = 2.801585 * math.sqrt(2.0 * p * (1.0 - p) / r.n_per_arm)
        assert r.base_rate == round(p, 6)
        assert r.mde_abs_micro == round(mde * 1e6)
        assert r.mde_rel_micro == round(mde / p * 1e6)
    # MDE must shrink ~1/sqrt(n): quadrupling n halves the MDE
    by_n = {r.n_per_arm: r.mde_abs_micro for r in out}
    assert abs(by_n[2000] / by_n[500] - 0.5) < 0.01


# ------------------------------------------------------------ wedge closure
def test_wedge_closure_python_oracle(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n: Counter = Counter()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    edges = {e for e, n in pair_n.items() if n >= 2}
    adj: defaultdict = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # count triangles per node exactly: enumerate each triangle once
    tri: Counter = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a<b<c triangle enumerated once (edges store a<b)
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    buckets: dict = defaultdict(lambda: [0, 0, 0])
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        bk = d.bit_length() - 1
        buckets[bk][0] += 1
        buckets[bk][1] += d * (d - 1) // 2
        buckets[bk][2] += tri.get(v, 0)
    out = {
        r.degree_bucket: r
        for r in all_specs()["graph_wedge_closure_by_degree"].spark(spark, SF).collect()
    }
    assert sorted(out) == sorted(buckets)
    for bk, (n_nodes, wedges, t) in buckets.items():
        r = out[bk]
        assert (r.n_nodes, r.n_wedges, r.n_triangles) == (n_nodes, wedges, t)
        assert r.closure_micro == round(1e6 * t / wedges)
        assert 0 <= r.closure_micro <= 1_000_000  # closure is a proper ratio


# ------------------------------------------------------ preference margins
def test_preference_pair_python_oracle(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["score"] = d.text.map(
        lambda t: len(re.split(r"\s+", t.strip().lower()))
    )
    margins: defaultdict = defaultdict(list)
    for (src, _), grp in d.groupby(["source", d.score // 16]):
        grp = grp.sort_values(["score", "doc_id"], ascending=[False, True])
        sc = list(grp.score)
        for i in range(len(sc) - 1):
            margins[src].append(sc[i] - sc[i + 1])
    expected: dict = {}
    for src, ms in margins.items():
        by_bucket: defaultdict = defaultdict(list)
        for m in ms:
            by_bucket[(m + 1).bit_length() - 1].append(m)
        for bk, vals in by_bucket.items():
            expected[(src, bk)] = (len(vals), round(sum(vals) / len(vals), 4))
    out = all_specs()["pipeline_preference_pair_margin"].spark(spark, SF).collect()
    got = {(r.source, r.margin_bucket): (r.n_pairs, r.avg_margin) for r in out}
    assert got == expected
    # every margin is non-negative by construction (desc sort within band)
    assert all(bk >= 0 for _, bk in got)


# ------------------------------------------------------- magic number audit
def test_magic_number_python_oracle(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet")
    exp: Counter = Counter()
    for doc_id, text in zip(d.doc_id, d.text):
        kind = ["image", "audio", "video"][doc_id % 3]
        h = text.encode("utf-8")[:8].hex().upper()
        if h[:4] == "FFD8":
            det = "jpeg"
        elif h[:4] == "8950":
            det = "png"
        elif h[:4] == "4749":
            det = "gif"
        elif h[:4] in ("4949", "4D4D"):
            det = "tiff"
        elif h[:6] == "494433":
            det = "mp3"
        elif h[:8] == "52494646":
            det = "riff"
        elif h[:8] == "4F676753":
            det = "ogg"
        elif h[:8] == "1A45DFA3":
            det = "matroska"
        elif h[8:16] == "66747970":
            det = "mp4"
        elif h[:2] and "20" <= h[:2] <= "7E":
            det = "ascii-text"
        else:
            det = "other"
        conf = {
            "image": det in ("jpeg", "png", "gif", "tiff"),
            "audio": det in ("mp3", "riff", "ogg"),
            "video": det in ("mp4", "matroska", "riff"),
        }[kind]
        exp[(kind, det, conf)] += 1
    out = all_specs()["multimodal_magic_number_audit"].spark(spark, SF).collect()
    got = {(r.kind, r.detected, r.conformant): r.n for r in out}
    assert got == dict(exp)
    # fake payloads are utf-8 text: nothing should conform (honesty check)
    assert not any(conf for (_, _, conf) in got)


# ------------------------------------------------- calibration slope/intercept
def test_calibration_slope_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    cents = (c.c_acctbal * 100).round().astype(int)
    x = (cents - cents.min()).astype(object)  # exact big-int arithmetic
    rng = int(cents.max() - cents.min())
    y = (c.c_mktsegment == "BUILDING").astype(int).astype(object)
    n = len(c)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    slope_rel = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    r = all_specs()["ml_calibration_slope_intercept"].spark(spark, SF).collect()[0]
    assert r.n == n
    assert r.base_rate_micro == round(1e6 * sy / n)
    assert r.slope_micro == round(1e6 * slope_rel * rng)
    assert r.intercept_micro == round(1e6 * (sy / n - slope_rel * (sx / n)))
    # regression-through-the-mean sanity: fitted line at the mean forecast
    # recovers the base rate exactly (OLS identity)
    fitted_at_mean = r.intercept_micro / 1e6 + (r.slope_micro / 1e6) * (
        (sx / n) / rng
    )
    assert abs(fitted_at_mean - sy / n) < 1e-4


# ------------------------------------------------------------ lorenz deciles
def test_lorenz_deciles_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    spend = o.groupby("o_custkey").cents.sum()
    v = sorted(int(spend.get(k, 0)) for k in c.c_custkey)
    n, t = len(v), sum(v)
    rows = all_specs()["analytics_lorenz_deciles"].spark(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    cum = 0
    for r in rows:
        k = r.decile
        lo, hi = n * (k - 1) // 10, n * k // 10
        take = sum(v[lo:hi])
        cum += take
        assert r.n_customers == hi - lo
        assert r.share_micro == round(1e6 * take / t)
        assert r.cum_share_micro == round(1e6 * cum / t)
    assert rows[-1].cum_share_micro == 1_000_000
    # Lorenz curve is convex: decile shares non-decreasing
    shares = [r.share_micro for r in rows]
    assert shares == sorted(shares)


# ---------------------------------------------------- avg neighbor degree
def test_avg_neighbor_degree_python_oracle(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    pair_n: Counter = Counter()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    adj: defaultdict = defaultdict(list)
    for (a, b), cnt in pair_n.items():
        if cnt >= 2:
            adj[a].append(b)
            adj[b].append(a)
    by_deg: defaultdict = defaultdict(list)
    for u, nbrs in adj.items():
        d = len(nbrs)
        s = sum(len(adj[x]) for x in nbrs)
        by_deg[d].append(round(1e6 * s / d))
    out = {
        r.degree: r
        for r in all_specs()["graph_avg_neighbor_degree_curve"].spark(spark, SF).collect()
    }
    assert sorted(out) == sorted(by_deg)
    for d, knns in by_deg.items():
        assert out[d].n_nodes == len(knns)
        assert out[d].avg_knn_micro == round(sum(knns) / len(knns))


# ------------------------------------------------------ op transition matrix
def test_op_transition_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet").sort_values("event_id")
    op_of = {"signup": "ADD", "error": "DELETE"}
    exp: Counter = Counter()
    last: dict = {}
    for eid, et in zip(e.event_id, e.event_type):
        ent = eid % 500
        op = op_of.get(et, "UPDATE")
        if ent in last:
            exp[(last[ent], op)] += 1
        last[ent] = op
    legal = {"ADD>UPDATE", "ADD>DELETE", "UPDATE>UPDATE",
             "UPDATE>DELETE", "DELETE>ADD"}
    out = all_specs()["cdc_op_transition_matrix"].spark(spark, SF).collect()
    got = {(r.prev_op, r.op): (r.n, r.legal) for r in out}
    assert got == {
        (p, o): (n, f"{p}>{o}" in legal) for (p, o), n in exp.items()
    }


# -------------------------------------------------- theil decomposition
def test_theil_decomposition_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["day"] = pd.to_datetime(e.ts).dt.date
    # mirror the plan: Spark's double->DECIMAL(18,0) cast rounds HALF_UP
    # (away from zero), not toward zero
    import numpy as np

    x = e.value * 100
    e["cents"] = np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(int)
    daily = e.groupby("day").cents.sum().sort_index()
    y = daily.values[7:].astype(float)
    f = daily.values[:-7].astype(float)
    n = len(y)
    mse = float(((f - y) ** 2).mean())
    fbar, ybar = f.mean(), y.mean()
    sdf = math.sqrt((f * f).mean() - fbar * fbar)
    sdy = math.sqrt((y * y).mean() - ybar * ybar)
    cov = (f * y).mean() - fbar * ybar
    r = all_specs()["ts_theil_inequality_decomposition"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert abs(r.mse - mse) <= 0.51  # same value, independent fp order
    assert abs(r.um_micro - 1e6 * (fbar - ybar) ** 2 / mse) <= 2
    assert abs(r.us_micro - 1e6 * (sdf - sdy) ** 2 / mse) <= 2
    assert abs(r.uc_micro - 1e6 * 2 * (sdf * sdy - cov) / mse) <= 2
    # proportions must partition the MSE
    assert abs(r.um_micro + r.us_micro + r.uc_micro - 1_000_000) <= 3


# ------------------------------------------------------------ sma crossover
def test_sma_crossover_python_oracle(spark):
    import numpy as np

    e = pd.read_parquet(f"{SF}/events.parquet")
    e["day"] = pd.to_datetime(e.ts).dt.date
    x = e.value * 100
    e["cents"] = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(int)
    daily = e.groupby("day").cents.sum().sort_index()
    v = list(daily.values)
    days = list(daily.index)
    diffs = {}
    for i in range(9, len(v)):
        s3, s10 = sum(v[i - 2: i + 1]), sum(v[i - 9: i + 1])
        diffs[days[i]] = 10 * s3 - 3 * s10
    exp = []
    ds = sorted(diffs)
    for prev, cur in zip(ds, ds[1:]):
        pd_, cd = diffs[prev], diffs[cur]
        if pd_ < 0 and cd > 0:
            exp.append((str(cur), "golden", cd))
        elif pd_ > 0 and cd < 0:
            exp.append((str(cur), "death", cd))
    out = all_specs()["ts_sma_crossover_signals"].spark(spark, SF).collect()
    assert [(r.day, r.direction, r.diff_scaled) for r in out] == exp
    assert len(exp) >= 3  # non-degenerate: the series actually crosses


# ------------------------------------------------- cost-sensitive threshold
def test_cost_threshold_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    actual = e.event_type == "purchase"
    grid = [1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0]
    rows = {}
    for t in grid:
        hit = e.value > t
        tp = int((actual & hit).sum())
        fp = int((~actual & hit).sum())
        fn = int((actual & ~hit).sum())
        tn = int((~actual & ~hit).sum())
        rows[round(t * 100)] = (tp, fp, fn, tn, fp + 5 * fn)
    min_cost = min(v[4] for v in rows.values())
    out = all_specs()["ml_cost_sensitive_threshold"].spark(spark, SF).collect()
    assert len(out) == len(grid)
    for r in out:
        tp, fp, fn, tn, cost = rows[r.threshold_cents]
        assert (r.tp, r.fp, r.fn, r.tn, r.expected_cost) == (tp, fp, fn, tn, cost)
        assert r.is_optimal == (cost == min_cost)
    assert sum(r.is_optimal for r in out) >= 1


# ------------------------------------------------------ three-valued logic
def test_three_valued_logic_matches_python(spark):
    out = {
        (r.a_s, r.b_s): r
        for r in all_specs()["scalar_null_three_valued_logic"].spark(spark, SF).collect()
    }
    assert len(out) == 9

    def tv(x):  # render Python Kleene value
        return "N" if x is None else ("T" if x else "F")

    def k_and(a, b):
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True

    def k_or(a, b):
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False

    for a in (True, False, None):
        for b in (True, False, None):
            r = out[(tv(a), tv(b))]
            assert r.and_r == tv(k_and(a, b))
            assert r.or_r == tv(k_or(a, b))
            assert r.not_a == tv(None if a is None else (not a))
            assert r.eq_r == tv(None if a is None or b is None else a == b)
            assert r.null_safe_eq_r == tv(a is b if (a is None or b is None) else a == b)
            assert r.coalesce_r == tv(a if a is not None else b)


# ------------------------------------------------- resurrection latency
def test_resurrection_latency_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet").sort_values("event_id")
    op_of = {"signup": "ADD", "error": "DELETE"}
    last: dict = {}
    gaps = []
    for eid, et in zip(e.event_id, e.event_type):
        ent = eid % 500
        op = op_of.get(et, "UPDATE")
        if ent in last and last[ent][0] == "DELETE" and op == "ADD":
            gaps.append(eid - last[ent][1])
        last[ent] = (op, eid)
    exp: defaultdict = defaultdict(list)
    for g in gaps:
        exp[int(g).bit_length() - 1].append(int(g))
    out = all_specs()["cdc_entity_resurrection_latency"].spark(spark, SF).collect()
    got = {r.gap_bucket: (r.n, r.total_gap, r.avg_gap) for r in out}
    assert got == {
        bk: (len(v), sum(v), round(sum(v) / len(v), 2)) for bk, v in exp.items()
    }
    assert len(gaps) >= 5  # non-degenerate


# ------------------------------------------------ selection bias audit
def test_selection_bias_python_oracle(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet")
    out = {
        r.source: r
        for r in all_specs()["pipeline_length_quality_selection_bias"].spark(spark, SF).collect()
    }
    for src, grp in d.groupby("source"):
        x = grp.n_chars.astype(object)
        y = (grp.n_chars >= 200).astype(int).astype(object)
        n, sx, sy = len(grp), int(x.sum()), int(y.sum())
        sxx, sxy = int((x * x).sum()), int((x * y).sum())
        r = out[src]
        assert r.n == n
        assert r.pass_rate_micro == round(1e6 * sy / n)
        if sy in (0, n):
            assert r.corr_micro is None
        else:
            corr = float(n * sxy - sx * sy) / math.sqrt(
                float(n * sxx - sx * sx) * float(n * sy - sy * sy)
            )
            assert r.corr_micro == round(1e6 * corr)
            assert 0 < corr <= 1  # a length gate must correlate with length


# ------------------------------------------------------------- qq deciles
def test_residual_qq_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = sorted(int(c) for c in (o.o_totalprice * 100).round())
    n = len(cents)
    s1 = sum(cents)
    s2 = sum(c * c for c in cents)
    mean = s1 / n
    sd = math.sqrt(s2 / n - mean * mean)
    pz = [(5, -1.644854), (15, -1.036433), (25, -0.67449), (35, -0.38532),
          (45, -0.125661), (55, 0.125661), (65, 0.38532), (75, 0.67449),
          (85, 1.036433), (95, 1.644854)]
    out = {r.pct: r for r in all_specs()["ml_residual_qq_deciles"].spark(spark, SF).collect()}
    assert sorted(out) == [p for p, _ in pz]
    for p, z in pz:
        rank = max(n * p // 100, 1)
        q = cents[rank - 1]
        r = out[p]
        assert r.q_resid == round(q - mean, 4)
        assert r.theo_resid == round(z * sd, 4)
        assert r.gap_rel_micro == round(
            1e6 / max(mean, 1.0) * ((q - mean) - z * sd)
        )


# ---------------------------------------------------------------- twap
def test_twap_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["day"] = pd.to_datetime(e.ts).dt.date.astype(str)
    # normalize to µs regardless of the parquet reader's unit (this
    # testdata generation reads as datetime64[us]; older ones as [ns])
    e["us"] = e.ts.astype("datetime64[us]").astype("int64")
    e["cents"] = (e.value * 100).round().astype(int)
    exp = {}
    for day, grp in e.groupby("day"):
        grp = grp.sort_values(["us", "event_id"])
        us, cents = list(grp.us), list(grp.cents)
        gaps = [(us[i + 1] - us[i], cents[i]) for i in range(len(us) - 1)]
        covered = sum(g for g, _ in gaps)
        if not gaps or covered <= 0:
            continue
        wsum = sum(g * c for g, c in gaps)
        exp[day] = (len(gaps), covered, round(wsum / covered / 100, 4))
    out = all_specs()["win_time_weighted_average"].spark(spark, SF).collect()
    got = {r.day: (r.n_weighted, r.covered_us, r.twap) for r in out}
    assert got == exp
    # TWAP is a convex combination of event values: inside [min, max]
    lo, hi = e.value.min(), e.value.max()
    assert all(lo - 1e-6 <= t <= hi + 1e-6 for _, _, t in got.values())

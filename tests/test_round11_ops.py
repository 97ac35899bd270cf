"""Independent (pure-Python) oracles and behavioral tests for operators
added in round 10 and staged for round-11 certification — so a bug
mirrored into both engines' shared formulation cannot hide behind the
parity gate (the round-8/9/10 test-file pattern)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.01"


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark DIV / DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _daily_cents() -> list[int]:
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    return list(o.groupby("d").cents.sum().sort_index().astype(int))


def _norm_forecast():
    c = pd.read_parquet(f"{SF}/customer.parquet")
    cents = (c.c_acctbal * 100).round().astype(int)
    lo, hi = int(cents.min()), int(cents.max())
    f_rel = (cents - lo).astype(int)
    y = (c.c_mktsegment == "BUILDING").astype(int)
    return f_rel, hi - lo, y


# ------------------------------------------------------------------ yule k
def test_yule_k_python_oracle(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet")
    rows = {}
    for src, grp in d.groupby("source"):
        cnt = Counter()
        for t in grp.text:
            cnt.update(t.strip().lower().split())
        n = sum(cnt.values())
        sq = sum(c * c for c in cnt.values())
        rows[src] = (n, len(cnt), sq, round((sq - n) * 10000 / (n * n), 6))
    out = all_specs()["text_yule_k_by_source"].spark(spark, SF).collect()
    assert len(out) == len(rows)
    for r in out:
        n, types, sq, k = rows[r.source]
        assert (r.n_tokens, r.n_types, r.sum_freq_sq) == (n, types, sq)
        assert r.yule_k == k
        assert r.yule_k > 0


def test_yule_k_known_values():
    # "a a b" -> N=3, sum c^2 = 4+1=5, K = 1e4*(5-3)/9
    n, sq = 3, 5
    assert round((sq - n) * 10000 / (n * n), 6) == round(20000 / 9, 6)
    # all-distinct text has K = 0 (sum c^2 == N)
    assert (4 - 4) * 10000 == 0


# ----------------------------------------------------------------- tjur r2
def test_tjur_r2_python_oracle(spark):
    f_rel, rng, y = _norm_forecast()
    n1, n0 = int(y.sum()), int((1 - y).sum())
    rel1 = int(f_rel[y == 1].sum())
    rel0 = int(f_rel[y == 0].sum())
    p1 = rel1 / (n1 * float(rng))
    p0 = rel0 / (n0 * float(rng))
    r = all_specs()["ml_tjur_r2_discrimination"].spark(spark, SF).collect()[0]
    assert (r.n1, r.n0) == (n1, n0)
    assert r.mean_p_pos_ppm == round(p1 * 1_000_000)
    assert r.mean_p_neg_ppm == round(p0 * 1_000_000)
    assert r.tjur_r2 == round(p1 - p0, 6)
    assert -1.0 <= r.tjur_r2 <= 1.0


# --------------------------------------------------------------------- srm
def test_sample_ratio_mismatch_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    users = sorted(set(e.user_id))
    arms = Counter(u % 3 for u in users)
    n = len(users)
    out = all_specs()["analytics_sample_ratio_mismatch"].spark(spark, SF).collect()
    assert len(out) == 3
    for r in out:
        o = arms[r.variant]
        assert r.n_units == o
        assert r.expected_units_micro == _tdiv(n * 1_000_000, 3)
        assert r.chi2_contrib_micro == _tdiv(
            (3 * o - n) ** 2 * 1_000_000, 3 * n
        )
        assert r.chi2_contrib_micro >= 0


# ------------------------------------------------- permutation entropy
def _ordinal_pattern(x1: int, x2: int, x3: int) -> int:
    r1 = (x2 < x1) + (x3 < x1)
    r2 = (x1 < x2) + (x3 < x2) + (x1 == x2)
    r3 = (x1 < x3) + (x2 < x3) + (x1 == x3) + (x2 == x3)
    return r1 * 100 + r2 * 10 + r3


def test_permutation_entropy_python_oracle(spark):
    x = _daily_cents()
    pats = Counter(
        _ordinal_pattern(x[i], x[i + 1], x[i + 2]) for i in range(len(x) - 2)
    )
    m = sum(pats.values())
    ent_micro = sum(round(c * math.log(m / c) * 1_000_000) for c in pats.values())
    ent = ent_micro / m / 1_000_000
    r = all_specs()["ts_permutation_entropy"].spark(spark, SF).collect()[0]
    assert r.m_windows == m
    assert r.n_patterns == len(pats)
    assert r.entropy_nats == round(ent, 6)
    assert r.normalized_h == round(ent / 1.791759469228055, 6)
    assert 0.0 <= r.normalized_h <= 1.0


def test_ordinal_pattern_is_permutation():
    # any input triple maps to ranks forming a permutation of {0,1,2}
    for x1 in range(3):
        for x2 in range(3):
            for x3 in range(3):
                p = _ordinal_pattern(x1, x2, x3)
                digits = sorted((p // 100, (p // 10) % 10, p % 10))
                assert digits == [0, 1, 2], (x1, x2, x3, p)


# -------------------------------------------------------------------- kpss
def test_kpss_python_oracle(spark):
    x = _daily_cents()
    n = len(x)
    tot = sum(x)
    ps = 0
    sum_s2 = 0
    sum_e2 = 0
    for t, v in enumerate(x, start=1):
        ps += v
        s = n * ps - t * tot
        e = n * v - tot
        sum_s2 += s * s
        sum_e2 += e * e
    kpss = sum_s2 / (n * float(sum_e2))
    r = all_specs()["ts_kpss_level_stat"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.kpss_stat == round(kpss, 9)
    assert r.kpss_stat > 0


def test_kpss_scaling_identity():
    # the n-scaled integer formulation equals the textbook float one
    x = [3, 1, 4, 1, 5, 9, 2, 6]
    n = len(x)
    mean = sum(x) / n
    s_float = 0.0
    acc = 0.0
    for v in x:
        acc += v - mean
        s_float += acc * acc
    sigma2 = sum((v - mean) ** 2 for v in x) / n
    kpss_float = s_float / (n * n * sigma2)
    tot, ps, s2, e2 = sum(x), 0, 0, 0
    for t, v in enumerate(x, start=1):
        ps += v
        s2 += (n * ps - t * tot) ** 2
        e2 += (n * v - tot) ** 2
    assert abs(s2 / (n * float(e2)) - kpss_float) < 1e-12


# ----------------------------------------------------------- dickey-fuller
def test_dickey_fuller_python_oracle(spark):
    x = _daily_cents()
    xl = x[:-1]
    dx = [b - a for a, b in zip(x[:-1], x[1:])]
    m = len(xl)
    sx, sy = sum(xl), sum(dx)
    sxx = sum(v * v for v in xl)
    sxy = sum(a * b for a, b in zip(xl, dx))
    syy = sum(v * v for v in dx)
    msxx = float(m * sxx - sx * sx)
    msxy = float(m * sxy - sx * sy)
    msyy = float(m * syy - sy * sy)
    b = msxy / msxx
    t = b / math.sqrt((msyy - b * msxy) / ((m - 2) * msxx))
    r = all_specs()["ts_dickey_fuller_lag0"].spark(spark, SF).collect()[0]
    assert r.m == m
    assert r.adf_slope == round(b, 9)
    assert r.adf_t_stat == round(t, 6)
    # i.i.d.-like daily sums: strongly mean-reverting differences
    assert r.adf_slope < 0
    assert r.adf_t_stat < -2.86  # 5% DF critical value


# ---------------------------------------------------------------- log loss
def test_log_loss_python_oracle(spark):
    f_rel, rng, y = _norm_forecast()
    groups = Counter(zip(f_rel, y))
    ll_micro = 0
    for (fr, yy), c in groups.items():
        p = (fr + 1) / (rng + 2) if yy == 1 else (rng + 1 - fr) / (rng + 2)
        ll_micro += round(c * math.log(p) * 1_000_000)
    n = len(f_rel)
    r = all_specs()["ml_log_loss_forecast"].spark(spark, SF).collect()[0]
    assert r.n == n
    assert r.n_pos == int(y.sum())
    assert r.log_loss_nats == round(-ll_micro / n / 1_000_000, 6)
    # an uninformative forecast has log loss near ln(2) or worse for
    # imbalanced labels scored by a non-matching probability
    assert r.log_loss_nats > 0


# --------------------------------------------------------- gain ratio
def test_information_gain_ratio_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    y = ((c.c_acctbal * 100).round().astype(int) > 450000).astype(int)
    n = len(c)

    def ent_micro_sum(counts, bases):
        return sum(
            round(cc * math.log(b / cc) * 1_000_000)
            for cc, b in zip(counts, bases)
        )

    expected = {}
    for name, xs in [
        ("c_mktsegment", c.c_mktsegment),
        ("c_nationkey", c.c_nationkey.astype(str)),
    ]:
        xy = Counter(zip(xs, y))
        xm = Counter(xs)
        ym = Counter(y)
        s_y = ent_micro_sum(list(ym.values()), [n] * len(ym))
        s_c = ent_micro_sum(
            list(xy.values()), [xm[k[0]] for k in xy]
        )
        s_x = ent_micro_sum(list(xm.values()), [n] * len(xm))
        h_y, h_c, h_x = s_y // n, s_c // n, s_x // n
        expected[name] = (h_y, h_c, h_x, h_y - h_c,
                          round((h_y - h_c) / h_x, 6))
    out = all_specs()["ml_information_gain_ratio"].spark(spark, SF).collect()
    assert len(out) == 2
    for r in out:
        h_y, h_c, h_x, ig, ratio = expected[r.feature]
        assert r.n == n
        assert (r.h_label_micro, r.h_cond_micro, r.h_split_micro) == (
            h_y, h_c, h_x,
        )
        assert r.info_gain_micro == ig
        assert r.gain_ratio == ratio
        # conditioning can only reduce entropy (micro-rounding slack 1)
        assert r.h_cond_micro <= r.h_label_micro + 1
        assert r.info_gain_micro >= -1


# --------------------------------------------------------- cooks distance
def test_cooks_distance_python_oracle(spark):
    x = _daily_cents()
    n = len(x)
    st = n * (n + 1) // 2
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(x)
    sty = sum(t * v for t, v in enumerate(x, start=1))
    syy = sum(v * v for v in x)
    mstt = float(n * stt - st * st)
    msty = float(n * sty - st * sy)
    msyy = float(n * syy - sy * sy)
    slope = msty / mstt
    s2 = (msyy - slope * msty) / n / (n - 2)
    rows = []
    for t, v in enumerate(x, start=1):
        ey = float(n) * v - float(sy)
        et = float(n) * t - float(st)
        e = (ey - slope * et) / n
        h = 1.0 / n + et * et / (n * mstt)
        d = e * e * h / (2 * s2 * (1 - h) * (1 - h))
        rows.append((d, t, e, h))
    top = sorted(rows, key=lambda r: (-r[0], r[1]))[:10]
    out = all_specs()["ml_ols_influence_cooks_distance"].spark(spark, SF).collect()
    assert len(out) == 10
    for r, (d, t, e, h) in zip(out, top):
        assert r.cooks_d == round(d, 9)
        assert r.resid_cents == round(e, 3)
        assert r.leverage_ppm == round(h * 1_000_000)
        assert r.cooks_d > 0


def test_cooks_distance_leverage_bounds():
    # leverage of a simple-regression row is in [1/n, 1] and sums to 2
    n = 50
    st = n * (n + 1) // 2
    stt = sum(t * t for t in range(1, n + 1))
    mstt = float(n * stt - st * st)
    hs = [1.0 / n + (float(n) * t - st) ** 2 / (n * mstt)
          for t in range(1, n + 1)]
    assert all(1.0 / n <= h <= 1.0 for h in hs)
    assert abs(sum(hs) - 2.0) < 1e-9


# ------------------------------------------------------- spectral entropy
def test_spectral_entropy_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    days = (
        pd.to_datetime(e.ts).astype("datetime64[us]").astype("int64")
        // 86400000000
    ).astype(int)
    daily = Counter(days)
    d0 = min(daily)
    pi = 3.141592653589793
    powers = {}
    for p in range(2, 16):
        cm = sm = 0
        for d, v in daily.items():
            t = d - d0
            ang = 2 * pi * (t % p) / p
            cm += round(v * math.cos(ang) * 1000)
            sm += round(v * math.sin(ang) * 1000)
        powers[p] = cm * cm + sm * sm
    ptot = sum(powers.values())
    ent_nano = sum(
        round(pw / ptot * math.log(ptot / pw) * 1_000_000_000)
        for pw in powers.values()
        if pw > 0
    )
    ent = ent_nano / 1_000_000_000
    r = all_specs()["ts_spectral_entropy"].spark(spark, SF).collect()[0]
    assert r.n_periods == 14
    assert r.entropy_nats == round(ent, 6)
    assert r.normalized_h == round(ent / 2.6390573296152584, 6)
    assert 0.0 <= r.normalized_h <= 1.001


# ------------------------------------------------------ interquartile mean
def test_interquartile_mean_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(int)
    expected = {}
    for grp, vals in cents.groupby(o.o_orderpriority):
        s = sorted(vals)
        n = len(s)
        kept = s[n // 4 : n - n // 4]
        expected[grp] = (n, len(kept), sum(kept) / len(kept) / 100)
    out = all_specs()["agg_interquartile_mean"].spark(spark, SF).collect()
    assert len(out) == len(expected)
    for r in out:
        n, n_kept, mean = expected[r.grp]
        assert (r.n, r.n_kept) == (n, n_kept)
        assert abs(r.iq_mean - mean) < 1e-6
        # robustness sanity: the IQM sits inside the kept range
        s = sorted(cents[o.o_orderpriority == r.grp])
        assert s[n // 4] / 100 <= r.iq_mean <= s[n - n // 4 - 1] / 100


# ------------------------------------------------------------ degree gini
def test_degree_gini_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    ks = sorted(o.groupby("o_custkey").size())
    n = len(ks)
    t = sum(ks)
    s = sum(r * k for r, k in enumerate(ks, start=1))
    g = 2.0 * s / (n * t) - (n + 1) / n
    r = all_specs()["graph_degree_gini"].spark(spark, SF).collect()[0]
    assert (r.n_nodes, r.total_degree) == (n, t)
    assert r.degree_gini == round(g, 6)
    assert 0.0 <= r.degree_gini < 1.0


def test_gini_tie_group_rank_sum_identity():
    # contiguous-block rank sum per tie group equals the naive per-row sum
    ks = [1, 1, 2, 2, 2, 5]
    naive = sum(r * k for r, k in enumerate(sorted(ks), start=1))
    from collections import Counter

    cum, block = 0, 0
    for k, c in sorted(Counter(ks).items()):
        a, z = cum + 1, cum + c
        block += k * (a + z) * c // 2
        cum += c
    assert naive == block


# ------------------------------------------------------------- burstiness
def test_burstiness_histogram_python_oracle(spark):
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e.sort_values(["user_id", "ts", "event_id"])
    e["us"] = e.ts.astype("datetime64[us]").astype("int64")
    bins = Counter()
    for _, grp in e.groupby("user_id"):
        gaps = grp.us.diff().dropna().astype(int).tolist()
        m = len(gaps)
        if m < 2:
            continue
        s1, s2 = sum(gaps), sum(g * g for g in gaps)
        sd = math.sqrt((s2 - s1 * float(s1) / m) / m)
        mu = s1 / m
        b = (sd - mu) / (sd + mu)
        bins[min(math.floor((b + 1.0) * 5), 9)] += 1
    out = all_specs()["analytics_event_burstiness_histogram"].spark(
        spark, SF
    ).collect()
    assert {r.bin: r.n_users for r in out} == dict(bins)
    # B lives in [-1, 1) => bins 0..9 only
    assert all(0 <= r.bin <= 9 for r in out)


# --------------------------------------------------------- delta-method SE
def test_ratio_delta_var_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    x = o.groupby("o_custkey").cents.sum()
    y = o.groupby("o_custkey").size()
    rows = {}
    for seg, grp in c.groupby("c_mktsegment"):
        xs = [int(x.get(k, 0)) for k in grp.c_custkey]
        ys = [int(y.get(k, 0)) for k in grp.c_custkey]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        msxx = float(n * sum(v * v for v in xs) - sx * sx)
        msxy = float(n * sum(a * b for a, b in zip(xs, ys)) - sx * sy)
        msyy = float(n * sum(v * v for v in ys) - sy * sy)
        ratio = sx / sy
        var = (
            (msxx - 2 * ratio * msxy + ratio * ratio * msyy)
            / (n * (n - 1))
            / ((sy / n) ** 2)
            / n
        )
        rows[seg] = (n, round(ratio / 100, 6), round(math.sqrt(var) / 100, 6))
    out = all_specs()["analytics_ratio_metric_delta_var"].spark(
        spark, SF
    ).collect()
    assert len(out) == len(rows)
    for r in out:
        n, ratio, se = rows[r.segment]
        assert r.n == n
        assert r.revenue_per_order == ratio
        assert r.se_delta == se
        assert r.se_delta > 0


# ------------------------------------------------------ payload byte entropy
def test_payload_byte_entropy_python_oracle(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet")
    per_kind_counts: dict[str, Counter] = {
        "image": Counter(), "audio": Counter(), "video": Counter()
    }
    for doc_id, text in zip(d.doc_id, d.text):
        kind = ["image", "audio", "video"][doc_id % 3]
        per_kind_counts[kind].update(text.encode("utf-8")[:64])
    out = all_specs()["multimodal_payload_byte_entropy"].spark(
        spark, SF
    ).collect()
    assert len(out) == 3
    for r in out:
        cnt = per_kind_counts[r.kind]
        n = sum(cnt.values())
        s = sum(round(c * math.log(n / c) * 1_000_000) for c in cnt.values())
        assert r.n_bytes == n
        assert r.distinct_bytes == len(cnt)
        assert r.top_byte_share == round(max(cnt.values()) / n, 6)
        assert r.byte_entropy_nats == round(s / n / 1_000_000, 6)
        # entropy of a byte distribution is bounded by ln(256)
        assert 0.0 <= r.byte_entropy_nats <= math.log(256) + 1e-9


# ---------------------------------------------------------- content checksum
def test_content_checksum_python_oracle(spark):
    import hashlib

    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["day"] = pd.to_datetime(o.o_orderdate).dt.date.astype(str)
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    expected: dict[str, list[int]] = {}
    for r in o.itertuples(index=False):
        s = f"{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|{r.cents}|{r.o_orderpriority}"
        h = int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
        acc = expected.setdefault(r.day, [0, 0])
        acc[0] += 1
        acc[1] += h
    out = all_specs()["dq_content_checksum_by_day"].spark(spark, SF).collect()
    assert len(out) == len(expected)
    for r in out:
        n, chk = expected[r.day]
        assert r.tbl == "orders"
        # the engine folds the wide sum modulo 2^48 (ADVICE r10) so the
        # manifest column stays int64 at any rows/day
        assert (r.n_rows, r.checksum_sum) == (n, chk % 2**48)


def test_content_checksum_detects_single_field_swap():
    # the per-row serialization makes a two-row field swap change the sum
    # (a same-total swap of one measure would fool a plain SUM(measure))
    import hashlib

    def chk(rows):
        return sum(
            int(hashlib.md5("|".join(map(str, r)).encode()).hexdigest()[:12], 16)
            for r in rows
        )

    a = [(1, 10, "F", 500, "1-URGENT"), (2, 20, "F", 300, "5-LOW")]
    swapped = [(1, 10, "F", 300, "1-URGENT"), (2, 20, "F", 500, "5-LOW")]
    assert sum(r[3] for r in a) == sum(r[3] for r in swapped)
    assert chk(a) != chk(swapped)


# ------------------------------------------------------------ rollup text
def test_sql_front_rollup_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    out = all_specs()["sql_front_rollup"].spark(spark, SF).collect()
    rows = {(r.status, r.priority): r for r in out}
    # grand total
    g = rows[("ALL", "ALL")]
    assert g.lvl == 2 and g.n == len(o) and g.total_cents == int(o.cents.sum())
    # one per-status subtotal
    for st, grp in o.groupby("o_orderstatus"):
        r = rows[(st, "ALL")]
        assert r.lvl == 1 and r.n == len(grp)
        assert r.total_cents == int(grp.cents.sum())
        # leaf level sums to the subtotal
        leaves = [v for (s, p), v in rows.items() if s == st and p != "ALL"]
        assert sum(v.n for v in leaves) == r.n
        assert sum(v.total_cents for v in leaves) == r.total_cents


# ---------------------------------------------------------------- try funcs
def test_try_funcs_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = len(c)
    parsed = [int(nm[9:]) for nm in c.c_name]  # 'Customer#NNNNNNNNN'
    r = all_specs()["scalar_try_funcs"].spark(spark, SF).collect()[0]
    assert r.n == n
    assert r.n_name_parsed == n  # every name suffix parses
    assert r.parsed_id_sum == sum(parsed)
    assert r.n_segment_casts == 0  # alphabetic enum never casts to INT
    assert r.n_segment_cast_nulls == n
    assert r.n_safe_divides == int((c.c_nationkey % 5 != 0).sum())


# -------------------------------------------------------- snapshot novelty
def test_snapshot_novelty_python_oracle(spark):
    from collections import defaultdict

    d = pd.read_parquet(f"{SF}/documents.parquet")
    # df-capped 3-shingle sets (mirrors shingle_pairs_jaccard max_df=1000)
    shingles: dict[int, set] = {}
    full_sizes: dict[int, int] = {}
    df_count: Counter = Counter()
    for doc_id, text in zip(d.doc_id, d.text):
        toks = text.strip().lower().split()
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        shingles[doc_id] = sh
        full_sizes[doc_id] = len(sh)
        df_count.update(sh)
    keep = {s for s, cnt in df_count.items() if cnt <= 1000}
    inv = defaultdict(list)
    for doc_id, sh in shingles.items():
        for s in sh & keep:
            inv[s].append(doc_id)
    inter: Counter = Counter()
    for s, ids in inv.items():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter[(ids[i], ids[j])] += 1
    matched = set()
    for (a, b), ncom in inter.items():
        jac = ncom / (full_sizes[a] + full_sizes[b] - ncom)
        if jac >= 0.5:
            if a % 2 == 1 and b % 2 == 0:
                matched.add(a)
            if b % 2 == 1 and a % 2 == 0:
                matched.add(b)
    expected = {}
    inc = d[d.doc_id % 2 == 1]
    for src, grp in inc.groupby("source"):
        n_inc = len(grp)
        n_hit = sum(1 for i in grp.doc_id if i in matched)
        expected[src] = (n_inc, n_hit, round(1.0 - n_hit / n_inc, 6))
    out = all_specs()["pipeline_snapshot_novelty_rate"].spark(
        spark, SF
    ).collect()
    assert len(out) == len(expected)
    for r in out:
        n_inc, n_hit, rate = expected[r.source]
        assert (r.n_incoming, r.n_near_dup_of_base) == (n_inc, n_hit)
        assert r.novelty_rate == rate


# ----------------------------------------------------- seasonal mann-kendall
def test_seasonal_mann_kendall_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    daily = o.groupby("d").cents.sum().sort_index()
    base = pd.Timestamp("1995-01-01").date()
    pts = [((d - base).days, int(y)) for d, y in daily.items()]
    s_stat = 0
    seasons: dict[int, list[int]] = {}
    for di, y in pts:
        seasons.setdefault(di % 7, []).append((di, y))
    var18 = 0
    n_days = 0
    for vals in seasons.values():
        vals.sort()
        ys = [y for _, y in vals]
        n_w = len(ys)
        n_days += n_w
        for i in range(n_w):
            for j in range(i + 1, n_w):
                s_stat += (ys[j] > ys[i]) - (ys[j] < ys[i])
        ties = Counter(ys)
        tsum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 += n_w * (n_w - 1) * (2 * n_w + 5) - tsum
    denom = math.sqrt(var18 / 18.0)
    if s_stat > 0:
        z = (s_stat - 1) / denom
    elif s_stat < 0:
        z = (s_stat + 1) / denom
    else:
        z = 0.0
    r = all_specs()["ts_seasonal_mann_kendall"].spark(spark, SF).collect()[0]
    assert (r.n_seasons, r.n_days) == (len(seasons), n_days)
    assert r.s_stat == s_stat
    assert r.var18 == var18
    assert r.z_stat == round(z, 6)


def test_seasonal_mk_immune_to_pure_weekly_cycle():
    # a pure weekly cycle (no trend) gives S = 0 in the seasonal test:
    # same-weekday values are constant, so every within-season sign is 0
    series = [(di, [10, 20, 30, 40, 50, 60, 70][di % 7]) for di in range(70)]
    s = 0
    for w in range(7):
        ys = [y for di, y in series if di % 7 == w]
        for i in range(len(ys)):
            for j in range(i + 1, len(ys)):
                s += (ys[j] > ys[i]) - (ys[j] < ys[i])
    assert s == 0
    # while the UNSEASONED statistic on the same data is wildly nonzero
    ys = [y for _, y in series]
    s_plain = sum(
        (ys[j] > ys[i]) - (ys[j] < ys[i])
        for i in range(len(ys))
        for j in range(i + 1, len(ys))
    )
    assert s_plain != 0

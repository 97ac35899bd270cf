"""Independent (pure-Python) oracles and behavioral tests for operators
added late in round 9 and staged for round-10 certification — so a bug
mirrored into both engines' shared formulation cannot hide behind the
parity gate (the round-8/9 test-file pattern)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
import pytest

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.01"


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark DIV / DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ---------------------------------------------------------------- cochran Q
def test_cochran_q_python_oracle(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    rows = []
    for v in emb.embedding:
        rows.append([1 if round(float(v[d]) * 1_000_000) > 0 else 0
                     for d in range(4)])
    k = 4
    t = sum(sum(r) for r in rows)
    sum_rowsq = sum(sum(r) ** 2 for r in rows)
    cj = [sum(r[j] for r in rows) for j in range(k)]
    q_num = (k - 1) * sum((k * c - t) ** 2 for c in cj)
    q_den = k * (k * t - sum_rowsq)
    r = all_specs()["ml_cochran_q_test"].spark(spark, SF).collect()[0]
    assert r.n_items == len(rows)
    assert r.t_successes == t
    assert r.sum_rowsq == sum_rowsq
    assert r.q_num == q_num
    assert r.q_den == q_den
    assert r.q_micro == _tdiv(q_num * 1_000_000, q_den)
    # Q must be non-negative and zero iff all column totals are equal
    assert r.q_micro >= 0


def test_cochran_q_zero_when_raters_identical():
    # identical raters => every row is 0000 or 1111 => Q numerator is 0
    rows = [[1, 1, 1, 1]] * 7 + [[0, 0, 0, 0]] * 5
    k = 4
    t = sum(map(sum, rows))
    cj = [sum(r[j] for r in rows) for j in range(k)]
    assert all(c == cj[0] for c in cj)
    assert (k - 1) * sum((k * c - t) ** 2 for c in cj) == 0


# ---------------------------------------------------------- kruskal-wallis
def test_kruskal_wallis_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(int)
    grp = o.o_orderpriority
    n = len(o)
    # doubled average ranks via the tie-group decomposition
    counts = Counter(cents)
    svals = sorted(counts)
    rank2, cum = {}, 0
    for v in svals:
        c = counts[v]
        rank2[v] = 2 * cum + c + 1  # 2 * average rank of the tie group
        cum += c
    r2sum = defaultdict(int)
    ng = defaultdict(int)
    for g, v in zip(grp, cents):
        r2sum[g] += rank2[v]
        ng[g] += 1
    s0 = sum(_tdiv(r2sum[g] ** 2, ng[g]) for g in ng)
    tie_cubes = sum(c**3 - c for c in counts.values())
    h_micro = _tdiv(s0 * 3_000_000, n * (n + 1)) - 3_000_000 * (n + 1)
    h_corr = _tdiv(h_micro * (n**3 - n), n**3 - n - tie_cubes)
    r = all_specs()["ml_kruskal_wallis_h"].spark(spark, SF).collect()[0]
    assert r.n_total == n
    assert r.k_groups == len(ng)
    assert r.tie_cubes == tie_cubes
    assert r.h_micro == h_micro
    assert r.h_tie_corrected_micro == h_corr


def test_kruskal_wallis_detects_separated_groups():
    # sanity of the formula itself: fully separated groups maximize H
    vals = {"a": [1, 2, 3], "b": [11, 12, 13], "c": [21, 22, 23]}
    n = 9
    flat = sorted(v for vs in vals.values() for v in vs)
    rank = {v: i + 1 for i, v in enumerate(flat)}
    s = sum(
        (sum(rank[v] for v in vs)) ** 2 / len(vs) for vs in vals.values()
    )
    h = 12 / (n * (n + 1)) * s - 3 * (n + 1)
    assert h == pytest.approx(7.2)  # the k=3, n_g=3 separated maximum


# ----------------------------------------------------------------- friedman
def test_friedman_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey",
                right_on="c_custkey")
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.between(1995, 1997)]
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    rev = o.groupby(["c_nationkey", "yr"]).cents.sum()
    blocks = rev.unstack().dropna()
    k = 3
    r2 = {1995: 0, 1996: 0, 1997: 0}
    for _, row in blocks.iterrows():
        vals = sorted(row.items(), key=lambda kv: kv[1])
        for yr in r2:
            smaller = sum(1 for _, v in row.items() if v < row[yr])
            equal = sum(1 for _, v in row.items() if v == row[yr])
            r2[yr] += 2 * (smaller + 1) + equal - 1
    nb = len(blocks)
    chi2 = _tdiv(1_000_000 * sum(v * v for v in r2.values()), 4 * nb) \
        - 12_000_000 * nb
    r = all_specs()["ml_friedman_test"].spark(spark, SF).collect()[0]
    assert r.n_blocks == nb
    assert r.k_treatments == k
    assert (r.r2_1995, r.r2_1996, r.r2_1997) == (
        r2[1995], r2[1996], r2[1997])
    assert r.chi2_micro == chi2
    # doubled rank sums over complete blocks must total nb * k * (k+1)
    assert r.r2_1995 + r.r2_1996 + r.r2_1997 == nb * k * (k + 1)


# --------------------------------------------------------- target encoding
def test_target_encoding_loo_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    m = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey",
                right_on="c_custkey")
    m["y"] = m.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    seg = m.groupby("c_mktsegment").y.agg(["count", "sum"])
    g_n, g_pos = int(seg["count"].sum()), int(seg["sum"].sum())
    rows = {
        r.segment: r
        for r in all_specs()["ml_target_encoding_loo"].spark(spark, SF).collect()
    }
    assert set(rows) == set(seg.index)
    for s, row in seg.iterrows():
        n, pos = int(row["count"]), int(row["sum"])
        got = rows[s]
        assert got.n == n and got.pos == pos
        assert got.enc_pos_ppm == _tdiv((pos - 1) * 1_000_000, n - 1)
        assert got.enc_neg_ppm == _tdiv(pos * 1_000_000, n - 1)
        assert got.enc_smooth_ppm == _tdiv(
            (pos * g_n + 100 * g_pos) * 1_000_000, (n + 100) * g_n
        )
        # LOO identity: a y=1 row always sees a LOWER encoding than a
        # y=0 row of the same segment (its own label removed)
        assert got.enc_pos_ppm < got.enc_neg_ppm


# ------------------------------------------------------- cv fold variance
def test_cv_fold_accuracy_variance_python_oracle(spark):
    import hashlib

    c = pd.read_parquet(f"{SF}/customer.parquet")
    folds = defaultdict(lambda: [0, 0])  # n, correct
    for key, bal, segm in zip(c.c_custkey, c.c_acctbal, c.c_mktsegment):
        h = hashlib.md5(f"{key}:cv5".encode()).hexdigest()
        f = int(h[:8], 16) % 5
        pred = 1 if bal >= 5000 else 0
        y = 1 if segm == "BUILDING" else 0
        folds[f][0] += 1
        folds[f][1] += pred == y
    acc = {f: _tdiv(v[1] * 1_000_000, v[0]) for f, v in folds.items()}
    s = sum(acc.values())
    ssd = sum((5 * a - s) ** 2 for a in acc.values())
    got = all_specs()["ml_cv_fold_accuracy_variance"].spark(spark, SF).collect()
    assert len(got) == 5
    for r in got:
        assert r.n == folds[r.fold][0]
        assert r.n_correct == folds[r.fold][1]
        assert r.acc_ppm == acc[r.fold]
        assert r.s_acc_ppm == s
        assert r.ssd_x25 == ssd


# ----------------------------------------------------------------- kmv
def test_kmv_distinct_sketch_python_oracle(spark):
    import hashlib

    o = pd.read_parquet(f"{SF}/orders.parquet")
    H = 16**15
    groups = defaultdict(set)
    for g, ck in zip(o.o_orderpriority, o.o_custkey):
        groups[g].add(
            int(hashlib.md5(str(ck).encode()).hexdigest()[:15], 16)
        )
    got = {
        r.grp: r
        for r in all_specs()["agg_kmv_distinct_sketch"].spark(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for g, hashes in groups.items():
        exact = len(hashes)
        mins = sorted(hashes)[:256]
        r = got[g]
        assert r.exact_distinct == exact
        if exact >= 256:
            hk = mins[255]
            est = 255 * H // hk
            assert r.kth_min_hash == hk
            assert r.kmv_estimate == est
            # the KMV bound: estimate within ~3/sqrt(k) ≈ 19% whp
            assert abs(est - exact) / exact < 0.25
        else:
            assert r.kmv_estimate == exact
        assert r.err_ppm == abs(r.kmv_estimate - exact) * 1_000_000 // exact


def test_kmv_survivor_gate_keeps_all_minima():
    # the h*cnt <= H*1024 gate must never cut into the 256 smallest:
    # the 256th smallest of n uniform draws on [0, H) exceeds the gate
    # threshold H*1024/n only if 256th-order-statistic > 1024/n * H,
    # i.e. essentially never for n >= 256. Verify on a seeded sample.
    import hashlib

    H = 16**15
    hashes = sorted(
        int(hashlib.md5(f"key{i}".encode()).hexdigest()[:15], 16)
        for i in range(5000)
    )
    thresh = H * 1024 // 5000
    assert hashes[255] <= thresh


# -------------------------------------------------------- variance ratio
def test_variance_ratio_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    daily = o.groupby("d").cents.sum().sort_index()
    x = daily.to_numpy()
    d1 = [int(b) - int(a) for a, b in zip(x[:-1], x[1:])]
    d5 = [int(x[i]) - int(x[i - 5]) for i in range(5, len(x))]
    s1, s5 = sum(v * v for v in d1), sum(v * v for v in d5)
    r = all_specs()["ts_variance_ratio"].spark(spark, SF).collect()[0]
    assert r.n_days == len(x)
    assert (r.n1, r.n5) == (len(d1), len(d5))
    assert r.sum_d1sq_k == s1 // 1000
    assert r.sum_d5sq_k == s5 // 1000
    assert r.vr_ppm == s5 * len(d1) * 1_000_000 // (s1 * len(d5) * 5)


def test_variance_ratio_random_walk_is_unity():
    # for a pure random walk the ratio Var(q-diff)/(q*Var(1-diff)) -> 1
    import hashlib

    steps = [
        1 if int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 2
        else -1
        for i in range(4000)
    ]
    x = [0]
    for s in steps:
        x.append(x[-1] + s)
    d1 = [b - a for a, b in zip(x[:-1], x[1:])]
    d5 = [x[i] - x[i - 5] for i in range(5, len(x))]
    vr = (sum(v * v for v in d5) / len(d5)) / (
        5 * sum(v * v for v in d1) / len(d1)
    )
    assert 0.8 < vr < 1.2


# ------------------------------------------------------ simpson diversity
def test_simpson_diversity_python_oracle(spark):
    import re

    d = pd.read_parquet(f"{SF}/documents.parquet")
    per = defaultdict(Counter)
    for src, text in zip(d.source, d.text):
        per[src].update(re.split(r"\s+", text.strip().lower()))
    got = {
        r.source: r
        for r in all_specs()["text_simpson_lexical_diversity"]
        .spark(spark, SF).collect()
    }
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        cc1 = sum(c * (c - 1) for c in cnt.values())
        r = got[src]
        assert r.n_tokens == n
        assert r.n_types == len(cnt)
        assert r.simpson_d_ppm == cc1 * 1_000_000 // (n * (n - 1))
        assert r.diversity_ppm == 1_000_000 - r.simpson_d_ppm


# ------------------------------------------------------------- qualify
def test_qualify_top3_is_exact(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["total_cents"] = (o.o_totalprice * 100).round().astype(int)
    expect = set()
    for g, grp in o.groupby("o_orderpriority"):
        top = grp.sort_values(["total_cents", "o_orderkey"],
                              ascending=[False, True]).head(3)
        for rn, (_, row) in enumerate(top.iterrows(), 1):
            expect.add((g, int(row.o_orderkey), int(row.total_cents), rn))
    got = {
        (r.o_orderpriority, r.o_orderkey, r.total_cents, r.rn)
        for r in all_specs()["sql_front_qualify"].spark(spark, SF).collect()
    }
    assert got == expect


# ----------------------------------------------- propensity stratification
def test_propensity_stratification_python_oracle(spark):
    import math

    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    bal = sorted(float(round(b * 100)) for b in c.c_acctbal)
    n = len(bal)
    # linear-interpolated percentiles — Spark percentile()/DuckDB
    # quantile_cont semantics
    thr = []
    for q in (0.2, 0.4, 0.6, 0.8):
        pos = q * (n - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        thr.append(bal[lo] + (pos - lo) * (bal[hi] - bal[lo]))
    spend = (
        (o.o_totalprice * 100).round().astype(int)
        .groupby(o.o_custkey).sum().astype(int).to_dict()
    )
    per = {s: [0, 0, 0, 0] for s in range(1, 6)}  # nt, nc, st, sc
    for _, row in c.iterrows():
        b = float(round(row.c_acctbal * 100))
        s = 1 + sum(1 for t in thr if b > t)
        treat = row.c_mktsegment == "BUILDING"
        val = spend.get(row.c_custkey, 0)
        if treat:
            per[s][0] += 1
            per[s][2] += val
        else:
            per[s][1] += 1
            per[s][3] += val
    got = {
        r.stratum: r
        for r in all_specs()["analytics_propensity_stratification"]
        .spark(spark, SF).collect()
    }
    for s, (nt, nc, st, sc) in per.items():
        r = got[s]
        assert (r.n_treat, r.n_ctrl) == (nt, nc)
        assert (r.sum_treat, r.sum_ctrl) == (st, sc)
        assert r.ate_cents_x100 == _tdiv(st * 100, nt) - _tdiv(sc * 100, nc)


# ------------------------------------------------- minhash estimate error
def test_minhash_estimate_error_python_oracle(spark):
    import hashlib
    import random
    import re

    d = pd.read_parquet(f"{SF}/documents.parquet")
    P = 4294967311
    rng = random.Random(7)
    coeffs = [(rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
              for _ in range(32)]

    def shingles(text):
        toks = re.split(r"\s+", text.strip().lower())
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sh = {r.doc_id: shingles(r.text) for r in d.itertuples()}
    hs = {
        doc: [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in ss]
        for doc, ss in sh.items()
    }
    sig = {
        doc: [min((a * x + b) % P for x in h) if h else None
              for a, b in coeffs]
        for doc, h in hs.items()
    }
    # banding (4 bands x 8 rows), bucket cap 500
    buckets = defaultdict(list)
    for doc, s in sig.items():
        if s[0] is None:
            continue
        for b in range(4):
            buckets[(b, tuple(s[b * 8:(b + 1) * 8]))].append(doc)
    cand = set()
    for (_, _), docs_in in buckets.items():
        if len(docs_in) > 500:
            continue
        for i, d1 in enumerate(docs_in):
            for d2 in docs_in[i + 1:]:
                cand.add((min(d1, d2), max(d1, d2)))
    per_bucket = defaultdict(lambda: [0, 0, 0])  # n, sum_exact, sum_err
    for d1, d2 in cand:
        agree = sum(1 for x, y in zip(sig[d1], sig[d2]) if x == y)
        inter = len(sh[d1] & sh[d2])  # max_df cap never binds at sf0.01
        union = len(sh[d1]) + len(sh[d2]) - inter
        if union <= 0:
            continue
        b = per_bucket[agree]
        b[0] += 1
        b[1] += inter * 1_000_000 // union
        b[2] += abs(agree * union - 32 * inter) * 1_000_000 // (32 * union)
    got = {
        r.n_agree: r
        for r in all_specs()["dedup_minhash_estimate_error"]
        .spark(spark, SF).collect()
    }
    assert set(got) == set(per_bucket)
    for agree, (n, se, serr) in per_bucket.items():
        r = got[agree]
        assert r.n_pairs == n
        assert r.sum_exact_ppm == se
        assert r.sum_abs_err_ppm == serr
        assert r.mean_abs_err_ppm == serr // n


# ------------------------------------------------------ op-mix drift
def test_op_mix_drift_python_oracle(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev.ts).dt.date
    ev["op"] = ev.event_type.map(
        lambda t: "ADD" if t == "signup" else
        ("DELETE" if t == "error" else "UPDATE"))
    cell = ev.groupby(["d", "op"]).size()
    daytot = ev.groupby("d").size()
    optot = ev.groupby("op").size()
    t = len(ev)
    got = {
        r.day.date(): r
        for r in all_specs()["cdc_op_mix_drift_by_day"].spark(spark, SF).collect()
    }
    assert set(got) == set(daytot.index)
    for day in daytot.index:
        n_d = int(daytot[day])
        chi2 = 0
        for op in optot.index:
            obs = int(cell.get((day, op), 0))
            c_op = int(optot[op])
            chi2 += (obs * t - n_d * c_op) ** 2 * 1_000_000 \
                // (n_d * c_op * t)
        assert got[day].n_ops == n_d
        assert got[day].chi2_micro == chi2


def test_op_mix_drift_uniform_stream_is_zero():
    # a perfectly proportional day contributes exactly zero
    n_d, t = 100, 1000
    c = {"ADD": 300, "UPDATE": 500, "DELETE": 200}
    chi2 = sum(
        ((n_d * cj // t) * t - n_d * cj) ** 2 * 1_000_000
        // (n_d * cj * t)
        for cj in c.values()
    )
    assert chi2 == 0


# ------------------------------------------------------------ kendall W
def test_kendall_w_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    o = o.merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey",
                right_on="c_custkey")
    o["yr"] = pd.to_datetime(o.o_orderdate).dt.year
    o = o[o.yr.between(1995, 1997)]
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    rev = o.groupby(["c_nationkey", "yr"]).cents.sum().unstack().dropna()
    n, k = len(rev), 3
    r2 = defaultdict(int)
    tie_sum = 0
    for yr in (1995, 1996, 1997):
        vals = rev[yr]
        cnt = Counter(vals)
        tie_sum += sum(tt**3 - tt for tt in cnt.values() if tt > 1)
        for nat, v in vals.items():
            smaller = sum(1 for x in vals if x < v)
            equal = sum(1 for x in vals if x == v)
            r2[nat] += 2 * (smaller + 1) + equal - 1
    s4 = sum((r - 3 * (n + 1)) ** 2 for r in r2.values())
    w_ppm = _tdiv(s4 * 3_000_000, 9 * (n**3 - n) - 3 * tie_sum)
    r = all_specs()["analytics_kendall_w_concordance"].spark(spark, SF).collect()[0]
    assert r.n_subjects == n
    assert r.k_judges == k
    assert r.s4 == s4
    assert r.tie_sum == tie_sum
    assert r.w_ppm == w_ppm
    assert 0 <= r.w_ppm <= 1_000_000


def test_kendall_w_perfect_concordance_is_one():
    # identical rankings across judges -> W = 1 exactly
    n, k = 10, 3
    r2 = {i: k * 2 * (i + 1) for i in range(n)}  # doubled rank sums
    s4 = sum((r - k * (n + 1)) ** 2 for r in r2.values())
    assert s4 * 3_000_000 // (9 * (n**3 - n)) == 1_000_000


# --------------------------------------------------------- ego density
def test_ego_density_python_oracle(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in op.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1:]:
                edges.add((p1, p2))
    adj = defaultdict(set)
    for p1, p2 in edges:
        adj[p1].add(p2)
        adj[p2].add(p1)
    hubs = sorted(adj, key=lambda u: (-len(adj[u]), u))[:20]
    got = {
        r.part: r
        for r in all_specs()["graph_ego_density_topk"].spark(spark, SF).collect()
    }
    assert set(got) == set(hubs)
    for u in hubs:
        d = len(adj[u])
        among = sum(
            1 for (a, b) in edges if a in adj[u] and b in adj[u]
        )
        r = got[u]
        assert r.degree == d
        assert r.edges_among_neighbors == among
        assert r.ego_edges == d + among
        assert r.ego_possible == (d + 1) * d // 2
        assert r.density_ppm == (d + among) * 2_000_000 // ((d + 1) * d)
        # ego density can never exceed 1 (complete ego net)
        assert r.density_ppm <= 1_000_000


# --------------------------------------------------------- delong variance
def test_delong_variance_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    rows = [(int(round(b * 100)), 1 if s == "BUILDING" else 0)
            for b, s in zip(c.c_acctbal, c.c_mktsegment)]
    pos = sorted(s for s, y in rows if y == 1)
    neg = sorted(s for s, y in rows if y == 0)
    import bisect

    P, N = len(pos), len(neg)
    # V10 per positive, scaled by 2N
    v10 = [2 * bisect.bisect_left(neg, s)
           + (bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s))
           for s in pos]
    v01 = [2 * (P - bisect.bisect_right(pos, s))
           + (bisect.bisect_right(pos, s) - bisect.bisect_left(pos, s))
           for s in neg]
    s10, ss10 = sum(v10), sum(v * v for v in v10)
    s01, ss01 = sum(v01), sum(v * v for v in v01)
    var_e12 = _tdiv((P * ss10 - s10 * s10) * 10**12,
                    P * (P - 1) * 4 * N * N * P) \
        + _tdiv((N * ss01 - s01 * s01) * 10**12,
                N * (N - 1) * 4 * P * P * N)
    r = all_specs()["ml_auc_delong_variance"].spark(spark, SF).collect()[0]
    assert (r.n_pos, r.n_neg) == (P, N)
    assert r.auc_ppm == _tdiv(s10 * 1_000_000, 2 * N * P)
    assert r.delong_var_e12 == var_e12
    # the two placement-mean identities: mean(V10) == mean(V01) == AUC
    assert _tdiv(s10 * 1_000_000, 2 * N * P) == _tdiv(
        s01 * 1_000_000, 2 * P * N)


# ------------------------------------------------------------- pivot
def test_sql_front_pivot_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    got = {
        r.o_orderpriority: r
        for r in all_specs()["sql_front_pivot"].spark(spark, SF).collect()
    }
    for pr, grp in o.groupby("o_orderpriority"):
        r = got[pr]
        for st, ncol, ccol in (("F", "f_n", "f_cents"),
                               ("O", "o_n", "o_cents"),
                               ("P", "p_n", "p_cents")):
            sub = grp[grp.o_orderstatus == st]
            assert getattr(r, ncol) == len(sub)
            expect = int(sub.cents.sum()) if len(sub) else None
            assert getattr(r, ccol) == expect


# --------------------------------------------------------- multinomial NB
def test_multinomial_nb_python_oracle(spark):
    import math
    import re

    d = pd.read_parquet(f"{SF}/documents.parquet")
    tf = {}
    for r in d.itertuples():
        tf[r.doc_id] = Counter(re.split(r"\s+", r.text.strip().lower()))
    lang_of = dict(zip(d.doc_id, d.lang))
    langs = sorted(set(lang_of.values()))
    langid = {l: i + 1 for i, l in enumerate(langs)}
    d_l = Counter(lang_of.values())
    clt = defaultdict(Counter)
    for doc, cnt in tf.items():
        clt[lang_of[doc]].update(cnt)
    n_l = {l: sum(c.values()) for l, c in clt.items()}
    vocab = sorted({t for c in tf.values() for t in c})
    V, D = len(vocab), len(d)

    def q(x):
        return round(x * 1_000_000)

    logp = {
        (l, t): q(math.log2(clt[l].get(t, 0) + 1) - math.log2(n_l[l] + V))
        for l in langs for t in vocab
    }
    prior = {l: q(math.log2(d_l[l]) - math.log2(D)) for l in langs}
    per = defaultdict(lambda: [0, 0])
    for doc, cnt in tf.items():
        best, best_key = None, None
        for l in langs:
            s = prior[l] + sum(c * logp[(l, t)] for t, c in cnt.items())
            key = s * 64 - langid[l]
            if best_key is None or key > best_key:
                best, best_key = l, key
        truth = lang_of[doc]
        per[truth][0] += 1
        per[truth][1] += best == truth
    got = {
        r.lang: r
        for r in all_specs()["ml_multinomial_nb_lang"].spark(spark, SF).collect()
    }
    assert set(got) == set(per)
    for l, (n, corr) in per.items():
        assert got[l].n_docs == n
        assert got[l].n_correct == corr
        assert got[l].acc_ppm == corr * 1_000_000 // n
    # a trained language NB on language-distinct vocab must beat chance
    total_n = sum(v[0] for v in per.values())
    total_c = sum(v[1] for v in per.values())
    assert total_c / total_n > 1 / len(langs)


# ------------------------------------------------------- two-proportion z
def test_two_proportion_ab_python_oracle(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["conv"] = (
        (ev.event_type == "purchase")
        & ((ev.value * 100).round().astype(int) >= 12000)
    ).astype(int)
    per = ev.groupby("user_id").conv.max()
    n1 = sum(1 for u in per.index if u % 2 == 1)
    x1 = int(sum(v for u, v in per.items() if u % 2 == 1))
    n2 = len(per) - n1
    x2 = int(per.sum()) - x1
    r = all_specs()["analytics_two_proportion_ab"].spark(spark, SF).collect()[0]
    assert (r.n1, r.x1, r.n2, r.x2) == (n1, x1, n2, x2)
    assert r.p1_ppm == x1 * 1_000_000 // n1
    assert r.p2_ppm == x2 * 1_000_000 // n2
    assert r.p_pool_ppm == (x1 + x2) * 1_000_000 // (n1 + n2)
    import math

    pp = (x1 + x2) / (n1 + n2)
    z = (x1 / n1 - x2 / n2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    assert abs(r.z_score - round(z, 9)) < 2e-9


# --------------------------------------------------------- turning points
def test_turning_points_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    x = o.groupby("d").cents.sum().sort_index().to_numpy()
    n = len(x)
    t = sum(
        1
        for i in range(1, n - 1)
        if (x[i] > x[i - 1] and x[i] > x[i + 1])
        or (x[i] < x[i - 1] and x[i] < x[i + 1])
    )
    r = all_specs()["ts_turning_points_test"].spark(spark, SF).collect()[0]
    assert r.n_days == n
    assert r.n_turning == t
    assert r.expected_x3 == 2 * (n - 2)
    assert r.variance_x90 == 16 * n - 29


def test_turning_points_monotone_series_has_none():
    x = list(range(100))
    t = sum(
        1 for i in range(1, 99)
        if (x[i] > x[i - 1] and x[i] > x[i + 1])
        or (x[i] < x[i - 1] and x[i] < x[i + 1])
    )
    assert t == 0


# --------------------------------------------------------- somers d gamma
def test_somers_d_gamma_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["mo"] = pd.to_datetime(o.o_orderdate).dt.to_period("M")
    g = o.groupby("mo").agg(
        x=("o_orderkey", "size"),
        y=("o_totalprice", lambda s: int((s * 100).round().astype(int).sum())),
    )
    import itertools

    c = d = tx = ty = n0 = 0
    for (x1, y1), (x2, y2) in itertools.combinations(
        zip(g.x, g.y), 2
    ):
        n0 += 1
        s = (x2 - x1) * (y2 - y1)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
        if x1 == x2:
            tx += 1
        if y1 == y2:
            ty += 1
    r = all_specs()["ml_somers_d_gamma"].spark(spark, SF).collect()[0]
    assert (r.n0, r.concordant, r.discordant) == (n0, c, d)
    assert (r.ties_x, r.ties_y) == (tx, ty)
    assert r.gamma_ppm == _tdiv((c - d) * 1_000_000, c + d)
    assert r.somers_d_yx_ppm == _tdiv((c - d) * 1_000_000, n0 - tx)
    assert r.somers_d_xy_ppm == _tdiv((c - d) * 1_000_000, n0 - ty)


# ------------------------------------------------------ markov entropy rate
def test_markov_entropy_rate_python_oracle(spark):
    import math

    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans = Counter()
    for _, grp in ev.groupby("user_id"):
        types = list(grp.event_type)
        for a, b in zip(types[:-1], types[1:]):
            trans[(a, b)] += 1
    rowtot = Counter()
    for (a, _), cnt in trans.items():
        rowtot[a] += cnt
    hcond = Counter()
    for (a, _), cnt in trans.items():
        p = cnt / rowtot[a]
        hcond[a] += round(-p * math.log2(p) * 1_000_000)
    states = sorted(set(ev.event_type))
    v = {s: 200_000_000_000 for s in states}
    for _ in range(3):
        nv = Counter()
        for (a, b), cnt in trans.items():
            nv[b] += round(v[a] * (cnt / rowtot[a]))
        v = nv
    contrib = {s: v[s] * hcond[s] // 1_000_000 for s in rowtot}
    total = sum(contrib.values())
    got = {
        r.event_type: r
        for r in all_specs()["analytics_markov_entropy_rate"]
        .spark(spark, SF).collect()
    }
    assert set(got) == set(rowtot)
    for s in rowtot:
        r = got[s]
        assert r.n_transitions == rowtot[s]
        assert r.h_cond_micro == hcond[s]
        assert r.pi_pico == v[s]
        assert r.contrib_pico == contrib[s]
        assert r.entropy_rate_pico == total
    # bits-per-step must be within [0, log2(#states)]
    assert 0 <= total <= round(math.log2(len(states)) * 1e12)


# ----------------------------------------------------------- WoE / IV
def test_woe_iv_python_oracle(spark):
    import math

    c = pd.read_parquet(f"{SF}/customer.parquet")
    per = defaultdict(lambda: [0, 0])
    for seg, bal in zip(c.c_mktsegment, c.c_acctbal):
        per[seg][0 if bal >= 5000 else 1] += 1
    tp = sum(v[0] for v in per.values())
    tn = sum(v[1] for v in per.values())
    woe = {
        b: round((math.log2(p / tp) - math.log2(n / tn)) * 1_000_000)
        for b, (p, n) in per.items()
    }
    gap = {
        b: _tdiv(p * 1_000_000, tp) - _tdiv(n * 1_000_000, tn)
        for b, (p, n) in per.items()
    }
    iv = sum(_tdiv(gap[b] * woe[b], 1_000_000) for b in per)
    got = {
        r.bucket: r
        for r in all_specs()["ml_woe_information_value"].spark(spark, SF).collect()
    }
    assert set(got) == set(per)
    for b, (p, n) in per.items():
        r = got[b]
        assert (r.pos, r.neg) == (p, n)
        assert r.woe_microbits == woe[b]
        assert r.dist_gap_ppm == gap[b]
        assert r.iv_microbits == iv
    # IV is a sum of products with matching signs: each term >= 0 up to
    # quantization, so the total cannot be meaningfully negative
    assert iv >= -len(per)


# --------------------------------------------------------- mood median
def test_mood_median_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(int)
    m = float(cents.median())
    per = defaultdict(lambda: [0, 0])
    for g, v in zip(o.o_orderpriority, cents):
        per[g][0 if float(v) > m else 1] += 1
    ta = sum(v[0] for v in per.values())
    tb = sum(v[1] for v in per.values())
    t = ta + tb
    got = {
        r.grp: r
        for r in all_specs()["analytics_mood_median_test"].spark(spark, SF).collect()
    }
    assert set(got) == set(per)
    for g, (a, b) in per.items():
        r = got[g]
        assert (r.above, r.at_or_below) == (a, b)
        ng = a + b
        expect = _tdiv((a * t - ng * ta) ** 2 * 1_000_000, ng * ta * t) \
            + _tdiv((b * t - ng * tb) ** 2 * 1_000_000, ng * tb * t)
        assert r.chi2_contrib_micro == expect


# --------------------------------------------------------- script profile
def test_script_profile_python_oracle(spark):
    import re

    d = pd.read_parquet(f"{SF}/documents.parquet")
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for lang, text in zip(d.lang, d.text):
        p = per[lang]
        p[0] += 1
        p[1] += len(text)
        p[2] += len(re.sub(r"[^a-zA-Z]", "", text))
        p[3] += len(re.sub(r"[^0-9]", "", text))
        p[4] += len(re.sub("[^一-鿿]", "", text))
        p[5] += len(re.sub("[^À-ÿĀ-ſ]", "", text))
    got = {
        r.lang: r
        for r in all_specs()["text_script_profile"].spark(spark, SF).collect()
    }
    assert set(got) == set(per)
    for lang, (nd, nc, la, dg, cj, le) in per.items():
        r = got[lang]
        assert (r.n_docs, r.n_chars) == (nd, nc)
        assert r.latin_ppm == la * 1_000_000 // nc
        assert r.digit_ppm == dg * 1_000_000 // nc
        assert r.cjk_ppm == cj * 1_000_000 // nc
        assert r.latin_ext_ppm == le * 1_000_000 // nc
    # shares are fractions of the same denominator, never above 1
    for r in got.values():
        assert max(r.latin_ppm, r.digit_ppm, r.cjk_ppm,
                   r.latin_ext_ppm) <= 1_000_000
    # on THIS synthetic corpus the 'zh' shard is ASCII text — the audit's
    # whole point is that it reports cjk_ppm == 0 there (the
    # mislabeled-shard signal), rather than trusting the lang column
    if "zh" in got:
        assert got["zh"].cjk_ppm == 0 and got["zh"].latin_ppm > 500_000


def test_script_profile_classes_detect_real_cjk():
    import re

    s = "hello 世界 café 123"
    assert len(re.sub("[^一-鿿]", "", s)) == 2      # 世界
    assert len(re.sub("[^À-ÿĀ-ſ]", "", s)) == 1    # é
    assert len(re.sub(r"[^0-9]", "", s)) == 3
    assert len(re.sub(r"[^a-zA-Z]", "", s)) == 8   # hello + caf



# -------------------------------------------------- values spine, distinct on
def test_values_spine_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    rg = pd.read_parquet(f"{SF}/region.parquet")
    o = o[pd.to_datetime(o.o_orderdate) >= pd.Timestamp("1997-01-01")]
    m = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    m["cents"] = (m.o_totalprice * 100).round().astype(int)
    rev = m.groupby("r_name").cents.sum().to_dict()
    targets = {"AFRICA": 500000000, "AMERICA": 900000000,
               "ASIA": 700000000, "EUROPE": 800000000,
               "MIDDLE EAST": 400000000}
    got = {
        r.region_name: r
        for r in all_specs()["sql_front_values_spine"].spark(spark, SF).collect()
    }
    assert set(got) == set(targets)
    for rn, tgt in targets.items():
        r = got[rn]
        assert r.target_cents == tgt
        assert r.revenue_cents == int(rev.get(rn, 0))
        assert r.target_met == (1 if r.revenue_cents >= tgt else 0)


def test_distinct_on_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    c["bal"] = (c.c_acctbal * 100).round().astype(int)
    expect = {}
    for nk, grp in c.groupby("c_nationkey"):
        top = grp.sort_values(["bal", "c_custkey"],
                              ascending=[False, True]).iloc[0]
        expect[nk] = (int(top.c_custkey), int(top.bal))
    got = {
        r.c_nationkey: (r.c_custkey, r.bal_cents)
        for r in all_specs()["sql_front_distinct_on"].spark(spark, SF).collect()
    }
    assert got == expect


# ---------------------------------------------------- krippendorff alpha
def test_krippendorff_alpha_python_oracle(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    c1s = []
    for v in emb.embedding:
        c1s.append(sum(
            1 for d in range(4) if round(float(v[d]) * 1_000_000) > 0
        ))
    m, n_items = 4, len(c1s)
    n1 = sum(c1s)
    n0 = m * n_items - n1
    s_pairs = sum(c * (m - c) for c in c1s)
    n_c = m * n_items
    alpha = 1_000_000 - _tdiv((n_c - 1) * s_pairs * 1_000_000, 3 * n1 * n0)
    r = all_specs()["ml_krippendorff_alpha_binary"].spark(spark, SF).collect()[0]
    assert (r.n_items, r.k_raters) == (n_items, m)
    assert (r.n1, r.n0, r.s_pairs, r.n_c) == (n1, n0, s_pairs, n_c)
    assert r.alpha_ppm == alpha


def test_krippendorff_alpha_closed_form_matches_pairwise():
    # verify the collapsed formula against the definitional coincidence
    # computation on a small panel: Do = sum_i 2*c1*c0/(m-1) / n_c,
    # De = 2*n1*n0 / (n_c*(n_c-1))
    c1s = [4, 3, 1, 0, 2, 4, 1]
    m = 4
    n_items = len(c1s)
    n_c = m * n_items
    n1 = sum(c1s)
    n0 = n_c - n1
    do = sum(2 * c * (m - c) / (m - 1) for c in c1s) / n_c
    de = 2 * n1 * n0 / (n_c * (n_c - 1))
    alpha_direct = 1 - do / de
    s_pairs = sum(c * (m - c) for c in c1s)
    alpha_closed = 1 - (n_c - 1) * s_pairs / (3 * n1 * n0)
    assert abs(alpha_direct - alpha_closed) < 1e-12


# ------------------------------------------------------------- VaR / CVaR
def test_var_cvar_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    daily = o.groupby("d").cents.sum().sort_index()
    x = daily.to_numpy()
    days = list(daily.index)
    diffs = sorted(
        (int(b) - int(a), d)
        for a, b, d in zip(x[:-1], x[1:], days[1:])
    )
    n1 = len(diffs)
    k = n1 // 20
    bottom = diffs[:k]
    var_c = bottom[-1][0]
    cvar = _tdiv(sum(v for v, _ in bottom) * 100, k)
    r = all_specs()["ts_value_at_risk_cvar"].spark(spark, SF).collect()[0]
    assert (r.n_changes, r.k) == (n1, k)
    assert r.var_cents == var_c
    assert r.cvar_cents_x100 == cvar
    # CVaR is at least as extreme as VaR (coherence sanity)
    assert r.cvar_cents_x100 <= r.var_cents * 100


# ------------------------------------------------------ matthews corrcoef
def test_matthews_corrcoef_python_oracle(spark):
    import math

    e = pd.read_parquet(f"{SF}/events.parquet")
    actual = e.event_type == "purchase"
    predicted = e.value > 10.0
    tp = int((actual & predicted).sum())
    fp = int((~actual & predicted).sum())
    fn = int((actual & ~predicted).sum())
    tn = int((~actual & ~predicted).sum())
    num = float(tp) * tn - float(fp) * fn
    den = math.sqrt(
        float(tp + fp) * float(tp + fn) * float(tn + fp) * float(tn + fn)
    )
    r = all_specs()["ml_matthews_corrcoef"].spark(spark, SF).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    assert r.n == tp + fp + fn + tn == len(e)
    assert r.mcc == round(num / den, 6)
    ba = (tp / (tp + fn) + tn / (tn + fp)) / 2.0
    assert r.balanced_accuracy == round(ba, 6)
    assert -1.0 <= r.mcc <= 1.0


def test_matthews_corrcoef_known_values():
    # perfect classifier: MCC = 1; inverted: MCC = -1; random: 0
    import math

    def mcc(tp, fp, fn, tn):
        num = tp * tn - fp * fn
        den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        return num / den

    assert mcc(50, 0, 0, 50) == 1.0
    assert mcc(0, 50, 50, 0) == -1.0
    assert mcc(25, 25, 25, 25) == 0.0


# ------------------------------------------------------- hosmer-lemeshow
def test_hosmer_lemeshow_python_oracle(spark):
    c = pd.read_parquet(f"{SF}/customer.parquet")
    cents = (c.c_acctbal * 100).round().astype(int)
    y = (c.c_mktsegment == "BUILDING").astype(int)
    lo, hi = int(cents.min()), int(cents.max())
    rng = hi - lo
    f_rel = cents - lo
    bins = (f_rel * 10 // rng).clip(upper=9)
    rows = {}
    for b in range(10):
        mask = bins == b
        n_k = int(mask.sum())
        obs = int(y[mask].sum())
        sum_rel = int(f_rel[mask].sum())
        e_k = sum_rel / rng
        term = (
            round((obs - e_k) ** 2 / (e_k * (1 - e_k / n_k)) * 1_000_000)
            if 0 < e_k < n_k
            else 0
        )
        rows[b] = (n_k, obs, round(e_k * 1_000_000), term)
    out = all_specs()["ml_hosmer_lemeshow_gof"].spark(spark, SF).collect()
    assert len(out) == 10
    for r in out:
        n_k, obs, exp_micro, term = rows[r.bin]
        assert (r.n_k, r.obs_pos) == (n_k, obs)
        assert r.exp_pos_micro == exp_micro
        assert r.hl_term_micro == term
    # the bins partition the population
    assert sum(r.n_k for r in out) == len(c)


# --------------------------------------------------------------- cohens d
def test_cohens_d_python_oracle(spark):
    import math

    e = pd.read_parquet(f"{SF}/events.parquet")
    v = (e.value * 100).round().astype(int)
    purch = e.event_type == "purchase"
    g1, g2 = v[purch], v[~purch]
    n1, n2 = len(g1), len(g2)
    sum1, sum2 = int(g1.sum()), int(g2.sum())
    sq1 = int((g1.astype("int64") ** 2).sum())
    sq2 = int((g2.astype("int64") ** 2).sum())
    mean_diff = sum1 / n1 - sum2 / n2
    ss1 = sq1 - sum1 * sum1 / n1
    ss2 = sq2 - sum2 * sum2 / n2
    sp = math.sqrt((ss1 + ss2) / (n1 + n2 - 2))
    d = mean_diff / sp
    g = d * (1 - 3 / (4 * (n1 + n2) - 9))
    r = all_specs()["analytics_cohens_d_effect_size"].spark(spark, SF).collect()[0]
    assert (r.n_purchase, r.n_other) == (n1, n2)
    assert r.mean_diff == round(mean_diff / 100, 6)
    assert r.cohens_d == round(d, 6)
    assert r.hedges_g == round(g, 6)
    # Hedges' correction shrinks |d| toward zero
    assert abs(r.hedges_g) <= abs(r.cohens_d)


# ------------------------------------------------------ symmetric diff
def test_symmetric_diff_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    a = set(o.loc[o.o_orderstatus == "F", "o_custkey"])
    b = set(o.loc[o.o_orderstatus == "O", "o_custkey"])
    out = all_specs()["set_symmetric_diff_tagged"].spark(spark, SF).collect()
    left = {r.custkey for r in out if r.side == "finished_only"}
    right = {r.custkey for r in out if r.side == "open_only"}
    assert left == a - b
    assert right == b - a
    assert len(out) == len(a - b) + len(b - a)  # no duplicate rows
    assert not (left & right)

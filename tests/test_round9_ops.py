"""Independent (pure-Python) oracles and behavioral tests for round-9
operators — so a bug mirrored into both engines' shared formulation
cannot hide behind the parity gate (the round-8 test-file pattern)."""

from __future__ import annotations

import itertools
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    """Truncating (toward-zero) integer division — Spark DIV / DuckDB //."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# ---------------------------------------------------------------- wilcoxon
def test_wilcoxon_signed_rank_python_oracle(spark):
    per = (
        pd.read_parquet(f"{SF}/orders.parquet")
        .assign(
            d=lambda f: pd.to_datetime(f.o_orderdate).dt.year,
            cents=lambda f: (f.o_totalprice * 100).round().astype(int),
        )
        .query("d in (1995, 1996)")
        .pivot_table(index="o_custkey", columns="d", values="cents",
                     aggfunc="sum")
        .dropna()
    )
    diffs = [int(a) - int(b) for a, b in zip(per[1995], per[1996]) if a != b]
    n = len(diffs)
    # average ranks of |d| with ties, doubled to stay integral
    sorted_abs = sorted(abs(d) for d in diffs)
    rank2 = {}
    i = 0
    while i < len(sorted_abs):
        j = i
        while j < len(sorted_abs) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        rank2[sorted_abs[i]] = (i + 1) + j  # 2 * average of ranks i+1..j
        i = j
    w2 = sum(rank2[abs(d)] for d in diffs if d > 0)
    ties = Counter(abs(d) for d in diffs)
    tie_cubes = sum(t**3 - t for t in ties.values())
    r = all_specs()["ml_wilcoxon_signed_rank"].spark(spark, SF).collect()[0]
    assert r.n_pairs == n
    assert r.w_plus_doubled == w2
    assert r.mean_doubled == n * (n + 1) // 2
    assert r.variance_x48 == 2 * n * (n + 1) * (2 * n + 1) - tie_cubes


# ---------------------------------------------------------------- runs test
def test_runs_test_python_oracle(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        o.assign(
            d=lambda f: pd.to_datetime(f.o_orderdate).dt.date,
            cents=lambda f: (f.o_totalprice * 100).round().astype(int),
        )
        .groupby("d")["cents"].sum().sort_index()
    )
    diffs = daily.diff().dropna()
    signs = [1 if v > 0 else 0 for v in diffs if v != 0]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    n = n1 + n2
    runs = 1 + sum(1 for a, b in itertools.pairwise(signs) if a != b)
    r = all_specs()["ts_runs_test_wald_wolfowitz"].spark(spark, SF).collect()[0]
    assert (r.n, r.n_plus, r.n_minus, r.n_runs) == (n, n1, n2, runs)
    assert r.expected_runs_micro == 1_000_000 + _tdiv(2_000_000 * n1 * n2, n)
    assert r.var_runs_micro == _tdiv(
        2 * n1 * n2 * (2 * n1 * n2 - n) * 1_000_000, n * n * (n - 1)
    )


# ------------------------------------------------- idle-timeout sessions
def test_idle_timeout_sessions_batch_split_invariant(spark):
    """The emitted closed-session set must be identical at 2 vs 4 replay
    micro-batches (timers fire through the no-data final batch), and must
    equal the millisecond-clock batch rule calibrated in round 9."""
    from wal_consumer_spark.plans.streaming_batch import (
        _SESSION_GAP_US,
        _make_timeout_sessionize_fn,
        _run_stateful_replay,
    )
    from wal_consumer_spark.sources.tables import load_table

    e = load_table(spark, SF_SMOKE, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    outs = {}
    for nf in (2, 4):
        out = _run_stateful_replay(
            spark,
            e,
            read_schema="user_id long, ts_us long",
            state_fn=_make_timeout_sessionize_fn(_SESSION_GAP_US),
            out_schema=(
                "user_id long, session_start_us long, "
                "session_end_us long, n_events long"
            ),
            state_schema="start long, last long, n long",
            prefix="tosess_test",
            n_files=nf,
            timeout="EventTimeTimeout",
            watermark_delay="0 seconds",
        )
        outs[nf] = sorted(map(tuple, out.collect()))
    assert outs[2] == outs[4], "timeout emission is batch-split-dependent"
    # pure-Python islands oracle with the ms timer predicate
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    us = pd.to_datetime(ev.ts).astype("datetime64[us]").astype("int64")
    mx = int(us.max())
    expected = []
    for uid, grp in pd.DataFrame({"u": ev.user_id, "t": us}).groupby("u"):
        ts = sorted(int(t) for t in grp.t)
        start = last = None
        n = 0
        islands = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > _SESSION_GAP_US:
                islands.append((int(uid), start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        islands.append((int(uid), start, last, n))
        expected.extend(
            s for s in islands
            if (s[2] + _SESSION_GAP_US) // 1000 < mx // 1000
        )
    assert outs[4] == sorted(expected)


# ------------------------------------------------------- edit distance
def test_levenshtein_semantics_and_ascii_corpus(spark):
    """DuckDB levenshtein counts bytes, Spark counts chars — the oracle
    equivalence of text_edit_distance_near_pairs rests on the corpus
    being ASCII. Pin both facts."""
    import duckdb

    rows = [("kitten", "sitting"), ("", "xy"), ("same", "same")]
    df = spark.createDataFrame(rows, "a string, b string").select(
        F.levenshtein("a", "b").alias("d")
    )
    sp = [r.d for r in df.collect()]
    dk = [
        duckdb.sql(f"SELECT levenshtein('{a}', '{b}')").fetchone()[0]
        for a, b in rows
    ]
    assert sp == dk == [3, 2, 0]
    # the known divergence case, so the assumption is visible
    assert (
        duckdb.sql("SELECT levenshtein('wörld', 'world')").fetchone()[0] == 2
    )  # bytes
    for sf in (SF_SMOKE, SF):
        non_ascii = duckdb.sql(
            f"SELECT count_if(strlen(text) <> length(text)) "
            f"FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()[0]
        assert non_ascii == 0, f"corpus at {sf} is no longer ASCII"


# ------------------------------------------- permutation importance
def test_permutation_importance_closed_form_matches_enumeration():
    """The analytic E[acc] over ALL feature permutations equals the
    brute-force average on a case small enough to enumerate."""
    feats = [0, 0, 1, 1, 2, 2]
    labels = [1, 1, 1, 0, 0, 0]
    thr = 1  # left: feat <= 0 (bins 0), right: feat >= 1
    nl = sum(1 for f in feats if f < thr)
    nt, pt = len(labels), sum(labels)
    pl = sum(y for f, y in zip(feats, labels) if f < thr)
    nr, pr = nt - nl, pt - pl
    pred_l = 1 if 2 * pl >= nl else 0
    pred_r = 1 if 2 * pr >= nr else 0
    accs = []
    for perm in itertools.permutations(range(nt)):
        correct = 0
        for i, pi in enumerate(perm):
            side_pred = pred_l if feats[pi] < thr else pred_r
            correct += side_pred == labels[i]
        accs.append(correct / nt)
    brute = sum(accs) / len(accs)
    analytic = (
        nl * (pt if pred_l == 1 else nt - pt)
        + nr * (pt if pred_r == 1 else nt - pt)
    ) / (nt * nt)
    assert abs(brute - analytic) < 1e-12


def test_permutation_importance_consistent_with_stump(spark):
    """Best split and counts must match ml_decision_stump's training."""
    stump = all_specs()["ml_decision_stump"].spark(spark, SF).collect()[0]
    imp = all_specs()["ml_permutation_importance_stump"].spark(
        spark, SF
    ).collect()[0]
    assert imp.threshold_bin == stump.threshold_bin
    assert (imp.n_left, imp.pos_left) == (stump.n_left, stump.pos_left)
    assert imp.acc_ppm >= imp.perm_acc_ppm  # trained split beats chance
    assert imp.importance_ppm == imp.acc_ppm - imp.perm_acc_ppm


# ------------------------------------------------- arrival inversion cap
def test_arrival_inversion_cap_exact_when_under_k(spark):
    """With per-entity op counts <= K the sampled audit equals the exact
    all-pairs formulation (pure-Python oracle on a small synthetic WAL)."""
    import hashlib

    rows = [(i, i % 7) for i in range(70)]  # 7 entities x 10 ops, 10 < K=16
    per = {}
    for i, ent in rows:
        ak = hashlib.md5(f"{i}:arr".encode()).hexdigest()
        per.setdefault(ent, []).append((ak, i))
    deciles = Counter()
    for ent, ops in per.items():
        inv = pairs = 0
        for (a1, i1), (a2, i2) in itertools.combinations(sorted(ops), 2):
            pairs += 1
            inv += i1 > i2
        ppm = inv * 1_000_000 // pairs
        deciles[ppm // 100_000] += 1
    wal = spark.createDataFrame(rows, "id long, entity_id long")
    import wal_consumer_spark.plans.cdc as cdc_mod

    orig = cdc_mod.synthetic_wal
    try:
        cdc_mod.synthetic_wal = lambda _s, _d: wal
        out = cdc_mod.cdc_arrival_inversion_audit(spark, SF)
        got = {r.inv_decile: r.n_entities for r in out.collect()}
        capped = sum(r.n_entities_capped for r in out.collect())
    finally:
        cdc_mod.synthetic_wal = orig
    assert got == dict(deciles)
    assert capped == 0  # 10 ops < K: nothing sampled, everything exact


# ---------------------------------------------------------- mann-whitney U
def test_mann_whitney_u_python_oracle(spark):
    """Rank-sum formulation (average ranks over the combined sample) —
    independent of the plan's cumulative-count formulation."""
    ev = pd.read_parquet(f"{SF}/events.parquet").assign(
        cents=lambda f: (f.value * 100).round().astype(int)
    )
    groups = {
        t: sorted(g.cents.tolist()) for t, g in ev.groupby("event_type")
    }
    types = sorted(groups)
    expected = {}
    for a, b in itertools.combinations(types, 2):
        combined = sorted(groups[a] + groups[b])
        # doubled average rank per distinct value
        rank2, i = {}, 0
        while i < len(combined):
            j = i
            while j < len(combined) and combined[j] == combined[i]:
                j += 1
            rank2[combined[i]] = (i + 1) + j
            i = j
        r2_a = sum(rank2[v] for v in groups[a])
        n_a, n_b = len(groups[a]), len(groups[b])
        two_u = r2_a - n_a * (n_a + 1)  # 2*(R_a - n_a(n_a+1)/2)
        ties = Counter(combined)
        tie_cubes = sum(t**3 - t for t in ties.values())
        expected[(a, b)] = (n_a, n_b, two_u, tie_cubes)
    rows = all_specs()["analytics_mann_whitney_u"].spark(spark, SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n_a, n_b, two_u, tie_cubes = expected[(r.group_a, r.group_b)]
        assert (r.n_a, r.n_b) == (n_a, n_b), (r.group_a, r.group_b)
        assert r.two_u_a == two_u, (r.group_a, r.group_b)
        assert r.tie_cubes == tie_cubes, (r.group_a, r.group_b)


def test_mann_whitney_u_detects_shift():
    """Sanity on the closed form: a clean location shift with no overlap
    gives U = n_a*n_b (all a-wins) and a large positive z."""
    import math

    n_a = n_b = 20
    two_u = 2 * n_a * n_b  # every a beats every b, no ties
    tie_cubes = 0
    n = n_a + n_b
    z = (two_u / 2 - n_a * n_b / 2) / math.sqrt(
        n_a * n_b / 12 * ((n + 1) - tie_cubes / (n * (n - 1)))
    )
    assert z > 5


# ------------------------------------------------------------- bloom audit
def test_bloom_fpr_audit_python_oracle(spark):
    """Recompute the 2^16-bit/3-hash Bloom membership with hashlib —
    independent of both engines' md5/conv SQL paths."""
    import hashlib

    ok = pd.read_parquet(f"{SF}/orders.parquet").o_orderkey
    build = sorted(set(int(k) for k in ok if k % 2 == 0))
    probe = sorted(set(int(k) for k in ok if k % 2 == 1))

    def pos(key, i):
        h = hashlib.md5(f"{key}:b{i}".encode()).hexdigest()[:8]
        return int(h, 16) % 65536

    bits = {pos(k, i) for k in build for i in range(3)}
    fp = sum(
        1 for k in probe if all(pos(k, i) in bits for i in range(3))
    )
    r = all_specs()["agg_bloom_filter_fpr_audit"].spark(spark, SF).collect()[0]
    assert r.n_build == len(build)
    assert r.n_probes == len(probe)
    assert r.n_set_bits == len(bits)
    assert r.n_false_positives == fp
    assert r.fpr_ppm == fp * 1_000_000 // len(probe)
    assert r.fill_ratio_ppm == len(bits) * 1_000_000 // 65536


# ----------------------------------------------------------- shapley attr
def test_shapley_attribution_python_oracle(spark):
    """Enumerate all 4! channel permutations and average marginal
    contributions directly — independent of the plan's subset-weight
    closed form; also pins the efficiency axiom."""
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts"] = pd.to_datetime(ev.ts)
    fp = (
        ev[ev.event_type == "purchase"]
        .groupby("user_id")
        .ts.min()
        .rename("fp_ts")
    )
    pre = ev[ev.event_type != "purchase"].join(fp, on="user_id", how="inner")
    pre = pre[pre.ts < pre.fp_ts]
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    masks = (
        pre.assign(b=lambda f: f.event_type.map(bits))
        .groupby("user_id")
        .b.agg(lambda s: int(pd.Series(sorted(set(s))).sum()))
    )
    mask_by_user = {u: int(masks.get(u, 0)) for u in fp.index}
    counts = Counter(mask_by_user.values())

    def v(s_mask: int) -> int:
        return sum(n for m, n in counts.items() if m | s_mask == s_mask)

    phi24 = {c: 0 for c in bits}
    for perm in itertools.permutations(bits):
        s = 0
        for c in perm:
            phi24[c] += v(s | bits[c]) - v(s)
            s |= bits[c]
    rows = {
        r.channel: r
        for r in all_specs()["analytics_shapley_attribution"]
        .spark(spark, SF)
        .collect()
    }
    assert set(rows) == set(bits)
    for c in bits:
        assert rows[c].phi_x24 == phi24[c], c
        assert rows[c].n_converted == len(fp)
        assert rows[c].total_gain_x24 == 24 * (v(15) - v(0))
    # efficiency axiom: Shapley values exactly split the coalition gain
    assert sum(phi24.values()) == 24 * (v(15) - v(0))


# -------------------------------------------------------------- kneser-ney
def test_kneser_ney_python_oracle(spark):
    """Textbook KN formulation with float d=0.75 — independent of the
    plan's exact-rational common-denominator form (ppm floor checked
    against the float value within 1 micro)."""
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    big, c1, n1left, contset = Counter(), Counter(), Counter(), {}
    for text in docs.text:
        toks = text.lower().strip().split()
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
    for (a, b), c in big.items():
        c1[a] += c
    left_types = Counter(a for a, _ in big)
    cont = Counter(b for _, b in big)
    n_types = len(big)
    rows = (
        all_specs()["text_kneser_ney_bigram"].spark(spark, SF).collect()
    )
    assert len(rows) == 20
    top = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.w1, r.w2) for r in rows] == [p for p, _ in top]
    d = 0.75
    for r in rows:
        assert r.c12 == big[(r.w1, r.w2)]
        assert r.c1 == c1[r.w1]
        assert r.n1plus_left == left_types[r.w1]
        assert r.n_cont_right == cont[r.w2]
        assert r.n_types == n_types
        p_kn = (
            max(r.c12 - d, 0) / r.c1
            + d * r.n1plus_left / r.c1 * r.n_cont_right / n_types
        )
        assert abs(r.pkn_ppm - p_kn * 1e6) <= 1.0, (r.w1, r.w2)
        lam = d * r.n1plus_left / r.c1
        assert abs(r.lambda_ppm - lam * 1e6) <= 1.0


# ------------------------------------------------- stream-stream join
def test_interval_join_batch_split_invariant(spark):
    """The stream-stream interval join must produce the identical lag
    histogram whether the replay arrives as 2 or 4 micro-batches."""
    from wal_consumer_spark.plans.streaming_batch import (
        stream_click_purchase_interval_join,
    )

    a = sorted(
        map(tuple, stream_click_purchase_interval_join(spark, SF, n_files=4).collect())
    )
    b = sorted(
        map(tuple, stream_click_purchase_interval_join(spark, SF, n_files=2).collect())
    )
    assert a == b
    assert len(a) >= 3  # non-vacuous: several lag buckets populated


# ------------------------------------------------------------- granger(1)
def test_granger_causality_python_oracle(spark):
    """numpy least-squares on the explicit design matrices — independent
    of the plan's centered-moment Cramer solve."""
    import numpy as np

    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["d"] = pd.to_datetime(od.o_orderdate).dt.normalize()
    daily = (
        od.assign(cents=lambda f: (f.o_totalprice * 100).round().astype(int))
        .groupby("d")
        .agg(rev=("cents", "sum"), nord=("o_orderkey", "count"))
        .sort_index()
    )
    nxt = daily.index + pd.Timedelta(days=1)
    both = daily.index.intersection(nxt)
    cur = daily.loc[both]
    prev = daily.loc[both - pd.Timedelta(days=1)]
    rows = {
        r.direction: r
        for r in all_specs()["ts_granger_causality_daily"]
        .spark(spark, SF)
        .collect()
    }
    for direction, (y, y1, x1) in {
        "orders_cause_revenue": (
            cur.rev.values,
            prev.rev.values,
            prev.nord.values,
        ),
        "revenue_cause_orders": (
            cur.nord.values,
            prev.nord.values,
            prev.rev.values,
        ),
    }.items():
        y = y.astype(float)
        n = len(y)
        Xu = np.column_stack([np.ones(n), y1, x1]).astype(float)
        Xr = np.column_stack([np.ones(n), y1]).astype(float)
        bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
        br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
        rss_u = float(((y - Xu @ bu) ** 2).sum())
        rss_r = float(((y - Xr @ br) ** 2).sum())
        f = (rss_r - rss_u) * (n - 3) / rss_u
        r = rows[direction]
        assert r.n_days == n
        assert abs(r.beta_lag_self - bu[1]) < 1e-4
        assert abs(r.beta_lag_cross - bu[2]) < 1e-4
        assert abs(r.f_stat - f) < max(1e-3, abs(f) * 1e-3)
        assert r.granger_05 == (f > 3.84)


# ----------------------------------------------------------------- PQ audit
def test_product_quantization_python_oracle(spark):
    """Direct numpy replication of the fixed-point PQ pipeline (seeds,
    argmin assignment, floored-mean Lloyd step, re-assignment)."""
    import numpy as np

    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values("vec_id")
    vids = emb.vec_id.to_numpy()
    X = (
        np.round(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 1e6)
        .astype(np.int64)
        + 2_000_000
    )
    n, d = X.shape
    assert d == 64
    expected = {}
    for sub in range(8):
        Xs = X[:, sub * 8 : sub * 8 + 8]
        seeds = Xs[vids < 16]  # 16 x 8, ordered by vec_id
        dist1 = ((Xs[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
        pick1 = (dist1 * 16 + np.arange(16)).min(axis=1)
        a1c, a1d = pick1 % 16, pick1 // 16
        cb2 = {}
        for c in np.unique(a1c):
            mem = Xs[a1c == c]
            cb2[c] = mem.sum(axis=0) // len(mem)  # floored integer mean
        codes = sorted(cb2)
        C2 = np.stack([cb2[c] for c in codes])
        dist2 = ((Xs[:, None, :] - C2[None, :, :]) ** 2).sum(axis=2)
        pick2 = (dist2 * 16 + np.array(codes)).min(axis=1)
        a2c, a2d = pick2 % 16, pick2 // 16
        buckets = Counter(a2c.tolist())
        expected[sub] = dict(
            n_points=n,
            used_codes_r2=len(buckets),
            max_bucket_r2=max(buckets.values()),
            avg_dist_r1=int(a1d.sum()) // n,
            avg_dist_r2=int(a2d.sum()) // n,
        )
    rows = {
        r.sub: r
        for r in all_specs()["sim_product_quantization_audit"]
        .spark(spark, SF)
        .collect()
    }
    assert set(rows) == set(range(8))
    for sub, exp in expected.items():
        r = rows[sub]
        for k, v in exp.items():
            assert getattr(r, k) == v, (sub, k, getattr(r, k), v)
        assert r.lloyd_improved == (exp["avg_dist_r2"] <= exp["avg_dist_r1"])


# ----------------------------------------------------------- depth-2 tree
def test_decision_tree_depth2_python_oracle(spark):
    """Brute-force split enumeration in pure Python over the raw rows —
    independent of the plan's histogram/cumulative-window formulation."""
    od = pd.read_parquet(f"{SF}/orders.parquet")
    f1 = (od.o_totalprice.astype("float64").round(2) // 1000).astype(int)
    f2 = pd.to_datetime(od.o_orderdate).dt.year.astype(int)
    y = (od.o_orderpriority == "1-URGENT").astype(int)

    def best(f, yy):
        nt, pt = len(yy), int(yy.sum())
        cands = sorted(f.unique())
        out = None
        for t in cands:
            m = f <= t
            nl, pl = int(m.sum()), int(yy[m].sum())
            if nl == 0 or nl == nt:
                continue
            nr, pr = nt - nl, pt - pl
            g = (
                nl * (1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2)
                + nr * (1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2)
            ) / nt
            if out is None or g < out[1] - 1e-15:
                out = (t, g, nl, nr, pl, pr)
        return out

    t1, g1, nl1, nr1, pl1, pr1 = best(f1, y)
    rows = {
        r.node: r
        for r in all_specs()["ml_decision_tree_depth2"].spark(spark, SF).collect()
    }
    assert rows["root"].threshold_bin == t1
    assert (rows["root"].n_left, rows["root"].n_right) == (nl1, nr1)
    assert (rows["root"].pos_left, rows["root"].pos_right) == (pl1, pr1)
    assert abs(rows["root"].weighted_gini - g1) < 1e-6
    for node, m in (("left", f1 <= t1), ("right", f1 > t1)):
        t, g, nl, nr, pl, pr = best(f2[m], y[m])
        r = rows[node]
        assert r.split_feature == "order_year"
        assert r.threshold_bin == t, node
        assert (r.n_left, r.n_right, r.pos_left, r.pos_right) == (nl, nr, pl, pr)
        assert abs(r.weighted_gini - g) < 1e-6


def test_left_outer_join_batch_split_invariant(spark):
    """Watermark-closed unmatched emission must not depend on how the
    replay is batched: the FINAL watermark (min side max - delay) is the
    same at 2 and 4 files, so emitted sets must be identical."""
    from wal_consumer_spark.plans.streaming_batch import (
        stream_left_outer_join_watermark_close,
    )

    a = sorted(
        map(
            tuple,
            stream_left_outer_join_watermark_close(spark, SF, n_files=4).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            stream_left_outer_join_watermark_close(spark, SF, n_files=2).collect(),
        )
    )
    assert a == b
    d = dict((r[0], r[1]) for r in a)
    assert d["matched"] > 0 and d["unmatched_closed"] > 0


# ----------------------------------------------------------- louvain sweep
def test_louvain_first_sweep_python_oracle(spark):
    """networkx-free pure-Python replication: build the co-purchase
    graph, apply the min-degree-neighbor merge rule, recompute exact
    integer modularity numerators."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    op = set(map(tuple, li.drop_duplicates().itertuples(index=False)))
    by_o = {}
    for o, p in op:
        by_o.setdefault(o, set()).add(p)
    edges = set()
    for ps in by_o.values():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for bb in ps[i + 1:]:
                edges.add((a, bb))
    deg = Counter()
    adj = {}
    for a, bb in edges:
        deg[a] += 1
        deg[bb] += 1
        adj.setdefault(a, set()).add(bb)
        adj.setdefault(bb, set()).add(a)
    m = len(edges)
    lbl = {}
    for v, nbrs in adj.items():
        kmin = min(deg[u] for u in nbrs)
        umin = min(u for u in nbrs if deg[u] == kmin)
        lbl[v] = umin if 2 * m > deg[v] * kmin else v
    comm_sz = Counter(lbl.values())
    d_c = Counter()
    for v, c in lbl.items():
        d_c[c] += deg[v]
    intra = sum(1 for a, bb in edges if lbl[a] == lbl[bb])
    q_single = -sum(k * k for k in deg.values())
    q_after = 4 * m * intra - sum(d * d for d in d_c.values())
    r = all_specs()["graph_louvain_first_sweep"].spark(spark, SF).collect()[0]
    assert r.n_nodes == len(adj)
    assert r.n_edges == m
    assert r.n_moved == sum(1 for v, c in lbl.items() if c != v)
    assert r.n_communities == len(comm_sz)
    assert r.top_community_size == max(comm_sz.values())
    assert r.n_intra_edges == intra
    assert r.q_singleton_x4m2 == q_single
    assert r.q_after_x4m2 == q_after
    assert r.improved == (q_after > q_single)


# ---------------------------------------------------- absorption horizon
def test_markov_absorption_python_oracle(spark):
    """Direct dict-based value iteration with the same micro quantization
    — independent of both engines' join formulation — plus monotone
    convergence sanity."""
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        ts = g.event_type.tolist()
        for a, b in zip(ts, ts[1:]):
            trans[(a, b)] += 1
    outdeg = Counter()
    for (a, _), c in trans.items():
        outdeg[a] += c
    p = {(a, b): c / outdeg[a] for (a, b), c in trans.items()}
    states = sorted(ev.event_type.unique())
    v = {s: 0 for s in states}
    hist = []
    for _ in range(8):
        nv = {}
        for s in states:
            if s == "purchase":
                nv[s] = 0
            else:
                nv[s] = 1_000_000 + sum(
                    round(p[(s, t)] * v[t]) for t in states if (s, t) in p
                )
        v = nv
        hist.append(dict(v))
    rows = {
        r.event_type: r
        for r in all_specs()["analytics_markov_absorption_time"]
        .spark(spark, SF)
        .collect()
    }
    assert set(rows) == set(states)
    for s in states:
        assert rows[s].expected_steps_micro == v[s], s
    assert rows["purchase"].expected_steps_micro == 0
    # value iteration from 0 is monotone nondecreasing per state
    for s in states:
        seq = [h[s] for h in hist]
        assert seq == sorted(seq), s


# ------------------------------------------------------------ burrows delta
def test_burrows_delta_python_oracle(spark):
    """Classic textbook formulation (rates -> per-word z-score -> mean
    |dz|) in pure Python with the same ppm/micro quantization points."""
    import math

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt, tot = {}, Counter()
    for src, text in zip(docs.source, docs.text):
        for w in text.lower().strip().split():
            cnt[(src, w)] = cnt.get((src, w), 0) + 1
            tot[w] += 1
    topw = [w for w, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:20]]
    sources = sorted(docs.source.unique())
    srctot = Counter()
    for (s, w), c in cnt.items():
        srctot[s] += c
    ppm = {
        (s, w): cnt.get((s, w), 0) * 1_000_000 // srctot[s]
        for s in sources
        for w in topw
    }
    z = {}
    kept_words = []
    for w in topw:
        xs = [ppm[(s, w)] for s in sources]
        n = len(xs)
        sx, sxx = sum(xs), sum(x * x for x in xs)
        if sxx * n <= sx * sx:
            continue
        kept_words.append(w)
        mu = sx / n
        sd = math.sqrt((sxx - sx * sx / n) / n)
        for s in sources:
            z[(s, w)] = (ppm[(s, w)] - mu) / sd
    rows = all_specs()["text_burrows_delta_sources"].spark(spark, SF).collect()
    assert len(rows) == len(sources) * (len(sources) - 1) // 2
    for r in rows:
        dsum = sum(
            round(abs(z[(r.source_a, w)] - z[(r.source_b, w)]) * 1_000_000)
            for w in kept_words
        )
        assert r.n_words == len(kept_words)
        assert r.delta_sum_micro == dsum, (r.source_a, r.source_b)
        assert r.delta_avg_micro == dsum // len(kept_words)
    # style distance must discriminate: not all pairs identical
    assert len({r.delta_sum_micro for r in rows}) > 1


def test_full_outer_join_batch_split_invariant(spark):
    """Both sides' watermark-closed emission depends only on the FINAL
    watermark — identical at 2 vs 4 replay files."""
    from wal_consumer_spark.plans.streaming_batch import (
        stream_full_outer_join_watermark_close,
    )

    a = sorted(
        map(
            tuple,
            stream_full_outer_join_watermark_close(spark, SF, n_files=4).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            stream_full_outer_join_watermark_close(spark, SF, n_files=2).collect(),
        )
    )
    assert a == b
    d = dict((r[0], r[1]) for r in a)
    assert set(d) == {"matched", "left_closed", "right_closed"}
    assert all(v > 0 for v in d.values())

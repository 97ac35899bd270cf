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

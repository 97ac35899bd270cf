"""Independent first-principles Python oracles for round-8 operators.

The driver gate (and tests/test_parity.py) compare each Spark query against
its DuckDB oracle — but a bug mirrored into BOTH engines' shared
formulation would pass that gate. These tests recompute each operator's
result from scratch in plain Python over the raw parquet, with no shared
SQL text and no shared helper code.
"""

from __future__ import annotations

import pandas as pd
import pytest

from wal_consumer_spark.plans import all_specs

SF = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


def _py_sessions(events: pd.DataFrame) -> list[tuple[int, int, int, int]]:
    """Pure-Python sessionizer: per user, sort timestamps, split on
    > 30 min gaps, DROP the final (still-open) session."""
    out: list[tuple[int, int, int, int]] = []
    for uid, grp in events.groupby("user_id"):
        ts = sorted(int(t.value) // 1000 for t in grp["ts"])  # ns -> us
        sessions: list[list[int]] = []
        for t in ts:
            if not sessions or t - sessions[-1][1] > GAP_US:
                sessions.append([t, t, 1])
            else:
                sessions[-1][1] = t
                sessions[-1][2] += 1
        for s in sessions[:-1]:  # final session never emitted
            out.append((int(uid), s[0], s[1], s[2]))
    return sorted(out)


def test_stateful_sessionize_matches_pure_python(spark):
    """The applyInPandasWithState streaming sessionizer must agree with a
    from-scratch Python gaps-and-islands sessionization of the same
    parquet — closed sessions only, exact timestamps and counts."""
    events = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    expected = _py_sessions(events)

    got = all_specs()["stream_stateful_sessionize"].spark(spark, SF).collect()
    actual = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in got
    )
    assert len(actual) > 0
    assert actual == expected


def test_stateful_sessionize_crosses_batch_boundaries(spark):
    """The 4-file replay must actually exercise cross-batch state: at
    least one emitted session's start and end fall in DIFFERENT ts-range
    quartiles (i.e. the open session was carried in GroupState across a
    micro-batch boundary and closed later)."""
    events = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = events["ts"].astype("int64") // 1000
    lo, hi = int(us.min()), int(us.max())
    step = (hi - lo) // 4 + 1

    def quartile(t: int) -> int:
        return (t - lo) // step

    got = all_specs()["stream_stateful_sessionize"].spark(spark, SF).collect()
    spanning = [
        r for r in got if quartile(r.session_start_us) != quartile(r.session_end_us)
    ]
    assert spanning, (
        "no session spans a micro-batch boundary — the replay would not "
        "be testing cross-batch GroupState at all"
    )


def _tokens(text: str) -> list[str]:
    import re

    return re.split(r"\s+", text.strip().lower())


def test_vocab_topk_coverage_matches_pure_python(spark):
    from collections import Counter

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(_tokens(t))
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    expected = {}
    for k in (1, 2, 4, 8, 16):
        mass = sum(c for _, c in ranked[:k])
        expected[k] = (ranked[k - 1][0], mass, total, mass / total)

    got = all_specs()["text_vocab_topk_coverage"].spark(spark, SF).collect()
    assert len(got) == 5
    for r in got:
        tok, mass, tot, share = expected[r.k]
        assert (r.boundary_token, r.topk_occurrences, r.total_occurrences) == (
            tok, mass, tot,
        )
        assert r.coverage_share == pytest.approx(share, abs=1e-12)


def test_padding_waste_curve_matches_pure_python(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    lens = [len(_tokens(t)) for t in docs["text"]]
    got = {
        r.max_len: r
        for r in all_specs()["pipeline_padding_waste_curve"]
        .spark(spark, SF)
        .collect()
    }
    assert set(got) == {64, 128, 256}
    for L, r in got.items():
        kept = sum(min(n, L) for n in lens)
        pad = sum(L - min(n, L) for n in lens)
        trunc = sum(max(n - L, 0) for n in lens)
        assert (r.n_docs, r.total_tokens, r.kept_tokens) == (
            len(lens), sum(lens), kept,
        )
        assert (r.pad_tokens, r.truncated_tokens) == (pad, trunc)
        assert r.batch_utilization == pytest.approx(kept / (kept + pad))
        assert r.truncation_loss_share == pytest.approx(trunc / sum(lens))


def test_embedding_norm_audit_matches_pure_python(spark):
    import math

    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
    norms: dict[int, list[int]] = {}
    for lab, vec in zip(emb["label"], emb["embedding"]):
        q = [round(float(x) * 1_000_000) for x in vec]
        nm = math.floor(math.sqrt(sum(v * v for v in q)))
        norms.setdefault(int(lab), []).append(nm)

    got = {
        r.label: r
        for r in all_specs()["sim_embedding_norm_audit"].spark(spark, SF).collect()
    }
    assert set(got) == set(norms)
    for lab, ns in norms.items():
        r = got[lab]
        n, s, s2 = len(ns), sum(ns), sum(v * v for v in ns)
        assert r.n_vectors == n
        assert r.mean_norm_micro == s // n
        assert r.var_norm_micro == (n * s2 - s * s) // (n * n)
        assert (r.min_norm_micro, r.max_norm_micro) == (min(ns), max(ns))


def test_psi_matches_pure_python(spark):
    import hashlib
    import math

    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    bins: dict[int, list[int]] = {}
    for key, price in zip(orders["o_orderkey"], orders["o_totalprice"]):
        cents = round(float(price) * 100)
        b = min(math.floor(cents / 5_000_000.0), 9)
        g = int(hashlib.md5(f"{key}:psi".encode()).hexdigest()[:8], 16) % 2
        cur = bins.setdefault(b, [0, 0])
        cur[g] += 1
    tot_ref = sum(v[0] for v in bins.values())
    tot_cur = sum(v[1] for v in bins.values())

    got = {
        r.bin: r
        for r in all_specs()["ml_psi_population_stability"].spark(spark, SF).collect()
    }
    assert set(got) == set(bins)
    for b, (na, nb) in bins.items():
        r = got[b]
        assert (r.n_ref, r.n_cur) == (na, nb)
        if na > 0 and nb > 0:
            pa, pb = na / tot_ref, nb / tot_cur
            assert r.psi_term_micro == round((pa - pb) * math.log(pa / pb) * 1e6)
        else:
            assert r.psi_term_micro is None


def test_changepoint_argmax_matches_pure_python(spark):
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily = (
        orders.assign(
            d=orders["o_orderdate"].dt.date,
            cents=[round(float(p) * 100) for p in orders["o_totalprice"]],
        )
        .groupby("d")["cents"]
        .sum()
        .sort_index()
    )
    vals = [float(v) for v in daily.values]
    n, tot = len(vals), float(sum(daily.values))
    best = []
    cum = 0.0
    for k in range(1, n):
        cum += vals[k - 1]
        ma, mb = cum / k, (tot - cum) / (n - k)
        score = (k * (n - k) / n) * (ma - mb) ** 2
        best.append((-score, daily.index[k - 1], k, ma, mb, score))
    best.sort()

    got = sorted(
        all_specs()["ts_changepoint_argmax_split"].spark(spark, SF).collect(),
        key=lambda r: r.rank,
    )
    assert len(got) == 3
    for r, (_, d, k, ma, mb, score) in zip(got, best[:3]):
        assert r.split_date.date() == d
        assert (r.n_days_before, r.n_days_after) == (k, n - k)
        assert r.mean_before_cents == math_floor(ma)
        assert r.mean_after_cents == math_floor(mb)
        assert r.score_floor_m == math_floor(score / 1e6)


def math_floor(x: float) -> int:
    import math

    return math.floor(x)


def test_triangle_participation_matches_pure_python(spark):
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    import itertools
    import math
    from collections import defaultdict

    orders = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        orders[o].add(int(p))
    pair_orders = defaultdict(int)
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            pair_orders[(a, b)] += 1
    # support >= 2 gate: co-purchased in at least two distinct orders
    edges = {pair for pair, n in pair_orders.items() if n >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c exactly once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    buckets = defaultdict(list)
    for v in adj:
        t = tri.get(v, 0)
        bk = -1 if t == 0 else math.floor(math.log(t) / math.log(2))
        buckets[bk].append(t)

    got = {
        r.tri_bucket: r
        for r in all_specs()["graph_triangle_participation"].spark(spark, SF).collect()
    }
    assert set(got) == set(buckets)
    for bk, ts in buckets.items():
        r = got[bk]
        assert (r.n_parts, r.min_triangles, r.max_triangles) == (
            len(ts), min(ts), max(ts),
        )


def test_cross_source_dup_matrix_matches_pure_python(spark):
    import itertools
    from collections import defaultdict

    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    shingles, source = {}, {}
    for did, text, src in zip(docs["doc_id"], docs["text"], docs["source"]):
        toks = _tokens(text)
        n = max(len(toks) - 3, 0) + 1  # matches greatest(len-3,0) span
        shingles[did] = {" ".join(toks[i : i + 3]) for i in range(n)}
        source[did] = src
    pairs = defaultdict(list)
    for d1, d2 in itertools.combinations(sorted(shingles), 2):
        inter = len(shingles[d1] & shingles[d2])
        if inter == 0:
            continue
        j = inter / len(shingles[d1] | shingles[d2])
        if j >= 0.5:
            a, b = sorted((source[d1], source[d2]))
            pairs[(a, b)].append(int(j * 1e6))  # floor of exact ratio
    total = sum(len(v) for v in pairs.values())

    got = {
        (r.source_a, r.source_b): r
        for r in all_specs()["pipeline_cross_source_dup_matrix"]
        .spark(spark, SF)
        .collect()
    }
    assert set(got) == set(pairs) and total > 0
    for key, js in pairs.items():
        r = got[key]
        assert r.n_pairs == len(js)
        assert (r.min_jaccard_micro, r.max_jaccard_micro) == (min(js), max(js))
        assert r.share_of_pairs == pytest.approx(len(js) / total)


def test_mcnemar_dim_ablation_matches_pure_python(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(v): [round(float(x) * 1e6) + 2_000_000 for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    labels = {int(v): int(l) for v, l in zip(emb["vec_id"], emb["label"])}
    from collections import defaultdict

    sums = defaultdict(lambda: [0] * 64)
    counts = defaultdict(int)
    for v, q in vecs.items():
        lab = labels[v]
        counts[lab] += 1
        for d in range(64):
            sums[lab][d] += q[d]
    cent = {
        lab: [s // counts[lab] for s in sums[lab]] for lab in sums
    }

    def classify(q, dims):
        best = None
        for lab in sorted(cent):
            dist = sum((q[d] - cent[lab][d]) ** 2 for d in dims)
            if best is None or (dist, lab) < best:
                best = (dist, lab)
        return best[1]

    b = c = ok_f = ok_h = 0
    for v, q in vecs.items():
        pf = classify(q, range(64))
        ph = classify(q, range(32))
        f_ok, h_ok = pf == labels[v], ph == labels[v]
        ok_f += f_ok
        ok_h += h_ok
        b += f_ok and not h_ok
        c += h_ok and not f_ok
    n = len(vecs)

    r = all_specs()["ml_mcnemar_dim_ablation"].spark(spark, SF).collect()[0]
    assert r.n_vectors == n
    assert r.acc_full_ppm == ok_f * 1_000_000 // n
    assert r.acc_half_ppm == ok_h * 1_000_000 // n
    assert (r.n_full_only, r.n_half_only) == (b, c)
    assert r.mcnemar_chi2_cc_micro == (abs(b - c) - 1) ** 2 * 1_000_000 // (b + c)


def test_high_water_alerts_match_pure_python(spark):
    """The scalar-state streaming alerter must agree with a from-scratch
    Python replay: an event alerts iff it strictly exceeds every value at
    a strictly earlier timestamp for its user (firsts included)."""
    events = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"]
    )
    expected = []
    for uid, grp in events.groupby("user_id"):
        rows = sorted(
            (int(t.value) // 1000, round(float(v) * 1e6))
            for t, v in zip(grp["ts"], grp["value"])
        )
        prev_max = None
        i = 0
        while i < len(rows):
            ts = rows[i][0]
            group = [v for t, v in rows if t == ts]
            for v in group:
                if prev_max is None or v > prev_max:
                    expected.append((int(uid), ts, v, prev_max))
            gm = max(group)
            prev_max = gm if prev_max is None else max(prev_max, gm)
            i += len(group)

    got = sorted(
        (r.user_id, r.ts_us, r.value_micro, r.prev_max_micro)
        for r in all_specs()["stream_high_water_alerts"].spark(spark, SF).collect()
    )
    assert len(got) > 0
    assert got == sorted(expected)


def test_high_water_alerts_cross_batch_state(spark):
    """Cross-batch evidence: at least one user must have alerts in two
    different replay quartiles — the second one only correct if the
    first quartile's maximum was carried in GroupState."""
    events = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = events["ts"].astype("int64") // 1000
    lo, hi = int(us.min()), int(us.max())
    step = (hi - lo) // 4 + 1

    got = all_specs()["stream_high_water_alerts"].spark(spark, SF).collect()
    by_user: dict[int, set[int]] = {}
    for r in got:
        by_user.setdefault(r.user_id, set()).add((r.ts_us - lo) // step)
    assert any(len(qs) > 1 for qs in by_user.values()), (
        "no user alerts across two replay batches — cross-batch state "
        "carry would be untested"
    )


def test_tokenizer_fertility_matches_pure_python(spark):
    import re

    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["text", "lang", "n_chars"]
    )
    bpe_re = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"
    )
    agg: dict[str, list[int]] = {}
    for text, lang, nc in zip(docs["text"], docs["lang"], docs["n_chars"]):
        ws = len(_tokens(text))
        bpe = len(bpe_re.findall(text.lower()))
        cur = agg.setdefault(lang, [0, 0, 0, 0])
        cur[0] += 1
        cur[1] += ws
        cur[2] += bpe
        cur[3] += int(nc)

    got = {
        r.lang: r
        for r in all_specs()["pipeline_tokenizer_fertility_by_lang"]
        .spark(spark, SF)
        .collect()
    }
    assert set(got) == set(agg)
    for lang, (n, ws, bpe, chars) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.ws_tokens, r.bpe_tokens, r.total_chars) == (
            n, ws, bpe, chars,
        )
        assert r.fertility_ppm == bpe * 1_000_000 // ws
        assert r.chars_per_bpe_ppm == chars * 1_000_000 // bpe


def test_regime_run_lengths_match_pure_python(spark):
    from collections import Counter

    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily: dict = {}
    for d, p in zip(orders["o_orderdate"].dt.date, orders["o_totalprice"]):
        daily[d] = daily.get(d, 0) + round(float(p) * 100)
    days = sorted(daily)
    ranked = sorted((daily[d], d) for d in days)
    median = ranked[(len(ranked) + 1) // 2 - 1][0]  # lower median, rn 1-based
    flags = [1 if daily[d] >= median else 0 for d in days]
    runs: list[tuple[int, int]] = []
    for f in flags:
        if runs and runs[-1][0] == f:
            runs[-1] = (f, runs[-1][1] + 1)
        else:
            runs.append((f, 1))
    hist = Counter((f, ln) for f, ln in runs)

    got = {
        (r.regime_hi, r.run_length): r.n_runs
        for r in all_specs()["win_regime_run_lengths"].spark(spark, SF).collect()
    }
    assert got == dict(hist)


def test_kcore_bounded_peel_matches_pure_python(spark):
    import itertools
    from collections import defaultdict

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    orders = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        orders[o].add(int(p))
    pair_orders = defaultdict(int)
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            pair_orders[(a, b)] += 1
    edges = {pair for pair, n in pair_orders.items() if n >= 2}

    expected = []
    cur = edges
    for r in range(1, 9):
        deg = defaultdict(int)
        for a, b in cur:
            deg[a] += 1
            deg[b] += 1
        cur = {(a, b) for a, b in cur if deg[a] >= 3 and deg[b] >= 3}
        nodes = {n for e in cur for n in e}
        expected.append((r, len(cur), len(nodes)))

    got = sorted(
        (r.round, r.n_edges, r.n_nodes)
        for r in all_specs()["graph_kcore_bounded_peel"].spark(spark, SF).collect()
    )
    assert got == expected


def test_arrival_inversion_audit_matches_pure_python(spark):
    import hashlib
    from collections import defaultdict

    events = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    ids_by_entity = defaultdict(list)
    for eid in events["event_id"]:
        ids_by_entity[int(eid) % 500].append(int(eid))

    buckets = defaultdict(lambda: [0, 0, 0, [], []])
    for ent, ids in ids_by_entity.items():
        arrival = sorted(
            ids, key=lambda i: hashlib.md5(f"{i}:arr".encode()).hexdigest()
        )
        n = len(arrival)
        if n < 2:
            continue
        inv = sum(
            1
            for x in range(n)
            for y in range(x + 1, n)
            if arrival[x] > arrival[y]
        )
        pairs = n * (n - 1) // 2
        ppm = inv * 1_000_000 // pairs
        bk = ppm // 100_000
        cur = buckets[bk]
        cur[0] += 1
        cur[1] += inv
        cur[2] += pairs
        cur[3].append(ppm)

    got = {
        r.inv_decile: r
        for r in all_specs()["cdc_arrival_inversion_audit"].spark(spark, SF).collect()
    }
    assert set(got) == set(buckets) and len(got) > 0
    for bk, (ne, inv, pairs, ppms, _) in buckets.items():
        r = got[bk]
        assert (r.n_entities, r.total_inversions, r.total_pairs) == (
            ne, inv, pairs,
        )
        assert (r.min_inv_ppm, r.max_inv_ppm) == (min(ppms), max(ppms))


def test_ks_separation_matches_pure_python(spark):
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_totalprice", "o_orderpriority"]
    )
    pos = sorted(
        round(float(p) * 100)
        for p, pr in zip(orders["o_totalprice"], orders["o_orderpriority"])
        if pr == "1-URGENT"
    )
    neg = sorted(
        round(float(p) * 100)
        for p, pr in zip(orders["o_totalprice"], orders["o_orderpriority"])
        if pr != "1-URGENT"
    )
    na, nb = len(pos), len(neg)
    best = None
    import bisect

    for score in sorted(set(pos) | set(neg)):
        ca = bisect.bisect_right(pos, score)
        cb = bisect.bisect_right(neg, score)
        num = abs(ca * nb - cb * na)
        key = (-num, score)
        if best is None or key < best[0]:
            best = (key, score, num)

    r = all_specs()["ml_ks_separation"].spark(spark, SF).collect()[0]
    assert (r.at_score_cents, r.n_pos, r.n_neg) == (best[1], na, nb)
    assert r.ks_micro == best[2] * 1_000_000 // (na * nb)


def test_shingle_df_profile_matches_pure_python(spark):
    import math
    from collections import Counter, defaultdict

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    df = Counter()
    for text in docs["text"]:
        toks = _tokens(text)
        n = max(len(toks) - 3, 0) + 1
        df.update({" ".join(toks[i : i + 3]) for i in range(n)})
    buckets = defaultdict(list)
    for _, d in df.items():
        buckets[math.floor(math.log(d) / math.log(2))].append(d)

    got = {
        r.df_bucket: r
        for r in all_specs()["dedup_shingle_df_profile"].spark(spark, SF).collect()
    }
    assert set(got) == set(buckets)
    for bk, ds in buckets.items():
        r = got[bk]
        assert (r.n_shingles, r.min_df, r.max_df) == (len(ds), min(ds), max(ds))
        assert r.candidate_pairs == sum(d * (d - 1) // 2 for d in ds)


def test_soft_dedup_weights_match_pure_python(spark):
    import itertools
    from collections import defaultdict

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    shingles = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        n = max(len(toks) - 3, 0) + 1
        shingles[int(did)] = {" ".join(toks[i : i + 3]) for i in range(n)}
    adj = defaultdict(set)
    for d1, d2 in itertools.combinations(sorted(shingles), 2):
        inter = len(shingles[d1] & shingles[d2])
        if inter and inter / len(shingles[d1] | shingles[d2]) >= 0.5:
            adj[d1].add(d2)
            adj[d2].add(d1)
    # union-find-free BFS components over the near-dup graph
    comp: dict[int, int] = {}
    for start in sorted(adj):
        if start in comp:
            continue
        stack, members = [start], set()
        while stack:
            v = stack.pop()
            if v in members:
                continue
            members.add(v)
            stack.extend(adj[v] - members)
        canon = min(members)
        for v in members:
            comp[v] = canon
    sizes = defaultdict(int)
    for v, c in comp.items():
        sizes[c] += 1

    got = {
        r.doc_id: r
        for r in all_specs()["pipeline_soft_dedup_weights"].spark(spark, SF).collect()
    }
    assert set(got) == set(shingles)
    for did in shingles:
        r = got[did]
        if did in comp:
            c = comp[did]
            assert (r.canonical_id, r.cluster_size) == (c, sizes[c])
            assert r.weight_ppm == 1_000_000 // sizes[c]
        else:
            assert (r.canonical_id, r.cluster_size, r.weight_ppm) == (
                did, 1, 1_000_000,
            )


def test_ohlc_weekly_matches_pure_python(spark):
    from collections import defaultdict
    import datetime as dt

    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    daily: dict = {}
    for d, p in zip(orders["o_orderdate"].dt.date, orders["o_totalprice"]):
        daily[d] = daily.get(d, 0) + round(float(p) * 100)
    weeks = defaultdict(list)
    for d in sorted(daily):
        monday = d - dt.timedelta(days=d.weekday())
        weeks[monday].append((d, daily[d]))

    got = {
        r.week.date(): r
        for r in all_specs()["ts_ohlc_weekly"].spark(spark, SF).collect()
    }
    assert set(got) == set(weeks)
    for wk, days in weeks.items():
        r = got[wk]
        revs = [v for _, v in days]
        assert r.n_days == len(days)
        assert (r.open_cents, r.close_cents) == (days[0][1], days[-1][1])
        assert (r.high_cents, r.low_cents) == (max(revs), min(revs))
        assert r.volume_cents == sum(revs)


def test_davies_bouldin_matches_pure_python(spark):
    import math
    from collections import defaultdict

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(v): [round(float(x) * 1e6) + 2_000_000 for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    labels = {int(v): int(l) for v, l in zip(emb["vec_id"], emb["label"])}
    sums = defaultdict(lambda: [0] * 64)
    counts = defaultdict(int)
    for v, q in vecs.items():
        lab = labels[v]
        counts[lab] += 1
        for d in range(64):
            sums[lab][d] += q[d]
    cent = {lab: [s // counts[lab] for s in sums[lab]] for lab in sums}
    scat_sum = defaultdict(int)
    for v, q in vecs.items():
        lab = labels[v]
        d2 = sum((q[d] - cent[lab][d]) ** 2 for d in range(64))
        scat_sum[lab] += math.floor(math.sqrt(d2))
    scatter = {lab: scat_sum[lab] // counts[lab] for lab in scat_sum}

    expected = {}
    for li in cent:
        best = None
        for lj in cent:
            if lj == li:
                continue
            d2 = sum((cent[li][d] - cent[lj][d]) ** 2 for d in range(64))
            d_ij = math.floor(math.sqrt(d2))
            r = (scatter[li] + scatter[lj]) * 1_000_000 // d_ij
            if best is None or (-r, lj) < best[0]:
                best = ((-r, lj), lj, r)
        expected[li] = (counts[li], scatter[li], best[1], best[2])

    got = {
        r.label: r
        for r in all_specs()["sim_davies_bouldin_index"].spark(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for lab, (n, s, wl, r_ppm) in expected.items():
        row = got[lab]
        assert (row.n_members, row.scatter_micro) == (n, s)
        assert (row.worst_other_label, row.db_term_ppm) == (wl, r_ppm)


def test_sessionize_invariant_to_micro_batch_count(spark):
    """The batch-split-invariance CLAIM, tested directly: replaying the
    same events in 2 vs 4 ts-ordered micro-batches must emit the exact
    same closed-session set (the open-session-never-emitted rule is what
    makes the output independent of batching)."""
    from pyspark.sql import functions as F

    from wal_consumer_spark.plans.streaming_batch import (
        _SESSION_GAP_US,
        _make_sessionize_fn,
        _run_stateful_replay,
    )
    from wal_consumer_spark.sources.tables import load_table

    e = load_table(spark, SF, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )

    def run(n_files: int):
        rows = _run_stateful_replay(
            spark,
            e,
            read_schema="user_id long, ts_us long",
            state_fn=_make_sessionize_fn(_SESSION_GAP_US),
            out_schema=(
                "user_id long, session_start_us long, "
                "session_end_us long, n_events long"
            ),
            state_schema="start long, last long, n long",
            prefix=f"sess_inv{n_files}",
            n_files=n_files,
        ).collect()
        return sorted(
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
            for r in rows
        )

    two, four = run(2), run(4)
    assert len(two) > 0
    assert two == four


def test_isotropy_audit_matches_pure_python(spark):
    from collections import defaultdict

    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label", "embedding"])
    sums = defaultdict(lambda: [0] * 64)
    sum_norm2 = defaultdict(int)
    counts = defaultdict(int)
    for lab, vec in zip(emb["label"], emb["embedding"]):
        lab = int(lab)
        q = [round(float(x) * 1e6) for x in vec]
        counts[lab] += 1
        sum_norm2[lab] += sum(v * v for v in q)
        for d in range(64):
            sums[lab][d] += q[d]

    got = {
        r.label: r
        for r in all_specs()["sim_isotropy_audit"].spark(spark, SF).collect()
    }
    assert set(got) == set(counts)
    for lab in counts:
        n = counts[lab]
        sum_sq = sum(s * s for s in sums[lab])
        r = got[lab]
        assert r.n_vectors == n
        assert r.mean_vec_norm2_sq == sum_sq // (n * n)
        assert r.mean_norm2 == sum_norm2[lab] // n
        assert r.anisotropy_ppm == sum_sq * 1_000_000 // (n * sum_norm2[lab])


def test_fleiss_kappa_panel_matches_pure_python(spark):
    from collections import Counter, defaultdict

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(v): [round(float(x) * 1e6) + 2_000_000 for x in e]
        for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    labels = {int(v): int(l) for v, l in zip(emb["vec_id"], emb["label"])}
    sums = defaultdict(lambda: [0] * 64)
    counts = defaultdict(int)
    for v, q in vecs.items():
        lab = labels[v]
        counts[lab] += 1
        for d in range(64):
            sums[lab][d] += q[d]
    cent = {lab: [s // counts[lab] for s in sums[lab]] for lab in sums}

    def classify(q, upto):
        best = None
        for lab in sorted(cent):
            dist = sum((q[d] - cent[lab][d]) ** 2 for d in range(upto))
            if best is None or (dist, lab) < best:
                best = (dist, lab)
        return best[1]

    votes = {}
    for v, q in vecs.items():
        votes[v] = Counter([classify(q, 16), classify(q, 32), classify(q, 64)])
    N, n = len(vecs), 3
    s1 = sum(sum(c * c for c in cnt.values()) for cnt in votes.values()) - N * n
    cj = Counter()
    for cnt in votes.values():
        cj.update(cnt)
    sum_cj_sq = sum(c * c for c in cj.values())

    r = all_specs()["ml_fleiss_kappa_panel"].spark(spark, SF).collect()[0]
    assert r.n_items == N
    assert r.p_bar_ppm == s1 * 1_000_000 // (N * n * (n - 1))
    assert r.p_e_ppm == sum_cj_sq * 1_000_000 // ((N * n) * (N * n))
    num = s1 * (N * n) * (N * n) - sum_cj_sq * N * n * (n - 1)
    den = (N * n) * (N * n) * N * n * (n - 1) - sum_cj_sq * N * n * (n - 1)
    # the kappa numerator is the one SIGNED quantity here: both engines
    # truncate toward zero (Spark DIV, DuckDB //), while Python // floors —
    # use sign-adjusted truncating division so a below-chance (negative
    # kappa) panel still matches a correct engine result (ADVICE r8)
    q = abs(num * 1_000_000) // abs(den)
    expected_kappa = q if (num >= 0) == (den >= 0) else -q
    assert r.fleiss_kappa_micro == expected_kappa

"""Value-level mirrors for the statistical-testing queries: each
statistic recomputed from the RAW fixture with an independent
formulation (full-grid chi-square including empty cells, direct CDF
sup-difference, plug-in MI, numpy linear quantile) — not the query's
own algebra.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from commodity_price_forecasting_spark.plans.registry import load_all

from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def test_mutual_info_matches_plugin_estimator(spark, duck):
    rows = duck.execute(
        "SELECT CAST(FLOOR(value/50) AS BIGINT), EXTRACT(hour FROM ts), "
        "user_id % 4, event_type FROM events"
    ).fetchall()
    feats = {
        "value_bin50": [(str(r[0]), r[3]) for r in rows],
        "hour": [(str(r[1]), r[3]) for r in rows],
        "user_mod4": [(str(r[2]), r[3]) for r in rows],
    }
    got = {
        r["feature"]: (r["mi_bits"], r["n_cells"])
        for r in REGISTRY["stat_mutual_info"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(feats)
    for name, pairs in feats.items():
        n = len(pairs)
        nxy = Counter(pairs)
        nx = Counter(x for x, _ in pairs)
        ny = Counter(y for _, y in pairs)
        mi = sum(
            (c / n) * math.log2(c * n / (nx[x] * ny[y]))
            for (x, y), c in nxy.items()
        )
        assert abs(got[name][0] - round(mi, 6)) <= 1e-6, name
        assert got[name][1] == len(nxy)
        assert got[name][0] >= 0


def test_chi2_matches_full_grid_including_empty_cells(spark, duck):
    """The query uses the ΣO²/E − n identity; this mirror builds the
    FULL lang×source grid (empty cells contribute E) — agreement
    proves the identity was applied correctly."""
    rows = duck.execute(
        "SELECT lang, source, COUNT(*) FROM documents GROUP BY 1, 2"
    ).fetchall()
    obs = {(l, s): c for l, s, c in rows}
    langs = sorted({l for l, _, _ in rows})
    srcs = sorted({s for _, s, _ in rows})
    n = sum(obs.values())
    nl = defaultdict(int)
    ns = defaultdict(int)
    for (l, s), c in obs.items():
        nl[l] += c
        ns[s] += c
    chi2 = 0.0
    for l in langs:
        for s in srcs:
            e = nl[l] * ns[s] / n
            o = obs.get((l, s), 0)
            chi2 += (o - e) ** 2 / e
    [r] = REGISTRY["stat_chi2_independence"].fn(spark, SF_SMOKE).collect()
    assert abs(r["chi2"] - round(chi2, 6)) <= 1e-5
    assert r["dof"] == (len(langs) - 1) * (len(srcs) - 1)
    assert r["n"] == n
    v = math.sqrt(chi2 / (n * min(len(langs) - 1, len(srcs) - 1)))
    assert abs(r["cramers_v"] - round(v, 6)) <= 1e-5


def test_ks_matches_direct_cdf_supremum(spark, duck):
    rows = duck.execute(
        "SELECT event_type, value, ts < TIMESTAMP '2024-01-16' FROM events"
    ).fetchall()
    by_type = defaultdict(lambda: ([], []))
    for et, v, first in rows:
        by_type[et][0 if first else 1].append(v)
    got = {r["event_type"]: r for r in REGISTRY["stat_ks_two_sample"].fn(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_type)
    for et, (a, b) in by_type.items():
        a, b = np.sort(a), np.sort(b)
        grid = np.unique(np.concatenate([a, b]))
        f1 = np.searchsorted(a, grid, side="right") / len(a)
        f2 = np.searchsorted(b, grid, side="right") / len(b)
        ks = float(np.max(np.abs(f1 - f2)))
        r = got[et]
        assert (r["n1"], r["n2"]) == (len(a), len(b))
        assert abs(r["ks_stat"] - round(ks, 6)) <= 1e-6
        crit = 1.36 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
        assert abs(r["ks_crit_05"] - round(crit, 6)) <= 1e-6
        assert r["drifted"] == (ks > crit)


def test_conformal_matches_numpy_quantile_and_coverage(spark, duck):
    # hourly grain + time-ordered 2/3 split since r12 (r11 ask #8):
    # the old daily grain + fixed calendar cutoff calibrated on n=7
    rows = duck.execute(
        "SELECT user_id, date_trunc('hour', ts) AS day, AVG(value) AS px "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for uid, day, px in rows:
        series[uid].append((day, px))
    got = {r["instrument"]: r for r in REGISTRY["m7_conformal_interval"].fn(spark, SF_SMOKE).collect()}
    for uid, pts in series.items():
        resid = [
            abs(p2 - p1) for (_d1, p1), (_d2, p2) in zip(pts, pts[1:])
        ]
        k = (2 * len(resid)) // 3  # rn*3 <= n*2 == first floor(2n/3) rows
        cal, ev = resid[:k], resid[k:]
        if not cal or not ev:
            assert uid not in got
            continue
        assert len(cal) >= 30  # the grain change is the point
        q90 = float(np.quantile(cal, 0.9, method="linear"))
        cov = sum(1.0 for x in ev if x <= q90) / len(ev)
        r = got[uid]
        assert r["n_cal"] == len(cal) and r["n_eval"] == len(ev)
        assert abs(r["q90"] - round(q90, 6)) <= 1e-6
        assert abs(r["coverage"] - round(cov, 6)) <= 1e-6
        assert 0.0 <= r["coverage"] <= 1.0


def test_cusum_changepoint_matches_numpy_argmax(spark, duck):
    # hourly grain since r12 (r11 ask #8)
    rows = duck.execute(
        "SELECT user_id, date_trunc('hour', ts) AS day, AVG(value) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for uid, day, px in rows:
        series[uid].append((day, px))
    got = {r["instrument"]: r for r in REGISTRY["ts_cusum_changepoint"].fn(spark, SF_SMOKE).collect()}
    assert set(got) == set(series)
    for uid, pts in series.items():
        px = np.array([p for _, p in pts])
        s = np.cumsum(px - px.mean())
        k = int(np.lexsort((np.arange(len(s)), -np.round(np.abs(s), 6)))[0])
        r = got[uid]
        assert r["cp_day"] == pts[k][0]
        assert abs(r["s_max_abs"] - round(abs(s[k]), 6)) <= 1e-6
        assert abs(r["s_range"] - round(s.max() - s.min(), 6)) <= 1e-6
        assert r["n"] == len(pts)


def test_theilsen_matches_numpy_median_of_slopes(spark, duck):
    rows = duck.execute(
        "SELECT user_id, CAST(ts AS DATE) AS day, AVG(value) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for uid, day, px in rows:
        series[uid].append((day, px))
    got = {r["instrument"]: r for r in REGISTRY["ts_theilsen_trend"].fn(spark, SF_SMOKE).collect()}
    for uid, pts in series.items():
        slopes = [
            (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0]).days
            for i in range(len(pts))
            for j in range(i + 1, len(pts))
        ]
        r = got[uid]
        assert r["n_pairs"] == len(slopes)
        assert abs(r["ts_slope"] - round(float(np.median(slopes)), 6)) <= 1e-6
        assert abs(r["mean_pair_slope"] - round(float(np.mean(slopes)), 6)) <= 1e-6


def test_bootstrap_ci_matches_hashlib_mirror(spark, duck):
    """Replicate means recomputed with hashlib md5 + the same
    Poisson(1) inversion table — verifies the md5-fraction weight
    draw end-to-end — and the CI must bracket the point estimate."""
    import hashlib

    cuts = (
        0.36787944117144233,
        0.7357588823428847,
        0.9196986029286058,
        0.9810118431238462,
        0.9963401531726563,
        0.9994058151824183,
    )
    rows = duck.execute(
        "SELECT event_type, event_id, value FROM events"
    ).fetchall()
    means = defaultdict(dict)
    by_type = defaultdict(list)
    for et, eid, v in rows:
        by_type[et].append((eid, v))
    for et, evs in by_type.items():
        for b in range(50):
            sw = swx = 0.0
            for eid, v in evs:
                u = (
                    int(hashlib.md5(f"{eid}_{b}".encode()).hexdigest()[:8], 16)
                    + 1.0
                ) / 4294967297.0
                w = next((i for i, c in enumerate(cuts) if u < c), 6)
                sw += w
                swx += w * v
            means[et][b] = swx / sw if sw else None
    got = {r["event_type"]: r for r in REGISTRY["stat_bootstrap_ci"].fn(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_type)
    for et, reps in means.items():
        ms = sorted(v for v in reps.values() if v is not None)
        lo = float(np.quantile(ms, 0.025, method="linear"))
        hi = float(np.quantile(ms, 0.975, method="linear"))
        r = got[et]
        assert abs(r["ci_lo"] - round(lo, 6)) <= 1e-6
        assert abs(r["ci_hi"] - round(hi, 6)) <= 1e-6
        assert r["mean_in_ci"] and r["ci_lo"] < r["mean_value"] < r["ci_hi"]
        assert r["n"] == len(by_type[et])


def test_welch_and_anova_match_manual_stats(spark, duck):
    rows = duck.execute(
        "SELECT event_type, user_id % 2, value FROM events"
    ).fetchall()
    by_type = defaultdict(lambda: ([], []))
    for et, g, v in rows:
        by_type[et][g].append(v)
    got = {r["event_type"]: r for r in REGISTRY["stat_welch_ttest"].fn(spark, SF_SMOKE).collect()}
    for et, (a, b) in by_type.items():
        a, b = np.array(a), np.array(b)
        sa, sb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
        df = (sa + sb) ** 2 / (sa**2 / (len(a) - 1) + sb**2 / (len(b) - 1))
        r = got[et]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        assert abs(r["t_stat"] - round(t, 6)) <= 1e-6
        assert abs(r["welch_df"] - round(df, 6)) <= 1e-5
        assert r["significant_z"] == (abs(t) > 1.96)
    # ANOVA against the textbook SS decomposition
    groups = [np.array(a + b) for a, b in by_type.values()]
    allv = np.concatenate(groups)
    k, nn = len(groups), len(allv)
    ssb = sum(len(g) * (g.mean() - allv.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    [r] = REGISTRY["stat_anova_f"].fn(spark, SF_SMOKE).collect()
    assert (r["k_groups"], r["n"]) == (k, nn)
    assert abs(r["f_stat"] - round((ssb / (k - 1)) / (ssw / (nn - k)), 6)) <= 1e-5


def test_event_pmi_matches_set_arithmetic(spark, duck):
    rows = duck.execute(
        "SELECT DISTINCT user_id, event_type FROM events"
    ).fetchall()
    users_of = defaultdict(set)
    for uid, et in rows:
        users_of[et].add(uid)
    n_users = len({uid for uid, _ in rows})
    got = {(r["type_a"], r["type_b"]): r for r in REGISTRY["behavior_event_pmi"].fn(spark, SF_SMOKE).collect()}
    types = sorted(users_of)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            both = users_of[a] & users_of[b]
            if not both:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_users_both"] == len(both)
            pmi = math.log(
                (len(both) / n_users)
                / ((len(users_of[a]) / n_users) * (len(users_of[b]) / n_users))
            )
            jac = len(both) / len(users_of[a] | users_of[b])
            assert abs(r["pmi"] - round(pmi, 6)) <= 1e-6
            assert abs(r["jaccard"] - round(jac, 6)) <= 1e-6


def _avg_ranks(vals):
    order = np.lexsort((np.arange(len(vals)), vals))
    rn = np.empty(len(vals))
    rn[order] = np.arange(1, len(vals) + 1)
    out = np.empty(len(vals))
    for v in np.unique(vals):
        m = vals == v
        out[m] = rn[m].mean()
    return out


def test_spearman_matches_manual_tie_corrected_ranks(spark, duck):
    rows = duck.execute(
        "SELECT event_type, value, epoch_us(ts) FROM events"
    ).fetchall()
    by_type = defaultdict(lambda: ([], []))
    for et, v, t in rows:
        by_type[et][0].append(v)
        by_type[et][1].append(t)
    got = {r["event_type"]: r for r in REGISTRY["stat_spearman_corr"].fn(spark, SF_SMOKE).collect()}
    for et, (v, t) in by_type.items():
        rv = _avg_ranks(np.array(v, dtype=np.float64))
        rt = _avg_ranks(np.array(t, dtype=np.float64))
        rho = float(np.corrcoef(rv, rt)[0, 1])
        r = got[et]
        assert r["n"] == len(v)
        assert abs(r["spearman_rho"] - round(rho, 6)) <= 2e-6


def test_hll_rollup_bounds_hold(spark):
    [r] = REGISTRY["sketch_hll_rollup"].fn(spark, SF_SMOKE).collect()
    assert r["merged_within_5pct"] and r["merged_le_sum_daily"]
    assert r["n_days"] >= 28
    assert r["sum_daily_exact"] >= r["exact_total"]


def test_mannwhitney_matches_manual_ranksum(spark, duck):
    rows = duck.execute(
        "SELECT event_type, user_id % 2, value FROM events"
    ).fetchall()
    by_type = defaultdict(lambda: ([], []))
    for et, g, v in rows:
        by_type[et][g].append(v)
    got = {r["event_type"]: r for r in REGISTRY["stat_mannwhitney_u"].fn(spark, SF_SMOKE).collect()}
    for et, (a, b) in by_type.items():
        allv = np.array(a + b)
        ranks = _avg_ranks(allv)
        r1 = ranks[: len(a)].sum()
        n1, n2 = len(a), len(b)
        u = r1 - n1 * (n1 + 1) / 2
        n = n1 + n2
        _, counts = np.unique(allv, return_counts=True)
        tie = float((counts.astype(float) ** 3 - counts).sum())
        sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1))))
        z = (u - n1 * n2 / 2) / sigma
        r = got[et]
        assert (r["n1"], r["n2"]) == (n1, n2)
        assert abs(r["u_stat"] - round(u, 6)) <= 1e-6
        assert abs(r["z_stat"] - round(z, 6)) <= 1e-5


def test_benford_terms_are_consistent(spark, duck):
    rows = REGISTRY["dq_benford_firstdigit"].fn(spark, SF_SMOKE).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    assert abs(sum(r["obs_p"] for r in rows) - 1.0) <= 1e-4
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) <= 1e-4
    n = duck.execute("SELECT COUNT(*) FROM events WHERE value > 0").fetchone()[0]
    obs = {
        d: c
        for d, c in duck.execute(
            "SELECT CAST(FLOOR(value / POWER(10, FLOOR(LOG10(value)))) AS BIGINT),"
            " COUNT(*) FROM events WHERE value > 0 GROUP BY 1"
        ).fetchall()
    }
    for r in rows:
        assert r["n_obs"] == obs[r["digit"]]
        e = n * math.log10(1 + 1 / r["digit"])
        assert abs(r["chi2_term"] - round((r["n_obs"] - e) ** 2 / e, 6)) <= 1e-5


def test_granger_matches_numpy_lstsq(spark, duck):
    # 6-hour LOCF grid over each pair's common span since r12
    # (r11 ask #8): the reference rebuilds the SAME alignment in
    # plain python before the lstsq comparison
    rows = duck.execute(
        "SELECT user_id, CAST(FLOOR(epoch(ts) / 21600) AS BIGINT), "
        "AVG(value) FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(dict)
    for uid, slot, px in rows:
        series[uid][slot] = px
    got = {r["leg_a"]: r for r in REGISTRY["ts_granger_causality"].fn(spark, SF_SMOKE).collect()}
    assert len(got) >= 10
    for leg, r in got.items():
        a, b = series[leg], series[leg + 1]
        lo = max(min(a), min(b))
        hi = min(max(a), max(b))
        pa = pb = None
        aligned = []
        for slot in range(lo, hi + 1):
            pa = a.get(slot, pa)
            pb = b.get(slot, pb)
            if pa is not None and pb is not None:
                aligned.append((pa, pb))
        y, a1, b1 = [], [], []
        for (pa0, pb0), (pa1_, _pb1) in zip(aligned, aligned[1:]):
            y.append(pa1_)
            a1.append(pa0)
            b1.append(pb0)
        y = np.array(y)
        a1 = np.array(a1)
        b1 = np.array(b1)
        n = len(y)
        assert r["n"] == n
        Xr = np.column_stack([np.ones(n), a1])
        Xu = np.column_stack([np.ones(n), a1, b1])
        cr = np.linalg.lstsq(Xr, y, rcond=None)[0]
        cu = np.linalg.lstsq(Xu, y, rcond=None)[0]
        rss_r = float(((y - Xr @ cr) ** 2).sum())
        rss_u = float(((y - Xu @ cu) ** 2).sum())
        f = (rss_r - rss_u) * (n - 3) / rss_u
        assert abs(r["f_stat"] - round(f, 6)) <= 1e-4
        assert abs(r["beta_own"] - round(float(cu[1]), 6)) <= 1e-5
        assert abs(r["gamma_cross"] - round(float(cu[2]), 6)) <= 1e-5
        assert r["causal_05"] == (f > 4.0)
        assert n >= 30  # the grain change is the point


def test_target_encoding_is_leakage_free(spark, duck):
    """Recompute each (category, fold) encoding from the RAW rows of
    the OTHER folds only — equality proves no own-fold leakage and
    that the one-pass subtraction trick equals the naive 5-pass
    definition."""
    import hashlib

    rows = duck.execute(
        "SELECT event_type, event_id, value FROM events"
    ).fetchall()
    data = defaultdict(lambda: defaultdict(list))
    for et, eid, v in rows:
        fold = int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16) % 5
        data[et][fold].append(v)
    gm = np.mean([v for et in data.values() for f in et.values() for v in f])
    got = {(r["event_type"], r["fold"]): r for r in REGISTRY["ml_target_encode_oof"].fn(spark, SF_SMOKE).collect()}
    for et, folds in data.items():
        for f in folds:
            others = [v for f2, vs in folds.items() if f2 != f for v in vs]
            enc = (sum(others) + 10 * gm) / (len(others) + 10)
            r = got[(et, f)]
            assert r["n_fold"] == len(folds[f])
            assert abs(r["oof_encoding"] - round(enc, 6)) <= 1e-6


def test_calibration_bins_partition_all_predictions(spark, duck):
    rows = REGISTRY["m7_calibration_bins"].fn(spark, SF_SMOKE).collect()
    assert rows and all(0 <= r["bucket"] <= 9 for r in rows)
    assert all(0.0 <= r["hit_rate"] <= 1.0 for r in rows)
    # bucket magnitudes must be ordered with the bucket index
    by_b = sorted(rows, key=lambda r: r["bucket"])
    mags = [r["mean_abs_mom"] for r in by_b]
    assert mags == sorted(mags)


def test_piecewise_trend_matches_bruteforce_refits(spark, duck):
    """The O(n) prefix-sum search must agree with the naive
    per-candidate numpy polyfit refit on every instrument."""
    # hourly grain since r12 (r11 ask #8)
    rows = duck.execute(
        "SELECT user_id, date_trunc('hour', ts) AS day, AVG(value) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series = defaultdict(list)
    for uid, day, px in rows:
        series[uid].append((day, px))
    got = {r["instrument"]: r for r in REGISTRY["ts_piecewise_trend"].fn(spark, SF_SMOKE).collect()}

    def rss_fit(t, y):
        if len(t) < 2:
            return 0.0
        c = np.polyfit(t, y, 1)
        return float(((y - np.polyval(c, t)) ** 2).sum())

    for uid, pts in series.items():
        y = np.array([p for _, p in pts])
        t = np.arange(len(y), dtype=float)
        cands = [
            (round(rss_fit(t[: k + 1], y[: k + 1]) + rss_fit(t[k + 1:], y[k + 1:]), 6), k)
            for k in range(1, len(y) - 2)
        ]
        best_rss, best_k = min(cands)
        r = got[uid]
        assert r["break_day"] == pts[best_k][0]
        assert abs(r["rss_split"] - best_rss) <= 2e-6
        assert abs(r["rss_single"] - round(rss_fit(t, y), 6)) <= 2e-6
        assert r["n"] == len(y)
        assert r["rss_split"] <= r["rss_single"] + 1e-9


def test_auc_rank_identity_matches_pairwise_definition(spark, duck):
    """The Mann–Whitney rank identity must equal the O(n₊·n₋)
    pairwise AUC definition (ties count ½) computed directly."""
    rows = duck.execute(
        "SELECT value, event_type = 'purchase' FROM events"
    ).fetchall()
    pos = np.array([v for v, p in rows if p])
    neg = np.array([v for v, p in rows if not p])
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    [r] = REGISTRY["m7_auc_rank"].fn(spark, SF_SMOKE).collect()
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert abs(r["auc"] - round(auc, 6)) <= 1e-6


def test_confusion_cells_partition_the_predictions(spark):
    [r] = REGISTRY["m7_confusion_f1"].fn(spark, SF_SMOKE).collect()
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] > 0
    for m in ("precision_up", "recall_up", "f1_up"):
        assert r[m] is None or 0.0 <= r[m] <= 1.0
    if r["precision_up"] and r["recall_up"]:
        h = 2 * r["precision_up"] * r["recall_up"] / (
            r["precision_up"] + r["recall_up"]
        )
        assert abs(r["f1_up"] - h) <= 1e-4


def test_kaplan_meier_full_death_row_pins_survival_to_zero(spark, tmp_path):
    """When an event duration's ENTIRE risk set dies (d == at_risk),
    survival from that row on is exactly 0. Unguarded, Spark's
    ln(1 − d/n) = ln(0) is NULL, the window SUM silently skips it and
    emits a wrong nonzero survival, while DuckDB's LN(0) raises —
    both engines carry an explicit guard now (ADVICE r5). The sf
    fixtures never hit d == at_risk, so this synthetic lifetime table
    is the only coverage of the terminal row."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    # users A,B: dur 5, die; C: dur 2, dies; D: dur 2, censored
    # (D's last day IS the horizon). Event rows = first + last day.
    def ts(day, hour=12):
        return dt.datetime(2024, 1, 1 + day, hour)

    rows = [
        (1, ts(0), 10, "view", 1.0, "{}"),
        (2, ts(5), 10, "view", 1.0, "{}"),   # A: 0→5, died
        (3, ts(0), 11, "view", 1.0, "{}"),
        (4, ts(5), 11, "view", 1.0, "{}"),   # B: 0→5, died
        (5, ts(0), 12, "view", 1.0, "{}"),
        (6, ts(2), 12, "view", 1.0, "{}"),   # C: 0→2, died
        (7, ts(8), 13, "view", 1.0, "{}"),
        (8, ts(10), 13, "view", 1.0, "{}"),  # D: 8→10, horizon ⇒ censored
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    spec = REGISTRY["stat_kaplan_meier"]
    got = {
        r["duration_days"]: r
        for r in spec.fn(spark, str(tmp_path)).collect()
    }
    # dur 2: d=1 (C), at_risk=4 → S = 1 − 1/4 = 0.75
    # dur 5: d=2 (A,B), at_risk=2 → FULL DEATH → S = 0 exactly
    assert got[2]["n_at_risk"] == 4 and got[2]["km_survival"] == 0.75
    assert got[5]["n_at_risk"] == 2 and got[5]["n_events"] == 2
    assert got[5]["km_survival"] == 0.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    con.close()
    assert oracle[5][3] == 0.0 and oracle[2][3] == 0.75


def test_ljung_box_statistic_matches_numpy_and_separates_regimes(
    spark, tmp_path
):
    """Value-level exercise of m11_ljung_box's Q arithmetic (r10
    VERDICT #1: the query compared empty sets for 8 rounds — this
    test feeds it planted series and mirrors the published formula,
    statsmodels ``acorr_ljungbox`` Q = n(n+2)·Σ r_k²/(n−k), in pure
    numpy). Instrument 1's RETURNS are a strong AR(1) (φ=0.8) → must
    reject white noise; instrument 2's returns are iid N(0,1) →
    must not. One event per hour so hourly px == the planted value."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    rng = np.random.default_rng(7)
    n_bars = 120
    # returns: AR(1) for inst 1, white noise for inst 2
    ar = np.empty(n_bars - 1)
    ar[0] = rng.standard_normal()
    for i in range(1, n_bars - 1):
        ar[i] = 0.8 * ar[i - 1] + rng.standard_normal() * 0.3
    wn = rng.standard_normal(n_bars - 1)
    px = {1: np.concatenate([[100.0], 100.0 + np.cumsum(ar)]),
          2: np.concatenate([[100.0], 100.0 + np.cumsum(wn)])}

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for inst, series in px.items():
        for i, v in enumerate(series):
            rows.append((eid, t0 + timedelta(hours=i), inst, "tick",
                         float(v), "{}"))
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    spec = REGISTRY["m11_ljung_box"]
    got = {r["instrument"]: r for r in spec.fn(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2}

    def lb_q(returns, h=5):
        e = returns - returns.mean()
        ss = float(np.dot(e, e))
        n = len(e)
        q = 0.0
        for k in range(1, h + 1):
            rk = float(np.dot(e[k:], e[:-k])) / ss
            q += rk * rk / (n - k)
        return n * (n + 2) * q

    for inst, series in ((1, ar), (2, wn)):
        expect = lb_q(series)
        assert got[inst]["n"] == n_bars - 1
        assert abs(got[inst]["lb_q"] - round(expect, 6)) < 1e-6, (
            inst, got[inst]["lb_q"], expect,
        )
    assert got[1]["reject_white_noise"] is True  # AR(1) must reject
    assert got[2]["reject_white_noise"] is False  # white noise must not

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    con.close()
    assert oracle[1][3] is True and oracle[2][3] is False
    assert abs(oracle[1][2] - got[1]["lb_q"]) < 1e-9

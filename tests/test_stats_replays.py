"""Independent Python/pandas replays of the statistics family.

Oracle parity proves Spark == DuckDB, but both sides share MY formula —
a conceptual error (wrong rank convention, wrong CDF tie handling, a
mis-transcribed Wilson bound) would pass parity on both engines.  These
replays re-derive each statistic from its TEXTBOOK definition in
numpy/pandas (a third, independently-written implementation; pandas'
own spearman for the rank correlation) and compare against the Spark
output at the suite SF.  Float comparisons allow 2e-6 (the queries round
to 6 dp; the replay may differ by one ulp at the rounding boundary).

One shared pandas load of events/orders; every check is a plain function
so a failure names the statistic.
"""

import math

import numpy as np
import pandas as pd

from dbt_trill_shop_spark.catalog import load_table
from dbt_trill_shop_spark.harness import QUERIES




def _one(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).toPandas()


def _pr_gini_matches_textbook_formula(spark, sf_dir, frames):
    ev, _ = frames
    x = np.sort(ev.groupby("user_id")["cents"].sum().to_numpy())
    n = len(x)
    i = np.arange(1, n + 1, dtype="int64")
    gini = (2 * int((i * x).sum()) - (n + 1) * int(x.sum())) / (n * int(x.sum()))
    got = _one(spark, sf_dir, "q_gini").iloc[0]
    assert got["n_users"] == n and got["total_cents"] == int(x.sum())
    assert abs(got["gini"] - round(gini, 6)) <= 2e-6


def _pr_spearman_matches_midrank_pearson(spark, sf_dir, frames):
    # textbook tie-correct Spearman: average (mid) ranks, then Pearson —
    # pandas' rank(method="average") supplies the independent ranking
    ev, _ = frames
    daily = ev.groupby("day").agg(x=("cents", "size"), y=("cents", "sum"))
    rx = daily["x"].rank(method="average").to_numpy()
    ry = daily["y"].rank(method="average").to_numpy()
    rho = float(np.corrcoef(rx, ry)[0, 1])
    got = _one(spark, sf_dir, "q_spearman").iloc[0]
    assert got["n_days"] == len(daily)
    assert abs(got["rho"] - round(rho, 6)) <= 2e-6


def _pr_ks_matches_textbook_cdf_scan(spark, sf_dir, frames):
    _, orders = frames
    cents = (orders["o_totalprice"] * 100).round(0).astype("int64")
    s1 = np.sort(cents[orders["o_orderpriority"] == "1-URGENT"].to_numpy())
    s2 = np.sort(cents[orders["o_orderpriority"] == "5-LOW"].to_numpy())
    pooled = np.unique(np.concatenate([s1, s2]))
    f1 = np.searchsorted(s1, pooled, side="right") / len(s1)
    f2 = np.searchsorted(s2, pooled, side="right") / len(s2)
    d = float(np.abs(f1 - f2).max())
    got = _one(spark, sf_dir, "q_ks_test").iloc[0]
    assert got["n_urgent"] == len(s1) and got["n_low"] == len(s2)
    assert abs(got["ks_d"] - round(d, 6)) <= 2e-6


def _pr_theilsen_matches_pairwise_median(spark, sf_dir, frames):
    ev, _ = frames
    daily = ev.groupby("day").size()
    x = np.array([(d - pd.Timestamp("2024-01-01").date()).days for d in daily.index])
    y = daily.to_numpy()
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(len(x))
        if x[i] < x[j]
    ]
    slopes.sort()
    med = slopes[(len(slopes) - 1) // 2]  # lower-middle order statistic
    got = _one(spark, sf_dir, "q_theilsen_trend").iloc[0]
    assert got["n_pairs"] == len(slopes)
    assert abs(got["theil_sen_slope"] - med) <= 2e-6


def _pr_benford_matches_digit_histogram(spark, sf_dir, frames):
    _, orders = frames
    digits = orders["o_totalprice"].map(lambda v: int(f"{v:.2f}"[0]))
    counts = digits[digits >= 1].value_counts()
    total = int(counts.sum())
    got = _one(spark, sf_dir, "q_benford").set_index("d")
    assert sorted(got.index) == sorted(counts.index)
    for d, n in counts.items():
        row = got.loc[d]
        assert row["n"] == n
        assert row["observed_ppm"] == n * 1_000_000 // total
        expected = round(math.log10(1 + 1 / d) * 1_000_000)
        assert row["expected_ppm"] == expected
        assert row["deviation_ppm"] == row["observed_ppm"] - expected


def _pr_wilson_matches_textbook_bound(spark, sf_dir, frames):
    ev, _ = frames
    purchasers = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    per = ev.groupby(["user_id", "event_type"]).size().reset_index()
    got = _one(spark, sf_dir, "q_wilson_ranking").set_index("event_type")
    z = 1.96
    for et, g in per.groupby("event_type"):
        n = len(g)
        pos = sum(1 for u in g["user_id"] if u in purchasers)
        p = pos / n
        lower = (
            p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
        ) / (1 + z * z / n)
        row = got.loc[et]
        assert row["n"] == n and row["pos"] == pos, et
        assert abs(row["wilson_lower"] - round(lower, 6)) <= 2e-6, et


def _pr_autocorrelation_matches_pearson_per_lag(spark, sf_dir, frames):
    ev, _ = frames
    y = ev.groupby("day").size().sort_index().to_numpy(dtype="float64")
    got = _one(spark, sf_dir, "q_autocorrelation").set_index("lag")
    for lag in got.index:
        a, b = y[:-lag], y[lag:]
        r = float(np.corrcoef(a, b)[0, 1])
        row = got.loc[lag]
        assert row["n_pairs"] == len(a), lag
        assert abs(row["r"] - round(r, 6)) <= 2e-6, lag


def _pr_chisquare_matches_contingency_formula(spark, sf_dir, frames):
    ev, _ = frames
    dow = pd.to_datetime(ev["ts"]).dt.dayofweek
    # Spark dayofweek: 1=Sunday..7=Saturday; pandas: 0=Monday..6=Sunday —
    # chi2 is label-invariant, only the cell partition matters, which is
    # identical; n_cells too.
    table = pd.crosstab(ev["event_type"], dow)
    o = table.to_numpy(dtype="float64")
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / o.sum()
    chi2 = float(((o - e) ** 2 / e)[o + e > 0].sum())
    got = _one(spark, sf_dir, "q_chisquare").iloc[0]
    assert got["n_cells"] == int((table > 0).to_numpy().sum())
    # the query rounds each cell term to micro before summing: allow the
    # accumulated per-cell rounding (n_cells * 0.5 micro) plus float slack
    assert abs(got["chi2"] - chi2) <= got["n_cells"] * 1e-6 + 1e-4


def _pr_ols_matches_numpy_least_squares(spark, sf_dir, frames):
    ev, _ = frames
    base = pd.Timestamp("2024-01-01").date()
    got = _one(spark, sf_dir, "q_ols_trend").set_index("event_type")
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day").size()
        x = np.array([(d - base).days for d in daily.index], dtype="float64")
        y = daily.to_numpy(dtype="float64")
        slope, intercept = np.polyfit(x, y, 1)
        r2 = float(np.corrcoef(x, y)[0, 1]) ** 2
        row = got.loc[et]
        assert row["n_days"] == len(x), et
        assert abs(row["slope"] - round(float(slope), 6)) <= 2e-6, et
        assert abs(row["intercept"] - round(float(intercept), 6)) <= 2e-6, et
        assert abs(row["r2"] - round(r2, 6)) <= 2e-6, et


def _pr_weekly_correlation_matches_numpy_pearson(spark, sf_dir, frames):
    ev, _ = frames
    daily = (
        ev.groupby("day")
        .agg(x=("cents", "size"), y=("cents", "sum"))
        .reset_index()
    )
    # date_trunc('week') is Monday-start
    daily["week"] = pd.to_datetime(daily["day"]).dt.to_period("W-SUN").dt.start_time.dt.date
    got = _one(spark, sf_dir, "q_weekly_correlation").set_index("week")
    for wk, g in daily.groupby("week"):
        r = float(np.corrcoef(g["x"], g["y"])[0, 1])
        row = got.loc[wk]
        assert row["n_days"] == len(g), wk
        assert abs(row["pearson_r"] - round(r, 6)) <= 2e-6, wk


def _pr_runs_test_matches_wald_wolfowitz(spark, sf_dir, frames):
    ev, _ = frames
    y = ev.groupby("day").size().sort_index().to_numpy()
    dy = np.diff(y)
    s = np.sign(dy[dy != 0])
    n1 = int((s == 1).sum())
    n2 = int((s == -1).sum())
    runs = 1 + int((s[1:] != s[:-1]).sum())
    n = n1 + n2
    e_r = 2 * n1 * n2 / n + 1
    var_r = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    z = (runs - e_r) / math.sqrt(var_r)
    got = _one(spark, sf_dir, "q_runs_test").iloc[0]
    assert (got["n_up"], got["n_down"], got["n_runs"]) == (n1, n2, runs)
    assert abs(got["z"] - round(z, 4)) <= 2e-4
    assert bool(got["significant"]) == (abs(z) > 1.96)


def _pr_iqr_outliers_match_tukey_fences(spark, sf_dir, frames):
    ev, _ = frames
    daily = ev.groupby("day").size()
    y = daily.to_numpy(dtype="float64")
    q1_4 = round(float(np.percentile(y, 25)) * 4)
    q3_4 = round(float(np.percentile(y, 75)) * 4)
    lo8 = 2 * q1_4 - 3 * (q3_4 - q1_4)
    hi8 = 2 * q3_4 + 3 * (q3_4 - q1_4)
    want = sorted(
        (d, int(v), lo8, hi8)
        for d, v in daily.items()
        if 8 * v < lo8 or 8 * v > hi8
    )
    got = sorted(map(tuple, _one(spark, sf_dir, "q_iqr_outliers").itertuples(index=False)))
    assert got == want


def _pr_cusum_matches_integer_argmax(spark, sf_dir, frames):
    ev, _ = frames
    got = _one(spark, sf_dir, "q_cusum").set_index("event_type")
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        s = daily.cumsum().to_numpy(dtype="int64")
        n, st = len(daily), int(daily.sum())
        dev = np.abs(n * s - np.arange(1, n + 1, dtype="int64") * st)
        best = int(dev.argmax())  # argmax returns FIRST max = earliest day
        row = got.loc[et]
        assert row["change_day"] == daily.index[best], et
        assert row["dev_num"] == int(dev[best]) and row["n_days"] == n, et
        assert abs(row["dev_rel"] - round(int(dev[best]) / (n * st), 6)) <= 2e-6, et


def _pr_lorenz_matches_closed_form_ntile(spark, sf_dir, frames):
    ev, _ = frames
    per_user = (
        ev.groupby("user_id")["cents"].sum().reset_index().sort_values(
            ["cents", "user_id"]
        )
    )
    x = per_user["cents"].to_numpy(dtype="int64")
    n, total = len(x), int(x.sum())
    q, r = divmod(n, 10)
    sizes = [q + 1] * r + [q] * (10 - r)
    got = _one(spark, sf_dir, "q_lorenz_curve").set_index("decile")
    pos, cum_v = 0, 0
    for tile, size in enumerate(sizes, start=1):
        if size == 0:
            continue
        v = int(x[pos : pos + size].sum())
        pos += size
        cum_v += v
        row = got.loc[tile]
        assert row["n_users"] == size and row["value_cents"] == v, tile
        assert row["share_ppm"] == v * 1_000_000 // total, tile
        # cumulative share floors the CUMULATIVE value once (no drift
        # accumulation from per-decile flooring)
        assert row["cum_share_ppm"] == cum_v * 1_000_000 // total, tile


def _pr_seasonality_matches_integer_index(spark, sf_dir, frames):
    ev, _ = frames
    daily = ev.groupby("day").size().reset_index(name="n")
    anchor = pd.Timestamp("2024-01-07").date()
    daily["dow"] = daily["day"].map(lambda d: (d - anchor).days % 7)
    kt, st = len(daily), int(daily["n"].sum())
    got = _one(spark, sf_dir, "q_seasonality").set_index("dow")
    for dow, g in daily.groupby("dow"):
        k, s = len(g), int(g["n"].sum())
        row = got.loc[dow]
        assert row["n_days"] == k and row["n_events"] == s, dow
        assert row["index_ppm"] == s * kt * 1_000_000 // (st * k), dow


def _pr_churn_matches_set_difference(spark, sf_dir, frames):
    ev, _ = frames
    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    act = (
        pd.DataFrame({"user_id": ev["user_id"], "week": wk})
        .drop_duplicates()
        .groupby("week")["user_id"]
        .agg(set)
        .sort_index()
    )
    weeks = list(act.index)
    got = _one(spark, sf_dir, "q_churn").set_index("week")
    assert list(got.index) == weeks[:-1]  # last week (no successor) excluded
    by_week = dict(act)
    for i, w in enumerate(weeks[:-1]):
        nxt_date = w + pd.Timedelta(days=7).to_pytimedelta()
        churned = len(by_week[w] - by_week.get(nxt_date, set()))
        row = got.loc[w]
        assert row["n_active"] == len(by_week[w]), w
        assert row["n_churned"] == churned, w
        assert row["churn_ppm"] == churned * 1_000_000 // len(by_week[w]), w


def _pr_char_entropy_matches_counter_formula(spark, sf_dir):
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    got = _one(spark, sf_dir, "x_char_entropy").set_index("doc_id")
    for _, rec in docs.iterrows():
        c = Counter(rec["text"])
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        row = got.loc[rec["doc_id"]]
        assert row["n_chars"] == n and row["alphabet_size"] == len(c)
        # per-char micro-nat rounding inside the query: allow its
        # accumulation over the alphabet plus float slack
        assert abs(row["entropy_nats"] - h) <= len(c) * 1e-6 + 1e-4


def _pr_ab_ztest_and_power_match_closed_forms(spark, sf_dir, frames):
    ev, _ = frames
    anchor = pd.Timestamp("2024-01-07").date()
    dow = ev["day"].map(lambda d: (d - anchor).days % 7)
    weekend = dow.isin([0, 6])
    purchase = ev["event_type"] == "purchase"
    n1, x1 = int(weekend.sum()), int((weekend & purchase).sum())
    n2, x2 = int((~weekend).sum()), int((~weekend & purchase).sum())
    p1, p2, pp = x1 / n1, x2 / n2, (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    got = _one(spark, sf_dir, "q_ab_ztest").iloc[0]
    assert (got["n_weekend"], got["x_weekend"]) == (n1, x1)
    assert (got["n_weekday"], got["x_weekday"]) == (n2, x2)
    assert abs(got["z"] - round(z, 4)) <= 2e-4
    assert bool(got["significant"]) == (abs(z) > 1.96)

    mde = (1.96 + 0.8416) * math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    power = _one(spark, sf_dir, "q_ab_power").iloc[0]
    assert (power["n_weekend"], power["n_weekday"]) == (n1, n2)
    assert power["pooled_rate_ppm"] == (x1 + x2) * 1_000_000 // (n1 + n2)
    assert abs(power["mde_ppm"] - round(mde * 1_000_000)) <= 1


def _pr_histogram_quantiles_match_cumcount_scan(spark, sf_dir, frames):
    _, orders = frames
    cents = (orders["o_totalprice"] * 100).round(0).astype("int64")
    bins = (cents // 50_000).astype("int64")  # $500 bins
    counts = bins.value_counts().sort_index()
    cum = counts.cumsum()
    total = int(counts.sum())
    got = _one(spark, sf_dir, "q_histogram_quantiles").set_index("pct")
    for pct in got.index:
        want_bin = int(cum.index[(cum * 100 >= pct * total).argmax()])
        row = got.loc[pct]
        assert row["bin"] == want_bin, pct
        assert row["est_upper_dollars"] == (want_bin + 1) * 500, pct
        assert row["n_orders"] == total, pct


def _pr_interpolation_matches_linear_formula(spark, sf_dir, frames):
    ev, _ = frames
    daily = ev.groupby("day").size()
    days = pd.date_range(min(daily.index), max(daily.index), freq="D").date
    # the query masks every day-of-month divisible by 7 to force gaps
    v = {d: (None if d.day % 7 == 0 else daily.get(d)) for d in days}
    got = _one(spark, sf_dir, "q_interpolate_daily").set_index("d")
    assert list(got.index) == list(days)
    obs_days = [d for d in days if v[d] is not None]
    for d in days:
        row = got.loc[d]
        if v[d] is not None:
            assert row["observed"] == v[d] and row["value_milli"] == v[d] * 1000, d
            continue
        assert pd.isna(row["observed"]), d
        prevs = [p for p in obs_days if p < d]
        nexts = [p for p in obs_days if p > d]
        if prevs and nexts:
            p, nx = prevs[-1], nexts[0]
            want = v[p] * 1000 + (v[nx] - v[p]) * 1000 * (d - p).days // (nx - p).days
        else:
            edge = prevs[-1] if prevs else nexts[0]
            want = v[edge] * 1000
        assert row["value_milli"] == want, d


def _pr_event_transitions_match_pandas_lag(spark, sf_dir, frames):
    ev, _ = frames
    s = ev.sort_values(["user_id", "ts", "event_id"])
    pairs = {}
    for _, g in s.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    row_n = {}
    for (a, _), n in pairs.items():
        row_n[a] = row_n.get(a, 0) + n
    got = _one(spark, sf_dir, "q_event_transitions")
    assert len(got) == len(pairs)
    for rec in got.itertuples(index=False):
        n = pairs[(rec.from_type, rec.to_type)]
        assert rec.n == n and rec.row_n == row_n[rec.from_type]
        assert rec.ppm == n * 1_000_000 // row_n[rec.from_type]


def _pr_user_ewma_matches_python_fold(spark, sf_dir, frames):
    ev, _ = frames
    got = _one(spark, sf_dir, "q_user_ewma").set_index("user_id")
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        vs = list(g["cents"])
        acc = vs[0]
        for x in vs[1:]:
            acc = (acc + x) // 2  # positive -> trunc == floor
        row = got.loc[uid]
        assert row["n_events"] == len(vs) and row["ewma_cents"] == acc, uid


def _pr_rfm_segments_match_closed_form_ntiles(spark, sf_dir, frames):
    ev, _ = frames
    ref_date = pd.Timestamp("2024-01-30").date()
    per = ev.groupby("user_id").agg(
        last=("day", "max"), frequency=("cents", "size"), monetary=("cents", "sum")
    )
    per["recency_days"] = per["last"].map(lambda d: (ref_date - d).days)

    def ntile4(ordered_ids):
        n = len(ordered_ids)
        q, r = divmod(n, 4)
        out, pos = {}, 0
        for tile in range(1, 5):
            size = q + 1 if tile <= r else q
            for uid in ordered_ids[pos : pos + size]:
                out[uid] = tile
            pos += size
        return out

    r_tile = ntile4(
        list(per.sort_values(["recency_days"], ascending=False)
             .sort_values("user_id", kind="stable")
             .sort_values("recency_days", ascending=False, kind="stable").index)
    )
    f_tile = ntile4(
        list(per.sort_values("user_id", kind="stable")
             .sort_values("frequency", kind="stable").index)
    )
    m_tile = ntile4(
        list(per.sort_values("user_id", kind="stable")
             .sort_values("monetary", kind="stable").index)
    )
    seg = {}
    for uid in per.index:
        code = r_tile[uid] * 100 + f_tile[uid] * 10 + m_tile[uid]
        seg.setdefault(code, []).append(uid)
    got = _one(spark, sf_dir, "q_rfm_segments").set_index("rfm_segment")
    assert sorted(got.index) == sorted(seg)
    for code, uids in seg.items():
        row = got.loc[code]
        assert row["n_users"] == len(uids), code
        total = int(per.loc[uids, "monetary"].sum())
        assert row["mean_monetary_cents"] == total // len(uids), code


def _pr_ttr_and_source_entropy_match_token_counts(spark, sf_dir):
    import re
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    per_source: dict[str, Counter] = {}
    for _, rec in docs.iterrows():
        toks = [w for w in re.split(r"[^a-z]+", rec["text"].lower()) if w]
        per_source.setdefault(rec["source"], Counter()).update(toks)
    ttr = _one(spark, sf_dir, "x_ttr_by_source").set_index("source")
    ent = _one(spark, sf_dir, "x_source_entropy").set_index("source")
    for src, c in per_source.items():
        n, types = sum(c.values()), len(c)
        trow = ttr.loc[src]
        assert trow["n_tokens"] == n and trow["n_types"] == types, src
        assert trow["ttr_milli"] == types * 1000 // n, src
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        erow = ent.loc[src]
        assert erow["n_tokens"] == n and erow["n_types"] == types, src
        assert abs(erow["entropy_nats"] - h) <= types * 1e-6 + 1e-4, src


def _pr_weekly_anomalies_match_integer_ztest(spark, sf_dir, frames):
    ev, _ = frames
    cells = ev.groupby(["event_type", "day"]).size().rename("n").reset_index()
    got = _one(spark, sf_dir, "q_weekly_anomalies").set_index(["week", "event_type"])
    assert len(got) == len(cells)
    for et, g in cells.groupby("event_type"):
        k, s, sq = len(g), int(g["n"].sum()), int((g["n"] ** 2).sum())
        for rec in g.itertuples(index=False):
            # (n - s/k)^2 > 4*(sq/k - (s/k)^2), cross-multiplied by k^2
            flag = (rec.n * k - s) ** 2 > 4 * (k * sq - s * s)
            row = got.loc[(rec.day, et)]
            assert row["n"] == rec.n and bool(row["is_anomaly"]) == flag, (et, rec.day)


def _pr_seasonal_adjust_matches_index_division(spark, sf_dir, frames):
    ev, _ = frames
    daily = ev.groupby("day").size().rename("y").reset_index()
    anchor = pd.Timestamp("2024-01-07").date()
    daily["dow"] = daily["day"].map(lambda d: (d - anchor).days % 7)
    kt, st = len(daily), int(daily["y"].sum())
    idx = {
        dow: int(g["y"].sum()) * kt * 1_000_000 // (st * len(g))
        for dow, g in daily.groupby("dow")
    }
    got = _one(spark, sf_dir, "q_seasonal_adjust").set_index("d")
    assert len(got) == len(daily)
    for rec in daily.itertuples(index=False):
        row = got.loc[rec.day]
        assert row["y"] == rec.y and row["index_ppm"] == idx[rec.dow], rec.day
        assert row["adjusted"] == rec.y * 1_000_000 // idx[rec.dow], rec.day


def _pr_ltv_cohorts_match_cumulative_grid(spark, sf_dir, frames):
    ev, _ = frames
    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    df = pd.DataFrame(
        {"user_id": ev["user_id"], "week": wk, "cents": ev["cents"]}
    )
    cohort = df.groupby("user_id")["week"].min().rename("cohort")
    df = df.join(cohort, on="user_id")
    df["age_weeks"] = (
        pd.to_datetime(df["week"]) - pd.to_datetime(df["cohort"])
    ).dt.days // 7
    cohort_n = cohort.value_counts()
    grid = (
        df.groupby(["cohort", "age_weeks"])["cents"].sum().rename("v").reset_index()
    )
    got = _one(spark, sf_dir, "q_ltv_cohorts").set_index(["cohort", "age_weeks"])
    for co, g in grid.sort_values("age_weeks").groupby("cohort"):
        n = int(cohort_n[co])
        cum = 0
        for rec in g.itertuples(index=False):
            cum += int(rec.v)
            row = got.loc[(co, rec.age_weeks)]
            assert row["cohort_n"] == n, (co, rec.age_weeks)
            assert row["cum_cents"] == cum, (co, rec.age_weeks)
            assert row["ltv_milli_per_user"] == cum * 10 // n, (co, rec.age_weeks)


def _pr_vocab_growth_matches_first_seen_buckets(spark, sf_dir):
    import re

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    first: dict[str, int] = {}
    for _, rec in docs.sort_values("doc_id").iterrows():
        for w in re.split(r"[^a-z]+", rec["text"].lower()):
            if w and w not in first:
                first[w] = int(rec["doc_id"])
    lo, hi = int(docs["doc_id"].min()), int(docs["doc_id"].max())
    span = max(hi - lo + 1, 1)
    buckets: dict[int, int] = {}
    for d in first.values():
        b = min(9, (d - lo) * 10 // span)
        buckets[b] = buckets.get(b, 0) + 1
    got = _one(spark, sf_dir, "x_vocab_growth").set_index("bucket")
    assert sorted(got.index) == sorted(buckets)
    cum = 0
    for b in sorted(buckets):
        cum += buckets[b]
        row = got.loc[b]
        assert row["new_types"] == buckets[b] and row["cumulative_types"] == cum, b


def _pr_prefix_templates_match_counted_prefixes(spark, sf_dir):
    import re
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select("text").toPandas()
    prefixes = Counter(
        " ".join(re.split(r"\s+", t)[:5]) for t in docs["text"]
    )
    nd = len(docs)
    want = {p: n for p, n in prefixes.items() if n >= 2}
    got = _one(spark, sf_dir, "x_prefix_templates").set_index("prefix")
    assert sorted(got.index) == sorted(want)
    for p, n in want.items():
        row = got.loc[p]
        assert row["n_docs"] == n and row["share_ppm"] == n * 1_000_000 // nd, p


def _pr_weekend_lift_matches_rate_ratio(spark, sf_dir, frames):
    ev, _ = frames
    anchor = pd.Timestamp("2024-01-07").date()
    is_we = ev["day"].map(lambda d: (d - anchor).days % 7 in (0, 6))
    days = ev.assign(we=is_we).drop_duplicates("day")
    we_days = int(days["we"].sum())
    wd_days = int((~days["we"]).sum())
    got = _one(spark, sf_dir, "q_weekend_lift").set_index("event_type")
    for et, g in ev.assign(we=is_we).groupby("event_type"):
        we, wd = int(g["we"].sum()), int((~g["we"]).sum())
        row = got.loc[et]
        assert (row["weekend_events"], row["weekday_events"]) == (we, wd), et
        assert row["rate_lift_ppm"] == we * wd_days * 1_000_000 // max(
            1, wd * we_days
        ), et


def _pr_stickiness_matches_set_cardinalities(spark, sf_dir, frames):
    ev, _ = frames
    ts = pd.to_datetime(ev["ts"])
    week = ts.dt.to_period("W-SUN").dt.start_time.dt.date
    month = ts.dt.to_period("M").dt.start_time.dt.date
    df = pd.DataFrame({"u": ev["user_id"], "week": week, "month": month})
    got = _one(spark, sf_dir, "q_stickiness").set_index("week")
    for wk, g in df.groupby("week"):
        wau = g["u"].nunique()
        months = g["month"].unique()
        # each week joins its calendar month(s); MAX picks the larger MAU
        mau = max(df.loc[df["month"] == m, "u"].nunique() for m in months)
        row = got.loc[wk]
        assert (row["wau"], row["mau"]) == (wau, mau), wk
        assert row["stickiness_ppm"] == wau * 1_000_000 // mau, wk


def _pr_ma_crossover_matches_rolling_sums(spark, sf_dir, frames):
    ev, _ = frames
    daily = ev.groupby("day").size().sort_index()
    y = daily.to_numpy(dtype="int64")
    want = []
    prev = None
    for i in range(6, len(y)):
        s3, s7 = int(y[i - 2 : i + 1].sum()), int(y[i - 6 : i + 1].sum())
        st = 1 if 7 * s3 > 3 * s7 else -1
        if prev is not None and st != prev:
            want.append(
                (daily.index[i], int(y[i]), s3, s7, "golden" if st == 1 else "death")
            )
        prev = st
    got = sorted(map(tuple, _one(spark, sf_dir, "q_ma_crossover").itertuples(index=False)))
    assert got == sorted(want)


def _pr_interarrival_matches_log2_histogram(spark, sf_dir, frames):
    ev, _ = frames
    s = ev.sort_values(["ts", "event_id"])
    buckets: dict[int, int] = {}
    for _, g in s.groupby("user_id"):
        t = pd.to_datetime(g["ts"]).astype("int64") // 1000  # microseconds
        for gap_us in np.diff(t.to_numpy()):
            gap_min = int(gap_us) // 60_000_000
            # bucket b holds gaps in [2^(b-1), 2^b) minutes, b=0 is <1 min,
            # b=11 collects everything >= 1024 min
            b = 0 if gap_min < 1 else min(11, int(math.floor(math.log2(gap_min))) + 1)
            buckets[b] = buckets.get(b, 0) + 1
    total = sum(buckets.values())
    got = _one(spark, sf_dir, "q_interarrival").set_index("log2_min_bucket")
    assert sorted(got.index) == sorted(buckets)
    for b, n in buckets.items():
        row = got.loc[b]
        assert row["n_gaps"] == n and row["share_ppm"] == n * 1_000_000 // total, b


def _pr_punchcard_matches_crosstab(spark, sf_dir, frames):
    ev, _ = frames
    anchor = pd.Timestamp("2024-01-07").date()
    dow = ev["day"].map(lambda d: (d - anchor).days % 7)
    hour = pd.to_datetime(ev["ts"]).dt.hour
    cells = pd.DataFrame({"dow": dow, "hour": hour}).value_counts()
    total = int(cells.sum())
    got = _one(spark, sf_dir, "q_punchcard").set_index(["dow", "hour"])
    assert len(got) == len(cells)
    for (d, h), n in cells.items():
        row = got.loc[(d, h)]
        assert row["n_events"] == n and row["share_ppm"] == n * 1_000_000 // total


def _pr_adoption_and_new_returning_match_first_seen(spark, sf_dir, frames):
    ev, _ = frames
    first_day = ev.groupby("user_id")["day"].min()
    per_day = first_day.value_counts().sort_index()
    got = _one(spark, sf_dir, "q_adoption_curve").set_index("d")
    cum = 0
    assert len(got) == len(per_day)
    for d, n in per_day.items():
        cum += int(n)
        row = got.loc[d]
        assert row["n_new"] == n and row["cumulative_users"] == cum, d

    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    act = pd.DataFrame({"u": ev["user_id"], "week": wk}).drop_duplicates()
    first_week = act.groupby("u")["week"].min()
    nvr = _one(spark, sf_dir, "q_new_vs_returning").set_index("week")
    for w, g in act.groupby("week"):
        n_active = len(g)
        n_new = int((first_week[g["u"]] == w).sum())
        row = nvr.loc[w]
        assert (row["n_active"], row["n_new"]) == (n_active, n_new), w
        assert row["n_returning"] == n_active - n_new, w
        assert row["new_share_ppm"] == n_new * 1_000_000 // n_active, w


def _pr_key_skew_matches_counted_ranking(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source").toPandas()
    counts = docs["source"].value_counts()
    total, n_keys = int(counts.sum()), len(counts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = _one(spark, sf_dir, "q_key_skew").set_index("rank")
    assert len(got) == len(ranked)
    for r, (key, n) in enumerate(ranked, start=1):
        row = got.loc[r]
        assert row["key"] == key and row["n_rows"] == n, r
        assert row["share_ppm"] == n * 1_000_000 // total, r
        assert row["pct_of_mean"] == n * 100 * n_keys // total, r


def _pr_weekly_ctr_matches_counts(spark, sf_dir, frames):
    ev, _ = frames
    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    df = pd.DataFrame({"week": wk, "t": ev["event_type"]})
    got = _one(spark, sf_dir, "q_weekly_ctr").set_index("week")
    for w, g in df.groupby("week"):
        v = int((g["t"] == "view").sum())
        c = int((g["t"] == "click").sum())
        p = int((g["t"] == "purchase").sum())
        row = got.loc[w]
        assert (row["views"], row["clicks"], row["purchases"]) == (v, c, p), w
        assert row["ctr_ppm"] == c * 1_000_000 // v, w
        assert row["purchase_rate_ppm"] == p * 1_000_000 // c, w


def _pr_return_rate_matches_monthly_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_extendedprice"
    ).toPandas()
    li["month"] = pd.to_datetime(li["l_shipdate"]).dt.to_period("M").dt.start_time.dt.date
    li["cents"] = (li["l_extendedprice"] * 100).round(0).astype("int64")
    got = _one(spark, sf_dir, "q_return_rate").set_index("month")
    for m, g in li.groupby("month"):
        n, ret = len(g), int((g["l_returnflag"] == "R").sum())
        rc = int(g["cents"].sum())
        rc_ret = int(g.loc[g["l_returnflag"] == "R", "cents"].sum())
        row = got.loc[m]
        assert (row["n_lines"], row["n_returned"]) == (n, ret), m
        assert row["return_ppm"] == ret * 1_000_000 // n, m
        assert row["value_return_ppm"] == rc_ret * 1_000_000 // rc, m


def _pr_aov_by_segment_matches_join_rollup(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).toPandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"] * 100).round(0).astype("int64")
    got = _one(spark, sf_dir, "q_aov_by_segment").set_index("c_mktsegment")
    for seg, g in j.groupby("c_mktsegment"):
        n, total = len(g), int(g["cents"].sum())
        row = got.loc[seg]
        assert (row["n_orders"], row["total_cents"]) == (n, total), seg
        assert row["aov_cents"] == total // n, seg


def _pr_fulfillment_latency_matches_percentiles(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    ).toPandas()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).toPandas()
    first = li.groupby("l_orderkey")["l_shipdate"].min().rename("ship")
    j = orders.join(first, on="o_orderkey", how="inner")
    j["days"] = (
        pd.to_datetime(j["ship"]) - pd.to_datetime(j["o_orderdate"])
    ).dt.days
    got = _one(spark, sf_dir, "q_fulfillment_latency").set_index("o_orderpriority")
    for pr, g in j.groupby("o_orderpriority"):
        d = g["days"].to_numpy(dtype="float64")
        row = got.loc[pr]
        assert row["n_orders"] == len(d), pr
        assert row["p50_days_x4"] == round(float(np.percentile(d, 50)) * 4), pr
        assert row["p90_days_x4"] == round(float(np.percentile(d, 90)) * 4), pr
        assert row["max_days"] == int(d.max()), pr


def _pr_cart_abandonment_matches_gap_sessions(spark, sf_dir, frames):
    ev, _ = frames
    s = ev.sort_values(["ts", "event_id"])
    sessions = []  # (first_ts, clicked, purchased)
    for _, g in s.groupby("user_id"):
        last = None
        cur = None
        for rec in g.itertuples(index=False):
            if last is None or (rec.ts - last).total_seconds() > 30 * 60:
                if cur:
                    sessions.append(cur)
                cur = [rec.ts, False, False]
            if rec.event_type == "click":
                cur[1] = True
            if rec.event_type == "purchase":
                cur[2] = True
            last = rec.ts
        if cur:
            sessions.append(cur)
    df = pd.DataFrame(sessions, columns=["t0", "clicked", "purchased"])
    df["week"] = pd.to_datetime(df["t0"]).dt.to_period("W-SUN").dt.start_time.dt.date
    got = _one(spark, sf_dir, "q_cart_abandonment").set_index("week")
    clicked = df[df["clicked"]]
    for w, g in clicked.groupby("week"):
        n, ab = len(g), int((~g["purchased"]).sum())
        row = got.loc[w]
        assert (row["n_click_sessions"], row["n_abandoned"]) == (n, ab), w
        assert row["abandonment_ppm"] == ab * 1_000_000 // n, w


def _pr_conversion_lag_matches_percentiles(spark, sf_dir, frames):
    ev, _ = frames
    lags = []
    for uid, g in ev.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        t_view = views.min()
        buys = g.loc[(g["event_type"] == "purchase") & (g["ts"] >= t_view), "ts"]
        if buys.empty:
            continue
        lags.append((buys.min() - t_view).total_seconds() * 1e6)
    a = np.array(lags, dtype="float64")
    got = _one(spark, sf_dir, "q_conversion_lag").iloc[0]
    assert got["n_users"] == len(a)
    for p, col in ((25, "p25"), (50, "p50"), (90, "p90")):
        assert abs(got[col] - round(float(np.percentile(a, p)), 1)) <= 0.2, col


def _pr_audience_overlap_matches_set_jaccard(spark, sf_dir, frames):
    ev, _ = frames
    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    by_week = (
        pd.DataFrame({"u": ev["user_id"], "week": wk})
        .drop_duplicates()
        .groupby("week")["u"]
        .agg(set)
    )
    weeks = list(by_week.index)
    got = _one(spark, sf_dir, "q_audience_overlap").set_index(["week_a", "week_b"])
    n_pairs = sum(1 for i in range(len(weeks)) for j in range(i + 1, len(weeks)))
    assert len(got) == n_pairs
    for i in range(len(weeks)):
        for j in range(i + 1, len(weeks)):
            a, b = by_week[weeks[i]], by_week[weeks[j]]
            inter, union = len(a & b), len(a | b)
            row = got.loc[(weeks[i], weeks[j])]
            assert (row["n_inter"], row["n_a"], row["n_b"]) == (inter, len(a), len(b))
            assert row["jaccard_ppm"] == inter * 1_000_000 // union


def _pr_range_frame_matches_calendar_window(spark, sf_dir, frames):
    ev, _ = frames
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("y").reset_index()
    )
    got = _one(spark, sf_dir, "q_range_frame").set_index(["event_type", "d"])
    assert len(got) == len(daily)
    for et, g in daily.groupby("event_type"):
        by_day = dict(zip(g["day"], g["y"]))
        for d, y in by_day.items():
            want = sum(
                v for dd, v in by_day.items() if 0 <= (d - dd).days <= 2
            )
            row = got.loc[(et, d)]
            assert row["y"] == y and row["rolling_3d"] == want, (et, d)


def _pr_weekly_mix_share_matches_delta(spark, sf_dir, frames):
    ev, _ = frames
    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    cells = (
        pd.DataFrame({"week": wk, "t": ev["event_type"]})
        .groupby(["week", "t"])
        .size()
        .rename("n")
        .reset_index()
    )
    tot = cells.groupby("week")["n"].sum()
    cells["share"] = [
        int(n) * 1_000_000 // int(tot[w]) for w, n in zip(cells["week"], cells["n"])
    ]
    got = _one(spark, sf_dir, "q_weekly_mix_share").set_index(["week", "event_type"])
    for t, g in cells.sort_values("week").groupby("t"):
        prev = None
        for rec in g.itertuples(index=False):
            row = got.loc[(rec.week, t)]
            assert row["n_events"] == rec.n and row["share_ppm"] == rec.share, (t, rec.week)
            if prev is None:
                assert pd.isna(row["share_delta_ppm"]), (t, rec.week)
            else:
                assert row["share_delta_ppm"] == rec.share - prev, (t, rec.week)
            prev = rec.share


def _pr_variant_props_matches_json_histogram(spark, sf_dir, frames):
    import json as _json

    ev, _ = frames
    k = ev["props"].map(lambda p: _json.loads(p).get("k") if p else None)
    dec = (pd.Series(k, dtype="float64") // 10 * 10).astype("int64")
    counts = dec.value_counts()
    got = _one(spark, sf_dir, "q_variant_props").set_index("k_decade")
    assert sorted(got.index) == sorted(counts.index)
    for d, n in counts.items():
        assert got.loc[d]["n_events"] == n, d


def _pr_association_rules_match_basket_counts(spark, sf_dir, frames):
    ev, _ = frames
    baskets = ev.groupby("user_id")["event_type"].agg(set)
    n_users = len(baskets)
    types = sorted(set().union(*baskets))
    got = _one(spark, sf_dir, "q_association_rules").set_index(["ante", "cons"])
    for a in types:
        n_a = sum(1 for b in baskets if a in b)
        for c in types:
            if a == c:
                continue
            n_c = sum(1 for b in baskets if c in b)
            n_both = sum(1 for b in baskets if a in b and c in b)
            if (a, c) not in got.index:
                assert n_both == 0, (a, c)
                continue
            row = got.loc[(a, c)]
            assert row["n_both"] == n_both, (a, c)
            assert row["support_ppm"] == n_both * 1_000_000 // n_users, (a, c)
            assert row["confidence_ppm"] == n_both * 1_000_000 // n_a, (a, c)
            assert row["lift_ppm"] == n_both * n_users * 1_000_000 // (n_a * n_c), (a, c)


def _pr_sequence_match_matches_python_regex(spark, sf_dir, frames):
    import re

    ev, _ = frames
    seqs = {
        uid: "".join(
            t[0] for t in g.sort_values(["ts", "event_id"])["event_type"]
        )
        for uid, g in ev.groupby("user_id")
    }
    pats = {
        "view_then_purchase": "v.*p",
        "view_click_purchase": "v.*c.*p",
        "error_then_retry": "e.+e",
        "signup_first": "^s",
    }
    got = _one(spark, sf_dir, "q_sequence_match").set_index("pattern")
    n_users = len(seqs)
    for name, pat in pats.items():
        n = sum(1 for s in seqs.values() if re.search(pat, s))
        row = got.loc[name]
        assert (row["n_matched"], row["n_users"]) == (n, n_users), name
        assert row["match_ppm"] == n * 1_000_000 // n_users, name


def _pr_zorder_keys_match_python_morton(spark, sf_dir):
    def morton(p, s):
        z = 0
        for i in range(16):
            z |= ((p >> i) & 1) << (2 * i)
            z |= ((s >> i) & 1) << (2 * i + 1)
        return z

    got = _one(spark, sf_dir, "q_zorder_keys")
    assert len(got) > 0
    for rec in got.itertuples(index=False):
        assert rec.zkey == morton(int(rec.l_partkey), int(rec.l_suppkey)), (
            rec.l_partkey,
            rec.l_suppkey,
        )


def _pr_metrics_events_match_weekly_grid(spark, sf_dir, frames):
    ev, _ = frames
    wk = pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    df = ev.assign(week=wk)
    got = _one(spark, sf_dir, "d_metrics_events").set_index("metric_time")
    assert len(got) == df["week"].nunique()
    for w, g in df.groupby("week"):
        total, n = int(g["cents"].sum()), len(g)
        purchases = int((g["event_type"] == "purchase").sum())
        buyers = g.loc[g["event_type"] == "purchase", "user_id"].nunique()
        row = got.loc[w]
        assert (row["total_value_cents"], row["n_events"]) == (total, n), w
        assert (row["purchases"], row["buyers"]) == (purchases, buyers), w
        assert row["cents_per_event"] == total // n, w


# ---------------------------------------------------------------------------
# Pooled lane (same trade as tests/test_ext.py): the replays are pure
# (shared read-only session + testdata), serially ~46 s; a 12-thread pool
# runs them in ~the longest member.  Failures surface per-name with the
# traceback.  The shared pandas frames are computed once here (replacing
# the module fixture for the pooled path).
# ---------------------------------------------------------------------------

def _pr_profile_orders_matches_pandas_profile(spark, sf_dir, frames):
    """Column profile: null/distinct counts for every column and the
    lexicographic string min/max for the string-safe columns (int keys,
    strings, ISO dates — float-to-string rendering differs by engine and
    is deliberately not replayed)."""
    _, orders = frames
    got = _one(spark, sf_dir, "q_profile_orders").set_index("column_name")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    for c in cols:
        s = orders[c]
        assert got.loc[c, "n_null"] == int(s.isna().sum()), c
        assert got.loc[c, "n_distinct"] == int(s.nunique()), c
    for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"):
        strs = orders[c].dropna().astype(str)
        assert got.loc[c, "min_str"] == strs.min(), c
        assert got.loc[c, "max_str"] == strs.max(), c
    # the parquet column is a midnight timestamp; Spark's string cast
    # renders 'YYYY-MM-DD HH:MM:SS' (lexicographic == chronological)
    d = pd.to_datetime(orders["o_orderdate"]).dt.strftime("%Y-%m-%d %H:%M:%S")
    assert got.loc["o_orderdate", "min_str"] == d.min()
    assert got.loc["o_orderdate", "max_str"] == d.max()


def _pr_table_fingerprints_match_hashlib_xor(spark, sf_dir):
    """Order-independent fingerprint: hashlib md5 over the canonical
    'col1|col2|...' string, first 15 hex chars as int64, XOR-reduced —
    an independent implementation of the whole hash path."""
    import hashlib
    from functools import reduce

    specs = {
        "region": ["r_regionkey", "r_name"],
        "nation": ["n_nationkey", "n_name", "n_regionkey"],
        "customer": ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
    }
    got = _one(spark, sf_dir, "q_table_fingerprints").set_index("table_name")
    for tbl, cols in specs.items():
        pdf = load_table(spark, sf_dir, tbl).toPandas()
        hs = [
            int(
                hashlib.md5(
                    "|".join(str(v) for v in row).encode()
                ).hexdigest()[:15],
                16,
            )
            for row in pdf[cols].itertuples(index=False)
        ]
        assert got.loc[tbl, "n_rows"] == len(hs)
        assert got.loc[tbl, "fingerprint"] == reduce(lambda a, b: a ^ b, hs), tbl


def _pr_session_paths_match_python_triples(spark, sf_dir, frames):
    """Top-k 3-step session paths: plain-Python sessionization (30-min
    gap), consecutive triples per session, Counter ranking with the
    (desc n, s1, s2, s3) tie-break, exact ppm shares."""
    from collections import Counter

    from dbt_trill_shop_spark.operators.analytics import SESSION_GAP_MINUTES

    ev, _ = frames
    gap_us = SESSION_GAP_MINUTES * 60 * 1_000_000
    counts: Counter = Counter()
    df = ev.sort_values(["user_id", "ts", "event_id"])
    for _, g in df.groupby("user_id"):
        ts_us = pd.to_datetime(g["ts"]).astype("int64").to_numpy() // 1000
        types = g["event_type"].tolist()
        sess: list[list[str]] = []
        for i, t in enumerate(types):
            if i == 0 or ts_us[i] - ts_us[i - 1] > gap_us:
                sess.append([])
            sess[-1].append(t)
        for s in sess:
            for i in range(len(s) - 2):
                counts[(s[i], s[i + 1], s[i + 2])] += 1
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = _one(spark, sf_dir, "q_session_paths")
    assert len(got) == min(15, len(ranked))
    for row, (path, n) in zip(got.itertuples(index=False), ranked):
        assert (row.s1, row.s2, row.s3) == path, (row, path)
        assert row.n == n
        assert row.share_ppm == n * 1_000_000 // total


def _pr_term_momentum_matches_pandas_lag_rank(spark, sf_dir):
    """Week-over-week riser ranking replayed in pandas over the (already
    triple-verified) staging relation: integer-milli means, per-term lag
    delta, per-week top-5 by (desc delta, asc term)."""
    from dbt_trill_shop_spark.models.trends import build_trends_relations

    stg = build_trends_relations(spark, sf_dir)["stg_top_terms"].toPandas()
    weekly = (
        stg.groupby(["term", "week"], as_index=False)
        .agg(n=("score", "size"), s=("score", "sum"))
        .sort_values(["term", "week"])
    )
    weekly["mean_milli"] = (weekly["s"] * 1000) // weekly["n"]
    weekly["delta"] = weekly.groupby("term")["mean_milli"].diff()
    d = weekly.dropna(subset=["delta"]).copy()
    d["delta"] = d["delta"].astype("int64")
    d["rk"] = (
        d.sort_values(["delta", "term"], ascending=[False, True])
        .groupby("week")
        .cumcount()
        + 1
    )
    want = d[d["rk"] <= 5].sort_values(["week", "rk"])
    got = _one(spark, sf_dir, "q_term_momentum")
    assert len(got) == len(want)
    for g, w in zip(got.itertuples(index=False), want.itertuples(index=False)):
        assert (g.week, g.riser_rank, g.term) == (w.week, w.rk, w.term), (g, w)
        assert g.mean_score_milli == w.mean_milli and g.delta_milli == w.delta


def _pr_bootstrap_degenerate_m_nulls_ci(spark, sf_dir):
    """ADVICE r6: with m < 4 valid replicas the fixed rank picks (2 and
    m-1) invert (m=2) or collapse to one replica (m=3) — the bounds must
    come back NULL, not malformed, in BOTH engines.  With the suite's
    orders table every replica is valid, so n_replicas=2 and 3 force
    m=2 and m=3 exactly."""
    from dbt_trill_shop_spark.operators.analytics import (
        bootstrap_mean_ci,
        bootstrap_mean_ci_sql,
    )
    from .oracle_utils import duck_connection, oracle_frame

    for b in (2, 3):
        row = bootstrap_mean_ci(spark, sf_dir, n_replicas=b).collect()[0]
        assert row["mean_value"] is not None
        assert row["ci_lo"] is None and row["ci_hi"] is None, (b, row)
        orow = oracle_frame(
            duck_connection(sf_dir), bootstrap_mean_ci_sql(n_replicas=b)
        ).iloc[0]
        assert pd.isna(orow["ci_lo"]) and pd.isna(orow["ci_hi"]), (b, orow)
    # at m >= 4 the interval exists and is properly ordered
    row4 = bootstrap_mean_ci(spark, sf_dir, n_replicas=4).collect()[0]
    assert row4["ci_lo"] is not None and row4["ci_lo"] <= row4["ci_hi"]


_POOLED_REPLAYS = [
    _pr_bootstrap_degenerate_m_nulls_ci,
    _pr_profile_orders_matches_pandas_profile,
    _pr_table_fingerprints_match_hashlib_xor,
    _pr_session_paths_match_python_triples,
    _pr_term_momentum_matches_pandas_lag_rank,
    _pr_gini_matches_textbook_formula,
    _pr_spearman_matches_midrank_pearson,
    _pr_ks_matches_textbook_cdf_scan,
    _pr_theilsen_matches_pairwise_median,
    _pr_benford_matches_digit_histogram,
    _pr_wilson_matches_textbook_bound,
    _pr_autocorrelation_matches_pearson_per_lag,
    _pr_chisquare_matches_contingency_formula,
    _pr_ols_matches_numpy_least_squares,
    _pr_weekly_correlation_matches_numpy_pearson,
    _pr_runs_test_matches_wald_wolfowitz,
    _pr_iqr_outliers_match_tukey_fences,
    _pr_cusum_matches_integer_argmax,
    _pr_lorenz_matches_closed_form_ntile,
    _pr_seasonality_matches_integer_index,
    _pr_churn_matches_set_difference,
    _pr_char_entropy_matches_counter_formula,
    _pr_ab_ztest_and_power_match_closed_forms,
    _pr_histogram_quantiles_match_cumcount_scan,
    _pr_interpolation_matches_linear_formula,
    _pr_event_transitions_match_pandas_lag,
    _pr_user_ewma_matches_python_fold,
    _pr_rfm_segments_match_closed_form_ntiles,
    _pr_ttr_and_source_entropy_match_token_counts,
    _pr_weekly_anomalies_match_integer_ztest,
    _pr_seasonal_adjust_matches_index_division,
    _pr_ltv_cohorts_match_cumulative_grid,
    _pr_vocab_growth_matches_first_seen_buckets,
    _pr_prefix_templates_match_counted_prefixes,
    _pr_weekend_lift_matches_rate_ratio,
    _pr_stickiness_matches_set_cardinalities,
    _pr_ma_crossover_matches_rolling_sums,
    _pr_interarrival_matches_log2_histogram,
    _pr_punchcard_matches_crosstab,
    _pr_adoption_and_new_returning_match_first_seen,
    _pr_key_skew_matches_counted_ranking,
    _pr_weekly_ctr_matches_counts,
    _pr_return_rate_matches_monthly_rollup,
    _pr_aov_by_segment_matches_join_rollup,
    _pr_fulfillment_latency_matches_percentiles,
    _pr_cart_abandonment_matches_gap_sessions,
    _pr_conversion_lag_matches_percentiles,
    _pr_audience_overlap_matches_set_jaccard,
    _pr_range_frame_matches_calendar_window,
    _pr_weekly_mix_share_matches_delta,
    _pr_variant_props_matches_json_histogram,
    _pr_association_rules_match_basket_counts,
    _pr_sequence_match_matches_python_regex,
    _pr_zorder_keys_match_python_morton,
    _pr_metrics_events_match_weekly_grid,
]


def test_stats_replays_pooled(spark, sf_dir):
    import inspect
    import traceback
    from concurrent.futures import ThreadPoolExecutor

    ev = load_table(spark, sf_dir, "events").toPandas()
    orders = load_table(spark, sf_dir, "orders").toPandas()
    ev["cents"] = (ev["value"] * 100).round(0).astype("int64")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    fr = (ev, orders)

    def one(fn):
        try:
            if "frames" in inspect.signature(fn).parameters:
                fn(spark, sf_dir, fr)
            else:
                fn(spark, sf_dir)
        except Exception:
            return f"{fn.__name__}:\n{traceback.format_exc()}"
        return None

    with ThreadPoolExecutor(max_workers=12) as ex:
        bad = [p for p in ex.map(one, _POOLED_REPLAYS) if p]
    assert not bad, "\n\n".join(bad)

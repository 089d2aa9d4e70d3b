"""Closed-form checks for operators/stats.py beyond the differential
oracle: exactness of the bitmap distinct counts, agreement of the
moment-based Welch t / Pearson r with an independent pandas
recomputation, and range invariants."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from multi_attribute_join_search_with_mapreduce_spark.operators.stats import (
    bitmap_distinct_rollup,
    chi_square_arms,
    corr_matrix_lineitem,
    ks_value_drift,
    mann_whitney_value,
    welch_ttest_value,
)
from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table


def test_bitmap_rollup_is_exact(spark, sf_dir):
    rows = {r.event_type: r.distinct_users for r in bitmap_distinct_rollup(spark, sf_dir).collect()}
    e = load_table(spark, "events", sf_dir)
    exact_all = e.select(F.countDistinct("user_id")).first()[0]
    assert rows.pop("ALL") == exact_all
    exact_types = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert rows == exact_types
    # distinct counts don't sum across overlapping groups — the reason
    # the rollup merges bitmaps instead of adding per-type counts
    assert sum(exact_types.values()) >= exact_all


def test_welch_t_matches_pandas_recompute(spark, sf_dir):
    out = {r.event_type: r for r in welch_ttest_value(spark, sf_dir).collect()}
    pdf = load_table(spark, "events", sf_dir).select("event_type", "user_id", "value").toPandas()
    for et, g in pdf.groupby("event_type"):
        a = g[g.user_id % 2 == 0].value
        b = g[g.user_id % 2 == 1].value
        sea = a.var(ddof=1) / len(a)
        seb = b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(sea + seb)
        df = (sea + seb) ** 2 / (sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1))
        r = out[et]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert abs(r.t_stat - t) < 1e-3
        assert abs(r.welch_df - df) < 0.5
        # parity split => both arms populated and df between the naive bounds
        assert min(len(a), len(b)) - 1 <= r.welch_df <= len(a) + len(b) - 2


def test_chi_square_matches_pandas_recompute(spark, sf_dir):
    r = chi_square_arms(spark, sf_dir).first()
    pdf = load_table(spark, "events", sf_dir).select("event_type", "user_id").toPandas()
    ct = pd.crosstab(pdf.event_type, pdf.user_id % 2)
    n = ct.values.sum()
    expected = ct.sum(axis=1).values[:, None] * ct.sum(axis=0).values[None, :] / n
    chi2 = ((ct.values - expected) ** 2 / expected).sum()
    assert r.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert r.n_events == n
    assert abs(r.chi2 - chi2) < 1e-3


def test_mann_whitney_matches_pandas_ranks(spark, sf_dir):
    out = {r.event_type: r for r in mann_whitney_value(spark, sf_dir).collect()}
    pdf = load_table(spark, "events", sf_dir).select(
        "event_type", "user_id", "value"
    ).toPandas()
    for et, g in pdf.groupby("event_type"):
        ranks = g.value.rank(method="average")
        is_a = (g.user_id % 2 == 0).to_numpy()
        n_a, n_b = int(is_a.sum()), int((~is_a).sum())
        u_a = ranks[is_a].sum() - n_a * (n_a + 1) / 2
        r = out[et]
        assert r.n_a == n_a and r.n_b == n_b
        assert abs(r.u_a - u_a) < 1e-9  # exact rank arithmetic
        # U + U' = n_a * n_b partition identity
        u_b = (ranks[~is_a].sum()) - n_b * (n_b + 1) / 2
        assert abs((r.u_a + u_b) - n_a * n_b) < 1e-9


def test_ks_drift_matches_manual_ecdf(spark, sf_dir):
    r = ks_value_drift(spark, sf_dir).first()
    pdf = load_table(spark, "events", sf_dir).select("user_id", "value").toPandas()
    a = pdf[pdf.user_id % 2 == 0].value.sort_values().to_numpy()
    b = pdf[pdf.user_id % 2 == 1].value.sort_values().to_numpy()
    import numpy as np

    grid = np.unique(pdf.value.to_numpy())
    ecdf_a = np.searchsorted(a, grid, side="right") / len(a)
    ecdf_b = np.searchsorted(b, grid, side="right") / len(b)
    ks = float(np.abs(ecdf_a - ecdf_b).max())
    assert r.n_a == len(a) and r.n_b == len(b)
    assert abs(r.ks_stat - ks) < 1e-6
    assert 0.0 <= r.ks_stat <= 1.0


def test_corr_matrix_matches_pandas(spark, sf_dir):
    out = corr_matrix_lineitem(spark, sf_dir).collect()
    pdf = load_table(spark, "lineitem", sf_dir).select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).toPandas()
    expected = pdf.corr()
    assert len(out) == 3
    for r in out:
        assert -1.0 <= r.corr <= 1.0
        assert abs(r.corr - expected.loc[r.col_x, r.col_y]) < 1e-6


def test_median_mad_matches_numpy_lower_median(spark, sf_dir):
    """Lower-median convention: rank ceil(n/2) of the sorted values —
    recompute per event type with a plain numpy sort and compare both
    the median and the MAD (lower median of |x - median|)."""
    import numpy as np

    from multi_attribute_join_search_with_mapreduce_spark.operators.stats import median_mad_value

    out = {r.event_type: r for r in median_mad_value(spark, sf_dir).collect()}
    pdf = load_table(spark, "events", sf_dir).select("event_type", "value").toPandas()
    for et, grp in pdf.groupby("event_type"):
        x = np.sort(grp.value.to_numpy())
        n = len(x)
        med = x[(n + 1) // 2 - 1]  # lower median, 0-based rank ceil(n/2)-1
        dev = np.sort(np.abs(grp.value.to_numpy() - med))
        mad = dev[(n + 1) // 2 - 1]
        r = out[et]
        assert r.n == n
        assert r.median == med
        assert r.mad == mad


def test_median_mad_even_count_planted(spark, tmp_path):
    """n=4 planted values [1, 3, 7, 100]: lower median must be 3 (an
    actual data value, NOT the interpolated 5), deviations {2,0,4,97} →
    lower MAD = 2."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.stats import median_mad_value

    rows = [(i, float(v)) for i, v in enumerate((1, 3, 7, 100))]
    d = spark.createDataFrame(rows, "event_id long, value double").select(
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        "value",
        F.lit("{}").alias("props"),
    )
    lake = tmp_path / "lake"
    d.write.parquet(str(lake / "events.parquet"))
    r = median_mad_value(spark, str(lake)).collect()[0]
    assert (r.event_type, r.n, r.median, r.mad) == ("click", 4, 3.0, 2.0)


def test_roc_auc_matches_bruteforce_pairs(spark, sf_dir):
    """AUC from the histogram rank-sum must equal the O(n²) pair
    definition (#concordant + 0.5·#ties) / (n⁺·n⁻) recomputed on the
    collected fixture, and the deciles partition the corpus."""
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.stats import roc_auc_quality
    from multi_attribute_join_search_with_mapreduce_spark.operators.textops import quality_score

    rows = roc_auc_quality(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    q = quality_score(spark, sf_dir).select(
        "n_bpe_tokens", (F.col("quality") >= 0.9).alias("pos")
    ).collect()
    pos = [r.n_bpe_tokens for r in q if r.pos]
    neg = [r.n_bpe_tokens for r in q if not r.pos]
    conc = sum(1 for p in pos for m in neg if p > m)
    ties = sum(1 for p in pos for m in neg if p == m)
    brute = (conc + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(rows[0].auc - brute) < 1e-6
    assert all(r.auc == rows[0].auc for r in rows)
    assert sum(r.n for r in rows) == len(q)
    assert sum(r.n_pos for r in rows) == len(pos)
    # bins are ordered, non-overlapping score ranges
    for a, b in zip(rows, rows[1:]):
        assert a.hi_score < b.lo_score


def test_acf_matches_pandas_recompute(spark, sf_dir):
    """Lag-k ACF must match the textbook formula recomputed in numpy on
    the collected daily series (shared-mean Box-Jenkins form)."""
    import numpy as np
    from pyspark.sql import functions as F

    from multi_attribute_join_search_with_mapreduce_spark.operators.stats import acf_daily_revenue
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    rows = acf_daily_revenue(spark, sf_dir).collect()
    daily = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("x"))
        .orderBy("day")
        .collect()
    )
    days = [r.day for r in daily]
    # fixture series is calendar-contiguous (pairing relies on day+k)
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    x = np.array([float(r.x) for r in daily])
    n, xbar = len(x), x.mean()
    denom = ((x - xbar) ** 2).sum()
    for r in rows:
        k = r.lag
        expect = ((x[:-k] - xbar) * (x[k:] - xbar)).sum() / denom
        assert r.n_pairs == n - k
        assert abs(r.acf - expect) < 2e-6, (k, r.acf, expect)


def test_acf_detects_planted_weekly_cycle(spark, tmp_path):
    """A planted period-7 series must show acf(7) ≈ max and acf values
    at non-multiples well below it."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = []
    eid = 0
    for d in range(56):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        amount = 100.0 if d % 7 == 0 else 10.0
        rows.append((eid, day, 1, "buy", amount, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    lake = tmp_path / "lake"
    df.write.parquet(str(lake / "events.parquet"))

    from multi_attribute_join_search_with_mapreduce_spark.operators.stats import acf_daily_revenue

    got = {r.lag: r.acf for r in acf_daily_revenue(spark, str(lake)).collect()}
    assert got[7] > 0.8
    assert all(got[k] < 0.0 for k in (1, 2, 3) )


def test_seasonal_wape_matches_pandas_recompute(spark, sf_dir):
    """WAPE/bias per type recomputed with pandas on the daily frame."""
    from multi_attribute_join_search_with_mapreduce_spark.operators.stats import (
        seasonal_wape_backtest,
    )
    from multi_attribute_join_search_with_mapreduce_spark.sources.lake import load_table

    pdf = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("x"))
        .toPandas()
    )
    rows = seasonal_wape_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        g = pdf[pdf.event_type == r.event_type].set_index("day")["x"]
        fc = g.copy()
        fc.index = fc.index + __import__("datetime").timedelta(days=7)
        both = g.to_frame("a").join(fc.to_frame("f"), how="inner").dropna()
        assert r.n_days == len(both)
        assert abs(r.wape - (both.a - both.f).abs().sum() / both.a.sum()) < 1e-3
        assert abs(r.bias - (both.a - both.f).sum() / both.a.sum()) < 1e-3

"""Metrics + statistics tests against scipy/hand-derived values."""

import numpy as np
import pytest

from mgat_graphsage_tpu.eval.metrics import pearsonr, regression_metrics
from mgat_graphsage_tpu.compare.stats import (odds_ratio_ci, student_ttest,
                                              welch_ttest)


def test_pearson_matches_scipy():
    from scipy import stats

    rng = np.random.default_rng(0)
    x = rng.normal(size=200)
    y = 0.7 * x + rng.normal(scale=0.5, size=200)
    r, p = pearsonr(x, y)
    sr, sp = stats.pearsonr(x, y)
    assert r == pytest.approx(float(sr), rel=1e-9)
    assert p == pytest.approx(float(sp), rel=1e-6)


def test_pearson_edge_cases():
    r, p = pearsonr([1.0, 2.0, 3.0], [2.0, 4.0, 6.0])
    assert r == pytest.approx(1.0)
    r, _ = pearsonr([1.0, 1.0, 1.0], [2.0, 4.0, 6.0])
    assert np.isnan(r)


def test_regression_metrics():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([1.5, 2.0, 2.5, 4.0])
    m = regression_metrics(y, p)
    assert m["mse"] == pytest.approx((0.25 + 0 + 0.25 + 0) / 4)
    assert m["rmse"] == pytest.approx(np.sqrt(m["mse"]))
    assert m["mae"] == pytest.approx(0.25)
    assert m["n"] == 4
    assert 0 < m["r2"] <= 1


def test_welch_ttest_matches_scipy():
    from scipy import stats

    rng = np.random.default_rng(1)
    a = rng.normal(0, 1, 80)
    b = rng.normal(0.5, 1.5, 60)
    t, p = welch_ttest(a, b)
    st, sp = stats.ttest_ind(a, b, equal_var=False)
    assert t == pytest.approx(float(st), rel=1e-9)
    assert p == pytest.approx(float(sp), rel=1e-9)


def test_student_ttest_matches_scipy_default():
    """descriptor_statistics must use the reference's scipy ttest_ind
    DEFAULT (equal_var=True, statistical analysis.py:117), not Welch."""
    from scipy import stats

    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 80)
    b = rng.normal(0.5, 1.5, 60)
    t, p = student_ttest(a, b)
    st, sp = stats.ttest_ind(a, b)          # scipy default
    assert t == pytest.approx(float(st), rel=1e-9)
    assert p == pytest.approx(float(sp), rel=1e-9)
    # and it differs from Welch on heteroscedastic inputs
    wt, _ = welch_ttest(a, b)
    assert t != pytest.approx(float(wt), rel=1e-6)


def test_odds_ratio_hand_computed():
    # high group: 3 above pooled median, 1 below; low: 1 above, 3 below
    high = np.array([10.0, 9.0, 8.0, 1.0])
    low = np.array([7.0, 0.5, 0.4, 0.3])
    # pooled median of the 8 values = (1.0 + 7.0)/2 = 4.0
    or_, lo, hi = odds_ratio_ci(high, low)
    assert or_ == pytest.approx((3 * 3) / (1 * 1))
    assert lo < or_ < hi


def test_odds_ratio_haldane_correction():
    # zero cell -> +0.5 correction keeps OR finite
    high = np.array([10.0, 9.0, 8.0])
    low = np.array([1.0, 0.5, 0.4])
    or_, lo, hi = odds_ratio_ci(high, low)
    assert np.isfinite(or_) and or_ > 1
    assert np.isfinite(lo) and np.isfinite(hi)


def test_statistical_analysis_artifacts(tmp_path):
    """End-to-end stats pipeline persists the tables the reference only
    prints (statistical analysis.py:237-242, 272-277) plus the 3 figure
    families."""
    import csv
    import json

    from mgat_graphsage_tpu.compare.stats import run_statistical_analysis
    from mgat_graphsage_tpu.data import TEST_CSV

    out = run_statistical_analysis(TEST_CSV, str(tmp_path), limit=80,
                                   verbose=False)
    for fname in ("forest_plot.png", "pca.png", "rf_importance.png",
                  "descriptor_stats.csv", "rf_report.json"):
        assert (tmp_path / fname).exists(), fname

    rows = list(csv.DictReader(open(tmp_path / "descriptor_stats.csv")))
    assert len(rows) == len(out["stats"]) == 11      # 11 descriptors
    for row in rows:
        assert row["significant"] in ("True", "False")
        lo, mid, hi = (float(row["ci_low"]), float(row["odds_ratio"]),
                       float(row["ci_high"]))
        assert lo <= mid <= hi

    rf = json.load(open(tmp_path / "rf_report.json"))
    assert set(rf) == {"importances", "classification_report"}
    assert 0.0 <= rf["classification_report"]["accuracy"] <= 1.0
    assert len(rf["importances"]) == 11

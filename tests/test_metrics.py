"""Metrics + statistics tests against scipy/hand-derived values."""

import numpy as np
import pytest

from mgat_graphsage_tpu.eval.metrics import pearsonr, regression_metrics
from mgat_graphsage_tpu.compare.stats import odds_ratio_ci, welch_ttest


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

"""Classical-ML comparison harness: leaderboard artifacts, the stated
XGBoost/LightGBM/CatBoost environment gap, and per-model prediction
dumps (reference ``pycaret.py:184-449``; VERDICT r2 next #9)."""

import os

import numpy as np

from mgat_graphsage_tpu.compare.classical import (
    build_models,
    comprehensive_modeling,
    get_combined_features,
    unavailable_boosters,
)


def test_combined_features_dim():
    """ECFP1024 + 5 aggregations of the 35-dim atom matrix = 1199
    (reference pycaret.py:36-97,139-148)."""
    feats = get_combined_features("CC(=O)Oc1ccccc1C(=O)O")
    assert feats.shape == (1199,)
    assert np.isfinite(feats).all()


def test_unavailable_boosters_are_stated(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(48, 12))
    w = rng.normal(size=12)
    y = x @ w + 0.1 * rng.normal(size=48)
    rows = comprehensive_modeling(
        x[:36], y[:36], x[36:], y[36:],
        output_dir=str(tmp_path), cv_folds=2, fast=True, verbose=False)
    assert len(rows) >= 20          # the full sklearn registry ran
    # leaderboard sorted by RMSE
    rmses = [r["rmse"] for r in rows]
    assert rmses == sorted(rmses)

    lb = open(tmp_path / "leaderboard.csv").read().splitlines()
    assert lb[0].split(",")[:2] == ["model", "status"]
    missing = unavailable_boosters()
    for name in missing:
        assert any(line.startswith(f"{name},unavailable")
                   for line in lb), name
    # gated models absent from the image must NOT appear as scored rows
    scored = {r["model"] for r in rows}
    assert not (scored & set(missing))

    # per-model prediction dumps (reference pycaret.py:408-447)
    allp = open(tmp_path / "all_models_predictions.csv").read().splitlines()
    header = allp[0].split(",")
    assert header[-1] == "actual"
    assert len(allp) == 1 + 12      # one row per test sample
    best = rows[0]["model"].lower().replace(" ", "_")
    bestp = open(
        tmp_path / f"best_model_predictions_{best}.csv").read().splitlines()
    assert bestp[0] == "actual,predicted,residuals,abs_residuals"
    a, p, r_, ab = map(float, bestp[1].split(","))
    assert abs(r_ - (a - p)) < 1e-5 and abs(ab - abs(r_)) < 1e-12


def test_booster_registry_gating_consistent():
    models = build_models(fast=True)
    for name in unavailable_boosters():
        assert name not in models

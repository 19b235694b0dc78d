"""Classical-ML comparison harness: leaderboard artifacts, the stated
XGBoost/LightGBM/CatBoost environment gap, and per-model prediction
dumps (reference ``pycaret.py:184-449``; VERDICT r2 next #9)."""

import os

import numpy as np
import pytest

# fitting the full sklearn registry (reference-parity requirement:
# PassiveAggressive stays in the leaderboard, pycaret.py:205) emits
# third-party deprecation/convergence warnings on tiny fast-mode data —
# expected, not ours to fix
pytestmark = [
    pytest.mark.filterwarnings(
        "ignore:Class PassiveAggressiveRegressor is deprecated"
        ":FutureWarning"),
    pytest.mark.filterwarnings(
        "ignore::sklearn.exceptions.ConvergenceWarning"),
]

from mgat_graphsage_tpu.compare.classical import (  # noqa: E402
    build_models,
    comprehensive_modeling,
    feature_names,
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

    # the TheilSen subset-cap divergence must be labeled IN the artifact
    # (VERDICT r3 weak #5), and the label must not break the CSV layout
    ts_lines = [line for line in lb if line.startswith("TheilSen,")]
    assert ts_lines and "max_subpopulation=" in ts_lines[0]
    assert len(ts_lines[0].split(",")) == len(lb[0].split(","))

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


def test_feature_names_match_reference_scheme():
    """pycaret.py:129-144: ECFP_0..1023 then Mean/Max/Sum/Min/Std of the
    35 atom-feature columns = 1199 names aligned with
    get_combined_features' layout."""
    names = feature_names()
    assert len(names) == 1199
    assert names[0] == "ECFP_0" and names[1023] == "ECFP_1023"
    assert names[1024] == "Mean_AtomSymbol_0"
    assert names[1024 + 35] == "Max_AtomSymbol_0"
    assert names[-1] == "Std_TotalNumHs_4"


def test_feature_importances_csv(tmp_path):
    """The importance dump mirrors combined_feature_importances.csv
    (pycaret.py:437-440): one row per feature, one column per model
    exposing feature_importances_."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 9))
    y = x[:, 0] * 2.0 + 0.05 * rng.normal(size=40)
    comprehensive_modeling(
        x[:30], y[:30], x[30:], y[30:],
        output_dir=str(tmp_path), cv_folds=0, fast=True, verbose=False)
    lines = open(tmp_path / "feature_importances.csv").read().splitlines()
    header = lines[0].split(",")
    assert header[0] == "feature"
    assert "Random Forest" in header
    assert len(lines) == 1 + 9          # generic f{i} names at 9 dims
    assert lines[1].startswith("f0,")
    # the informative feature dominates for the tree ensembles
    rf = header.index("Random Forest")
    imp = np.array([[float(v) for v in ln.split(",")[1:]]
                    for ln in lines[1:]])
    assert np.argmax(imp[:, rf - 1]) == 0


def test_booster_registry_gating_consistent():
    models = build_models(fast=True)
    for name in unavailable_boosters():
        assert name not in models

"""End-to-end CLI chain on tiny data: train -> predict -> explain.

One in-process run of each user-facing entry point (the reference's
``train.py`` / ``test.py`` / ``gnnexplainer.py`` workflow), sharing one
tiny checkpoint so the whole chain costs a single small training run.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    """Train 1 epoch of the flagship on 48 rows via the CLI; return the
    (ckpt_dir, workdir) the downstream CLIs consume."""
    from mgat_graphsage_tpu.train.run import main as train_main

    work = tmp_path_factory.mktemp("cli")
    ckpt_root = str(work / "ckpt")
    log_path = str(work / "metrics.jsonl")
    train_main(["--preset", "flagship", "--epochs", "1",
                "--batch-size", "16", "--limit", "48",
                "--ckpt-dir", ckpt_root, "--log", log_path])
    ckpt = os.path.join(ckpt_root, "flagship", "best_model.msgpack")
    assert os.path.exists(ckpt)
    assert os.path.exists(ckpt + ".json")
    assert os.path.exists(log_path)
    return ckpt, work


def test_train_cli_checkpoint_and_log(cli_run):
    ckpt, work = cli_run
    meta = json.load(open(ckpt + ".json"))
    assert meta["config"]["name"] == "flagship"
    assert "scaler" in meta
    rows = [json.loads(ln) for ln in open(work / "metrics.jsonl")]
    assert len(rows) == 1                       # one epoch logged
    assert np.isfinite(rows[0]["train_loss"])


def test_predict_cli_results_csv(cli_run):
    from mgat_graphsage_tpu.data import TEST_CSV
    from mgat_graphsage_tpu.eval.predict import main as predict_main

    ckpt, work = cli_run
    out = str(work / "pred.csv")
    predict_main([ckpt, TEST_CSV, "--out", out, "--batch-size", "16"])
    lines = open(out).read().splitlines()
    assert lines[0] == "SMILES,True_Value,Predicted_Value,Absolute_Error"
    # the tiny 48-row training set fixes a small node/edge budget in the
    # checkpoint; test rows over that budget are skip-and-logged
    # (reference semantics), so expect nearly-all of the 961 rows
    assert 1 + 950 <= len(lines) <= 1 + 961
    smi, t, p, ae = lines[1].rsplit(",", 3)[0], *map(
        float, lines[1].rsplit(",", 3)[1:])
    assert ae == pytest.approx(abs(t - p), abs=2e-6)


def test_explain_cli_artifacts(cli_run):
    from mgat_graphsage_tpu.data import TEST_CSV
    from mgat_graphsage_tpu.explain.pipeline import main as explain_main

    ckpt, work = cli_run
    out = work / "explain"
    # a rerun into an existing dir must not leave panels from a previous
    # selection behind (stale molecule_<i>.png from an older generation)
    out.mkdir()
    (out / "molecule_999.png").write_bytes(b"stale")
    # the REAL detailed path (GNNExplainer mask optimization) — ~35s at
    # this scale on CPU; --no-gnnexplainer covers the gradient fallback
    # elsewhere (test_explain.py)
    explain_main([ckpt, TEST_CSV, "--count", "4", "--threshold", "0.3",
                  "--out", str(out), "--limit", "24"])
    assert not (out / "molecule_999.png").exists()
    report = (out / "analysis_report.txt").read_text()
    assert "Global statistics" in report       # gnnexplainer.py:1652-1664
    assert "+/-" in report                     # prediction mean +/- std
    assert "functional groups" in report       # gnnexplainer.py:1714-1717
    res = json.load(open(out / "analysis_results.json"))
    assert res                                  # non-empty results
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert pngs, "no figures written"

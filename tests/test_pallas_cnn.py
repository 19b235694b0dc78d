"""Fused Pallas CNN backward (ops/pallas_cnn.py): gradient parity with
XLA AD in interpret mode, module wiring, and shape gating.

The kernels replace the backward of the reference CNN branch
(``train.py:127-146``); correctness bar: f32 gradients must match XLA
AD to float-reassociation noise, and bf16 gradients must sit at the
same distance from an f32 oracle as XLA AD's own bf16 gradients (the
kernels accumulate f32 like XLA does, so neither path is allowed to be
the sloppier one).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgat_graphsage_tpu.models.layers import CNNNet
from mgat_graphsage_tpu.ops.pallas_cnn import (
    _fwd_chain,
    chain_shapes_supported,
    cnn_tail,
)

ARGNAMES = ["fp", "k1", "b1", "k2", "b2", "k3", "b3", "fk", "fb"]


def _args(rng, batch, width, hidden, dtype):
    mk = lambda s, sc=1.0: jnp.asarray(rng.normal(size=s) * sc, dtype)
    return [mk((batch, width)), mk((3, 1, 32), 0.3), mk((32,), 0.1),
            mk((3, 32, 64), 0.1), mk((64,), 0.1),
            mk((3, 64, 128), 0.05), mk((128,), 0.1),
            mk((width * 128, hidden), 0.01), mk((hidden,), 0.1)]


def _grads(fn, vals, tgt):
    def loss(*a):
        out = fn(*a).astype(jnp.float32)
        return jnp.sum((out - tgt.astype(jnp.float32)) ** 2)
    return jax.grad(loss, argnums=tuple(range(9)))(*vals)


@pytest.mark.parametrize("width", [64, 96, 128])
@pytest.mark.parametrize("batch", [256, 512])
def test_grad_parity_f32(width, batch):
    """Edge tiles (W=64 is all-edge at the 32-wide tiling), interior
    tiles, and multi-B-tile grids all reproduce XLA AD to
    reassociation noise."""
    if batch == 512 and width != 64:
        pytest.skip("one multi-B-tile case is enough")
    rng = np.random.default_rng(0)
    vals = _args(rng, batch, width, 16, jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(batch, 16)), jnp.float32)
    g_ref = _grads(lambda *a: _fwd_chain(*a)[0], vals, tgt)
    g_pl = _grads(lambda *a: cnn_tail(*a, True), vals, tgt)
    for name, a, b in zip(ARGNAMES, g_ref, g_pl):
        if name == "fp":
            continue  # data input: pallas path returns zeros by design
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
        assert err < 5e-6, (name, err)


def test_grad_parity_bf16_vs_oracle():
    """bf16 kernels must be as close to the f32 oracle as XLA AD's own
    bf16 backward — same-accuracy, not just similar-to-AD."""
    rng = np.random.default_rng(1)
    vals = _args(rng, 256, 64, 16, jnp.bfloat16)
    vals32 = [v.astype(jnp.float32) for v in vals]
    tgt = jnp.asarray(rng.normal(size=(256, 16)), jnp.float32)
    g_oracle = _grads(lambda *a: _fwd_chain(*a)[0], vals32, tgt)
    g_ad = _grads(lambda *a: _fwd_chain(*a)[0], vals, tgt)
    g_pl = _grads(lambda *a: cnn_tail(*a, True), vals, tgt)
    for i, name in enumerate(ARGNAMES):
        if name == "fp":
            continue
        o = g_oracle[i]
        scale = float(jnp.max(jnp.abs(o))) + 1e-12
        e_ad = float(jnp.max(jnp.abs(g_ad[i].astype(jnp.float32) - o)))
        e_pl = float(jnp.max(jnp.abs(g_pl[i].astype(jnp.float32) - o)))
        # allow 2x + epsilon: both paths are bf16-noise-limited
        assert e_pl <= 2.0 * e_ad + 0.02 * scale, (name, e_pl, e_ad)


def test_forward_identical_and_module_wiring():
    """CNNNet(pallas_bwd=True): bit-identical forward to the module
    path (same params), and gradients through the whole module match."""
    rng = np.random.default_rng(2)
    fp = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32)
    base = CNNNet(input_dim=64, output_dim=8, fc_hidden=16)
    fused = CNNNet(input_dim=64, output_dim=8, fc_hidden=16,
                   pallas_bwd=True)
    params = base.init(jax.random.PRNGKey(0), fp)
    # identical param tree (params_only creates through the same scopes)
    assert jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), fp)) == \
        jax.tree_util.tree_structure(params)
    out_a = base.apply(params, fp)
    out_b = fused.apply(params, fp)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    def loss(fn):
        def f(p):
            return jnp.sum(fn.apply(p, fp) ** 2)
        return f

    g_a = jax.grad(loss(base))(params)
    g_b = jax.grad(loss(fused))(params)
    flat_a, _ = jax.tree_util.tree_flatten(g_a)
    flat_b, _ = jax.tree_util.tree_flatten(g_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_shape_gate_falls_back():
    """Unsupported shapes (batch not a BT2 multiple) silently use the
    module path — same numbers, no error."""
    assert not chain_shapes_supported(100, 1024)   # batch not a BT2 multiple
    assert not chain_shapes_supported(256, 32)     # width below the tiling
    assert chain_shapes_supported(1024, 1024)
    assert chain_shapes_supported(256, 2048)   # ecfp2048 widths work
    rng = np.random.default_rng(3)
    fp = jnp.asarray(rng.normal(size=(100, 32)), jnp.float32)
    fused = CNNNet(input_dim=32, output_dim=8, fc_hidden=16,
                   pallas_bwd=True)
    base = CNNNet(input_dim=32, output_dim=8, fc_hidden=16)
    params = base.init(jax.random.PRNGKey(0), fp)
    np.testing.assert_array_equal(np.asarray(fused.apply(params, fp)),
                                  np.asarray(base.apply(params, fp)))


def test_trainer_mesh_guard():
    """cnn_pallas_bwd is force-disabled under a mesh (no GSPMD rule for
    the pallas_call) and kept otherwise."""
    from mgat_graphsage_tpu.data import MolecularDataset
    from mgat_graphsage_tpu.parallel import make_mesh
    from mgat_graphsage_tpu.train import Trainer, get_config

    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CCN"] * 2
    targets = [5.0, 6.0, 7.0, 5.5] * 2
    ds = MolecularDataset(smiles, targets, fit_scaler=True,
                          fingerprint="ecfp1024", verbose=False)
    cfg = get_config("flagship", cnn_pallas_bwd=True, epochs=1,
                     batch_size=4)
    t_single = Trainer(cfg, ds, ds)
    assert t_single.cfg.cnn_pallas_bwd
    assert t_single.model.cnn_pallas_bwd
    mesh = make_mesh(jax.devices()[:8])
    t_mesh = Trainer(cfg, ds, ds, mesh=mesh)
    assert not t_mesh.cfg.cnn_pallas_bwd
    assert not t_mesh.model.cnn_pallas_bwd

"""Mixed-precision (compute_dtype='bfloat16') correctness tests.

The bf16 compute path keeps f32 master params, f32 gradients, and f32
optimizer state; only the weight/activation storage inside forward+backward
is bf16 (f32 MXU accumulation via preferred_element_type in every layer —
see models/layers.py).  These tests pin:

  - bf16 forward stays within bf16 rounding distance of the f32 forward
    on identical params;
  - a bf16 train step leaves params/grads/moments in f32 and produces a
    finite loss close to the f32 step's;
  - short bf16 training converges like f32 training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgat_graphsage_tpu.data import MolecularDataset, load_csv, TRAIN_CSV
from mgat_graphsage_tpu.train import Trainer, get_config


@pytest.fixture(scope="module")
def fp_data():
    sm, y = load_csv(TRAIN_CSV)
    return MolecularDataset(sm[:96], y[:96], fit_scaler=True,
                            fingerprint="ecfp1024", verbose=False)


def _eval_pred(cfg, ds, state=None):
    trainer = Trainer(cfg, ds, ds)
    st = trainer.init_state() if state is None else state
    ev = trainer.evaluate(st, ds)
    return trainer, st, ev


def test_bf16_forward_matches_f32_within_rounding(fp_data):
    f32_cfg = get_config("flagship", batch_size=32)
    bf16_cfg = f32_cfg.replace(compute_dtype="bfloat16")
    # identical init (the cast happens inside forward, not at init)
    tr32, st32, ev32 = _eval_pred(f32_cfg, fp_data)
    tr16, st16, ev16 = _eval_pred(bf16_cfg, fp_data)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(st32.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(st16.params)[0]))
    # predictions agree to bf16 rounding (preds are O(1) normalized units)
    np.testing.assert_allclose(ev16["pred"], ev32["pred"],
                               rtol=0.05, atol=0.05)
    # and are meaningfully nonzero (the cast didn't zero anything out)
    assert np.abs(ev32["pred"]).max() > 1e-3


def test_bf16_step_keeps_f32_state_and_close_loss(fp_data):
    losses = {}
    for dt in ("float32", "bfloat16"):
        cfg = get_config("flagship", batch_size=32, compute_dtype=dt)
        trainer = Trainer(cfg, fp_data, None)
        state = trainer.init_state()
        rng = jax.random.PRNGKey(7)
        state, m = trainer.train_epoch(state, 0, rng)
        losses[dt] = m["train_loss"]
        # master params / optimizer state stay f32 regardless
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        mu = state.opt_state.mu if hasattr(state.opt_state, "mu") \
            else state.opt_state[0].mu
        for leaf in jax.tree_util.tree_leaves(mu):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(losses["bfloat16"])
    assert abs(losses["bfloat16"] - losses["float32"]) \
        < 0.1 * abs(losses["float32"]) + 0.05, losses


def test_bf16_training_converges(fp_data):
    cfg = get_config("flagship", epochs=4, batch_size=32,
                     compute_dtype="bfloat16",
                     adam_moment_dtype="bfloat16")
    trainer = Trainer(cfg, fp_data, None)
    state = trainer.init_state()
    rng = jax.random.PRNGKey(0)
    losses = []
    for e in range(cfg.epochs):
        rng, sub = jax.random.split(rng)
        state, m = trainer.train_epoch(state, e, sub)
        losses.append(m["train_loss"])
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0] * 0.9, losses


def test_stochastic_rounding_unbiased_and_accumulates():
    """bf16 master storage (master_dtype='bfloat16', VERDICT r2 next #4):
    SR must be unbiased, and updates far below the bf16 spacing must
    still accumulate in expectation (round-to-nearest would drop them)."""
    from mgat_graphsage_tpu.train.optim import (
        _sr_to_bf16,
        apply_updates_stochastic_round,
    )

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(64,)).astype(np.float32) * 0.01)
    acc = np.zeros(64, np.float64)
    reps = 600
    for k in range(reps):
        acc += np.asarray(_sr_to_bf16(x, jax.random.PRNGKey(k)).astype(
            jnp.float32), dtype=np.float64)
    err = np.abs(acc / reps - np.asarray(x, np.float64))
    spacing = np.abs(np.asarray(x)) * 2.0 ** -8 + 1e-12
    assert (err < 0.25 * spacing + 1e-9).all()

    # p = 1.0, u = 1e-4: |u| ~ spacing/39, invisible to RTN
    p = {"w": jnp.full((1000,), 1.0, jnp.bfloat16)}
    u = {"w": jnp.full((1000,), 1e-4, jnp.float32)}
    cur = p
    for k in range(100):
        cur = apply_updates_stochastic_round(cur, u, jax.random.PRNGKey(k))
    mean = float(np.asarray(cur["w"].astype(jnp.float32)).mean())
    assert 1.005 < mean < 1.015, mean


def test_bf16_master_training_converges(fp_data):
    cfg = get_config("flagship", epochs=4, batch_size=32,
                     compute_dtype="bfloat16",
                     adam_moment_dtype="bfloat16",
                     master_dtype="bfloat16")
    trainer = Trainer(cfg, fp_data, fp_data)
    state = trainer.init_state()
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    losses = []
    for e in range(cfg.epochs):
        rng, sub = jax.random.split(rng)
        state, m = trainer.train_epoch(state, e, sub)
        losses.append(m["train_loss"])
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0] * 0.9, losses
    # params stayed bf16 through the fused epoch scan
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.bfloat16
    # eval path works on the bf16 master
    ev = trainer.evaluate(state)
    assert np.isfinite(ev["val_mse"])


def test_bf16_master_requires_bf16_compute(fp_data):
    import pytest as _pytest

    cfg = get_config("flagship", master_dtype="bfloat16")
    with _pytest.raises(ValueError, match="master_dtype"):
        Trainer(cfg, fp_data, None)


def test_fused_sr_update_matches_two_pass_adam_math():
    """torch_adam_sr_update (single fused Adam+round pass) must produce
    bf16 params within one bf16 spacing of the exact f32 torch-Adam
    result, and moments identical to torch_adam's (same math, same
    storage dtype)."""
    import optax

    from mgat_graphsage_tpu.train.optim import (
        torch_adam,
        torch_adam_sr_update,
    )

    rng = np.random.default_rng(1)
    params32 = {"a": jnp.asarray(rng.normal(size=(64, 8)),
                                 jnp.float32),
                "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32)}
    params16 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params32)
    # grads w.r.t. the SAME (bf16-representable) params
    params32 = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32), params16)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32),
    params32)

    lr, wd = 1e-2, 1e-4
    tx = torch_adam(lr, weight_decay=wd, moment_dtype="bfloat16")
    st32 = tx.init(params32)
    upd, st_ref = tx.update(grads, st32, params32)
    exact = optax.apply_updates(params32, upd)

    st16 = tx.init(params16)
    new_p, st_sr = torch_adam_sr_update(
        grads, st16, params16, jax.random.PRNGKey(3), lr=lr,
        weight_decay=wd, moment_dtype="bfloat16")
    for k in ("a", "b"):
        got = np.asarray(new_p[k].astype(jnp.float32), np.float64)
        want = np.asarray(exact[k], np.float64)
        # SR lands on one of the two bf16 neighbours of the exact f32
        # value: error < one bf16 ulp = 2^floor(log2|x|) * 2^-7
        spacing = np.abs(want) * 2.0 ** -7 + 1e-9
        assert (np.abs(got - want) <= spacing + 1e-9).all(), k
        np.testing.assert_array_equal(
            np.asarray(st_sr.mu[k]), np.asarray(st_ref.mu[k]))
        np.testing.assert_array_equal(
            np.asarray(st_sr.nu[k]), np.asarray(st_ref.nu[k]))
    assert int(st_sr.count) == 1


def test_hash_noise_uniform_and_salt_decorrelated():
    """_hash_noise16 (the SR noise source) must be uniform over
    [0, 2^16) and decorrelated across salts — the properties stochastic
    rounding actually needs from its noise."""
    from mgat_graphsage_tpu.train.optim import _hash_noise16

    n = 1 << 16
    a = np.asarray(_hash_noise16((n,), jnp.uint32(0x1234)), np.float64)
    b = np.asarray(_hash_noise16((n,), jnp.uint32(0xBEEF)), np.float64)
    # mean of U[0, 65535] = 32767.5; std of the mean = 65536/sqrt(12n)
    assert abs(a.mean() - 32767.5) < 5 * 65536 / np.sqrt(12 * n)
    # 16-bucket occupancy within 5% of uniform
    counts, _ = np.histogram(a, bins=16, range=(0, 65536))
    assert (np.abs(counts / (n / 16) - 1) < 0.05).all(), counts
    # distinct salts give (near-)independent streams
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.02, corr
    # and the full 16-bit range is actually exercised
    assert a.min() < 256 and a.max() > 65279

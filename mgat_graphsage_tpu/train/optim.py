"""torch-semantics Adam with configurable moment storage dtype.

Measured on a v5e chip (see BENCH notes): the flagship's 36M params make
the Adam update the single largest slice of the train step — it is pure
HBM streaming (read p, g, m, v; write p, m, v).  XLA already fuses
optax's ``chain(add_decayed_weights, scale_by_adam, scale)`` into one
pass (a hand-fused tree_map measures the same), so the only remaining
lever is BYTES: storing the two moment EMAs in bfloat16 cuts optimizer
traffic from ~1015 MB to ~725 MB per step (measured 1.76 -> 1.09 ms).

Math is exactly ``torch.optim.Adam(lr, weight_decay)`` (reference
``train.py:216-222``): L2 folded into the gradient before the moment
updates, bias-corrected moments, update ``-lr * mhat / (sqrt(vhat)+eps)``.
All arithmetic runs in float32; only the STORAGE of m and v between steps
is reduced-precision when ``moment_dtype='bfloat16'`` (m/v are smooth
EMAs, so the ~0.4% quantization perturbs the trajectory far less than it
would perturb params; trajectory-drift bounds are pinned in
``tests/test_trainer.py``).

State is ``optax.ScaleByAdamState`` for checkpoint compatibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["torch_adam", "apply_updates_stochastic_round"]


def _sr_to_bf16(x: jnp.ndarray, key) -> jnp.ndarray:
    """Stochastically round f32 ``x`` to bf16: add uniform random bits to
    the 16 truncated mantissa bits, then truncate.  Unbiased
    (E[result] == x up to bf16 spacing), the standard formulation for
    reduced-precision weight storage.  Works for both signs (IEEE
    sign-magnitude: the carry propagates through the magnitude bits)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    hi = ((bits + noise) >> 16).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(hi, jnp.bfloat16)


def apply_updates_stochastic_round(params, updates, key):
    """``optax.apply_updates`` for bf16 master parameters: the f32 sum
    ``p + u`` is stochastically rounded back to bf16 (round-to-nearest
    would deterministically drop updates smaller than ~0.4% of the
    weight — SR keeps them in expectation).  Non-bf16 leaves (if any)
    are applied exactly."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    up_leaves = jax.tree_util.tree_leaves(updates)
    assert len(leaves) == len(up_leaves)
    out = []
    for i, (p, u) in enumerate(zip(leaves, up_leaves)):
        if p.dtype == jnp.bfloat16:
            x = p.astype(jnp.float32) + u.astype(jnp.float32)
            out.append(_sr_to_bf16(x, jax.random.fold_in(key, i)))
        else:
            out.append((p + u).astype(p.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def torch_adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               moment_dtype: str = "float32"
               ) -> optax.GradientTransformation:
    """Single-pass Adam + L2; ``moment_dtype`` in {'float32','bfloat16'}."""
    mdt = jnp.bfloat16 if moment_dtype == "bfloat16" else jnp.float32

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=mdt)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(z, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("torch_adam requires params")
        count = optax.safe_int32_increment(state.count)
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf

        def leaf(g, p, m, v):
            # explicit f32: with bf16 master params AND bf16 grads the
            # promotion rule would otherwise keep g*g in bf16 (8 mantissa
            # bits).  Register-only cast — the HBM streams stay narrow.
            g = g.astype(jnp.float32)
            g = g + weight_decay * p.astype(jnp.float32) if weight_decay \
                else g
            m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
            upd = (-lr) * (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
            return upd, m2.astype(mdt), v2.astype(mdt)

        is3 = lambda t: isinstance(t, tuple)  # noqa: E731
        out = jax.tree_util.tree_map(leaf, grads, params, state.mu,
                                     state.nu)
        updates = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is3)
        mu = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is3)
        nu = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is3)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)

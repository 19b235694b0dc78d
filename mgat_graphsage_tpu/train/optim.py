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

__all__ = ["torch_adam", "torch_adam_sr_update",
           "apply_updates_stochastic_round"]


def _hash_noise16(shape, salt: jnp.ndarray) -> jnp.ndarray:
    """16 uniform bits per element from a murmur3-finalizer hash of
    (element index ^ salt) — pure elementwise integer ops, so XLA fuses
    it into the surrounding (memory-bound) optimizer loop with ZERO
    extra HBM traffic.

    Why not a real PRNG: the profiler traces of the first two SR builds
    showed threefry dragging the fc1 grad+Adam fusion from 783 to
    368 GB/s (compute-bound ALU chain), and ``rng_bit_generator``
    materializing a 134 MB bit tensor (RngBitGenerator is a standalone
    HLO op that cannot fuse) — both cost more than the f32 master
    traffic SR saves.  Stochastic rounding only needs per-element
    uniformity, not a cryptographic stream; the murmur3 finalizer is a
    bijection on uint32, so distinct (index ^ salt) inputs stay
    uniformly spread."""
    n = 1
    for d in shape:
        n *= d
    h = jax.lax.iota(jnp.uint32, n) ^ salt
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0xFFFF)).reshape(shape)


def _key_salt(key) -> jnp.ndarray:
    """Collapse a jax.random key to one uint32 salt for the hash."""
    kd = jnp.reshape(jax.random.key_data(key), (-1,)).astype(jnp.uint32)
    return kd[0] * jnp.uint32(0x9E3779B9) ^ kd[-1]


def _sr_to_bf16(x: jnp.ndarray, key) -> jnp.ndarray:
    """Stochastically round f32 ``x`` to bf16: add uniform random bits to
    the 16 truncated mantissa bits, then truncate.  Unbiased
    (E[result] == x up to bf16 spacing), the standard formulation for
    reduced-precision weight storage.  Works for both signs (IEEE
    sign-magnitude: the carry propagates through the magnitude bits).

    Noise comes from ``_hash_noise16`` (fusable elementwise hash), not a
    PRNG — see its docstring for the measured story."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = _hash_noise16(x.shape, _key_salt(key))
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


def torch_adam_sr_update(grads, state, params, key,
                         lr, weight_decay: float = 0.0,
                         b1: float = 0.9, b2: float = 0.999,
                         eps: float = 1e-8,
                         moment_dtype: str = "bfloat16"):
    """One fused torch-Adam step ONTO bf16 master params with stochastic
    rounding: per leaf, the f32 Adam math and the round-to-bf16 happen
    in ONE pass (new_p = sr(p32 + upd)) so no f32 update or param tensor
    ever touches HBM.

    The first SR build went through ``optax`` (``tx.update`` producing a
    materialized f32 ``updates`` tree, then a separate
    ``apply_updates_stochastic_round`` pass): the trace showed the
    second pass as a 507 us loop fusion plus a 134 MB f32 updates
    stream.  This function is the single-pass replacement; the separate
    helper remains for tests and non-optimizer uses.

    Returns ``(new_params, new_state)`` with the same
    ``optax.ScaleByAdamState`` layout as ``torch_adam`` (checkpoint
    compatible)."""
    mdt = jnp.bfloat16 if moment_dtype == "bfloat16" else jnp.float32
    count = optax.safe_int32_increment(state.count)
    cf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** cf
    c2 = 1.0 - b2 ** cf
    lr_t = lr(cf) if callable(lr) else lr
    salt0 = _key_salt(key)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = jax.tree_util.tree_leaves(grads)
    m_leaves = jax.tree_util.tree_leaves(state.mu)
    v_leaves = jax.tree_util.tree_leaves(state.nu)
    new_p, new_m, new_v = [], [], []
    for i, (p, g, m, v) in enumerate(zip(leaves, g_leaves, m_leaves,
                                         v_leaves)):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p32
        m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
        v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
        upd = (-lr_t) * (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
        x = p32 + upd
        if p.dtype == jnp.bfloat16:
            bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
            leaf_salt = jnp.uint32((0x01000193 * (i + 1)) & 0xFFFFFFFF)
            noise = _hash_noise16(x.shape, salt0 ^ leaf_salt)
            hi = ((bits + noise) >> 16).astype(jnp.uint16)
            new_p.append(jax.lax.bitcast_convert_type(hi, jnp.bfloat16))
        else:
            new_p.append(x.astype(p.dtype))
        new_m.append(m2.astype(mdt))
        new_v.append(v2.astype(mdt))

    unf = jax.tree_util.tree_unflatten
    return unf(treedef, new_p), optax.ScaleByAdamState(
        count=count, mu=unf(treedef, new_m), nu=unf(treedef, new_v))


def torch_adam(lr, weight_decay: float = 0.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               moment_dtype: str = "float32",
               factored_v_min_size: int = 0
               ) -> optax.GradientTransformation:
    """Single-pass Adam + L2; ``moment_dtype`` in {'float32','bfloat16'}.

    ``lr`` is a float (constant — the reference's behavior) or a
    callable mapping the 1-based f32 step count to a scalar lr
    (schedules; built by ``trainer._lr_schedule``).  The scheduled lr
    is a scalar computed once per update — it adds no per-element HBM
    traffic to the fused optimizer pass.

    ``factored_v_min_size > 0`` (opt-in; ``TrainConfig.adam_factored_v``)
    stores the second moment of 2-D leaves with at least that many
    elements as an Adafactor-style rank-1 factorization — two f32
    vectors (row/column EMAs of ``g**2``) instead of a full matrix.
    The update reconstructs ``v_hat = outer(r, c) / mean(r)`` per step
    (registers only; no v matrix ever touches HBM), keeping Adam's m,
    bias corrections, and update formula.  Motivation is pure BYTES on
    the hybrid's 33.5M-param CNN fc1: the v read+write is 4 of the
    ~20 bytes/param the traced fc1 grad+Adam fusion streams at ~96% of
    HBM peak (profiles/bf16_full_bs256_posmajor), plus 67-134 MB of
    HBM capacity back.  Factored-leaf state is a plain ``(r, c)``
    tuple inside ``ScaleByAdamState.nu`` (checkpoint-serializable;
    the params tree is dicts-of-arrays, so tuples unambiguously mark
    factored leaves)."""
    mdt = jnp.bfloat16 if moment_dtype == "bfloat16" else jnp.float32

    def _factored(p) -> bool:
        return (factored_v_min_size > 0 and p.ndim == 2
                and p.size >= factored_v_min_size)

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=mdt)  # noqa: E731

        def zv(p):
            if _factored(p):
                return (jnp.zeros((p.shape[0],), jnp.float32),
                        jnp.zeros((p.shape[1],), jnp.float32))
            return z(p)

        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(z, params),
            nu=jax.tree_util.tree_map(zv, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("torch_adam requires params")
        count = optax.safe_int32_increment(state.count)
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        lr_t = lr(cf) if callable(lr) else lr

        def leaf(g, p, m, v):
            # explicit f32: with bf16 master params AND bf16 grads the
            # promotion rule would otherwise keep g*g in bf16 (8 mantissa
            # bits).  Register-only cast — the HBM streams stay narrow.
            g = g.astype(jnp.float32)
            g = g + weight_decay * p.astype(jnp.float32) if weight_decay \
                else g
            m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            if isinstance(v, tuple):  # factored second moment (r, c)
                g2 = g * g
                r2 = b2 * v[0] + (1.0 - b2) * g2.mean(axis=1)
                cc2 = b2 * v[1] + (1.0 - b2) * g2.mean(axis=0)
                # rank-1 estimate of E[g^2]; mean(r2) normalizes so the
                # estimate is exact when g^2 is itself rank-1.  The b2
                # bias factor is shared by r2/cc2/mean(r2), so dividing
                # the reconstruction by c2 corrects it exactly as for
                # the full v.
                vhat = (r2[:, None] * cc2[None, :]
                        / jnp.maximum(r2.mean(), 1e-30))
                upd = (-lr_t) * (m2 / c1) / (jnp.sqrt(vhat / c2) + eps)
                return upd, m2.astype(mdt), (r2, cc2)
            v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g)
            upd = (-lr_t) * (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
            return upd, m2.astype(mdt), v2.astype(mdt)

        is3 = lambda t: isinstance(t, tuple)  # noqa: E731
        tu = jax.tree_util
        g_leaves, treedef = tu.tree_flatten(grads)
        p_leaves = tu.tree_leaves(params)
        m_leaves = tu.tree_leaves(state.mu)
        # stop at the (r, c) tuples marking factored leaves — the
        # params tree is dicts-of-arrays, so tuples appear nowhere else
        v_leaves = tu.tree_leaves(state.nu, is_leaf=is3)
        out = [leaf(g, p, m, v) for g, p, m, v in
               zip(g_leaves, p_leaves, m_leaves, v_leaves)]
        unf = lambda xs: tu.tree_unflatten(treedef, xs)  # noqa: E731
        return unf([t[0] for t in out]), optax.ScaleByAdamState(
            count=count, mu=unf([t[1] for t in out]),
            nu=unf([t[2] for t in out]))

    return optax.GradientTransformation(init, update)

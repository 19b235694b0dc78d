"""Probe: can storing the fc1 kernel in conv-native [C, W, O] layout
kill the T(8,128) re-tiling copies around fc1?

Round-3 trace accounting (docs/DESIGN.md "Round-3 trace accounting")
showed ~150 us/step of pure layout copies at batch 128 (copy.387 fwd +
copy.403 bwd): the [B, 128ch, 1024] NCW conv activations are logically
reshaped to [B, 131072] for the fc1 matmul, but the physical T(8,128)
tilings differ, so XLA materializes a copy each way.  At batch 256 the
pair costs 412 us/step (13% of the 3171 us envelope,
profiles/bf16_full_bs256/OPS.json).

The round-3 einsum attempt kept the kernel flat [131072, 256] and XLA
resolved the layout conflict by transposing the 67 MB kernel instead
(REGRESSED).  This probe instead stores the kernel natively as
[C, W, O] = [128, 1024, 256] and contracts with
``dot_general(x[b,c,w], K[c,w,o], contracting=((1,2),(0,1)))`` so NO
operand is ever reshaped:

  - fwd: y[b,o]    = sum_cw x[b,c,w] K[c,w,o]
  - bwd dx[b,c,w]  = sum_o  dy[b,o] K[c,w,o]   (conv layout directly)
  - bwd dK[c,w,o]  = sum_b  x[b,c,w] dy[b,o]   (param layout directly)

Timed on the chip: a self-contained replica of the CNN branch
(3 NCW convs -> fc1 -> relu -> fc2) + sum-loss grad + a fused
Adam-style update on the fc1 kernel (to reproduce the dominant
grad-matmul+Adam fusion), flat vs cwo, batch 256, bf16.

Usage (on the TPU): python scripts/probe_fc1_cwo.py [--batch 256]

STATUS (round 4): superseded before it ran to completion — the
shipped fix stores the fc1 kernel rows POS-MAJOR and flattens
``[B, W, C] -> [B, W*C]`` (models/layers.py), which removes the same
copies with a plain 2-D kernel (measured 3.288 -> 3.036 ms/step at
batch 256, BENCH_STEP.json).  Kept as the probe record for the
[C, W, O] alternative.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def conv_stack(x, params, dtype):
    # x: [B, 1, nbits] NCW
    for i, _ in enumerate((32, 64, 128)):
        k = params[f"conv{i + 1}"]["kernel"].astype(dtype)
        b = params[f"conv{i + 1}"]["bias"].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, k, (1,), "SAME", dimension_numbers=("NCW", "WIO", "NCW"))
        x = jax.nn.relu(x + b[None, :, None])
    return x  # [B, 128, nbits]


def fwd_flat(params, fp, dtype):
    x = conv_stack(fp[:, None, :], params, dtype)
    x = x.reshape(x.shape[0], -1)                      # [B, 128*nbits]
    w1 = params["fc1"]["kernel"].astype(dtype)         # [128*nbits, H]
    h = jax.nn.relu(x @ w1 + params["fc1"]["bias"].astype(dtype))
    w2 = params["fc2"]["kernel"].astype(dtype)
    return h @ w2


def fwd_cwo(params, fp, dtype):
    x = conv_stack(fp[:, None, :], params, dtype)      # [B, C, W]
    w1 = params["fc1"]["kernel"].astype(dtype)         # [C, W, H]
    h = jax.lax.dot_general(
        x, w1, (((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    h = jax.nn.relu(h + params["fc1"]["bias"].astype(dtype))
    w2 = params["fc2"]["kernel"].astype(dtype)
    return h @ w2


def make_step(fwd, dtype):
    def loss_fn(params, fp):
        return jnp.sum(fwd(params, fp, dtype) ** 2)

    def step(params, m, v, fp):
        g = jax.grad(loss_fn)(params, fp)

        def upd(p, g, m, v):
            g = g.astype(jnp.float32)
            m2 = 0.9 * m.astype(jnp.float32) + 0.1 * g
            v2 = 0.999 * v.astype(jnp.float32) + 0.001 * g * g
            p2 = p - 1e-3 * m2 / (jnp.sqrt(v2) + 1e-8)
            return p2, m2.astype(jnp.bfloat16), v2.astype(jnp.bfloat16)

        out = jax.tree_util.tree_map(upd, params, g, m, v)
        three = lambda t: isinstance(t, tuple)  # noqa: E731
        p2 = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=three)
        m2 = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=three)
        v2 = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=three)
        return p2, m2, v2

    def scan_steps(params, m, v, fps):
        def body(carry, fp):
            p, m, v = carry
            return step(p, m, v, fp), jnp.float32(0)
        (p, m, v), _ = jax.lax.scan(body, (params, m, v), fps)
        return p, m, v

    return jax.jit(scan_steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--nbits", type=int, default=1024)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    B, W, H = args.batch, args.nbits, args.hidden
    rng = np.random.default_rng(0)

    def U(*s):
        return jnp.asarray(rng.uniform(-0.05, 0.05, s), jnp.float32)

    base = {
        "conv1": {"kernel": U(3, 1, 32), "bias": U(32)},
        "conv2": {"kernel": U(3, 32, 64), "bias": U(64)},
        "conv3": {"kernel": U(3, 64, 128), "bias": U(128)},
        "fc2": {"kernel": U(H, 1), "bias": U(1)},
    }
    flat = dict(base, fc1={"kernel": U(128 * W, H), "bias": U(H)})
    cwo = dict(base, fc1={"kernel": flat["fc1"]["kernel"]
                          .reshape(128, W, H), "bias": flat["fc1"]["bias"]})

    fp = jnp.asarray(rng.integers(0, 2, (args.steps, B, W)), jnp.bfloat16)
    dtype = jnp.bfloat16

    # numeric cross-check at f32 on a single forward
    y_flat = fwd_flat(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), flat), fp[0].astype(jnp.float32),
        jnp.float32)
    y_cwo = fwd_cwo(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), cwo), fp[0].astype(jnp.float32),
        jnp.float32)
    print(f"[probe] fwd max|flat-cwo| (f32): "
          f"{float(jnp.max(jnp.abs(y_flat - y_cwo))):.3e}", file=sys.stderr)

    for name, fwd, params in (("flat", fwd_flat, flat),
                              ("cwo", fwd_cwo, cwo)):
        p = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)
        m = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x, jnp.bfloat16), p)
        v = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x, jnp.bfloat16), p)
        stepf = make_step(fwd, dtype)
        out = stepf(p, m, v, fp)          # compile + warmup
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = stepf(p, m, v, fp)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        us = best / args.steps * 1e6
        print(f"[probe] {name}: {us:8.1f} us/step "
              f"({B / (best / args.steps):,.0f} mol/s)  "
              f"best-of-3 over {args.steps} scanned steps")


if __name__ == "__main__":
    main()

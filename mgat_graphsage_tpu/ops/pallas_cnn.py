"""Pallas TPU kernels: fused backward for the CNN fingerprint branch.

**Status: MEASURED NEGATIVE at the flagship shape — kept as an opt-in
(``TrainConfig.cnn_pallas_bwd``), parity-tested, with the full
post-mortem below and in docs/DESIGN.md.**  16.24 vs 9.64 ms/step at
bf16 bs 1024 (scripts/bench_step.py ``bf16_full_pl_bs1024``).

Motivation: the round-5 per-op trace of the promoted bs1024 step
(profiles/flagship_bf16_bs1024_wc/OPS.json) shows the backward of
``CNNNet``'s conv1->conv2->conv3->flatten->fc1 chain (reference
``train.py:127-146``) costing ~4.1 ms of the 9.66 ms step as a parade
of individually-near-roofline HBM-bound ops (fc1-dx 376 us + its
820 us copy.354 relayout, conv3 dgrad 1224 us, bias reduce 711 us,
pre-activation recompute 214 us, conv2/conv1 fusions ~700 us), and
JAX-level rewrites provably cannot claim any of it (custom-vjp
reformulations compile to the identical HLO — profiles/bs1024_exp_ab).

The kernels:

- **Kernel 1** (``_dy3_kernel``): dy3 = reshape(dy @ fc1_Wᵀ) * (y3>0),
  tiled over fc1 rows so the 67 MB fc1 weight streams exactly once and
  dy3 is written directly in [B, W, C] for kernel 2 (the ReLU mask
  uses the *post*-activation — identical mask for ReLU).  Measured at
  its roofline: 810 us (profiles/pl_bs1024 ``cnn.26``).
- **Kernel 2** (``_chain_bwd_kernel``): the whole conv3->conv2->conv1
  backward in one pass — dgrad chaining stays in VMEM (the conv1
  input is the fingerprint, which needs no gradient), dw/db for all
  three convs accumulate in f32 across the sequential grid, and halo
  handling uses clamped element-indexed windows zero-extended by one
  column per side so every shifted slice is static and SAME-padding
  falls out of the zero columns + post-ReLU masks.

Why it loses (profiles/pl_bs1024, 50-step trace):

1. **Pallas boundary layout copies, ~2.9 ms/step** (copy.397/398/399
   ~800 us each + copy.412): XLA lays conv activations out
   position-minor ({0,2,1}); pallas_call constrains its operands to
   the default layout, so y1/y2/y3 are each fully relaid in HBM
   before the kernels can read them.  Public pallas offers no operand
   layout control; fixing this needs (W, C, B)-shaped kernels fed by
   bitcast-transposes — a full rewrite of every in-kernel contraction.
2. **Kernel 2 at ~3x its roofline, 4.87 ms** (``cnn.27``): Mosaic
   supports neither two-contracting-dim matmuls ("lhs contracting
   dims must be of size 1") nor w-batched matmuls with the batch at
   position 1 ("batch dims pos must be 0"), so the wgrads require
   [bt, inner, c] -> [bt*inner, c] operand merges — sublane
   relayouts on 9 operands per grid step — plus 512 small grid steps
   whose windows overlap 1.5x (halo 8 forced by sublane-aligned
   Element offsets).
3. XLA's replaced ops were already at 65-98% of *their* rooflines —
   the theoretical win was ~2 ms, and items 1-2 cost ~6.5 ms.

The fc1 weight gradient stays in XLA either way: the traced dw+Adam
fusion (fusion.799) already streams at ~98% of HBM peak.

Integration: :func:`cnn_tail` is a ``jax.custom_vjp`` whose forward is
op-for-op the module math (forward numerics untouched; bit-identical —
tests/test_pallas_cnn.py) and whose backward calls the kernels;
``CNNNet(pallas_bwd=True)`` routes through it.  Gradient parity with
XLA AD: f32 to ~1e-6 rel, bf16 at the same distance from an f32 oracle
as XLA AD's own bf16 backward (verified on-chip: 3-7e-3 rel, the bf16
noise floor).  CPU/interpret execution supported for the test suite.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

__all__ = ["cnn_tail", "cnn_chain_bwd", "chain_shapes_supported"]

# W-tile core width for kernel 2 (window = WT2 + 2*HALO) and kernel 1
# tile; B-tile for kernel 2.  BT2=64 is the largest B-tile whose
# scoped-VMEM stack fits the 16 MB v5e limit at the flagship shapes
# (BT2=128 compiled to a 22.2 MB stack and was rejected).
WT1 = 8
WT2 = 32
BT2 = 64
# Three chained width-3 SAME convs reach +-3; the remaining 5 halo
# columns are inert (core-masked).  HALO = 8 so that every window
# START (wt*j - HALO, clamped between two div-8 bounds) and the window
# width wt + 2*HALO stay sublane-aligned — Mosaic requires both the
# 2nd-minor block dim % 8 == 0 and provably-8-divisible Element
# offsets on that dim.
HALO = 8


def chain_shapes_supported(batch: int, width: int) -> bool:
    """Shapes the tiled kernels accept; callers fall back to XLA AD."""
    return (width % WT1 == 0 and width % WT2 == 0
            and width >= WT2 + 2 * HALO
            and batch % BT2 == 0 and batch >= 8)


# ---------------------------------------------------------------------------
# Kernel 1: dy3 = reshape(dy @ fc1_W^T, [B, W, C3]) * (y3 > 0)
# ---------------------------------------------------------------------------

def _pos(x: jnp.ndarray) -> jnp.ndarray:
    """``x > 0`` with an f32 compare — Mosaic on v5e rejects packed
    bf16 ``arith.cmpf`` ("Target does not support this comparison");
    the cast is exact, so the mask is unchanged."""
    return x.astype(jnp.float32) > 0


def _dy3_kernel(dy_ref, fk_ref, y3_ref, out_ref):
    """One W-tile: [B, wt*C3] slice of the fc1 input gradient, masked.

    dy_ref: [B, H]; fk_ref: [wt*C3, H] (pos-major fc1 rows for this
    W-tile); y3_ref/out_ref: [B, wt, C3].
    """
    b, wt, c3 = out_ref.shape
    # dx = dy @ fk^T, f32 MXU accumulation (mirrors the AD dot transpose)
    dx = lax.dot_general(dy_ref[...], fk_ref[...],
                         (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dx = dx.astype(out_ref.dtype).reshape(b, wt, c3)
    y3 = y3_ref[...]
    out_ref[...] = jnp.where(_pos(y3), dx, jnp.zeros_like(dx))


def _dy3_pallas(dy: jnp.ndarray, fk: jnp.ndarray, y3: jnp.ndarray,
                interpret: bool) -> jnp.ndarray:
    b, w, c3 = y3.shape
    h = fk.shape[1]
    return pl.pallas_call(
        _dy3_kernel,
        grid=(w // WT1,),
        in_specs=[
            pl.BlockSpec((b, h), lambda i: (0, 0)),
            pl.BlockSpec((WT1 * c3, h), lambda i: (i, 0)),
            pl.BlockSpec((b, WT1, c3), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((b, WT1, c3), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, w, c3), y3.dtype),
        interpret=interpret,
    )(dy, fk, y3)


# ---------------------------------------------------------------------------
# Kernel 2: conv3 -> conv2 -> conv1 backward, one pass
# ---------------------------------------------------------------------------

def _wpad(x: jnp.ndarray) -> jnp.ndarray:
    """[B, win, C] -> [B, win+2, C] with zero columns at both ends."""
    z = jnp.zeros_like(x[:, :1])
    return jnp.concatenate([z, x, z], axis=1)


def _chain_bwd_kernel(dy3_ref, y2_ref, y1_ref, fp_ref, k3_ref, k2_ref,
                      dw3_ref, db3_ref, dw2_ref, db2_ref, dw1_ref, db1_ref,
                      *, wt: int, width: int, nb: int, nw: int):
    """One (B-tile, W-tile) step of the fused conv-chain backward.

    Window refs span [wt + 2*HALO] positions starting at
    s = clamp(j*wt - HALO, 0, width - win); wpad coordinates add one
    zero column per side, so every shifted slice below is static and
    the zero columns implement SAME-padding at the sequence edges.
    Weight-gradient accumulators are f32 and revisit the same block
    every step (zeroed on the first).
    """
    i = pl.program_id(0)          # B tile
    j = pl.program_id(1)          # W tile
    win = wt + 2 * HALO
    wp = win + 2

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        dw3_ref[...] = jnp.zeros_like(dw3_ref)
        db3_ref[...] = jnp.zeros_like(db3_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    # window start: same value as clip(j*wt - HALO, 0, width - win) but
    # written as 8*clip(...) so Mosaic's divisibility analysis accepts
    # the Element offset (it cannot see through a bare clip)
    s = 8 * jnp.clip((j * wt - HALO) // 8, 0, (width - win) // 8)
    # core mask over the [1, wp-1) wpad interior (the range every
    # masked sum below runs on): wpad coord u = m+1 has global
    # w = s + m; core iff w in [j*wt, j*wt + wt).  Built 2-D at the
    # broadcast shape directly — slicing a traced 1-D mask lowers to an
    # unsupported gather in Mosaic.
    gw = s + lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    cm = jnp.logical_and(gw >= j * wt, gw < j * wt + wt)   # [win, 1]

    Wd3 = _wpad(dy3_ref[...])                       # [bt, wp, 128]
    Wy2 = _wpad(y2_ref[...])                        # [bt, wp, 64]
    Wy1 = _wpad(y1_ref[...])                        # [bt, wp, 32]
    Wfp = _wpad(fp_ref[...])                        # [bt, wp, 1]
    k3 = k3_ref[...]                                # [3, C2, C3]
    k2 = k2_ref[...]                                # [3, C1, C2]
    cdt = Wd3.dtype
    bt = Wd3.shape[0]
    inner = wp - 2                                  # = win

    def flat(x):
        # [bt, inner, c] -> [bt*inner, c] so every dot below is a plain
        # 2-D MXU matmul.  Mosaic supports no alternative here: two
        # contracting dims fail ("lhs contracting dims must be of size
        # 1") and w-batched matmuls fail ("batch dims pos must be 0"
        # with w at position 1).  The merge is a relayout — part of why
        # this kernel lands above its roofline (see the docstring's
        # measured-negative note).
        return x.reshape(bt * inner, x.shape[2])

    def core_masked(full):
        # zero non-core wpad columns (wgrad/bias sums run full-width)
        return flat(jnp.where(cm[None], full, 0))

    def wgrad(acc_ref, taps, dflat):
        # acc[k, ci, co] += sum_{b, core w} taps[b, w+k-1, ci] d[b, w, co]
        for k in range(3):
            acc_ref[k] += lax.dot_general(
                flat(taps[:, k:k + inner]), dflat,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    def dgrad(wd, kern):
        # dx[b, u, ci] = sum_k d[b, u+1-k, co] kern[k, ci, co], u in [1, wp-1)
        dx = jnp.zeros((bt * inner, kern.shape[1]), jnp.float32)
        for k in range(3):
            dx += lax.dot_general(
                flat(wd[:, 2 - k:2 - k + inner]), kern[k],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return dx.reshape(bt, inner, kern.shape[1])

    # ---- level 3: dw3/db3; chain to dx2 --------------------------------
    d3m = core_masked(Wd3[:, 1:1 + inner])
    wgrad(dw3_ref, Wy2, d3m)
    db3_ref[...] += jnp.sum(d3m, axis=0, dtype=jnp.float32)[None]

    # AD parity: conv dgrad materializes in the compute dtype before the
    # ReLU mask multiplies it
    dx2 = dgrad(Wd3, k3).astype(cdt)
    dy2 = jnp.where(_pos(Wy2[:, 1:1 + inner]), dx2, 0)
    dy2e = _wpad(dy2)                               # zero-extend to wp

    # ---- level 2: dw2/db2; chain to dx1 --------------------------------
    d2m = core_masked(dy2)
    wgrad(dw2_ref, Wy1, d2m)
    db2_ref[...] += jnp.sum(d2m, axis=0, dtype=jnp.float32)[None]

    dx1 = dgrad(dy2e, k2).astype(cdt)
    dy1 = jnp.where(_pos(Wy1[:, 1:1 + inner]), dx1, 0)

    # ---- level 1: dw1/db1 ----------------------------------------------
    d1m = core_masked(dy1)
    for k in range(3):
        dw1_ref[k] += lax.dot_general(
            flat(Wfp[:, k:k + inner]), d1m,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(d1m, axis=0, dtype=jnp.float32)[None]


def cnn_chain_bwd(dy3: jnp.ndarray, y2: jnp.ndarray, y1: jnp.ndarray,
                  fp: jnp.ndarray, k3: jnp.ndarray, k2: jnp.ndarray,
                  interpret: bool) -> Tuple[jnp.ndarray, ...]:
    """Fused conv-chain weight/bias gradients (f32)."""
    b, w, c3 = dy3.shape
    if not chain_shapes_supported(b, w):
        raise ValueError(
            f"cnn_chain_bwd: unsupported shape B={b}, W={w} "
            f"(need W % {WT2} == 0, W >= {WT2 + 2 * HALO}, "
            f"B % {BT2} == 0) — gate with chain_shapes_supported")
    c2 = y2.shape[2]
    c1 = y1.shape[2]
    win = WT2 + 2 * HALO
    kern = functools.partial(_chain_bwd_kernel, wt=WT2, width=w,
                             nb=b // BT2, nw=w // WT2)

    def w_start(j):
        # 8*clip(...) so Mosaic can prove the sublane offset divisible
        return 8 * jnp.clip((j * WT2 - HALO) // 8, 0, (w - win) // 8)

    def win_spec(c):
        return pl.BlockSpec(
            (pl.Element(BT2), pl.Element(win), pl.Element(c)),
            lambda i, j: (i * BT2, w_start(j), 0))

    acc = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape))
    outs = pl.pallas_call(
        kern,
        grid=(b // BT2, w // WT2),
        in_specs=[
            win_spec(c3), win_spec(c2), win_spec(c1), win_spec(1),
            pl.BlockSpec((3, c2, c3), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((3, c1, c2), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            acc((3, c2, c3)), acc((1, c3)),
            acc((3, c1, c2)), acc((1, c2)),
            acc((3, 1, c1)), acc((1, c1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, c2, c3), jnp.float32),
            jax.ShapeDtypeStruct((1, c3), jnp.float32),
            jax.ShapeDtypeStruct((3, c1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
            jax.ShapeDtypeStruct((3, 1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
        ],
        interpret=interpret,
    )(dy3, y2, y1, fp[..., None], k3, k2)
    dw3, db3, dw2, db2, dw1, db1 = outs
    return dw3, db3[0], dw2, db2[0], dw1, db1[0]


# ---------------------------------------------------------------------------
# custom_vjp boundary: conv1 -> conv2 -> conv3 -> flatten -> fc1
# ---------------------------------------------------------------------------

_DN = ("NWC", "WIO", "NWC")


def _conv_relu(x, k, b):
    """Op-for-op ``TorchConv1d`` + ``nn.relu`` (models/layers.py)."""
    y = lax.conv_general_dilated(x, k.astype(x.dtype), (1,), "SAME",
                                 dimension_numbers=_DN)
    return jnp.maximum(y + b.astype(y.dtype), 0)


def _fwd_chain(fp, k1, b1, k2, b2, k3, b3, fk, fb):
    x = fp[..., None]
    y1 = _conv_relu(x, k1, b1)
    y2 = _conv_relu(y1, k2, b2)
    y3 = _conv_relu(y2, k3, b3)
    xf = y3.reshape(y3.shape[0], -1)        # pos-major flatten
    out = jnp.dot(xf, fk,
                  preferred_element_type=jnp.float32).astype(xf.dtype)
    return out + fb, (y1, y2, y3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def cnn_tail(fp, k1, b1, k2, b2, k3, b3, fk, fb, interpret=False):
    """``CNNNet``'s conv stack + pos-major flatten + fc1, with the
    backward replaced by the fused Pallas kernels above.  Forward math
    is identical to the module path (``models/layers.py::CNNNet``)."""
    out, _ = _fwd_chain(fp, k1, b1, k2, b2, k3, b3, fk, fb)
    return out


def _cnn_tail_fwd(fp, k1, b1, k2, b2, k3, b3, fk, fb, interpret):
    out, (y1, y2, y3) = _fwd_chain(fp, k1, b1, k2, b2, k3, b3, fk, fb)
    return out, (fp, k2, k3, fk, y1, y2, y3)


def _cnn_tail_bwd(interpret, res, g):
    fp, k2, k3, fk, y1, y2, y3 = res
    b, w, c3 = y3.shape
    # fc1 bias: reduce of the raw cotangent (AD parity: the bias add is
    # the last op, so its transpose sees g before anything else)
    dfb = jnp.sum(g, axis=0, dtype=g.dtype)
    # fc1 weight grad stays in XLA: the traced dw+Adam fusion already
    # runs at ~98% of HBM peak (docs/DESIGN.md round-5 accounting)
    xf = y3.reshape(b, -1)
    g32 = g.astype(jnp.float32)
    dfk = lax.dot_general(xf, g32, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32
                          ).astype(fk.dtype)
    # kernel 1: masked fc1 input gradient, already [B, W, C3]
    dy3 = _dy3_pallas(g32.astype(y3.dtype), fk, y3, interpret)
    # kernel 2: the whole conv chain
    dw3, db3, dw2, db2, dw1, db1 = cnn_chain_bwd(
        dy3, y2, y1, fp, k3, k2, interpret)
    cast = lambda v, like: v.astype(like.dtype)
    return (jnp.zeros_like(fp),
            cast(dw1, k2), cast(db1, k2), cast(dw2, k2), cast(db2, k2),
            cast(dw3, k3), cast(db3, k3), dfk, cast(dfb, fk))


cnn_tail.defvjp(_cnn_tail_fwd, _cnn_tail_bwd)

"""Pallas 3x3 SAME conv for large-spatial NHWC shapes (the SD VAE decode).

Why this kernel exists: XLA's conv lowering runs the VAE decoder's
512x512-spatial convs at 0.18-0.23 of bf16 peak in isolation
(tools/vae_conv_probe.py) — the worst rates anywhere in either model family
— and the scoring decode is 66% of SD device self-time (PARITY note 7e;
the reference executes this decode per candidate in sequential Python,
pipeline_stable_diffusion.py:1413-1414). The tiling roofline says the
geometry is ~0.97-clean (tools/roofline.py --arch sd_vae), so the deficit
is XLA's spatial-chunked lowering, not padding. This kernel is the
"halo-DMA'd im2col" design named in PARITY round-4 candidates 10/11.

Design (one grid step = one [TH, W] row-band of one batch element):

  grid = (B, H // TH)
  inputs per step (Pallas auto-pipelines HBM->VMEM, double-buffered):
    body [1, TH, W, C]   the band
    top  [1, 1,  W, C]   row TH*i - 1 (clamped; zeroed in-kernel at i=0)
    bot  [1, 1,  W, C]   row TH*i + TH (clamped; zeroed at the last band)
    w2   [9C, K]         kernel reshaped (dy, dx, c) -> rows
  scratch:
    xs   [TH+2, W+2, C]  W-padded band with halo rows; the W border
                         columns are zeroed once at the first grid step
                         and never rewritten (SAME zero padding)
    im   [TH*(W+2), 9C]  in-VMEM im2col: tap (dy, dx) occupies lane block
                         [3dy+dx]*C with rows = xs[dy:dy+TH] flattened and
                         rolled by -dx (row-crossing wrap and the dx>0
                         garbage land only in the two discarded W-pad
                         output columns)
  compute: ONE MXU dot [TH*(W+2), 9C] x [9C, K] per band (contraction
  depth 9C >= 1152 — far past the 128 the tap-accumulate form would get),
  then slice off the W padding. Optional fused epilogue: +bias, +residual
  (the VAE resnet's skip add — saves that tensor's separate HBM pass).

HBM traffic per band: body read once + 2 halo rows (re-read; (TH+2)/TH
overhead) + y write once. No manual DMA needed — the halo rows are just
two extra 1-row BlockSpec inputs with clamped index maps.

Differentiable via custom_vjp with the jnp/XLA conv as backward (the same
forward-only-kernel pattern as ops/pallas/groupnorm.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3_kernel(body_ref, top_ref, bot_ref, w2_ref, *rest,
                  th: int, w: int, c: int, kout: int, has_bias: bool,
                  has_residual: bool):
    refs = list(rest)
    bias_ref = refs.pop(0) if has_bias else None
    res_ref = refs.pop(0) if has_residual else None
    y_ref, xs, im = refs
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    first = (pl.program_id(0) == 0) & (i == 0)

    @pl.when(first)
    def _zero_pad_cols():
        # W-border zero padding: written once, never overwritten (interior
        # writes below cover [*, 1:W+1] only).
        xs[:] = jnp.zeros_like(xs)

    xs[1:th + 1, 1:w + 1, :] = body_ref[0]
    top = top_ref[0, 0].astype(xs.dtype)
    bot = bot_ref[0, 0].astype(xs.dtype)
    xs[0, 1:w + 1, :] = jnp.where(i > 0, top, jnp.zeros_like(top))
    xs[th + 1, 1:w + 1, :] = jnp.where(i < n_i - 1, bot, jnp.zeros_like(bot))

    m = th * (w + 2)
    for dy in range(3):
        base = xs[dy:dy + th, :, :].reshape(m, c)
        for dx in range(3):
            tap = 3 * dy + dx
            # roll by m - dx == roll by -dx: y[r] = base[r + dx]
            shifted = base if dx == 0 else pltpu.roll(base, m - dx, axis=0)
            im[:, tap * c:(tap + 1) * c] = shifted

    out = jnp.dot(im[:], w2_ref[:], preferred_element_type=jnp.float32)
    out = out.reshape(th, w + 2, kout)[:, 0:w, :]
    if bias_ref is not None:
        out = out + bias_ref[0].astype(jnp.float32)
    if res_ref is not None:
        out = out + res_ref[0].astype(jnp.float32)
    y_ref[0] = out.astype(y_ref.dtype)


def _pick_th(h: int, w: int, c: int, kout: int, itemsize: int,
             budget: int = 10 * 2**20) -> int:
    def est(th):
        m = th * (w + 2)
        return (m * 9 * c * itemsize            # im
                + (th + 2) * (w + 2) * c * itemsize  # xs
                + m * kout * 4                   # dot output (fp32)
                + 2 * th * w * c * itemsize      # body double-buffered
                + 2 * th * w * kout * itemsize   # y double-buffered
                + 9 * c * kout * itemsize)       # w2

    th = 1
    for cand in (32, 16, 8, 4, 2):
        if h % cand == 0 and est(cand) <= budget:
            th = cand
            break
    return th


def _conv3_reference(x, kernel, bias=None, residual=None):
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if residual is not None:
        out = out + residual.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret",))
def _conv3_fwd_only(x, kernel, bias=None, residual=None, *,
                    interpret: bool = False):
    b, h, w, c = x.shape
    kout = kernel.shape[-1]
    th = _pick_th(h, w, c, kout, x.dtype.itemsize)
    w2 = kernel.reshape(9 * c, kout).astype(x.dtype)

    in_specs = [
        pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda bi, i: (bi, jnp.maximum(i * th - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c),
                     lambda bi, i: (bi, jnp.minimum(i * th + th, h - 1), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * c, kout), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, w2]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, kout), lambda bi, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, kout))
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, th, w, kout),
                                     lambda bi, i: (bi, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    flops = 2 * b * h * w * 9 * c * kout
    return pl.pallas_call(
        functools.partial(
            _conv3_kernel, th=th, w=w, c=c, kout=kout,
            has_bias=bias is not None, has_residual=residual is not None,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, kout), x.dtype),
        grid=(b, h // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, kout), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(((th + 2), w + 2, c), x.dtype),       # xs
            pltpu.VMEM((th * (w + 2), 9 * c), x.dtype),       # im
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(b * h * w * (c + kout) * x.dtype.itemsize
                            + 9 * c * kout * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(*args)


# ---------------------------------------------------------------- custom vjp
# Forward runs the hand-written kernel; backward is the VJP of the jnp/XLA
# reference (numerically the same conv) so training through the kernel works
# on TPU — the same treatment as ops/pallas/groupnorm.py.

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _conv3_diff(x, kernel, bias, residual, interpret):
    return _conv3_fwd_only(x, kernel, bias, residual, interpret=interpret)


def _conv3_diff_fwd(x, kernel, bias, residual, interpret):
    out = _conv3_diff(x, kernel, bias, residual, interpret)
    return out, (x, kernel, bias, residual)


def _conv3_diff_bwd(interpret, res, g):
    x, kernel, bias, residual = res
    diff_args = [x, kernel]
    if bias is not None:
        diff_args.append(bias)
    if residual is not None:
        diff_args.append(residual)

    def ref(*a):
        xx, kk = a[0], a[1]
        rest = list(a[2:])
        bb = rest.pop(0) if bias is not None else None
        rr = rest.pop(0) if residual is not None else None
        return _conv3_reference(xx, kk, bb, rr)

    _, vjp = jax.vjp(ref, *diff_args)
    grads = list(vjp(g))
    gx, gk = grads.pop(0), grads.pop(0)
    gb = grads.pop(0) if bias is not None else None
    gr = grads.pop(0) if residual is not None else None
    return gx, gk, gb, gr


_conv3_diff.defvjp(_conv3_diff_fwd, _conv3_diff_bwd)


def conv3x3_same(x, kernel, bias=None, residual=None, *,
                 interpret: bool = False):
    """3x3 stride-1 SAME conv, NHWC x [B,H,W,C] * HWIO kernel [3,3,C,K],
    optional fused +bias [K] and +residual [B,H,W,K] epilogue. fp32
    accumulation regardless of input dtype."""
    return _conv3_diff(x, kernel, bias, residual, interpret)


_NO_PALLAS_CONV = bool(os.environ.get("DTTS_NO_PALLAS_CONV"))


def pallas_conv3_eligible(x, kernel) -> bool:
    """TPU only; lane-aligned channels; H tileable. Read-once env
    kill-switch DTTS_NO_PALLAS_CONV (same trace-time rule as the GN/attn
    kernels: set before first use)."""
    if _NO_PALLAS_CONV:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if kernel.shape[:2] != (3, 3):
        return False
    b, h, w, c = x.shape
    kout = kernel.shape[-1]
    if c % 128 or kout % 128:
        return False
    return h % 2 == 0 and h >= 8 and w >= 8


__all__ = ["conv3x3_same", "pallas_conv3_eligible"]

"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm is HBM-bandwidth-bound: unfused XLA does one pass for statistics
and one for normalization, plus a separate SiLU. This kernel fuses
stats + normalize + affine + SiLU with fp32 statistics regardless of
activation dtype (the reference GroupNorm's semantics,
edm/training/networks.py:96-106).

Statistics cross the whole spatial extent, and Mosaic forbids splitting the
lane (channel) dimension, so the kernel runs a two-phase grid per batch
element — (batch, phase, h-blocks) with fp32 accumulators in VMEM scratch
persisting across the sequential grid:

  phase 0: accumulate per-channel column sums / sum-of-squares,
  phase 1: fold channels into groups via a [C, G] one-hot matmul (MXU),
           broadcast back per-channel, normalize + affine (+ SiLU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, colsum, colsumsq, stats,
               *, cg: int, eps: float, apply_silu: bool, total_hw: int):
    ph = pl.program_id(1)
    hb = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # [HB, W, C]
    hbs, w, c = x.shape
    x2d = x.reshape(hbs * w, c)

    @pl.when((ph == 0) & (hb == 0))
    def _init():
        colsum[:] = jnp.zeros_like(colsum)
        colsumsq[:] = jnp.zeros_like(colsumsq)

    @pl.when(ph == 0)
    def _accumulate():
        colsum[:] = colsum[:] + jnp.sum(x2d, axis=0, keepdims=True)
        colsumsq[:] = colsumsq[:] + jnp.sum(x2d * x2d, axis=0, keepdims=True)

    @pl.when((ph == 1) & (hb == 0))
    def _finalize_stats():
        gb = c // cg
        ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, gb), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, gb), 1)
        onehot = (ch_ids // cg == g_ids).astype(jnp.float32)  # [C, G]
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        denom = float(total_hw * cg)
        mean_g = dot(colsum[:], onehot) / denom  # [1, G]
        var_g = dot(colsumsq[:], onehot) / denom - mean_g * mean_g
        stats[0:1, :] = dot(mean_g, onehot.T)  # mean per channel
        stats[1:2, :] = dot(jax.lax.rsqrt(var_g + eps), onehot.T)

    @pl.when(ph == 1)
    def _normalize():
        out = (x2d - stats[0:1, :]) * stats[1:2, :]
        # scale/bias are per-(batch, channel) [1, 1, C] blocks: the wrapper
        # folds the GN affine and any per-sample (AdaGN) modulation into them.
        out = out * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
        if apply_silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0] = out.reshape(hbs, w, c).astype(o_ref.dtype)


def _pick_hblock(h: int, w: int, c: int, budget: int = 4 * 2**20) -> int:
    per_row = w * c * 4 * 3
    hb = max(1, min(h, budget // max(per_row, 1)))
    while h % hb:
        hb -= 1
    return hb


def _gn_reference(x, scale, bias, groups, eps, apply_silu):
    """Pure-jnp mirror of the kernel (fp32 stats; [C] or [B, C] affine).
    Forward-equivalent to the Pallas path; used as the VJP source so the
    fused kernel is differentiable (training steps on TPU hit GN under
    grad; the kernel itself only implements the forward)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    scale = scale.astype(jnp.float32).reshape(-1, 1, 1, c)
    bias = bias.astype(jnp.float32).reshape(-1, 1, 1, c)
    out = xn * scale + bias
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_silu_diff(x, scale, bias, groups, eps, apply_silu, interpret):
    return _group_norm_silu_fwd_only(
        x, scale, bias, groups=groups, eps=eps, apply_silu=apply_silu,
        interpret=interpret,
    )


def _gn_silu_diff_fwd(x, scale, bias, groups, eps, apply_silu, interpret):
    out = _gn_silu_diff(x, scale, bias, groups, eps, apply_silu, interpret)
    return out, (x, scale, bias)


def _gn_silu_diff_bwd(groups, eps, apply_silu, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_reference(xx, ss, bb, groups, eps, apply_silu),
        x, scale, bias,
    )
    return vjp(g)


_gn_silu_diff.defvjp(_gn_silu_diff_fwd, _gn_silu_diff_bwd)


def group_norm_silu(
    x: jax.Array, scale: jax.Array, bias: jax.Array, *, groups: int,
    eps: float = 1e-5, apply_silu: bool = True, interpret: bool = False,
) -> jax.Array:
    """x [B,H,W,C] NHWC; scale/bias [C] or per-sample [B, C].

    Returns (GN(x)*scale+bias) (+SiLU). The per-sample form is how AdaGN
    (UNetBlock norm1, edm/training/networks.py:172-174) fuses: the wrapper
    folds the timestep-affine modulation into effective [B, C] scale/bias so
    GN + modulation + SiLU is one HBM round-trip. Differentiable: the
    backward pass is the VJP of the equivalent jnp computation (XLA-fused),
    only the forward runs the hand-written kernel.
    """
    return _gn_silu_diff(x, scale, bias, groups, eps, apply_silu, interpret)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu", "interpret"))
def _group_norm_silu_fwd_only(
    x: jax.Array, scale: jax.Array, bias: jax.Array, *, groups: int,
    eps: float = 1e-5, apply_silu: bool = True, interpret: bool = False,
) -> jax.Array:
    b, h, w, c = x.shape
    assert c % groups == 0
    cg = c // groups
    hb = _pick_hblock(h, w, c)
    # [B, 1, C] so the (1, 1, C) block's trailing two dims match Mosaic's
    # (sublane=full-dim, lane%128) tiling rules for any batch size.
    if scale.ndim == 1:
        scale = jnp.broadcast_to(scale[None, None, :], (b, 1, c))
    else:
        scale = scale.reshape(b, 1, c)
    if bias.ndim == 1:
        bias = jnp.broadcast_to(bias[None, None, :], (b, 1, c))
    else:
        bias = bias.reshape(b, 1, c)
    return pl.pallas_call(
        functools.partial(
            _gn_kernel, cg=cg, eps=eps, apply_silu=apply_silu, total_hw=h * w
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, 2, h // hb),
        in_specs=[
            pl.BlockSpec((1, hb, w, c), lambda i, p, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, w, c), lambda i, p, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),  # colsum
            pltpu.VMEM((1, c), jnp.float32),  # colsumsq
            pltpu.VMEM((2, c), jnp.float32),  # mean/rstd per channel
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * w * c, bytes_accessed=3 * b * h * w * c * x.dtype.itemsize,
            transcendentals=b * h * w * c if apply_silu else 0,
        ),
    )(x, scale, bias)


def pallas_gn_eligible(x: jax.Array) -> bool:
    import os

    if os.environ.get("DTTS_NO_PALLAS_GN"):  # A/B kill-switch (tools/perf_probe.py)
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, h, w, c = x.shape
    # The channel block always spans the full lane dim, which Mosaic allows
    # for any size ("equal to the overall array" clause) — but lane tiles are
    # 128 wide, so require enough channels that padding waste stays small
    # (192 -> 1.5 tiles covers the ADM res-64 level, the HBM-heaviest GNs).
    return c % 64 == 0 and c >= 128


__all__ = ["group_norm_silu", "pallas_gn_eligible"]

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


def _gn_kernel(x_ref, scale_ref, bias_ref, *rest,
               cg: int, eps: float, apply_silu: bool, total_hw: int,
               has_pre: bool):
    if has_pre:
        pre_ref, o_ref, colsum, colsumsq, stats = rest
    else:
        o_ref, colsum, colsumsq, stats = rest
        pre_ref = None
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
        cs, csq = colsum[:], colsumsq[:]
        if pre_ref is not None:
            # statistics of (x + pre) fold into the raw moments of x:
            # sum' = sum + HW*p,  sumsq' = sumsq + 2*p*sum + HW*p^2
            p = pre_ref[0].astype(jnp.float32)  # [1, C]
            csq = csq + 2.0 * p * cs + float(total_hw) * p * p
            cs = cs + float(total_hw) * p
        gb = c // cg
        ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, gb), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, gb), 1)
        onehot = (ch_ids // cg == g_ids).astype(jnp.float32)  # [C, G]
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        denom = float(total_hw * cg)
        mean_g = dot(cs, onehot) / denom  # [1, G]
        # raw-moment variance can cancel slightly negative in fp32 for
        # near-constant groups (esp. with a large folded pre-bias) — clamp
        # so rsqrt(var + eps) stays finite
        var_g = jnp.maximum(dot(csq, onehot) / denom - mean_g * mean_g, 0.0)
        stats[0:1, :] = dot(mean_g, onehot.T)  # mean per channel
        stats[1:2, :] = dot(jax.lax.rsqrt(var_g + eps), onehot.T)

    @pl.when(ph == 1)
    def _normalize():
        xin = x2d if pre_ref is None else x2d + pre_ref[0].astype(jnp.float32)
        out = (xin - stats[0:1, :]) * stats[1:2, :]
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


def _gn_reference(x, scale, bias, groups, eps, apply_silu, pre=None):
    """Pure-jnp mirror of the kernel (fp32 stats; [C] or [B, C] affine;
    optional per-sample additive pre-bias folded before normalization).
    Forward-equivalent to the Pallas path; used as the VJP source so the
    fused kernel is differentiable (training steps on TPU hit GN under
    grad; the kernel itself only implements the forward)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    if pre is not None:
        xf = xf + pre.astype(jnp.float32).reshape(-1, 1, 1, c)
    xf = xf.reshape(b, h, w, groups, c // groups)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _gn_silu_pre_diff(x, scale, bias, pre, groups, eps, apply_silu, interpret):
    return _group_norm_silu_fwd_only(
        x, scale, bias, pre=pre, groups=groups, eps=eps, apply_silu=apply_silu,
        interpret=interpret,
    )


def _gn_silu_pre_diff_fwd(x, scale, bias, pre, groups, eps, apply_silu, interpret):
    out = _gn_silu_pre_diff(x, scale, bias, pre, groups, eps, apply_silu, interpret)
    return out, (x, scale, bias, pre)


def _gn_silu_pre_diff_bwd(groups, eps, apply_silu, interpret, res, g):
    x, scale, bias, pre = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb, pp: _gn_reference(xx, ss, bb, groups, eps, apply_silu, pp),
        x, scale, bias, pre,
    )
    return vjp(g)


_gn_silu_pre_diff.defvjp(_gn_silu_pre_diff_fwd, _gn_silu_pre_diff_bwd)


def group_norm_silu_prebias(
    x: jax.Array, scale: jax.Array, bias: jax.Array, pre: jax.Array, *,
    groups: int, eps: float = 1e-5, apply_silu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """silu(GN(x + pre) * scale + bias) with per-sample pre [B, C] — the
    SongUNet (non-adaptive) norm1 pattern silu(GN(x + emb_affine))
    (edm/training/networks.py:176). The additive embedding folds into the
    kernel's raw moments (sum' = sum + HW*p, sumsq' = sumsq + 2p*sum +
    HW*p^2), so the add never materializes a separate HBM pass."""
    return _gn_silu_pre_diff(x, scale, bias, pre, groups, eps, apply_silu, interpret)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu", "interpret"))
def _group_norm_silu_fwd_only(
    x: jax.Array, scale: jax.Array, bias: jax.Array, pre: jax.Array | None = None,
    *, groups: int, eps: float = 1e-5, apply_silu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    b, h, w, c = x.shape
    assert c % groups == 0
    cg = c // groups
    hb = _pick_hblock(h, w, c)

    # [B, 1, C] so the (1, 1, C) block's trailing two dims match Mosaic's
    # (sublane=full-dim, lane%128) tiling rules for any batch size.
    def row(v):
        if v.ndim == 1:
            return jnp.broadcast_to(v[None, None, :], (b, 1, c))
        return v.reshape(b, 1, c)

    scale, bias = row(scale), row(bias)
    row_spec = pl.BlockSpec((1, 1, c), lambda i, p, j: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, hb, w, c), lambda i, p, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        row_spec,
        row_spec,
    ]
    args = [x, scale, bias]
    if pre is not None:
        in_specs.append(row_spec)
        args.append(row(pre))
    return pl.pallas_call(
        functools.partial(
            _gn_kernel, cg=cg, eps=eps, apply_silu=apply_silu, total_hw=h * w,
            has_pre=pre is not None,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, 2, h // hb),
        in_specs=in_specs,
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
    )(*args)


def _gn_stats_kernel(x_ref, stats_ref, colsum, colsumsq, *,
                     cg: int, eps: float, total_hw: int):
    """Moments-only phase of _gn_kernel: ONE read of x, emitting per-channel
    mean/rstd [2, C]. Feeds consumers that apply normalization themselves
    (the Pallas conv's GN prologue) — reshaped jnp group reductions measure
    13-70 GB/s on the 512x512 VAE tensors where this runs at read bandwidth."""
    hb = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    hbs, w, c = x.shape
    x2d = x.reshape(hbs * w, c)

    @pl.when(hb == 0)
    def _init():
        colsum[:] = jnp.zeros_like(colsum)
        colsumsq[:] = jnp.zeros_like(colsumsq)

    colsum[:] = colsum[:] + jnp.sum(x2d, axis=0, keepdims=True)
    colsumsq[:] = colsumsq[:] + jnp.sum(x2d * x2d, axis=0, keepdims=True)

    @pl.when(hb == pl.num_programs(1) - 1)
    def _finalize():
        gb = c // cg
        ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, gb), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, gb), 1)
        onehot = (ch_ids // cg == g_ids).astype(jnp.float32)  # [C, G]
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        denom = float(total_hw * cg)
        mean_g = dot(colsum[:], onehot) / denom
        var_g = jnp.maximum(
            dot(colsumsq[:], onehot) / denom - mean_g * mean_g, 0.0)
        stats_ref[0, 0:1, :] = dot(mean_g, onehot.T)
        stats_ref[0, 1:2, :] = dot(jax.lax.rsqrt(var_g + eps), onehot.T)


def _gn_stats_reference(x, groups, eps):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, c)
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(xf * xf, axis=1)
    n = float(h * w * (c // groups))
    s1g = s1.reshape(b, groups, c // groups).sum(-1)
    s2g = s2.reshape(b, groups, c // groups).sum(-1)
    mean_g = s1g / n
    var_g = jnp.maximum(s2g / n - mean_g * mean_g, 0.0)
    mean = jnp.repeat(mean_g, c // groups, axis=1)
    rstd = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // groups, axis=1)
    return mean, rstd


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def _gn_stats_fwd_only(x, *, groups, eps, interpret=False):
    b, h, w, c = x.shape
    assert c % groups == 0
    hb = _pick_hblock(h, w, c)
    out = pl.pallas_call(
        functools.partial(_gn_stats_kernel, cg=c // groups, eps=eps,
                          total_hw=h * w),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        grid=(b, h // hb),
        in_specs=[pl.BlockSpec((1, hb, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * b * h * w * c,
            bytes_accessed=b * h * w * c * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x)
    return out[:, 0, :], out[:, 1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _gn_stats_diff(x, groups, eps, interpret):
    return _gn_stats_fwd_only(x, groups=groups, eps=eps, interpret=interpret)


def _gn_stats_diff_fwd(x, groups, eps, interpret):
    return _gn_stats_diff(x, groups, eps, interpret), (x,)


def _gn_stats_diff_bwd(groups, eps, interpret, res, g):
    (x,) = res
    _, vjp = jax.vjp(lambda xx: _gn_stats_reference(xx, groups, eps), x)
    return vjp(g)


_gn_stats_diff.defvjp(_gn_stats_diff_fwd, _gn_stats_diff_bwd)


def group_norm_stats(x: jax.Array, *, groups: int, eps: float = 1e-5,
                     interpret: bool = False):
    """Per-channel GN statistics (mean, rstd) [B, C] fp32 in ONE read of x.

    TPU: the moments-phase Pallas kernel; elsewhere: the lane-friendly jnp
    reduction (sum over [B, HW, C] axis 1 — NOT the [B, HW, G, C/G]
    grouped reshape, which lowers to a 13 GB/s reduction at the 512x512
    VAE shapes). Differentiable via the jnp mirror's VJP."""
    if jax.default_backend() in ("tpu", "axon") and pallas_gn_eligible(x):
        return _gn_stats_diff(x, groups, eps, interpret)
    return _gn_stats_reference(x, groups, eps)


# A/B kill-switch (tools/perf_probe.py). Read ONCE at import: eligibility is
# evaluated at trace time and jitted callers cache the traced program, so a
# post-first-call toggle would silently do nothing anyway — set the env var
# before importing/first use.
_NO_PALLAS_GN = bool(__import__("os").environ.get("DTTS_NO_PALLAS_GN"))


def pallas_gn_eligible(x: jax.Array) -> bool:
    if _NO_PALLAS_GN:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    _, h, w, c = x.shape
    # The channel block always spans the full lane dim, which Mosaic allows
    # for any size ("equal to the overall array" clause) — but lane tiles are
    # 128 wide, so require enough channels that padding waste stays small
    # (192 -> 1.5 tiles covers the ADM res-64 level, the HBM-heaviest GNs).
    return c % 64 == 0 and c >= 128


__all__ = ["group_norm_silu", "group_norm_silu_prebias", "group_norm_stats",
           "pallas_gn_eligible"]

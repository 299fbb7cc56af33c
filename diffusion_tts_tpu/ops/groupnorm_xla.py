"""Two-HBM-pass GroupNorm(+SiLU) via XLA producer fusion.

The Pallas GN kernel (ops/pallas/groupnorm.py) is 3 HBM passes: read x for
statistics, read x again to normalize, write the output. Being an opaque
kernel it is also a fusion BARRIER — conv biases and residual adds feeding
a Pallas GN materialize as standalone elementwise passes (visible as the
`add` ops in the bench trace).

On TPU, XLA fuses per-channel moment reductions into the *producer's*
epilogue (measured: +0.04 ms on top of a 1.0 ms conv where the standalone
reductions cost 1.0 ms — tools/conv_epilogue_probe.py). So a pure-jnp GN
written as

  pass 0 (rides the producer):  colsum/colsumsq over (H, W) per (B, C)
  tiny [B, G] math:             raw moments -> mean / rsqrt(var + eps)
  pass 1 (one loop fusion):     (x - mean) * rstd * scale + bias (+ SiLU)

costs ~2 passes of x, and the elementwise chain AROUND it (conv bias,
residual skip, pre-bias embedding) fuses into both passes for free. Same
fp32-statistics semantics as the reference GroupNorm
(edm/training/networks.py:96-106) and the Pallas kernel (raw-moment
variance, clamped >= 0); natively differentiable (no custom_vjp needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_silu_xla(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    groups: int,
    eps: float = 1e-5,
    apply_silu: bool = True,
    pre: jax.Array | None = None,
) -> jax.Array:
    """silu((GN(x [+ pre]) * scale + bias)) in two fused XLA passes.

    Args:
      x: [B, H, W, C] (NHWC), any float dtype.
      scale, bias: [C] or per-sample [B, C] (AdaGN folds its modulation in).
      pre: optional per-sample additive pre-bias [B, C], added before the
        statistics (the SongUNet norm1 pattern).

    Returns [B, H, W, C] in x.dtype.
    """
    b, h, w, c = x.shape
    assert c % groups == 0
    cg = c // groups

    def xin_f32():
        xf = x.astype(jnp.float32)
        if pre is not None:
            xf = xf + pre.astype(jnp.float32).reshape(-1, 1, 1, c)
        return xf

    # Moments per (B, C): reduces over the spatial dims only, so the
    # reduction output is tiny and XLA emits it as an epilogue of whatever
    # wrote x (conv / residual-add fusion). Recomputing `xin_f32()` in the
    # normalize pass below is deliberate: it keeps this op a pure consumer
    # in both fusions instead of forcing an extra materialization.
    xf = xin_f32()
    colsum = xf.sum(axis=(1, 2))          # [B, C]
    colsumsq = (xf * xf).sum(axis=(1, 2))  # [B, C]

    n = float(h * w * cg)
    gsum = colsum.reshape(b, groups, cg).sum(axis=-1)      # [B, G]
    gsumsq = colsumsq.reshape(b, groups, cg).sum(axis=-1)  # [B, G]
    mean_g = gsum / n
    # raw-moment variance can cancel slightly negative in fp32 for
    # near-constant groups — clamp so rsqrt stays finite (same guard as the
    # Pallas kernel).
    var_g = jnp.maximum(gsumsq / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean = jnp.repeat(mean_g, cg, axis=-1).reshape(b, 1, 1, c)
    rstd = jnp.repeat(rstd_g, cg, axis=-1).reshape(b, 1, 1, c)

    scale_f = scale.astype(jnp.float32).reshape(-1, 1, 1, c)
    bias_f = bias.astype(jnp.float32).reshape(-1, 1, 1, c)
    out = (xin_f32() - mean) * rstd * scale_f + bias_f
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


__all__ = ["group_norm_silu_xla"]

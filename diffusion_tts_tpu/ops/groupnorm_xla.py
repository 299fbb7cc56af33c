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
residual skip, pre-bias embedding) fuses into both passes for free.
Statistics semantics match the reference GroupNorm
(edm/training/networks.py:96-106) and the Pallas kernel (raw-moment
variance, clamped >= 0) with ONE documented deviation: the per-element
square is computed in the INPUT dtype before the fp32 accumulation (see
the comment at the reduction below for why upcasting first regresses) —
for bf16 activations each x^2 is rounded to bf16 (<=0.4% per element)
while the sums, mean and rstd still accumulate and resolve in fp32. For
fp32 inputs the statistics are exactly fp32. Natively differentiable (no
custom_vjp needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_silu_xla(
    x,
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
      x: [B, H, W, C] (NHWC), any float dtype — or a tuple/list of channel
        parts [B, H, W, Ci] representing their (never-materialized-here)
        channel concatenation: each part's moments ride its OWN producer's
        epilogue, which a reduce over an explicit `concatenate` cannot do
        (the UNet decoder's cat(x, enc_skip) block inputs).
      scale, bias: [C] or per-sample [B, C] (AdaGN folds its modulation in).
      pre: optional per-sample additive pre-bias [B, C], added before the
        statistics (the SongUNet norm1 pattern).

    Returns [B, H, W, C] in x.dtype.
    """
    parts = list(x) if isinstance(x, (tuple, list)) else [x]
    b, h, w, _ = parts[0].shape
    c = sum(p.shape[-1] for p in parts)
    assert c % groups == 0
    cg = c // groups
    pre_f = (None if pre is None
             else pre.astype(jnp.float32).reshape(-1, 1, 1, c))

    def part_f32(i, lo, hi):
        pf = parts[i].astype(jnp.float32)
        if pre_f is not None:
            pf = pf + pre_f[..., lo:hi]
        return pf

    bounds = []
    off = 0
    for p in parts:
        bounds.append((off, off + p.shape[-1]))
        off += p.shape[-1]

    # Moments per (B, C) straight off the INPUT-dtype tensor: reduces with
    # an fp32 accumulator (dtype=) over the spatial dims, so the reduction
    # output is tiny and XLA emits it as an epilogue of whatever wrote that
    # part (conv / residual-add fusion). Upcasting first looks equivalent
    # but is not: at large spatial sizes XLA materializes the fp32 upcast
    # (and the fp32 square) as full tensors plus layout copies — observed
    # as 2x134 MB fp32 writes per VAE-decoder GN. The square is computed in
    # the input dtype for the same reason; for bf16 activations that
    # rounds each x^2 to bf16 before the fp32 accumulation (<=0.4% per
    # element on values the activations already quantize to bf16) — the
    # mean/rstd themselves still accumulate and resolve in fp32. The
    # per-sample `pre` folds into the raw moments analytically on [B, C]
    # (sum' = sum + HW*p, sumsq' = sumsq + 2p*sum + HW*p^2 — the same
    # identity the Pallas kernel uses), never touching the big tensor.
    sums, sumsqs = [], []
    for i, (lo, hi) in enumerate(bounds):
        p = parts[i]
        sums.append(p.sum(axis=(1, 2), dtype=jnp.float32))
        sumsqs.append((p * p).sum(axis=(1, 2), dtype=jnp.float32))
    colsum = sums[0] if len(sums) == 1 else jnp.concatenate(sums, axis=-1)
    colsumsq = (sumsqs[0] if len(sumsqs) == 1
                else jnp.concatenate(sumsqs, axis=-1))
    if pre is not None:
        pc = pre.astype(jnp.float32).reshape(-1, c)
        n_hw = float(h * w)
        colsumsq = colsumsq + 2.0 * pc * colsum + n_hw * pc * pc
        colsum = colsum + n_hw * pc

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
    outs = []
    for i, (lo, hi) in enumerate(bounds):
        o = (part_f32(i, lo, hi) - mean[..., lo:hi]) * rstd[..., lo:hi] \
            * scale_f[..., lo:hi] + bias_f[..., lo:hi]
        if apply_silu:
            o = o * jax.nn.sigmoid(o)
        outs.append(o)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return out.astype(parts[0].dtype)


__all__ = ["group_norm_silu_xla"]

"""Fused nearest-2x-upsample + 3x3 conv via 2x2-phase decomposition.

Both decoder families upsample with nearest-neighbor 2x followed by a
3x3/pad-1 conv (SD: diffusers upsampling.py Upsample2D; EDM: the ADM
up-blocks, reference networks.py:79-87 with resample_filter=[1,1]).
Running the conv at the upsampled resolution is the single least
MXU-efficient op in both models' profiles (~16% MFU on the SD VAE
decoder's up convs): every 2x2 output block re-reads the same nearest-
duplicated pixels, and the 4x-size upsampled intermediate round-trips
HBM.

Because nearest-up duplicates pixels, conv3x3(nn_up2(x)) is EXACTLY a
2x2-phase family of 2x2-kernel convs on the *un-upsampled* input: for
output row 2i+dh (1D view, pad-1 conv),

  dh=0:  y[2i]   = K0*x[i-1] + (K1+K2)*x[i]
  dh=1:  y[2i+1] = (K0+K1)*x[i] + K2*x[i+1]

and the 2D kernel is the tensor product of the row/col tap-foldings.
All four phases are evaluated as ONE conv with 4*Cout output channels
over the once-padded input, then interleaved (depth-to-space). Cost:
16 taps per 2x2 output block instead of 36 — 2.25x fewer MXU FLOPs —
and no 4x upsampled intermediate in HBM. The tap sums are the only
float reassociation vs the reference formulation (done in fp32).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _fold_rows(k: jax.Array, d: int) -> jax.Array:
    """[3, ...] taps -> [2, ...] phase taps along axis 0."""
    return (jnp.stack([k[0], k[1] + k[2]], axis=0) if d == 0
            else jnp.stack([k[0] + k[1], k[2]], axis=0))


def phase_kernels(w: jax.Array) -> jax.Array:
    """[3, 3, I, O] conv kernel -> [2, 2, I, 4*O] phase kernels, phases
    ordered (dh, dw) = (0,0), (0,1), (1,0), (1,1) along the output axis."""
    wf = w.astype(jnp.float32)
    cols = jnp.moveaxis(wf, 1, 0)  # [3(w), 3(h), I, O]
    phases = []
    for dh in (0, 1):
        for dw in (0, 1):
            k = jnp.moveaxis(_fold_rows(cols, dw), 0, 1)  # fold W axis
            phases.append(_fold_rows(k, dh))  # fold H axis -> [2, 2, I, O]
    return jnp.concatenate(phases, axis=-1).astype(w.dtype)


def nn_upsample2x_conv3x3(x: jax.Array, w: jax.Array,
                          bias: jax.Array | None = None) -> jax.Array:
    """y == conv3x3_pad1(nearest_upsample_2x(x)) without materializing the
    upsampled input. x: [B, H, W, I] (NHWC); w: [3, 3, I, O] (HWIO);
    returns [B, 2H, 2W, O]."""
    b, h, wd, _ = x.shape
    o = w.shape[3]
    wcat = phase_kernels(w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wcat, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H+1, W+1, 4*O]; phase (dh,dw) lives at positions dh.., dw..
    p = {(dh, dw): out[:, dh:dh + h, dw:dw + wd,
                       (2 * dh + dw) * o:(2 * dh + dw + 1) * o]
         for dh in (0, 1) for dw in (0, 1)}
    q0 = jnp.stack([p[(0, 0)], p[(0, 1)]], axis=3)  # [B, H, W, 2, O]
    q1 = jnp.stack([p[(1, 0)], p[(1, 1)]], axis=3)
    z = jnp.stack([q0, q1], axis=2)  # [B, H, 2, W, 2, O]
    y = z.reshape(b, 2 * h, 2 * wd, o)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


__all__ = ["nn_upsample2x_conv3x3", "phase_kernels"]

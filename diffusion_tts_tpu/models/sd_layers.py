"""Building blocks for the Stable Diffusion UNet/VAE in Flax, NHWC.

Behavioral counterparts of the vendored diffusers model layers used by
SD-1.5 (reference sd/diffusers/src/diffusers/models/: resnet.py
ResnetBlock2D, attention.py BasicTransformerBlock, transformer_2d.py,
downsampling.py/upsampling.py, unets/unet_2d_condition.py:172-227 for the
config surface). Module names mirror the diffusers state-dict keys
(norm1/conv1/time_emb_proj/..., attn1.to_q, ff.net_0.proj) so checkpoint
conversion is a mechanical rename (models/sd_import.py).
"""
from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Read once at import (toggling after first trace would be silently inert —
# the same rule as DTTS_NO_PALLAS_GN): set DTTS_NO_FUSED_UPSAMPLE=1 before
# process start to A/B the explicit nearest-2x + conv path.
_NO_FUSED_UPSAMPLE = os.environ.get("DTTS_NO_FUSED_UPSAMPLE", "") not in ("", "0")
# GN folded into the Pallas conv's input load on eligible shapes (read-once
# kill-switch, same trace-time rule as the other kernels).
_GN_IN_CONV = os.environ.get("DTTS_NO_GN_IN_CONV", "") in ("", "0")


def sd_timestep_embedding(
    timesteps: jax.Array, dim: int, *, flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0, max_period: float = 10000.0,
) -> jax.Array:
    """diffusers get_timestep_embedding (embeddings.py): sin-first, then
    flipped to [cos, sin] for SD."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class GroupNorm(nn.Module):
    """diffusers nn.GroupNorm(32, eps): fp32 statistics, NHWC.

    apply_silu=True fuses the SiLU that follows every ResNet/VAE norm site
    into the same pass. TPU routing goes through models/layers._fused_gn
    with this module's `prefer`: the UNet keeps the Pallas kernel (whole-
    model xla2 measured 31.7 vs 38.6 NFE/s), while the VAE — a pure conv
    chain, the producer-fusion-favorable case — passes prefer="xla2"
    (A/B pairs in PARITY round-3 notes). DTTS_GN_MODE overrides all."""

    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    apply_silu: bool = False
    # per-site routing: the UNet measures best on the Pallas kernel, the
    # VAE (a pure conv chain, the xla2-favorable case) on the producer-
    # fusion path — see the A/B pairs in PARITY round-3 notes.
    prefer: str = "pallas"

    @nn.compact
    def __call__(self, x: jax.Array, *,
                 return_scale_shift: bool = False) -> jax.Array:
        c = x.shape[-1]
        g = min(self.num_groups, c)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if return_scale_shift:
            # Fold the group statistics into per-(batch, channel) affine
            # vectors for a consumer that applies normalize+SiLU itself
            # (the Pallas conv's GN prologue, ops/pallas/conv3x3.py): one
            # READ of x (the moments-only Pallas kernel on TPU) instead of
            # the standalone kernel's read + read + write.
            # (x-m)*rstd*gamma + beta == x*(rstd*gamma) + (beta - m*rstd*gamma).
            from diffusion_tts_tpu.ops.pallas.groupnorm import group_norm_stats

            mean_c, rstd_c = group_norm_stats(x, groups=g, eps=self.eps)
            sc = rstd_c * scale.astype(jnp.float32)[None, :]
            sh = bias.astype(jnp.float32)[None, :] - mean_c * sc
            return sc, sh

        from diffusion_tts_tpu.models.layers import _fused_gn

        if c % g == 0:
            fused = _fused_gn(
                x, scale, bias, groups=g, eps=self.eps,
                apply_silu=self.apply_silu, prefer=self.prefer,
            )
            if fused is not None:
                return fused
        orig = x.dtype
        xf = x.astype(jnp.float32)
        shape = xf.shape
        xf = xf.reshape(shape[:-1] + (g, c // g))
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        xf = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(shape)
        out = xf * scale + bias
        if self.apply_silu:
            out = out * jax.nn.sigmoid(out)
        return out.astype(orig)


class Conv3x3(nn.Module):
    """3x3 SAME stride-1 conv with nn.Conv-compatible params (kernel HWIO
    + bias [K]) so checkpoints are interchangeable, routed to the Pallas
    stacked-form conv (ops/pallas/conv3x3.py) on TPU when eligible — XLA's
    own lowering runs the VAE's large-spatial shapes at 0.18-0.25 of bf16
    peak vs the kernel's 0.34+ (tools/vae_conv_probe.py, PARITY round-4).
    Optional residual input fuses the ResnetBlock2D skip add into the conv
    epilogue, saving that tensor's separate HBM read+write pass."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, gn=None, shortcut=None):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x, kernel, bias, residual = nn.dtypes.promote_dtype(
            x, kernel, bias, residual, dtype=self.dtype)

        from diffusion_tts_tpu.ops.pallas.conv3x3 import (
            conv3x3_same,
            pallas_conv3_eligible,
        )

        if shortcut is not None:
            # (sc_x, sc_kernel [1,1,Cres,K], sc_bias): the resnet's 1x1
            # conv_shortcut, folded into this conv's epilogue on the
            # Pallas route (callers gate on pallas_shortcut_eligible)
            sc_x, sc_k, sc_b = shortcut
            sc_x, sc_k, sc_b = nn.dtypes.promote_dtype(
                sc_x, sc_k, sc_b, dtype=self.dtype)
            sc_w = sc_k[0, 0]  # [Cres, K]
            bias = bias + sc_b

        if pallas_conv3_eligible(x, kernel):
            kw = dict(gn_scale=gn[0], gn_shift=gn[1]) if gn is not None else {}
            if shortcut is not None:
                return conv3x3_same(x, kernel, bias,
                                    shortcut=(sc_x, sc_w), **kw)
            return conv3x3_same(x, kernel, bias, residual, **kw)
        if gn is not None:
            # non-Pallas shapes: same math, XLA fuses the normalize+SiLU
            # into the conv input as a producer fusion
            xn = x.astype(jnp.float32) * gn[0][:, None, None, :] \
                + gn[1][:, None, None, :]
            x = (xn * jax.nn.sigmoid(xn)).astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + bias
        if residual is not None:
            out = out + residual
        if shortcut is not None:
            out = out + jnp.einsum("bhwc,ck->bhwk", sc_x, sc_w)
        return out


def conv3(features, dtype, name, stride=1):
    if stride == 1:
        return Conv3x3(features, dtype, name=name)
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=[(1, 1), (1, 1)], dtype=dtype, name=name)


class _Conv1x1Params(nn.Module):
    """Parameter container for the resnet's 1x1 conv_shortcut with
    nn.Conv-compatible param names/shapes/inits (kernel [1,1,Cin,K] +
    bias [K]), so checkpoints are interchangeable whether the projection
    executes standalone (XLA) or folded into conv2's Pallas epilogue."""

    features: int

    @nn.compact
    def __call__(self, cin):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ResnetBlock2D(nn.Module):
    """GN-SiLU-conv / +time / GN-SiLU-dropout-conv / +skip
    (diffusers resnet.py ResnetBlock2D with time_scale_shift='default')."""

    out_channels: int
    use_temb: bool = True
    dropout: float = 0.0
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    gn_prefer: str = "pallas"

    @nn.compact
    def __call__(self, x, temb=None, *, train=False):
        from diffusion_tts_tpu.ops.pallas.conv3x3 import (
            pallas_conv3_shape_eligible,
        )

        in_ch = x.shape[-1]
        _, hh, ww, _ = x.shape
        # GN-in-conv: on Pallas-conv-eligible shapes the GroupNorm+SiLU is
        # folded into the conv's input load (2 HBM trips of the full
        # tensor saved per norm site) — the norm module only computes the
        # per-(batch, channel) fp32 scale/shift (one read). Same params,
        # same math; DTTS_NO_GN_IN_CONV reverts to the standalone kernels.
        norm1 = GroupNorm(self.groups, self.eps, apply_silu=True,
                          prefer=self.gn_prefer, name="norm1")
        conv1 = conv3(self.out_channels, self.dtype, "conv1")
        if (_GN_IN_CONV and in_ch % self.groups == 0
                and pallas_conv3_shape_eligible(
                    hh, ww, in_ch, self.out_channels)):
            h = conv1(x, gn=norm1(x, return_scale_shift=True))
        else:
            h = conv1(norm1(x))
        if self.use_temb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :].astype(h.dtype)
        norm2 = GroupNorm(self.groups, self.eps, apply_silu=True,
                          prefer=self.gn_prefer, name="norm2")
        fuse2 = (_GN_IN_CONV and self.out_channels % self.groups == 0
                 and not (self.dropout > 0.0 and train)
                 and pallas_conv3_shape_eligible(
                     hh, ww, self.out_channels, self.out_channels))
        if not fuse2:
            h = norm2(h)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        # skip add fused into conv2's epilogue on the Pallas route (one HBM
        # pass saved per resnet); the fallback adds it after the conv —
        # identical math to the previous `x + h`. When the skip needs the
        # 1x1 conv_shortcut projection, the PROJECTION ITSELF also folds
        # into conv2 (pallas_shortcut_eligible): the standalone 1x1 op
        # (HBM-bound, 0.25 of peak in the SD trace) and the residual
        # re-read both disappear.
        conv2 = Conv3x3(self.out_channels, self.dtype, name="conv2")
        gn2 = norm2(h, return_scale_shift=True) if fuse2 else None
        if in_ch != self.out_channels:
            from diffusion_tts_tpu.ops.pallas.conv3x3 import (
                pallas_shortcut_eligible,
            )

            sc_k, sc_b = _Conv1x1Params(self.out_channels,
                                        name="conv_shortcut")(in_ch)
            if fuse2 and pallas_shortcut_eligible(in_ch):
                return conv2(h, gn=gn2, shortcut=(x, sc_k, sc_b))
            xd, kd, bd = nn.dtypes.promote_dtype(x, sc_k, sc_b,
                                                 dtype=self.dtype)
            x = jnp.einsum("bhwc,ck->bhwk", xd, kd[0, 0]) + bd
        if fuse2:
            return conv2(h, residual=x, gn=gn2)
        return conv2(h, residual=x)


class CrossAttention(nn.Module):
    """diffusers Attention: to_q/to_k/to_v (no bias) + to_out_0; softmax in
    fp32 (upcast for TPU numerics; SD-1.5 sets upcast_attention=False but
    runs fp16 on GPU — fp32 softmax here matches its fp32-reference
    behavior)."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, self.heads, self.dim_head)
        k = k.reshape(b, tk, self.heads, self.dim_head)
        v = v.reshape(b, tk, self.heads, self.dim_head)
        if tq == tk:
            # self-attention over latent tokens — the SD hot spot (T=4096 at
            # 64x64 latents); routes to the Pallas flash kernel on TPU.
            from diffusion_tts_tpu.ops.attention import multihead_attention_fp32

            out = multihead_attention_fp32(q, k, v)
        else:
            scale = 1.0 / math.sqrt(self.dim_head)
            attn = jnp.einsum(
                "bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale,
                k.astype(jnp.float32), preferred_element_type=jnp.float32,
            )
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                             preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(b, tq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers attention.py FeedForward/GEGLU):
    proj to 2*4*dim, x * gelu(gate), project back."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        class _DenseParams(nn.Module):
            """nn.Dense-compatible params (kernel [in, out] + bias [out])
            created without applying, so the fused Pallas FF and the
            unfused path share one checkpoint layout."""

            features: int

            @nn.compact
            def __call__(self, cin):
                k = self.param("kernel", nn.initializers.lecun_normal(),
                               (cin, self.features))
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,))
                return k, b

        class _GegluParams(nn.Module):
            features: int

            @nn.compact
            def __call__(self, cin):
                return _DenseParams(self.features, name="proj")(cin)

        c = x.shape[-1]
        f = self.dim * self.mult
        k0, b0 = _GegluParams(2 * f, name="net_0")(c)
        k2, b2 = _DenseParams(self.dim, name="net_2")(f)
        x, k0, b0, k2, b2 = nn.dtypes.promote_dtype(
            x, k0, b0, k2, b2, dtype=self.dtype)

        from diffusion_tts_tpu.ops.pallas.geglu_ff import (
            geglu_ff,
            geglu_ff_eligible,
        )

        m = 1
        for s in x.shape[:-1]:
            m *= s
        if geglu_ff_eligible(m, c, f, x.dtype):
            # fused FF: the [M, 2F] projection never round-trips HBM and
            # the exact-erf gelu-gate overlaps the dots across M-tiles —
            # XLA's lowering serializes it inside net_2's producer fusion
            # (net_2 measures 0.21-0.33 of peak in the SD trace vs
            # net_0's 0.73-0.90)
            return geglu_ff(x, k0, b0, k2, b2)
        h = jnp.dot(x, k0) + b0
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return jnp.dot(h, k2) + b2


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, all residual."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn1")(
            ln("norm1")(x)
        )
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn2")(
            ln("norm2")(x), context
        )
        x = x + FeedForward(x.shape[-1], dtype=self.dtype, name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    """GN -> 1x1 conv proj_in -> transformer blocks -> 1x1 conv proj_out ->
    residual (diffusers transformer_2d.py with use_linear_projection=False,
    SD-1.5's configuration)."""

    heads: int
    dim_head: int
    depth: int = 1
    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.groups, 1e-6, name="norm")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for d in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.dtype, name=f"transformer_blocks_{d}"
            )(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    """stride-2 conv; padding=1 symmetric (UNet) or 0 with (0,1) asymmetric
    pad (VAE encoder) — diffusers downsampling.py."""

    out_channels: int
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = [(0, 0), (0, 0)]
        else:
            pad = [(self.padding, self.padding)] * 2
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, name="conv")(x)


class _PhasedUpConv(nn.Module):
    """nearest-2x + conv3, evaluated as the 2x2-phase decomposition
    (ops/resample.py): identical params/output to nn.Conv after an
    explicit upsample, 2.25x fewer MXU FLOPs and no 4x intermediate."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffusion_tts_tpu.ops.pallas.conv3x3 import (
            conv3x3_up2, pallas_up2_eligible)
        from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3

        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        if pallas_up2_eligible(x, kernel):
            # the fused Pallas kernel: same phased math, but the column
            # interleave never exists (output written phase-major and
            # bitcast-reshaped) — 2.0-2.8x over the XLA lowering at the
            # VAE decoder's 128/256-px upsamplers
            return conv3x3_up2(x, kernel, bias)
        return nn_upsample2x_conv3x3(x, kernel, bias)


class Upsample2D(nn.Module):
    """nearest 2x + conv3 (diffusers upsampling.py)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if _NO_FUSED_UPSAMPLE:
            b, h, w, c = x.shape
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
                                 ).reshape(b, 2 * h, 2 * w, c)
            return conv3(self.out_channels, self.dtype, "conv")(x)
        return _PhasedUpConv(self.out_channels, self.dtype, name="conv")(x)


__all__ = [
    "sd_timestep_embedding", "GroupNorm", "ResnetBlock2D", "CrossAttention",
    "FeedForward", "BasicTransformerBlock", "Transformer2D", "Downsample2D",
    "Upsample2D", "conv3",
]

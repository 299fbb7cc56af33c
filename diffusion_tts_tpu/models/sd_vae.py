"""AutoencoderKL (the SD latent VAE) in Flax, NHWC.

Behavioral counterpart of the vendored diffusers AutoencoderKL
(sd/diffusers/src/diffusers/models/autoencoders/autoencoder_kl.py:567 LoC,
vae.py Encoder/Decoder) at the SD configuration: 4 DownEncoderBlocks /
UpDecoderBlocks, single-head mid attention, scaling_factor 0.18215.
Module names mirror the diffusers state dict.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_tts_tpu.models.sd_layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
    conv3,
)

Dtype = Any


# GN routing note (PARITY round-3): the VAE explicitly pins prefer="pallas".
# Routing its GroupNorms through the xla2 producer-fusion path measured
# SLOWER (sd_bench batch 1: 31.0/31.9 vs 38.3 NFE/s all-pallas, reproduced)
# despite the VAE being a pure conv chain. The compiled HLO shows why: at
# 512x512 spatial XLA decomposes the conv into row-chunked pieces whose
# output layout ({3,1,2,0}) disagrees with the layout its reduce wants
# ({3,0,2,1}), so the moment reductions cannot ride the conv epilogue and
# the program inserts ~134 MB fp32 materializations + layout copies per
# norm site — regardless of how the moments are phrased (fp32-upcast and
# input-dtype accumulate formulations both measured ~31). The 3-pass
# Pallas kernel has no layout opinion and stays the VAE route.


class VAEAttention(nn.Module):
    """Mid-block self-attention over spatial tokens (diffusers Attention with
    a single head of size C; GroupNorm input norm, fp32 softmax)."""

    groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        t = GroupNorm(self.groups, 1e-6, prefer="pallas", name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(t)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(t)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(t)
        from diffusion_tts_tpu.ops.attention import multihead_attention_fp32

        # single head of size C through the shared fp32-softmax attention
        # entry: the flash kernel on TPU (T=4096 tokens at 512px decode —
        # the XLA einsum materializes the [B, 4096, 4096] fp32 score matrix
        # in HBM and its softmax alone is ~0.7% of SD e2e device time), the
        # numerically-identical XLA path elsewhere.
        tq = h * w
        out = multihead_attention_fp32(
            q.reshape(b, tq, 1, c), k.reshape(b, tq, 1, c),
            v.reshape(b, tq, 1, c)).reshape(b, tq, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return res + out.reshape(b, h, w, c)


class _MidBlock(nn.Module):
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        x = ResnetBlock2D(ch, use_temb=False, groups=self.groups, eps=1e-6,
                          dtype=self.dtype, gn_prefer="pallas", name="resnets_0")(x)
        x = VAEAttention(self.groups, self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(ch, use_temb=False, groups=self.groups, eps=1e-6,
                          dtype=self.dtype, gn_prefer="pallas", name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    block_out_channels: Sequence[int]
    layers_per_block: int
    latent_channels: int
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        bo = self.block_out_channels
        x = conv3(bo[0], self.dtype, "conv_in")(x)

        class _Down(nn.Module):
            out_ch: int
            add_down: bool
            cfg: Any

            @nn.compact
            def __call__(self, x):
                p = self.cfg
                for j in range(p.layers_per_block):
                    x = ResnetBlock2D(self.out_ch, use_temb=False, groups=p.groups,
                                      eps=1e-6, dtype=p.dtype, gn_prefer="pallas",
                                      name=f"resnets_{j}")(x)
                if self.add_down:
                    x = Downsample2D(self.out_ch, padding=0, dtype=p.dtype,
                                     name="downsamplers_0")(x)
                return x

        for i, ch in enumerate(bo):
            x = _Down(out_ch=ch, add_down=(i < len(bo) - 1), cfg=self,
                      name=f"down_blocks_{i}")(x)
        x = _MidBlock(self.groups, self.dtype, name="mid_block")(x)
        x = GroupNorm(self.groups, 1e-6, apply_silu=True, prefer="pallas",
                      name="conv_norm_out")(x)
        return conv3(2 * self.latent_channels, self.dtype, "conv_out")(x)


class Decoder(nn.Module):
    block_out_channels: Sequence[int]
    layers_per_block: int
    out_channels: int
    groups: int
    dtype: Dtype

    @nn.compact
    def __call__(self, z):
        bo = self.block_out_channels
        x = conv3(bo[-1], self.dtype, "conv_in")(z)
        x = _MidBlock(self.groups, self.dtype, name="mid_block")(x)

        class _Up(nn.Module):
            out_ch: int
            add_up: bool
            cfg: Any

            @nn.compact
            def __call__(self, x):
                p = self.cfg
                for j in range(p.layers_per_block + 1):
                    x = ResnetBlock2D(self.out_ch, use_temb=False, groups=p.groups,
                                      eps=1e-6, dtype=p.dtype, gn_prefer="pallas",
                                      name=f"resnets_{j}")(x)
                if self.add_up:
                    x = Upsample2D(self.out_ch, dtype=p.dtype, name="upsamplers_0")(x)
                return x

        for i, ch in enumerate(reversed(bo)):
            x = _Up(out_ch=ch, add_up=(i < len(bo) - 1), cfg=self,
                    name=f"up_blocks_{i}")(x)
        x = GroupNorm(self.groups, 1e-6, apply_silu=True, prefer="pallas",
                      name="conv_norm_out")(x)
        return conv3(self.out_channels, self.dtype, "conv_out")(x)


class EncoderOutput(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(key, self.mean.shape, self.mean.dtype)


class AutoencoderKL(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels,
            self.norm_num_groups, self.dtype,
        )
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block, self.out_channels,
            self.norm_num_groups, self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x: jax.Array) -> EncoderOutput:
        h = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return EncoderOutput(mean=mean, logvar=logvar)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x: jax.Array, key: jax.Array) -> jax.Array:
        posterior = self.encode(x)
        z = posterior.sample(key)
        return self.decode(z)


__all__ = ["AutoencoderKL", "Encoder", "Decoder", "VAEAttention", "EncoderOutput"]

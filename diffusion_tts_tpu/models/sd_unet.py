"""UNet2DConditionModel (the SD-1.5 denoiser) in Flax, NHWC.

Behavioral counterpart of the vendored diffusers UNet2DConditionModel
(sd/diffusers/src/diffusers/models/unets/unet_2d_condition.py:71-1310)
restricted to the Stable-Diffusion family configuration: CrossAttnDownBlock
x3 + DownBlock, cross-attn mid block, UpBlock + CrossAttnUpBlock x3, conv
proj transformers, GEGLU FF, 'default' resnet time conditioning. Module
names mirror the diffusers state dict for mechanical weight conversion.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_tts_tpu.models.sd_layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Transformer2D,
    Upsample2D,
    conv3,
    sd_timestep_embedding,
)

Dtype = Any


class UNet2DConditionModel(nn.Module):
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Sequence[str] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int | Sequence[int] = 8  # SD quirk: this is NUM HEADS
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_layers_per_block: int = 1
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: Dtype = jnp.float32

    def _heads(self, level: int) -> int:
        ahd = self.attention_head_dim
        return ahd[level] if isinstance(ahd, (tuple, list)) else ahd

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, C] latents
        timesteps: jax.Array,  # [B] or scalar
        encoder_hidden_states: jax.Array,  # [B, 77, cross_attention_dim]
        *,
        train: bool = False,
    ) -> jax.Array:
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        bo = self.block_out_channels
        time_embed_dim = bo[0] * 4

        temb = sd_timestep_embedding(
            timesteps, bo[0], flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.freq_shift,
        )

        class _TimeEmbedding(nn.Module):
            dtype: Any

            @nn.compact
            def __call__(self, t):
                t = nn.Dense(time_embed_dim, dtype=self.dtype, name="linear_1")(t)
                return nn.Dense(time_embed_dim, dtype=self.dtype, name="linear_2")(nn.silu(t))

        temb = _TimeEmbedding(self.dtype, name="time_embedding")(temb)
        ctx = encoder_hidden_states.astype(self.dtype)

        x = conv3(bo[0], self.dtype, "conv_in")(sample.astype(self.dtype))
        res_stack = [x]

        class _DownBlock(nn.Module):
            out_ch: int
            has_attn: bool
            heads: int
            add_down: bool
            layers: int
            tf_depth: int
            groups: int
            eps: float
            dtype: Any

            @nn.compact
            def __call__(self, x, temb, ctx, *, train):
                outs = []
                for j in range(self.layers):
                    x = ResnetBlock2D(
                        self.out_ch, groups=self.groups, eps=self.eps,
                        dtype=self.dtype, name=f"resnets_{j}",
                    )(x, temb, train=train)
                    if self.has_attn:
                        x = Transformer2D(
                            self.heads, self.out_ch // self.heads,
                            depth=self.tf_depth, groups=self.groups,
                            dtype=self.dtype, name=f"attentions_{j}",
                        )(x, ctx)
                    outs.append(x)
                if self.add_down:
                    x = Downsample2D(self.out_ch, padding=1, dtype=self.dtype,
                                     name="downsamplers_0")(x)
                    outs.append(x)
                return x, outs

        for i, btype in enumerate(self.down_block_types):
            x, outs = _DownBlock(
                out_ch=bo[i], has_attn=(btype == "CrossAttnDownBlock2D"),
                heads=self._heads(i), add_down=(i < len(bo) - 1),
                layers=self.layers_per_block,
                tf_depth=self.transformer_layers_per_block,
                groups=self.norm_num_groups, eps=self.norm_eps, dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x, temb, ctx, train=train)
            res_stack.extend(outs)

        class _MidBlock(nn.Module):
            heads: int
            tf_depth: int
            groups: int
            eps: float
            dtype: Any

            @nn.compact
            def __call__(self, x, temb, ctx, *, train):
                ch = x.shape[-1]
                x = ResnetBlock2D(ch, groups=self.groups, eps=self.eps,
                                  dtype=self.dtype, name="resnets_0")(x, temb, train=train)
                x = Transformer2D(
                    self.heads, ch // self.heads, depth=self.tf_depth,
                    groups=self.groups, dtype=self.dtype, name="attentions_0",
                )(x, ctx)
                x = ResnetBlock2D(ch, groups=self.groups, eps=self.eps,
                                  dtype=self.dtype, name="resnets_1")(x, temb, train=train)
                return x

        x = _MidBlock(
            heads=self._heads(len(bo) - 1),
            tf_depth=self.transformer_layers_per_block,
            groups=self.norm_num_groups, eps=self.norm_eps, dtype=self.dtype,
            name="mid_block",
        )(x, temb, ctx, train=train)

        class _UpBlock(nn.Module):
            out_ch: int
            has_attn: bool
            heads: int
            add_up: bool
            num_layers: int
            tf_depth: int
            groups: int
            eps: float
            dtype: Any

            @nn.compact
            def __call__(self, x, skips, temb, ctx, *, train):
                for j in range(self.num_layers):
                    x = jnp.concatenate([x, skips.pop()], axis=-1)
                    x = ResnetBlock2D(
                        self.out_ch, groups=self.groups, eps=self.eps,
                        dtype=self.dtype, name=f"resnets_{j}",
                    )(x, temb, train=train)
                    if self.has_attn:
                        x = Transformer2D(
                            self.heads, self.out_ch // self.heads,
                            depth=self.tf_depth, groups=self.groups,
                            dtype=self.dtype, name=f"attentions_{j}",
                        )(x, ctx)
                if self.add_up:
                    x = Upsample2D(self.out_ch, dtype=self.dtype, name="upsamplers_0")(x)
                return x

        rev_bo = list(reversed(bo))
        for i, btype in enumerate(self.up_block_types):
            x = _UpBlock(
                out_ch=rev_bo[i], has_attn=(btype == "CrossAttnUpBlock2D"),
                heads=self._heads(len(bo) - 1 - i), add_up=(i < len(bo) - 1),
                num_layers=self.layers_per_block + 1,
                tf_depth=self.transformer_layers_per_block,
                groups=self.norm_num_groups, eps=self.norm_eps, dtype=self.dtype,
                name=f"up_blocks_{i}",
            )(x, res_stack, temb, ctx, train=train)

        x = nn.silu(GroupNorm(self.norm_num_groups, self.norm_eps, name="conv_norm_out")(x))
        return conv3(self.out_channels, self.dtype, "conv_out")(x)


__all__ = ["UNet2DConditionModel"]

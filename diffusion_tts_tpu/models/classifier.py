"""Guided-diffusion EncoderUNetModel (the noisy-ImageNet classifier) in Flax.

Behavioral counterpart of the reference's ADM classifier half-UNet
(edm/unet.py:701-911, used only by ImageNetScorer, edm/scorers.py:56-174):
ResBlocks with scale-shift GroupNorm conditioning and resblock up/down,
AttentionBlocks with the *legacy* (heads, 3, ch) qkv channel layout,
attention pooling (AttentionPool2d, edm/unet.py:40-69) with the *new*
(3, heads, ch) layout, and sinusoidal timestep embeddings
(edm/nn_utils.py:103-121).

NHWC layout; GroupNorm statistics and attention softmax in fp32 (matching
GroupNorm32 / the fp32-softmax in QKVAttention, edm/unet.py:355-377).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, cos-first (edm/nn_utils.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) with fp32 statistics (edm/nn_utils.py:17-21,93-100)."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        orig = x.dtype
        xf = x.astype(jnp.float32)
        shape = xf.shape
        g = self.num_groups
        xf = xf.reshape(shape[:-1] + (g, c // g))
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        xf = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(shape)
        return (xf * scale + bias).astype(orig)


def _avg_pool2(x: jax.Array) -> jax.Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _nearest_up2(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(
        b, 2 * h, 2 * w, c
    )


class GDResBlock(nn.Module):
    """guided-diffusion ResBlock (edm/unet.py:161-275)."""

    out_channels: int
    emb_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, *, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        conv = lambda feats, k, name: nn.Conv(
            feats, (k, k), padding=[(k // 2, k // 2)] * 2, dtype=self.dtype, name=name
        )
        h = nn.silu(GroupNorm32(name="in_norm")(x))
        if self.up:
            h = _nearest_up2(h)
            x = _nearest_up2(x)
        elif self.down:
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        h = conv(self.out_channels, 3, "in_conv")(h)

        emb_out = nn.Dense(
            self.out_channels * (2 if self.use_scale_shift_norm else 1),
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb)).astype(h.dtype)[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1.0 + scale) + shift
            h = nn.silu(h)
        else:
            h = nn.silu(GroupNorm32(name="out_norm")(h + emb_out))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv(self.out_channels, 3, "out_conv")(h)

        if self.out_channels == in_ch:
            skip = x
        elif self.use_conv_skip:
            skip = conv(self.out_channels, 3, "skip")(x)
        else:
            skip = conv(self.out_channels, 1, "skip")(x)
        return skip + h


def _qkv_attention(q, k, v):
    """guided-diffusion attention numerics (edm/unet.py:355-377): scores with
    1/sqrt(sqrt(ch)) double-scaling, softmax in fp32. q,k,v: [B, T, H, D]."""
    ch = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    w = jnp.einsum(
        "bqhd,bkhd->bhqk", (q * scale).astype(jnp.float32), (k * scale).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32).astype(v.dtype)


class GDAttentionBlock(nn.Module):
    """AttentionBlock with legacy qkv layout (heads, 3, ch) per channel
    (edm/unet.py:277-343,346-377)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hgt, wid, c = x.shape
        t = hgt * wid
        heads = self.num_heads
        ch = c // heads
        h = GroupNorm32(name="norm")(x).reshape(b, t, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        # legacy layout: channel dim splits as (heads, 3*ch) then (3, ch)
        # chunks of ch — i.e. (heads, 3, ch) row-major.
        qkv = qkv.reshape(b, t, heads, 3, ch)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        a = _qkv_attention(q, k, v).reshape(b, t, c)
        a = nn.Dense(c, dtype=self.dtype, name="proj_out")(a)
        return x + a.reshape(b, hgt, wid, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (edm/unet.py:40-69): prepend the mean
    token, add a positional embedding, one attention layer with the *new*
    (3, heads, ch) qkv layout, return the pooled (first) token."""

    num_head_channels: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hgt, wid, c = x.shape
        t = hgt * wid
        heads = c // self.num_head_channels
        ch = self.num_head_channels
        tokens = x.reshape(b, t, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        # stored torch-shaped [C, T+1] so the weight importer is a no-op
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / c**0.5,
            (c, t + 1),
        )
        tokens = tokens + pos.T.astype(tokens.dtype)[None]
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(tokens)
        # new layout: (3, heads, ch) row-major along channels.
        qkv = qkv.reshape(b, t + 1, 3, heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = _qkv_attention(q, k, v).reshape(b, t + 1, c)
        a = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")(a)
        return a[:, 0]


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier (edm/unet.py:701-911). Defaults here match the
    64x64 noisy-ImageNet classifier checkpoint (edm/scorers.py:76-88):
    width=128, depth=4, attention at ds 2/4/8, scale-shift norm, resblock
    up/down, attention pooling with 64 head channels."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 4
    attention_resolutions: Sequence[int] = (2, 4, 8)  # downsample factors
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "attention"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array, *, train: bool = False) -> jax.Array:
        assert self.pool == "attention", "only attention pooling is implemented"
        emb_ch = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(emb_ch, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(emb_ch, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="input_blocks_0_0")(h)
        block_i = 1
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = GDResBlock(
                    out_channels=ch, emb_channels=emb_ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype,
                    name=f"input_blocks_{block_i}_0",
                )(h, emb, train=train)
                if ds in self.attention_resolutions:
                    h = GDAttentionBlock(
                        num_heads=ch // self.num_head_channels, dtype=self.dtype,
                        name=f"input_blocks_{block_i}_1",
                    )(h)
                block_i += 1
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = GDResBlock(
                        out_channels=ch, emb_channels=emb_ch, dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm, down=True,
                        dtype=self.dtype, name=f"input_blocks_{block_i}_0",
                    )(h, emb, train=train)
                else:
                    h = _avg_pool2(h)
                block_i += 1
                ds *= 2

        h = GDResBlock(
            out_channels=ch, emb_channels=emb_ch, dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype,
            name="middle_block_0",
        )(h, emb, train=train)
        h = GDAttentionBlock(
            num_heads=ch // self.num_head_channels, dtype=self.dtype, name="middle_block_1"
        )(h)
        h = GDResBlock(
            out_channels=ch, emb_channels=emb_ch, dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype,
            name="middle_block_2",
        )(h, emb, train=train)

        h = nn.silu(GroupNorm32(name="out_0")(h))
        return AttentionPool2d(
            num_head_channels=self.num_head_channels, output_dim=self.out_channels,
            dtype=self.dtype, name="out_2",
        )(h)


def convert_classifier_state_dict(state: dict[str, np.ndarray]) -> dict:
    """Map the guided-diffusion classifier checkpoint (torch names like
    input_blocks.1.0.in_layers.0.weight) onto the flax tree above."""
    sub_map = {
        ("in_layers", "0"): "in_norm",
        ("in_layers", "2"): "in_conv",
        ("emb_layers", "1"): "emb_proj",
        ("out_layers", "0"): "out_norm",
        ("out_layers", "3"): "out_conv",
        ("skip_connection",): "skip",
        ("norm",): "norm",
        ("qkv",): "qkv",
        ("proj_out",): "proj_out",
        ("qkv_proj",): "qkv_proj",
        ("c_proj",): "c_proj",
    }
    params: dict = {}

    def put(path, leaf, value):
        value = np.asarray(value, np.float32)
        if leaf == "positional_embedding":
            pass
        elif leaf == "weight":
            if value.ndim == 4:  # conv OIHW -> HWIO
                value, leaf = value.transpose(2, 3, 1, 0), "kernel"
            elif value.ndim == 3:  # conv1d [O, I, 1] -> dense [I, O]
                value, leaf = value[:, :, 0].transpose(1, 0), "kernel"
            elif value.ndim == 2:  # linear [O, I] -> [I, O]
                value, leaf = value.transpose(1, 0), "kernel"
            else:  # norm gain
                leaf = "scale"
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for name, value in state.items():
        parts = name.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        if mods[:1] == ["time_embed"]:
            put([f"time_embed_{mods[1]}"], leaf, value)
        elif mods[0] in ("input_blocks", "middle_block", "out"):
            if mods[0] == "input_blocks":
                prefix, rest = f"input_blocks_{mods[1]}_{mods[2]}", mods[3:]
            elif mods[0] == "middle_block":
                prefix, rest = f"middle_block_{mods[1]}", mods[2:]
            else:
                prefix, rest = f"out_{mods[1]}", mods[2:]
            if not rest:  # GroupNorm / AttentionPool2d raw params
                if leaf == "positional_embedding":
                    put([prefix], leaf, value)
                else:
                    put([prefix], leaf, value)
            else:
                sub = sub_map.get(tuple(rest))
                if sub is None:
                    raise ValueError(f"unmapped module path {name}")
                put([prefix, sub], leaf, value)
        else:
            raise ValueError(f"unmapped top-level {name}")
    return {"params": params}


__all__ = [
    "EncoderUNetModel",
    "timestep_embedding",
    "convert_classifier_state_dict",
    "GroupNorm32",
]

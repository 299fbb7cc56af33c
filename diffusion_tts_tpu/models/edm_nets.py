"""SongUNet (DDPM++/NCSN++) and DhariwalUNet (ADM) in Flax, NHWC.

Behavioral counterparts of the reference architectures
(edm/training/networks.py:229-363 SongUNet, :372-461 DhariwalUNet), built
from the unified UNetBlock. The module graph is keyed by the same
"{res}x{res}_{role}" names as the reference so the torch->flax weight
converter is a mechanical rename; activations are NHWC and skip
concatenation happens on the channel-last axis.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_tts_tpu.models.layers import (
    EDMConv,
    EDMGroupNorm,
    EDMGroupNormSiLU,
    EDMLinear,
    FourierEmbedding,
    PositionalEmbedding,
    UNetBlock,
)

Dtype = Any


class SongUNet(nn.Module):
    """DDPM++ / NCSN++ (reference networks.py:229-363).

    encoder_type='standard' is DDPM++; 'residual' is NCSN++ (aux residual
    image pyramid merged at each downsampling); decoder_type='skip' adds the
    progressive-output pyramid. Attention uses a single head per block.
    """

    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"
    channel_mult_noise: int = 1
    encoder_type: str = "standard"
    decoder_type: str = "standard"
    resample_filter: Sequence[int] = (1, 1)
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.embedding_type in ("fourier", "positional")
        assert self.encoder_type in ("standard", "skip", "residual")
        assert self.decoder_type in ("standard", "skip")
        emb_channels = self.model_channels * self.channel_mult_emb
        noise_channels = self.model_channels * self.channel_mult_noise
        init = dict(init_mode="xavier_uniform")
        init_zero = dict(init_mode="xavier_uniform", init_weight=1e-5)
        init_attn = dict(init_mode="xavier_uniform", init_weight=math.sqrt(0.2))
        block = dict(
            emb_channels=emb_channels,
            num_heads=1,
            dropout=self.dropout,
            skip_scale=math.sqrt(0.5),
            eps=1e-6,
            resample_filter=tuple(self.resample_filter),
            resample_proj=True,
            adaptive_scale=False,
            init=init,
            init_zero=init_zero,
            init_attn=init_attn,
            dtype=self.dtype,
        )

        # Mapping.
        if self.embedding_type == "positional":
            self.map_noise = PositionalEmbedding(num_channels=noise_channels, endpoint=True)
        else:
            self.map_noise = FourierEmbedding(num_channels=noise_channels)
        if self.label_dim:
            self.map_label = EDMLinear(noise_channels, dtype=self.dtype, **init)
        if self.augment_dim:
            self.map_augment = EDMLinear(noise_channels, use_bias=False, dtype=self.dtype, **init)
        self.map_layer0 = EDMLinear(emb_channels, dtype=self.dtype, **init)
        self.map_layer1 = EDMLinear(emb_channels, dtype=self.dtype, **init)

        # Encoder plan (mirrors reference :276-297). Build both the module
        # dict and the static routing plan so __call__ has no shape probing.
        enc: dict[str, nn.Module] = {}
        cout = self.in_channels
        caux = self.in_channels
        self._enc_names = []
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cout = self.model_channels
                enc[f"{res}x{res}_conv"] = EDMConv(cout, 3, dtype=self.dtype, **init)
            else:
                enc[f"{res}x{res}_down"] = UNetBlock(out_channels=cout, down=True, **block)
                if self.encoder_type == "skip":
                    enc[f"{res}x{res}_aux_down"] = EDMConv(
                        caux, 0, down=True, resample_filter=tuple(self.resample_filter),
                        dtype=self.dtype,
                    )
                    enc[f"{res}x{res}_aux_skip"] = EDMConv(cout, 1, dtype=self.dtype, **init)
                if self.encoder_type == "residual":
                    enc[f"{res}x{res}_aux_residual"] = EDMConv(
                        cout, 3, down=True, resample_filter=tuple(self.resample_filter),
                        fused_resample=True, dtype=self.dtype, **init,
                    )
                    caux = cout
            for idx in range(self.num_blocks):
                cout = self.model_channels * mult
                attn = res in self.attn_resolutions
                enc[f"{res}x{res}_block{idx}"] = UNetBlock(out_channels=cout, attention=attn, **block)
        self.enc = enc
        self._enc_names = list(enc.keys())
        skips = [
            m.features if isinstance(m, EDMConv) else m.out_channels
            for name, m in enc.items()
            if "aux" not in name
        ]

        # Decoder plan (reference :300-317).
        dec: dict[str, nn.Module] = {}
        self._dec_consumes_skip: dict[str, bool] = {}
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                dec[f"{res}x{res}_in0"] = UNetBlock(out_channels=cout, attention=True, **block)
                dec[f"{res}x{res}_in1"] = UNetBlock(out_channels=cout, **block)
            else:
                dec[f"{res}x{res}_up"] = UNetBlock(out_channels=cout, up=True, **block)
            for idx in range(self.num_blocks + 1):
                skips.pop()
                cout = self.model_channels * mult
                attn = idx == self.num_blocks and res in self.attn_resolutions
                dec[f"{res}x{res}_block{idx}"] = UNetBlock(out_channels=cout, attention=attn, **block)
            if self.decoder_type == "skip" or level == 0:
                if self.decoder_type == "skip" and level < len(self.channel_mult) - 1:
                    dec[f"{res}x{res}_aux_up"] = EDMConv(
                        self.out_channels, 0, up=True,
                        resample_filter=tuple(self.resample_filter), dtype=self.dtype,
                    )
                dec[f"{res}x{res}_aux_norm"] = EDMGroupNorm(eps=1e-6, dtype=self.dtype)
                dec[f"{res}x{res}_aux_conv"] = EDMConv(self.out_channels, 3, dtype=self.dtype, **init_zero)
        self.dec = dec
        self._dec_names = list(dec.keys())

    def __call__(
        self,
        x: jax.Array,
        noise_labels: jax.Array,
        class_labels: jax.Array | None = None,
        augment_labels: jax.Array | None = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        # Mapping (reference :319-331). Positional embedding halves are
        # swapped to [sin, cos] — a Song-codebase quirk the weights bake in.
        emb = self.map_noise(noise_labels)
        b = emb.shape[0]
        emb = emb.reshape(b, 2, -1)[:, ::-1, :].reshape(b, -1)
        if self.label_dim:
            tmp = class_labels
            if train and self.label_dropout > 0.0:
                keep = (
                    jax.random.uniform(self.make_rng("label_dropout"), (x.shape[0], 1))
                    >= self.label_dropout
                )
                tmp = tmp * keep.astype(tmp.dtype)
            # scaled by sqrt(label_dim) = the label layer's fan-in (ref :325)
            emb = emb + self.map_label(tmp * math.sqrt(self.label_dim))
        if self.augment_dim and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels)
        emb = nn.silu(self.map_layer0(emb))
        emb = nn.silu(self.map_layer1(emb))

        # Encoder (reference :333-345).
        skips = []
        aux = x.astype(self.dtype)
        x = x.astype(self.dtype)
        for name in self._enc_names:
            m = self.enc[name]
            if "aux_down" in name:
                aux = m(aux)
            elif "aux_skip" in name:
                x = x + m(aux)
                skips[-1] = x
            elif "aux_residual" in name:
                x = (x + m(aux)) / math.sqrt(2.0)
                aux = x
                skips[-1] = x
            elif isinstance(m, UNetBlock):
                x = m(x, emb, train=train)
                skips.append(x)
            else:
                x = m(x)
                skips.append(x)

        # Decoder (reference :347-362).
        aux_out = None
        tmp = None
        for name in self._dec_names:
            m = self.dec[name]
            if "aux_up" in name:
                aux_out = m(aux_out)
            elif "aux_norm" in name:
                tmp = m(x)
            elif "aux_conv" in name:
                tmp = m(nn.silu(tmp))
                aux_out = tmp if aux_out is None else tmp + aux_out
            else:
                if "_block" in name:
                    # skip_cat: norm0 consumes (x, skip) as parts so the
                    # moment reductions fuse into each producer
                    x = m(x, emb, skip_cat=skips.pop(), train=train)
                else:
                    x = m(x, emb, train=train)
        return aux_out


class DhariwalUNet(nn.Module):
    """ADM (reference networks.py:372-461): multi-head attention with 64
    channels per head, adaptive-scale conditioning, kaiming-uniform init."""

    img_resolution: int
    in_channels: int
    out_channels: int
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        emb_channels = self.model_channels * self.channel_mult_emb
        init = dict(
            init_mode="kaiming_uniform",
            init_weight=math.sqrt(1.0 / 3.0),
            init_bias=math.sqrt(1.0 / 3.0),
        )
        init_zero = dict(init_mode="kaiming_uniform", init_weight=0.0, init_bias=0.0)
        block = dict(
            emb_channels=emb_channels,
            channels_per_head=64,
            dropout=self.dropout,
            init=init,
            init_zero=init_zero,
            dtype=self.dtype,
        )

        self.map_noise = PositionalEmbedding(num_channels=self.model_channels)
        if self.augment_dim:
            self.map_augment = EDMLinear(self.model_channels, use_bias=False, dtype=self.dtype, **init_zero)
        self.map_layer0 = EDMLinear(emb_channels, dtype=self.dtype, **init)
        self.map_layer1 = EDMLinear(emb_channels, dtype=self.dtype, **init)
        if self.label_dim:
            self.map_label = EDMLinear(
                emb_channels, use_bias=False, init_mode="kaiming_normal",
                init_weight=math.sqrt(self.label_dim), dtype=self.dtype,
            )

        enc: dict[str, nn.Module] = {}
        cout = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cout = self.model_channels * mult
                enc[f"{res}x{res}_conv"] = EDMConv(cout, 3, dtype=self.dtype, **init)
            else:
                enc[f"{res}x{res}_down"] = UNetBlock(out_channels=cout, down=True, **block)
            for idx in range(self.num_blocks):
                cout = self.model_channels * mult
                enc[f"{res}x{res}_block{idx}"] = UNetBlock(
                    out_channels=cout, attention=(res in self.attn_resolutions), **block
                )
        self.enc = enc
        self._enc_names = list(enc.keys())
        skips = [
            m.features if isinstance(m, EDMConv) else m.out_channels for m in enc.values()
        ]

        dec: dict[str, nn.Module] = {}
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                dec[f"{res}x{res}_in0"] = UNetBlock(out_channels=cout, attention=True, **block)
                dec[f"{res}x{res}_in1"] = UNetBlock(out_channels=cout, **block)
            else:
                dec[f"{res}x{res}_up"] = UNetBlock(out_channels=cout, up=True, **block)
            for idx in range(self.num_blocks + 1):
                skips.pop()
                cout = self.model_channels * mult
                dec[f"{res}x{res}_block{idx}"] = UNetBlock(
                    out_channels=cout, attention=(res in self.attn_resolutions), **block
                )
        self.dec = dec
        self._dec_names = list(dec.keys())
        self.out_norm = EDMGroupNormSiLU(dtype=self.dtype)
        self.out_conv = EDMConv(self.out_channels, 3, dtype=self.dtype, **init_zero)

    def __call__(
        self,
        x: jax.Array,
        noise_labels: jax.Array,
        class_labels: jax.Array | None = None,
        augment_labels: jax.Array | None = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        # Mapping (reference :440-450): label embedding added after layer1,
        # silu applied last.
        emb = self.map_noise(noise_labels)
        if self.augment_dim and augment_labels is not None:
            emb = emb + self.map_augment(augment_labels)
        emb = nn.silu(self.map_layer0(emb))
        emb = self.map_layer1(emb)
        if self.label_dim:
            tmp = class_labels
            if train and self.label_dropout > 0.0:
                keep = (
                    jax.random.uniform(self.make_rng("label_dropout"), (x.shape[0], 1))
                    >= self.label_dropout
                )
                tmp = tmp * keep.astype(tmp.dtype)
            emb = emb + self.map_label(tmp)
        emb = nn.silu(emb)

        x = x.astype(self.dtype)
        skips = []
        for name in self._enc_names:
            m = self.enc[name]
            x = m(x, emb, train=train) if isinstance(m, UNetBlock) else m(x)
            skips.append(x)
        for name in self._dec_names:
            m = self.dec[name]
            if "_block" in name:
                # skip_cat: norm0 consumes (x, skip) as parts so the moment
                # reductions fuse into each producer
                x = m(x, emb, skip_cat=skips.pop(), train=train)
            else:
                x = m(x, emb, train=train)
        return self.out_conv(self.out_norm(x))


__all__ = ["SongUNet", "DhariwalUNet"]

"""Scorer protocol: jit-compiled reward heads.

The reference scorer interface is ``scorer(images_uint8, cond, timesteps)
-> scores[B]`` (edm/scorers.py:14-23) fed with ``(x*127.5+128).clip(0,255)
.to(uint8)`` decodes and ``timesteps=0`` at every call site
(edm/main.py:126-129,828-838). The TPU design keeps everything on device:
scorers take float images and quantize internally with the same
truncation semantics, so candidate scoring fuses into the compiled search
step and never round-trips to host (the reference syncs ``.item()`` per
candidate, pipeline_stable_diffusion.py:1423).
"""
from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp


def quantize_to_uint8_grid(x: jax.Array) -> jax.Array:
    """[-1,1] model output -> the exact value grid the reference scores:
    trunc(clip(x*127.5+128, 0, 255)) / 255, staying in float on device.

    torch's ``.to(uint8)`` truncates; inputs are >= 0 after the clip so
    floor == trunc.
    """
    q = jnp.clip(x.astype(jnp.float32) * 127.5 + 128.0, 0.0, 255.0)
    return jnp.floor(q) / 255.0


class Scorer(Protocol):
    """score(images01 [B,H,W,C] float in [0,1], cond, timesteps) -> [B].

    ``cond`` is scorer-specific: one-hot class labels (ImageNet), token ids
    or text features (CLIP), or ignored (brightness, compressibility).
    """

    def __call__(self, images01: jax.Array, cond=None, timesteps: jax.Array | None = None) -> jax.Array:
        ...


__all__ = ["Scorer", "quantize_to_uint8_grid"]

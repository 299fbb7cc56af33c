"""Perceived-luminance reward (reference edm/scorers.py:25-54,
sd/scorers.py:25-76): Rec.709 weights, clamped to [0,1]. One fused
einsum+mean on device."""
from __future__ import annotations

import jax
import jax.numpy as jnp

_WEIGHTS = jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)


class BrightnessScorer:
    def __call__(self, images01: jax.Array, cond=None, timesteps=None) -> jax.Array:
        x = images01.astype(jnp.float32)
        if x.shape[-1] == 3:
            lum = jnp.einsum("bhwc,c->b", x, _WEIGHTS) / (x.shape[1] * x.shape[2])
        else:
            lum = x.mean(axis=(1, 2, 3))
        return jnp.clip(lum, 0.0, 1.0)


__all__ = ["BrightnessScorer"]

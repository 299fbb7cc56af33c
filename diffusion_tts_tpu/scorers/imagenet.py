"""Noisy-ImageNet classifier reward (reference edm/scorers.py:56-174).

Wraps the flax EncoderUNetModel (the 64x64 guided-diffusion classifier):
score = softmax(logits)[target_class]. Weights come from the OpenAI
``64x64_classifier.pt`` checkpoint via convert_classifier_state_dict when
available locally (zero-egress environments can't download it; random init
is used for pipeline tests)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.models.classifier import (
    EncoderUNetModel,
    convert_classifier_state_dict,
)


class ImageNetScorer:
    def __init__(self, variables: Any | None = None, *, rng: jax.Array | None = None,
                 dtype=jnp.float32, **model_overrides):
        self.model = EncoderUNetModel(dtype=dtype, **model_overrides)
        if variables is None:
            rng = rng if rng is not None else jax.random.key(0)
            dummy = jnp.zeros((1, self.model.image_size, self.model.image_size, 3))
            variables = self.model.init({"params": rng}, dummy, jnp.zeros((1,)))
        self.variables = variables
        self._apply = jax.jit(self.model.apply)

    @classmethod
    def from_torch_checkpoint(cls, path: str, **model_overrides) -> "ImageNetScorer":
        """Load the OpenAI classifier .pt (torch state_dict) from a local
        path (the reference downloads it, edm/scorers.py:61-74; this build
        is zero-egress so the file must already exist)."""
        import torch

        state = torch.load(path, map_location="cpu")
        state = {k: v.numpy() for k, v in state.items()}
        return cls(variables=convert_classifier_state_dict(state), **model_overrides)

    def __call__(self, images01: jax.Array, cond=None, timesteps=None, *,
                 variables=None) -> jax.Array:
        """variables: optional override so callers inside jit can thread the
        classifier weights as traced arguments instead of baked constants."""
        if timesteps is None:
            timesteps = jnp.zeros((images01.shape[0],), jnp.float32)
        v = variables if variables is not None else self.variables
        logits = self._apply(v, images01.astype(jnp.float32), timesteps)
        probs = jax.nn.softmax(logits, axis=-1)
        if cond is None:
            raise ValueError("ImageNetScorer needs class labels")
        cond = jnp.asarray(cond)
        target = jnp.argmax(cond, axis=-1) if cond.ndim > 1 else cond.astype(jnp.int32)
        return jnp.take_along_axis(probs, target[:, None], axis=1)[:, 0]


__all__ = ["ImageNetScorer"]

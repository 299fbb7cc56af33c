"""CLIP similarity reward (reference sd/scorers.py:149-213).

score = cosine(image_embed, text_embed) with openai/clip-vit-large-patch14.
Uses the transformers Flax CLIP implementation (a dependency of this
framework, as torch CLIPModel is of the reference). Preprocessing is done
on device in jnp (bicubic resize to 224 + CLIP normalization), so scoring
stays inside the compiled search step; text features are computed once per
prompt and cached.

Zero-egress note: from_pretrained works only if the checkpoint exists in a
local cache/path; CLIPScorer.random_init builds a tiny random model for
pipeline tests.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images01: jax.Array, image_size: int = 224) -> jax.Array:
    """[B,H,W,3] in [0,1] -> CLIP pixel_values [B,3,S,S]."""
    x = images01.astype(jnp.float32)
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, x.shape[3]), method="bicubic"
        )
        x = jnp.clip(x, 0.0, 1.0)
    x = (x - jnp.asarray(_CLIP_MEAN)) / jnp.asarray(_CLIP_STD)
    return x.transpose(0, 3, 1, 2)


class CLIPScorer:
    def __init__(self, model: Any, params: Any, image_size: int = 224):
        self.model = model
        self.params = params
        self.image_size = image_size
        self._image_features = jax.jit(
            lambda p, pix: model.get_image_features(pixel_values=pix, params=p)
        )
        self._text_features = jax.jit(
            lambda p, ids, mask: model.get_text_features(
                input_ids=ids, attention_mask=mask, params=p
            )
        )
        self._text_cache: dict[tuple, jax.Array] = {}

    @classmethod
    def from_pretrained(cls, model_id: str = "openai/clip-vit-large-patch14") -> "CLIPScorer":
        from transformers import FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(model_id)
        return cls(model, model.params, image_size=model.config.vision_config.image_size)

    @classmethod
    def random_init(cls, seed: int = 0, **config_overrides) -> "CLIPScorer":
        """Tiny random CLIP for tests (the vendored suite's tiny-model
        pattern, SURVEY.md §4)."""
        from transformers import CLIPConfig, FlaxCLIPModel

        cfg = dict(
            text_config=dict(hidden_size=32, intermediate_size=64, num_attention_heads=4,
                             num_hidden_layers=2, max_position_embeddings=77, vocab_size=1000),
            vision_config=dict(hidden_size=32, intermediate_size=64, num_attention_heads=4,
                               num_hidden_layers=2, image_size=32, patch_size=8),
            projection_dim=16,
        )
        cfg.update(config_overrides)
        model = FlaxCLIPModel(CLIPConfig(**{k: v for k, v in cfg.items()}), seed=seed)
        return cls(model, model.params, image_size=model.config.vision_config.image_size)

    def text_features(self, input_ids: jax.Array, attention_mask: jax.Array | None = None) -> jax.Array:
        input_ids = jnp.asarray(input_ids)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        key = (input_ids.shape, hash(np.asarray(input_ids).tobytes()))
        if key not in self._text_cache:
            emb = self._text_features(self.params, input_ids, attention_mask)
            self._text_cache[key] = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return self._text_cache[key]

    def __call__(self, images01: jax.Array, cond=None, timesteps=None, *,
                 params=None) -> jax.Array:
        """cond: normalized text features [B or 1, D], or token ids [B, L].
        params: optional override to thread CLIP weights through jit."""
        pix = preprocess_images(images01, self.image_size)
        img = self._image_features(params if params is not None else self.params, pix)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        if cond is None:
            return jnp.zeros(img.shape[0], jnp.float32)
        cond = jnp.asarray(cond)
        if jnp.issubdtype(cond.dtype, jnp.integer):
            txt = self.text_features(cond)
        else:
            txt = cond
        if txt.shape[0] == 1 and img.shape[0] > 1:
            txt = jnp.broadcast_to(txt, (img.shape[0], txt.shape[1]))
        return jnp.sum(img * txt, axis=-1)


__all__ = ["CLIPScorer", "preprocess_images"]

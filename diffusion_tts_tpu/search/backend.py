"""Search backend protocol: what a diffusion backend must expose so the six
search methods stay backend-agnostic.

The reference duplicates each method per backend (edm/main.py:101-866 and
pipeline_stable_diffusion.py:1045-1455); here the methods are written once
against this protocol. The searched variable is always the injected noise
``eps`` of one sampler step (SURVEY.md §2b):

  EDM  — the churn noise of the Heun step (edm/main.py:84-85),
  SD   — the DDIM variance noise (scheduling_ddim.py:451-463).

Scoring always happens on the decoded *predicted clean image*
(edm/main.py:824-838; pipeline:1111-1118): ``candidate_images`` returns the
float [0,1] images on the exact uint8 grid the reference feeds its scorers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Protocol

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
from diffusion_tts_tpu.scorers.base import quantize_to_uint8_grid


class SearchBackend(Protocol):
    num_steps: int

    def init_latents(self, z: jax.Array) -> jax.Array: ...

    def base_step(self, x: jax.Array, i: jax.Array) -> Any:
        """Per-(step) work shared by all candidates (SD: the one CFG UNet
        forward whose output every candidate reuses; EDM: nothing)."""

    def expand(
        self, x: jax.Array, i: jax.Array, aux: Any, eps: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Step every candidate: x [B,...], eps [N,B,...] ->
        (x_next [N,B,...], images01 [N*B,H,W,C]) where images are the decoded
        pred-x0 for scoring."""

    def advance(self, x: jax.Array, i: jax.Array, aux: Any, eps: jax.Array) -> jax.Array:
        """Commit the chosen noise: one sampler step."""

    def rollout(self, x: jax.Array, i: jax.Array) -> jax.Array:
        """Deterministic zero-noise trajectory from step i to terminal,
        returning decoded final images01 (MCTS simulation,
        edm/main.py:630-645)."""

    def final_images(self, x: jax.Array) -> jax.Array:
        """Decode the terminal latent state to scoring images."""

    def score(self, images01: jax.Array, timesteps: jax.Array | None = None) -> jax.Array:
        """Reward for [B',H,W,C] images (cond is bound at construction)."""


def _tile_cond(cond, n):
    if cond is None:
        return None
    return jnp.tile(cond, (n,) + (1,) * (cond.ndim - 1))


@dataclasses.dataclass
class EDMSearchBackend:
    """EDM backend: Heun/churn step, pixel-space decode = uint8 quantize.

    candidate_sharding: optional NamedSharding for the flattened [N*B]
    candidate batch — set it to shard search expansion across a device mesh
    (the reference's only scaling axis for search is in-chip batching,
    SURVEY.md §2c; this is the multi-chip version).
    """

    sampler: EDMHeunSampler
    scorer: Any  # scorers.Scorer
    scorer_cond: jax.Array | None = None  # class labels [B, label_dim]
    candidate_sharding: Any = None

    def _constrain(self, x):
        if self.candidate_sharding is not None:
            return jax.lax.with_sharding_constraint(x, self.candidate_sharding)
        return x

    @property
    def num_steps(self) -> int:
        return self.sampler.num_steps

    def init_latents(self, z):
        return self.sampler.init_latents(z)

    def base_step(self, x, i):
        return None

    def expand(self, x, i, aux, eps):
        n, b = eps.shape[:2]
        x_flat = jnp.broadcast_to(x[None], eps.shape).reshape((n * b,) + x.shape[1:])
        eps_flat = eps.reshape((n * b,) + eps.shape[2:])
        x_flat = self._constrain(x_flat)
        eps_flat = self._constrain(eps_flat)
        x_next, pred_x0 = self.sampler.step(x_flat, i, eps_flat)
        images = quantize_to_uint8_grid(pred_x0)
        return x_next.reshape(eps.shape), images

    def advance(self, x, i, aux, eps):
        x_next, _ = self.sampler.step(x, i, eps)
        return x_next

    def rollout(self, x, i):
        i = jnp.asarray(i, jnp.int32)
        mask_shape = (i.shape + (1,) * (x.ndim - i.ndim)) if i.ndim else ()

        def body(carry, j):
            xc = carry
            x_next, _ = self.sampler.step(xc, j, jnp.zeros_like(xc))
            live = (j >= i).reshape(mask_shape) if i.ndim else (j >= i)
            return jnp.where(live, x_next, xc), None

        steps = jnp.arange(self.num_steps, dtype=jnp.int32)
        x_final, _ = jax.lax.scan(body, x, steps)
        return self.final_images(x_final)

    def final_images(self, x):
        return quantize_to_uint8_grid(x)

    def score(self, images01, timesteps=None):
        b = images01.shape[0]
        cond = self.scorer_cond
        if cond is not None and cond.shape[0] != b:
            cond = _tile_cond(cond, b // cond.shape[0])
        if timesteps is None:
            timesteps = jnp.zeros((b,), jnp.float32)
        return self.scorer(images01, cond, timesteps)


__all__ = ["SearchBackend", "EDMSearchBackend"]

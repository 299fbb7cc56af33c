"""SD search backend: stochastic-DDIM latent search with one-step lookahead.

Behavioral counterpart of the modified SD pipeline's candidate evaluation
(pipeline_stable_diffusion.py:1368-1435): per timestep ONE CFG UNet forward
produces the base noise_pred every candidate reuses; each candidate's DDIM
variance noise yields latents_cand; a lookahead UNet call AT THE SAME t
(the reference's quirk, :1386-1411) gives a refined pred-x0 which is
VAE-decoded and scored with the reference's (x*127.5+128) uint8 grid
(:1413-1420). The committed step re-uses the base noise_pred with the
winning variance noise (:1435).

The reference evaluates candidates in a sequential Python loop with a
``.item()`` host sync per candidate (:1423-1425); here the N-candidate axis
is one batched UNet+VAE call inside the compiled search step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.samplers.ddim import StochasticDDIMSampler
from diffusion_tts_tpu.scorers.base import quantize_to_uint8_grid


@dataclasses.dataclass
class SDSearchBackend:
    """sampler.eps_model must already be CFG-combined; vae_decode maps
    latents (unscaled) -> images in [-1, 1]."""

    sampler: StochasticDDIMSampler
    vae_decode: Callable[[jax.Array], jax.Array]
    scorer: Any
    scorer_cond: Any = None  # text features / token ids, broadcastable
    candidate_sharding: Any = None  # NamedSharding for the [N*B] expansion

    def _constrain(self, x):
        if self.candidate_sharding is not None:
            return jax.lax.with_sharding_constraint(x, self.candidate_sharding)
        return x

    @property
    def num_steps(self) -> int:
        return self.sampler.num_steps

    def init_latents(self, z):
        return self.sampler.init_latents(z)

    def _t(self, i, n):
        return jnp.broadcast_to(self.sampler.timesteps[jnp.asarray(i, jnp.int32)], (n,))

    def base_step(self, x, i):
        """The shared CFG UNet forward (pipeline:1341-1362)."""
        return self.sampler.eps_model(x, self._t(i, x.shape[0]))

    def expand(self, x, i, aux, eps):
        n, b = eps.shape[:2]
        feat = x.shape[1:]
        x_flat = self._constrain(
            jnp.broadcast_to(x[None], eps.shape).reshape((n * b,) + feat))
        aux_flat = self._constrain(
            jnp.broadcast_to(aux[None], (n,) + aux.shape).reshape((n * b,) + feat))
        eps_flat = self._constrain(eps.reshape((n * b,) + feat))
        lat_cand, _ = self.sampler.step_math(x_flat, i, aux_flat, eps_flat)
        # lookahead at the SAME timestep (reference quirk, pipeline:1386-1411)
        np2 = self.sampler.eps_model(lat_cand, self._t(i, n * b))
        _, pred_x0_2 = self.sampler.step_math(lat_cand, i, np2, None)
        images = quantize_to_uint8_grid(self.vae_decode(pred_x0_2))
        return lat_cand.reshape(eps.shape), images

    def advance(self, x, i, aux, eps):
        x_next, _ = self.sampler.step_math(x, i, aux, eps)
        return x_next

    def rollout(self, x, i):
        """Deterministic DDIM rollout (no variance noise) from step i."""
        i = jnp.asarray(i, jnp.int32)
        mask_shape = (i.shape + (1,) * (x.ndim - i.ndim)) if i.ndim else ()

        def body(xc, j):
            np_j = self.sampler.eps_model(xc, self._t(j, xc.shape[0]))
            x_next, _ = self.sampler.step_math(xc, j, np_j, None)
            live = (j >= i).reshape(mask_shape) if i.ndim else (j >= i)
            return jnp.where(live, x_next, xc), None

        steps = jnp.arange(self.num_steps, dtype=jnp.int32)
        x_final, _ = jax.lax.scan(body, x, steps)
        return self.final_images(x_final)

    def final_images(self, x):
        return quantize_to_uint8_grid(self.vae_decode(x))

    def score(self, images01, timesteps=None):
        b = images01.shape[0]
        cond = self.scorer_cond
        if cond is not None and hasattr(cond, "shape") and cond.shape[0] not in (1, b):
            reps = b // cond.shape[0]
            cond = jnp.tile(cond, (reps,) + (1,) * (cond.ndim - 1))
        return self.scorer(images01, cond, timesteps)


__all__ = ["SDSearchBackend"]

"""Naive sampling and rejection (best-of-N) search.

naive: fresh Gaussian churn/variance noise per step, one trajectory
(reference edm/main.py:862-866; pipeline_stable_diffusion.py:1335-1366).
rejection: N independent full trajectories batched on the leading axis,
terminal-reward argmax per sample (edm/main.py:101-137; the SD side runs
the same restart loop OUTSIDE the pipeline, main.py:134-143).

TPU shape: one ``lax.scan`` over steps; rejection folds the N restarts into
the batch so the whole search is a single compiled program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.search.noise import SALT_STEP, InjectedNoise
from diffusion_tts_tpu.utils.rng import fold_in_path


def naive_sample(backend, z: jax.Array, key: jax.Array,
                 noise: InjectedNoise | None = None) -> jax.Array:
    """One trajectory with fresh per-step noise. Returns terminal latents.
    noise.step_noise [steps, B, *feat] overrides the keyed draws (the
    reference's precomputed_noise[i] injection, edm/main.py:113-121)."""
    x = backend.init_latents(z)
    inj = noise if noise is not None else InjectedNoise()

    def body(x, i):
        if inj.step_noise is not None:
            eps = inj.step_noise[i].astype(x.dtype)
        else:
            eps = jax.random.normal(fold_in_path(key, SALT_STEP, i), x.shape, x.dtype)
        aux = backend.base_step(x, i)
        return backend.advance(x, i, aux, eps), None

    steps = jnp.arange(backend.num_steps, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x, steps)
    return x


def rejection_search(backend, z: jax.Array, key: jax.Array, n: int,
                     noise: InjectedNoise | None = None) -> tuple[jax.Array, jax.Array]:
    """Best-of-N full trajectories. Returns (best terminal latents [B,...],
    best scores [B]). noise.step_noise [steps, N, B, *feat] overrides the
    keyed draws (reference: precomputed_noise[i][:, :N],
    edm/main.py:113-121; layout here is candidate-major)."""
    b = z.shape[0]
    z_rep = jnp.tile(z, (n,) + (1,) * (z.ndim - 1))  # [N*B, ...] candidate-major
    x = backend.init_latents(z_rep)
    inj = noise if noise is not None else InjectedNoise()

    def body(x, i):
        if inj.step_noise is not None:
            eps = inj.step_noise[i].reshape(x.shape).astype(x.dtype)
        else:
            eps = jax.random.normal(fold_in_path(key, SALT_STEP, i), x.shape, x.dtype)
        aux = backend.base_step(x, i)
        return backend.advance(x, i, aux, eps), None

    steps = jnp.arange(backend.num_steps, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x, steps)

    images = backend.final_images(x)
    scores = backend.score(images).reshape(n, b)
    best = jnp.argmax(scores, axis=0)  # [B]
    x_nb = x.reshape((n, b) + x.shape[1:])
    x_best = jnp.take_along_axis(
        x_nb, best[None, :].reshape((1, b) + (1,) * (x.ndim - 1)), axis=0
    )[0]
    return x_best, jnp.max(scores, axis=0)




def replay_trajectory(backend, z: jax.Array, noises: jax.Array) -> jax.Array:
    """Advance with an explicit per-step noise trajectory [steps, B, ...] —
    the consumer of run_search(record_noises=True) and the counterpart of
    the reference's precomputed_noise injection (edm/main.py:54,113-121):
    replaying the selected pivots reproduces the searched sample exactly."""
    x = backend.init_latents(z)

    def body(x, inp):
        i, eps = inp
        aux = backend.base_step(x, i)
        return backend.advance(x, i, aux, eps), None

    steps = jnp.arange(backend.num_steps, dtype=jnp.int32)
    x, _ = jax.lax.scan(body, x, (steps, noises))
    return x


__all__ = ["naive_sample", "rejection_search", "replay_trajectory"]

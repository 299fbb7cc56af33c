"""Beam search over injected noise.

Semantics follow the SD implementation (pipeline_stable_diffusion.py:
1045-1170): keep B beams per sample; each step draw N candidate noises per
beam, advance every (beam, candidate) pair, score the decoded pred-x0, and
keep the per-sample top-B states; after the last step decode all beams and
return the best. (The EDM reference's beam branch reads nonexistent
``method_params.b/k`` attributes and cannot run as-is — SURVEY.md §2b; this
is the intended behavior, implemented for both backends.)

TPU shape: beams ride the batch axis — every (beam, candidate) denoises in
one call; per-sample selection is an on-device top_k.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.search.noise import InjectedNoise
from diffusion_tts_tpu.utils.config import SearchParams
from diffusion_tts_tpu.utils.rng import fold_in_path

_SALT_BEAM = 0x31


class BeamResult(NamedTuple):
    x: jax.Array  # best terminal latents [B, ...]
    score: jax.Array  # [B]
    picks: jax.Array | None = None  # [steps, B, M] chosen flat candidate ids
    #   (flat id = n_idx * M + m_idx over the [N, M] expansion grid, rank-
    #    ordered best-first — the per-step top-B set the SD reference keeps,
    #    pipeline_stable_diffusion.py:1131-1134)


def beam_search(
    backend,
    z: jax.Array,
    key: jax.Array,
    params: SearchParams,
    *,
    noise: InjectedNoise | None = None,
    record: bool = False,
) -> BeamResult:
    m, n = params.B, params.N  # beams, expansions per beam
    b = z.shape[0]
    feat_ndim = z.ndim - 1
    inj = noise if noise is not None else InjectedNoise()

    x = backend.init_latents(z)
    # beams [M, B, ...] initialised as M copies
    beams = jnp.broadcast_to(x[None], (m,) + x.shape)

    def step_body(beams, i):
        beams_flat = beams.reshape((m * b,) + beams.shape[2:])
        aux = backend.base_step(beams_flat, i)
        if inj.beam_noise is not None:
            eps = inj.beam_noise[i].reshape((n, m * b) + beams.shape[2:])
        else:
            eps = jax.random.normal(
                fold_in_path(key, _SALT_BEAM, i), (n, m * b) + beams.shape[2:],
                jnp.float32,
            )
        x_next, images = backend.expand(beams_flat, i, aux, eps)  # [N, M*B, ...]
        scores = backend.score(images).reshape(n, m, b)
        # candidates [N*M, B, ...] per sample; pick top-M
        cands = x_next.reshape((n, m, b) + beams.shape[2:]).reshape(
            (n * m, b) + beams.shape[2:]
        )
        flat_scores = scores.reshape(n * m, b)
        _, top_idx = jax.lax.top_k(flat_scores.T, m)  # [B, M]
        new_beams = jnp.take_along_axis(
            cands, top_idx.T.reshape((m, b) + (1,) * feat_ndim), axis=0
        )
        return new_beams, (top_idx if record else None)

    steps = jnp.arange(backend.num_steps, dtype=jnp.int32)
    beams, picks = jax.lax.scan(step_body, beams, steps)

    # Final best-of-B (pipeline:1156-1170).
    beams_flat = beams.reshape((m * b,) + beams.shape[2:])
    images = backend.final_images(beams_flat)
    scores = backend.score(images).reshape(m, b)
    best = jnp.argmax(scores, axis=0)
    x_best = jnp.take_along_axis(
        beams, best.reshape((1, b) + (1,) * feat_ndim), axis=0
    )[0]
    return BeamResult(x=x_best, score=jnp.max(scores, axis=0), picks=picks)


__all__ = ["beam_search", "BeamResult"]

"""External noise injection for reproducible / externally-driven search.

Counterpart of the reference's ``precomputed_noise`` dict
(edm/main.py:54,113-121,437-447,723-796): the reference lets a caller drive
every pivot (``'pivot_{i}'``), candidate direction (int key ``i``), and
fresh exploration draw (``'fresh_{i}_{k}_{n}'``) of a search from an
external dict, falling back to ``randn`` for missing keys.

TPU-native design: a sparse dict of dynamic keys cannot live inside one
compiled program, so the injection surface is a pytree of optional
STATIC-SHAPED arrays — each field either ``None`` (keyed on-device draws,
the default) or a full ``[steps, ...]`` array consumed by indexing inside
the search scan. This is a superset of the reference's capability: the
uniform scale and the explore-Bernoulli draws are injectable too (the
reference leaves those to ``hash()``/``torch.rand``, edm/main.py:751,774),
so a fully-populated ``InjectedNoise`` makes the search a deterministic
function of its inputs with NO internal randomness.

``record_*_draws`` pre-draw every field with the exact fold_in paths the
search itself uses, so ``search(key=k2, noise=record(k1)) ==
search(key=k1)`` — the round-trip test that proves the wiring.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.utils.config import SearchParams
from diffusion_tts_tpu.utils.rng import fold_in_path

# Salts shared with the search implementations (zero_order.py, naive.py,
# mcts.py import these — single source of truth).
SALT_PIVOT = 0x21
SALT_DIR = 0x22
SALT_SCALE = 0x23
SALT_BERN = 0x24
SALT_FRESH = 0x25
SALT_STEP = 0x5A1
SALT_MCTS_TAB = 0x41
SALT_MCTS_PICK = 0x42
SALT_MCTS_EXPAND = 0x43


class InjectedNoise(NamedTuple):
    """Optional external noise for one search run. ``B`` = sample batch,
    ``feat`` = latent feature shape, ``steps`` = sampler steps. Any field
    left ``None`` falls back to the search's own keyed draws (the
    reference's per-key fallback, edm/main.py:741-744)."""

    pivots: jax.Array | None = None      # [steps, B, *feat]   'pivot_{i}'
    directions: jax.Array | None = None  # [steps, K, N, B, *feat]  key i
    fresh: jax.Array | None = None       # [steps, K, N, B, *feat]  'fresh_{i}_{k}_{n}'
    scales01: jax.Array | None = None    # [steps, K, N, B]  U(0,1) perturbation scale
    explore01: jax.Array | None = None   # [steps, K, N]     U(0,1) explore Bernoulli
    step_noise: jax.Array | None = None  # naive [steps, B, *feat] / rejection [steps, N, B, *feat]
    mcts_table: jax.Array | None = None  # [steps, B, b, *feat]  per-depth expansion table
    beam_noise: jax.Array | None = None  # [steps, N, M, B, *feat]  per-beam candidates
    #   (M = params.B beams in score-rank order; the SD reference draws these
    #    sequentially per beam, pipeline_stable_diffusion.py:1080)


def record_zero_order_draws(
    key: jax.Array, num_steps: int, params: SearchParams, sample_shape: tuple[int, ...]
) -> InjectedNoise:
    """Pre-draw every stochastic input of zero_order/eps_greedy exactly as
    the search would (same fold_in paths). sample_shape = (B, *feat)."""
    n, k_iters = params.N, params.K
    b = sample_shape[0]
    feat_ndim = len(sample_shape) - 1

    def per_step(i):
        pivot = jax.random.normal(fold_in_path(key, SALT_PIVOT, i), sample_shape, jnp.float32)

        def per_k(k):
            dirs = jax.random.normal(
                fold_in_path(key, SALT_DIR, i, k), (n,) + sample_shape, jnp.float32)
            scales = jax.random.uniform(
                fold_in_path(key, SALT_SCALE, i, k), (n, b) + (1,) * feat_ndim)
            fresh = jax.random.normal(
                fold_in_path(key, SALT_FRESH, i, k), (n,) + sample_shape, jnp.float32)
            bern = jax.random.uniform(fold_in_path(key, SALT_BERN, i, k), (n,))
            return dirs, scales.reshape(n, b), fresh, bern

        dirs, scales, fresh, bern = jax.vmap(per_k)(jnp.arange(k_iters, dtype=jnp.int32))
        return pivot, dirs, scales, fresh, bern

    pivots, dirs, scales, fresh, bern = jax.vmap(per_step)(
        jnp.arange(num_steps, dtype=jnp.int32))
    return InjectedNoise(pivots=pivots, directions=dirs, fresh=fresh,
                         scales01=scales, explore01=bern)


def record_step_draws(
    key: jax.Array, num_steps: int, shape: tuple[int, ...]
) -> InjectedNoise:
    """Per-step injected noise for naive (shape=(B,*feat)) or rejection
    (shape=(N*B,*feat), candidate-major — reshaped by the caller)."""
    eps = jax.vmap(
        lambda i: jax.random.normal(fold_in_path(key, SALT_STEP, i), shape, jnp.float32)
    )(jnp.arange(num_steps, dtype=jnp.int32))
    return InjectedNoise(step_noise=eps)


def record_mcts_table(
    key: jax.Array, num_steps: int, b: int, b_exp: int, feat_shape: tuple[int, ...]
) -> InjectedNoise:
    """The per-depth expansion noise table MCTS draws once
    (edm/main.py:437-447)."""
    tab = jax.random.normal(
        fold_in_path(key, SALT_MCTS_TAB), (num_steps, b, b_exp) + feat_shape, jnp.float32)
    return InjectedNoise(mcts_table=tab)


__all__ = [
    "InjectedNoise",
    "record_zero_order_draws",
    "record_step_draws",
    "record_mcts_table",
    "SALT_PIVOT", "SALT_DIR", "SALT_SCALE", "SALT_BERN", "SALT_FRESH",
    "SALT_STEP", "SALT_MCTS_TAB", "SALT_MCTS_PICK", "SALT_MCTS_EXPAND",
]

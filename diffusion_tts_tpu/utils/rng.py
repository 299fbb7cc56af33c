"""RNG discipline for reproducible, batching-independent noise trajectories.

The reference's reproducibility is weak: a single global ``torch.manual_seed``
(edm/main.py:58) plus per-process-salted ``hash()`` scales (edm/main.py:776).
Here every random draw is addressed by a structured key path:

    key = fold_in_path(root, seed, step, k_iter, candidate)

so candidate n at local-search iteration k of timestep i draws the *same*
noise regardless of how candidates are batched or sharded across devices —
the property the reference's StackedRandomGenerator (edm/generate.py:182-196)
provides only for the per-seed axis, extended to the whole search tree.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp


def fold_in_path(key: jax.Array, *path: int) -> jax.Array:
    """Fold a tuple of integers into a PRNG key, one at a time."""
    for p in path:
        key = jax.random.fold_in(key, p)
    return key


def per_seed_keys(seeds: Sequence[int] | jax.Array) -> jax.Array:
    """Batch of keys, one per image seed — the TPU-native equivalent of the
    reference's StackedRandomGenerator (edm/generate.py:182-196): the noise a
    given seed sees is independent of which batch it lands in."""
    seeds = jnp.asarray(seeds, dtype=jnp.uint32)
    return jax.vmap(lambda s: jax.random.key(s))(seeds)


def stacked_normal(keys: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Per-seed normal draws: keys [B] -> samples [B, *shape]."""
    return jax.vmap(lambda k: jax.random.normal(k, shape, dtype))(keys)


def unit_normalize(x: jax.Array, axis: Iterable[int] | None = None, eps: float = 0.0) -> jax.Array:
    """x / ||x||_2 over the given axes (default: all but the leading axis).

    Used to build zero-order candidate perturbations
    (reference edm/main.py:782-787, pipeline_stable_diffusion.py:1377-1379).
    """
    if axis is None:
        axis = tuple(range(1, x.ndim))
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=tuple(axis), keepdims=True))
    return x / jnp.maximum(norm, jnp.asarray(eps if eps > 0 else jnp.finfo(x.dtype).tiny, x.dtype))


__all__ = ["fold_in_path", "per_seed_keys", "stacked_normal", "unit_normalize"]

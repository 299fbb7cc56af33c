"""Zero-order local search and epsilon-greedy search over injected noise.

Reference semantics (shared branch edm/main.py:714-866; SD else-branch
pipeline_stable_diffusion.py:1368-1435): per timestep, start from a fresh
Gaussian pivot, run K local-search iterations; each iteration draws N
candidates — with prob (1-eps) a perturbation ``pivot + U(0,1)*lambda*
sqrt(CHW) * unit(randn)``, with prob eps a fresh Gaussian (the Bernoulli is
a single scalar per (k, n), shared across the batch, edm/main.py:751) —
steps all candidates, scores the decoded pred-x0, and moves the pivot to
the argmax. The final pivot drives the committed step.

zero_order is eps=0 (pure local search; the paper's and SD's semantics —
the EDM reference quirkily reuses the eps-greedy draw for zero_order too,
see SURVEY.md §2b; we implement the intended method and let callers pass
explore_eps explicitly for quirk-compat).

External noise injection (the reference's ``precomputed_noise`` dict,
edm/main.py:723-796) is supported via ``noise=InjectedNoise(...)``: any
populated field overrides the corresponding keyed draw; injected
directions are unit-normalized exactly like the reference normalizes
injected directions (edm/main.py:755-762).

TPU shape: scan over timesteps x scan over K, candidates batched into one
denoiser call per iteration; argmax on device. The reference's per-process
``hash()`` scale seeding (edm/main.py:774-779) is replaced by keyed uniform
draws — strictly stronger determinism.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffusion_tts_tpu.search.noise import (
    SALT_BERN, SALT_DIR, SALT_FRESH, SALT_PIVOT, SALT_SCALE, InjectedNoise,
)
from diffusion_tts_tpu.utils.config import SearchParams
from diffusion_tts_tpu.utils.rng import fold_in_path, unit_normalize


class ZeroOrderResult(NamedTuple):
    x: jax.Array  # terminal latents [B, ...]
    best_noises: jax.Array | None  # [steps, K, B, ...] selected pivots (dmap dump)


def zero_order_timestep(
    backend,
    x: jax.Array,
    key: jax.Array,
    i: jax.Array,
    params: SearchParams,
    *,
    explore_eps: float = 0.0,
    record_noises: bool = False,
    noise: InjectedNoise | None = None,
):
    """One timestep of zero-order/eps-greedy search: K iterations of
    N-candidate expansion + argmax, then the committed step. Returns
    (x_next, per-k selected pivots or None). Factored out so the whole
    search can run either as one compiled scan (zero_order_search) or as
    one dispatch per timestep (run_search(dispatch="per_step") — keeps
    device programs small for very long searches on large models)."""
    n, k_iters = params.N, params.K
    b = x.shape[0]
    feat_shape = x.shape[1:]
    lam = params.lambda_ * math.sqrt(math.prod(feat_shape))
    inj = noise if noise is not None else InjectedNoise()

    aux = backend.base_step(x, i)
    if inj.pivots is not None:
        pivot = inj.pivots[i]
    else:
        pivot = jax.random.normal(fold_in_path(key, SALT_PIVOT, i), x.shape, jnp.float32)

    def k_body(carry, k):
        pivot, _ = carry
        if inj.directions is not None:
            dirs = inj.directions[i, k]
        else:
            dirs = jax.random.normal(
                fold_in_path(key, SALT_DIR, i, k), (n,) + pivot.shape, jnp.float32
            )
        dirs = unit_normalize(dirs.reshape((n * b,) + feat_shape)).reshape(dirs.shape)
        if inj.scales01 is not None:
            scales01 = inj.scales01[i, k].reshape((n, b) + (1,) * len(feat_shape))
        else:
            scales01 = jax.random.uniform(
                fold_in_path(key, SALT_SCALE, i, k), (n, b) + (1,) * len(feat_shape)
            )
        perturbed = pivot[None] + scales01 * lam * dirs
        if inj.fresh is not None:
            fresh = inj.fresh[i, k]
        else:
            fresh = jax.random.normal(
                fold_in_path(key, SALT_FRESH, i, k), (n,) + pivot.shape, jnp.float32
            )
        # one Bernoulli per candidate slot, shared across the batch
        # (edm/main.py:751: torch.rand(1) < (1 - eps))
        if inj.explore01 is not None:
            bern = inj.explore01[i, k]
        else:
            bern = jax.random.uniform(fold_in_path(key, SALT_BERN, i, k), (n,))
        explore = (bern < explore_eps).reshape((n,) + (1,) * (pivot.ndim))
        cands = jnp.where(explore, fresh, perturbed)

        x_next_cands, images = backend.expand(x, i, aux, cands)
        scores = backend.score(images).reshape(n, b)
        best = jnp.argmax(scores, axis=0)  # [B]
        sel = best.reshape((1, b) + (1,) * len(feat_shape))
        new_pivot = jnp.take_along_axis(cands, sel, axis=0)[0]
        # the committed step IS the winning candidate's already-computed
        # x_next (expand = advance on the same eps) — carrying it here makes
        # the final backend.advance redundant, saving its 2 underfilled
        # batch-B UNet forwards per timestep on EDM (the reference re-steps
        # the chosen noise from scratch, edm/main.py:860-866)
        new_x_next = jnp.take_along_axis(x_next_cands, sel, axis=0)[0]
        return (new_pivot, new_x_next), new_pivot if record_noises else None

    (pivot, x_next), noises = jax.lax.scan(
        k_body, (pivot, jnp.zeros_like(x)), jnp.arange(k_iters, dtype=jnp.int32))
    if k_iters == 0:  # degenerate K=0: commit the fresh pivot (old semantics)
        x_next = backend.advance(x, i, aux, pivot)
    return x_next, noises


def zero_order_search(
    backend,
    z: jax.Array,
    key: jax.Array,
    params: SearchParams,
    *,
    explore_eps: float = 0.0,
    record_noises: bool = False,
    noise: InjectedNoise | None = None,
) -> ZeroOrderResult:
    x0 = backend.init_latents(z)

    def step_body(x, i):
        return zero_order_timestep(
            backend, x, key, i, params, explore_eps=explore_eps,
            record_noises=record_noises, noise=noise,
        )

    steps = jnp.arange(backend.num_steps, dtype=jnp.int32)
    x, noises = jax.lax.scan(step_body, x0, steps)
    return ZeroOrderResult(x=x, best_noises=noises)


def eps_greedy_search(backend, z, key, params: SearchParams, *, record_noises=False,
                      noise: InjectedNoise | None = None):
    """The paper's headline method: zero-order exploitation + eps-prob global
    exploration (edm/main.py:789-795)."""
    return zero_order_search(
        backend, z, key, params, explore_eps=params.eps,
        record_noises=record_noises, noise=noise,
    )


__all__ = ["zero_order_search", "zero_order_timestep", "eps_greedy_search",
           "ZeroOrderResult"]

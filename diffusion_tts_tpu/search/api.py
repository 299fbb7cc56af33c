"""Unified search entry point: the six methods behind one call.

Counterpart of the reference's method dispatch (edm/main.py:27-33 enum,
main.py:168-175 CLI map) with the whole search compiled as one XLA program
per (method, shape, params) — candidate expansion, scoring, and selection
never leave the device.

Large-model usage MUST pass the model state through the traced path:
closing over a 300M-parameter tree inside jit bakes it into the HLO as
constants (compile blows up, executables balloon to the parameter size).
Pass ``backend`` as a FACTORY ``backend_args -> SearchBackend`` together
with ``backend_args`` (the params pytree); tiny test backends may still be
passed as plain instances.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax

from diffusion_tts_tpu.search.beam import beam_search
from diffusion_tts_tpu.search.mcts import mcts_search
from diffusion_tts_tpu.search.naive import naive_sample, rejection_search
from diffusion_tts_tpu.search.noise import InjectedNoise
from diffusion_tts_tpu.search.zero_order import eps_greedy_search, zero_order_search
from diffusion_tts_tpu.utils.config import SearchParams

METHODS = ("naive", "rejection", "beam", "mcts", "zero_order", "eps_greedy")

_UNSET = object()


@dataclasses.dataclass
class SearchResult:
    x: jax.Array  # terminal latents [B, ...]
    images: jax.Array  # decoded images01 [B, H, W, C]
    score: jax.Array  # final reward per sample [B]
    best_noises: Any = None  # [steps, K, B, ...] when recorded (dmap dump)


def run_search(
    method: str,
    backend,
    z: jax.Array,
    key: jax.Array,
    params: SearchParams | None = None,
    *,
    backend_args: Any = _UNSET,
    record_noises: bool = False,
    mcts_rollout_batch: int | None = None,
    noise: InjectedNoise | None = None,
    jit: bool = True,
    dispatch: str = "whole",
) -> SearchResult:
    """Run one search method end-to-end. z: [B, ...] unit-variance latents;
    the final image and score are always computed (edm/main.py:869-877).

    backend: a SearchBackend instance, or — with ``backend_args`` given — a
    factory called as ``backend(backend_args)`` inside the traced program so
    model parameters stay jit arguments instead of baked constants.

    noise: optional InjectedNoise overriding the keyed draws (the
    reference's precomputed_noise dict, edm/main.py:54,723-796); beam has no
    reference injection surface and ignores it.

    dispatch: "whole" compiles the entire search into ONE device program
    (fastest — no per-step launch overhead). "per_step" compiles one
    timestep and dispatches it num_steps times — identical results, but the
    device program is K-iterations big instead of steps*K, which large
    models need to stay inside compiler/runtime limits (zero_order and
    eps_greedy at K=20 on the 296M flagship; other methods' programs are
    already per-trajectory-sized and run whole). "auto" (default for
    callers that pass it) picks per_step for the iterated methods when the
    model weights passed via backend_args exceed ~100M parameters."""
    params = params or SearchParams()
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; expected one of {METHODS}")
    if dispatch not in ("whole", "per_step", "auto"):
        raise ValueError(
            f"dispatch must be 'whole', 'per_step', or 'auto', got {dispatch!r}")
    factory_mode = backend_args is not _UNSET
    if dispatch == "auto":
        n_params = (
            sum(int(getattr(l, "size", 0))
                for l in jax.tree_util.tree_leaves(backend_args))
            if factory_mode else 0
        )
        dispatch = ("per_step"
                    if n_params > 100_000_000
                    and method in ("zero_order", "eps_greedy", "mcts")
                    else "whole")

    if dispatch == "per_step" and method in ("zero_order", "eps_greedy"):
        return _run_zero_order_per_step(
            method, backend, z, key, params,
            backend_args=backend_args, factory_mode=factory_mode,
            record_noises=record_noises, noise=noise, jit=jit,
        )
    if dispatch == "per_step" and method == "mcts":
        return _run_mcts_per_step(
            backend, z, key, params,
            backend_args=backend_args, factory_mode=factory_mode,
            rollout_batch=mcts_rollout_batch, noise=noise, jit=jit,
        )

    def go(z, key, bargs, inj):
        be = backend(bargs) if factory_mode else backend
        noises = None
        if method == "naive":
            x = naive_sample(be, z, key, noise=inj)
        elif method == "rejection":
            x, _ = rejection_search(be, z, key, params.N, noise=inj)
        elif method == "beam":
            x = beam_search(be, z, key, params).x
        elif method == "mcts":
            x = mcts_search(be, z, key, params, rollout_batch=mcts_rollout_batch,
                            noise=inj).x
        elif method == "zero_order":
            r = zero_order_search(be, z, key, params, record_noises=record_noises,
                                  noise=inj)
            x, noises = r.x, r.best_noises
        else:  # eps_greedy
            r = eps_greedy_search(be, z, key, params, record_noises=record_noises,
                                  noise=inj)
            x, noises = r.x, r.best_noises
        images = be.final_images(x)
        score = be.score(images)
        return x, images, score, noises

    fn = jax.jit(go, static_argnums=()) if jit else go
    x, images, score, noises = fn(z, key, backend_args if factory_mode else None, noise)

    # Exact-final-score guarantee: when the scorer had to degrade to an
    # on-device proxy inside the compiled search (CompressibilityScorer on a
    # callback-less backend), re-score the FINAL images on the host path so
    # the returned score is always the real reward (edm/scorers.py:207-244).
    be_out = backend(backend_args) if factory_mode else backend
    scorer = getattr(be_out, "scorer", None)
    if scorer is not None and not getattr(scorer, "final_score_is_exact", True):
        score = be_out.score(jax.device_get(images))
    return SearchResult(x=x, images=images, score=score, best_noises=noises)


def _run_zero_order_per_step(
    method, backend, z, key, params, *, backend_args, factory_mode,
    record_noises, noise, jit,
):
    """zero_order/eps_greedy with one device dispatch per timestep. The
    compiled step function is shared by all timesteps (the step index is a
    traced scalar), so there is exactly one compile; only the outer scan is
    replaced by a host loop."""
    import jax.numpy as jnp

    from diffusion_tts_tpu.search.zero_order import zero_order_timestep

    eps_val = params.eps if method == "eps_greedy" else 0.0

    def step(bargs, x, i, key, inj):
        be = backend(bargs) if factory_mode else backend
        return zero_order_timestep(
            be, x, key, i, params, explore_eps=eps_val,
            record_noises=record_noises, noise=inj,
        )

    def finish(bargs, x):
        be = backend(bargs) if factory_mode else backend
        images = be.final_images(x)
        return images, be.score(images)

    # donate the carried latents: each dispatch rebinds x, so in-place
    # update keeps per-step memory flat (matches the whole-program scan)
    step_fn = jax.jit(step, donate_argnums=(1,)) if jit else step
    finish_fn = jax.jit(finish) if jit else finish
    bargs = backend_args if factory_mode else None
    be0 = backend(backend_args) if factory_mode else backend

    x = be0.init_latents(z)
    noises = []
    for i in range(be0.num_steps):
        x, nz = step_fn(bargs, x, jnp.asarray(i, jnp.int32), key, noise)
        if record_noises:
            noises.append(nz)
    images, score = finish_fn(bargs, x)

    scorer = getattr(be0, "scorer", None)
    if scorer is not None and not getattr(scorer, "final_score_is_exact", True):
        score = be0.score(jax.device_get(images))
    return SearchResult(
        x=x, images=images, score=score,
        best_noises=jnp.stack(noises) if record_noises else None,
    )


def _run_mcts_per_step(
    backend, z, key, params, *, backend_args, factory_mode, rollout_batch,
    noise, jit,
):
    """MCTS with one device dispatch per timestep — the tree arena stays on
    device between dispatches; only the scan over timesteps moves to the
    host. The flagship MCTS program is by far the largest single program
    (every timestep embeds expansion + full rollouts-to-terminal)."""
    import jax.numpy as jnp

    from diffusion_tts_tpu.search.mcts import (
        mcts_init, mcts_result, mcts_timestep,
    )

    def init(bargs, z, key, inj):
        be = backend(bargs) if factory_mode else backend
        return mcts_init(be, z, key, params, rollout_batch=rollout_batch, noise=inj)

    def step(bargs, tree, noise_tab, i, key):
        be = backend(bargs) if factory_mode else backend
        return mcts_timestep(be, tree, noise_tab, key, i, params,
                             rollout_batch=rollout_batch)

    def finish(bargs, tree):
        be = backend(bargs) if factory_mode else backend
        x = mcts_result(tree).x
        images = be.final_images(x)
        return x, images, be.score(images)

    # donate the tree arena (arg 1): the [B, MAXN, *feat] states buffer is
    # the dominant allocation; without donation every dispatch double-
    # buffers it (noise_tab, arg 2, is reused across steps — not donated)
    init_fn, step_fn, finish_fn = (
        (jax.jit(init), jax.jit(step, donate_argnums=(1,)), jax.jit(finish)) if jit
        else (init, step, finish)
    )
    bargs = backend_args if factory_mode else None
    be0 = backend(backend_args) if factory_mode else backend

    tree, noise_tab = init_fn(bargs, z, key, noise)
    for i in range(be0.num_steps):
        tree = step_fn(bargs, tree, noise_tab, jnp.asarray(i, jnp.int32), key)
    x, images, score = finish_fn(bargs, tree)

    scorer = getattr(be0, "scorer", None)
    if scorer is not None and not getattr(scorer, "final_score_is_exact", True):
        score = be0.score(jax.device_get(images))
    return SearchResult(x=x, images=images, score=score, best_noises=None)


__all__ = ["run_search", "SearchResult", "METHODS"]

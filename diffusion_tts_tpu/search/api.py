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
import weakref
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

# Jitted search programs, reused across run_search calls. jax.jit keys its
# trace cache on the WRAPPER's identity, so rebuilding jax.jit(go) per call
# retraces and re-lowers the whole search program every time — on the 296M
# flagship that is ~30 s of host work per call during which the device sits
# idle (profiled as the round-3 "37.7% IDLE" / "1.8 s/timestep fixed cost").
# Keyed weakly on the backend factory (or instance) so programs die with the
# model; the value dict is keyed on every closure input baked into the trace.
_PROGRAM_CACHE: "weakref.WeakKeyDictionary[Any, dict]" = weakref.WeakKeyDictionary()


def _cached_program(anchor, cache_key, build):
    """Memoize ``build()`` (a jax.jit wrapper) on (anchor, cache_key).
    Anchors that cannot be weakly referenced or hashed (e.g. plain dataclass
    backend instances, whose generated __eq__ clears __hash__) skip the
    cache — those are the tiny-test paths where retracing is cheap."""
    try:
        per_anchor = _PROGRAM_CACHE.setdefault(anchor, {})
        fn = per_anchor.get(cache_key)
    except TypeError:  # unweakrefable anchor or unhashable key component
        return build()
    if fn is None:
        fn = per_anchor[cache_key] = build()
    return fn


def _params_key(params) -> tuple:
    return tuple(dataclasses.astuple(params))


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
    mcts_fresh_expansion: bool = False,
    noise: InjectedNoise | None = None,
    jit: bool = True,
    dispatch: str = "whole",
    chunk_steps: int | None = None,
    cache_anchor: Any = None,
    cache_salt: tuple = (),
) -> SearchResult:
    """Run one search method end-to-end. z: [B, ...] unit-variance latents;
    the final image and score are always computed (edm/main.py:869-877).

    backend: a SearchBackend instance, or — with ``backend_args`` given — a
    factory called as ``backend(backend_args)`` inside the traced program so
    model parameters stay jit arguments instead of baked constants.

    noise: optional InjectedNoise overriding the keyed draws (the
    reference's precomputed_noise dict, edm/main.py:54,723-796); beam
    consumes the ``beam_noise`` field (the SD reference's per-beam
    candidate draws, pipeline_stable_diffusion.py:1080) and, with
    ``record_noises``, reports its per-step top-B candidate ids via
    ``best_noises`` ([steps, B, M] flat n*M+m ids).

    dispatch: "whole" compiles the entire search into ONE device program
    (fastest — no per-step launch overhead). "per_step" compiles one
    timestep and dispatches it num_steps times — identical results, but the
    device program is K-iterations big instead of steps*K, which large
    models need to stay inside compiler/runtime limits (zero_order and
    eps_greedy at K=20 on the 296M flagship; other methods' programs are
    already per-trajectory-sized and run whole). "chunked" is the middle
    point: ONE compiled lax.scan over ``chunk_steps`` timesteps, dispatched
    ceil(steps/chunk) times — per-dispatch launch overhead is amortized over
    the chunk while the device program stays chunk*K-sized. chunk_steps
    defaults to the largest divisor of num_steps <= 6 so a single compile
    covers every dispatch (a non-divisor chunk_steps pays one extra compile
    for the remainder chunk). "auto" picks chunked for the iterated methods
    when the model weights passed via backend_args exceed ~100M parameters.

    cache_anchor/cache_salt: the jitted search programs are memoized on
    ``backend``'s identity — a caller that rebuilds its factory closure per
    invocation (the SD pipeline's __call__) would otherwise retrace the
    whole program every call (tens of seconds at 860M scale). Pass a
    long-lived ``cache_anchor`` (e.g. the pipeline instance) plus a
    ``cache_salt`` tuple capturing every config value baked into the
    factory closure (steps, eta, guidance scale, shapes, scorer identity)
    so programs are shared across invocations."""
    params = params or SearchParams()
    if method not in METHODS:
        raise ValueError(f"unknown method {method!r}; expected one of {METHODS}")
    if dispatch not in ("whole", "per_step", "chunked", "auto"):
        raise ValueError(
            "dispatch must be 'whole', 'per_step', 'chunked', or 'auto', "
            f"got {dispatch!r}")
    factory_mode = backend_args is not _UNSET
    anchor = backend if cache_anchor is None else cache_anchor
    if dispatch == "auto":
        n_params = (
            sum(int(getattr(l, "size", 0))
                for l in jax.tree_util.tree_leaves(backend_args))
            if factory_mode else 0
        )
        dispatch = ("chunked"
                    if n_params > 100_000_000
                    and method in ("zero_order", "eps_greedy", "mcts")
                    else "whole")

    if dispatch in ("per_step", "chunked") and method in ("zero_order", "eps_greedy"):
        return _run_zero_order_chunked(
            method, backend, z, key, params,
            backend_args=backend_args, factory_mode=factory_mode,
            record_noises=record_noises, noise=noise, jit=jit,
            chunk=1 if dispatch == "per_step" else chunk_steps,
            anchor=anchor, salt=cache_salt,
        )
    if dispatch in ("per_step", "chunked") and method == "mcts":
        return _run_mcts_chunked(
            backend, z, key, params,
            backend_args=backend_args, factory_mode=factory_mode,
            rollout_batch=mcts_rollout_batch, noise=noise, jit=jit,
            chunk=1 if dispatch == "per_step" else chunk_steps,
            fresh_expansion=mcts_fresh_expansion,
            anchor=anchor, salt=cache_salt,
        )

    def go(z, key, bargs, inj):
        be = backend(bargs) if factory_mode else backend
        noises = None
        if method == "naive":
            x = naive_sample(be, z, key, noise=inj)
        elif method == "rejection":
            x, _ = rejection_search(be, z, key, params.N, noise=inj)
        elif method == "beam":
            r = beam_search(be, z, key, params, noise=inj, record=record_noises)
            x, noises = r.x, r.picks
        elif method == "mcts":
            x = mcts_search(be, z, key, params, rollout_batch=mcts_rollout_batch,
                            noise=inj, fresh_expansion=mcts_fresh_expansion).x
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

    if jit:
        fn = _cached_program(
            anchor,
            ("whole", method, _params_key(params), record_noises,
             mcts_rollout_batch, mcts_fresh_expansion, factory_mode,
             cache_salt),
            lambda: jax.jit(go),
        )
    else:
        fn = go
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


def default_chunk_steps(num_steps: int, target: int = 6) -> int:
    """Largest divisor of num_steps <= target: every dispatch reuses ONE
    compiled chunk program (no remainder-length second compile). 18 steps ->
    6 (3 dispatches); 50 -> 5; a prime step count degrades to 1 (= per_step)."""
    for c in range(min(target, num_steps), 0, -1):
        if num_steps % c == 0:
            return c
    return 1


def _chunk_schedule(num_steps: int, chunk: int | None):
    c = chunk if chunk else default_chunk_steps(num_steps)
    c = max(1, min(int(c), num_steps))
    starts, lengths = [], []
    i = 0
    while i < num_steps:
        starts.append(i)
        lengths.append(min(c, num_steps - i))
        i += lengths[-1]
    return starts, lengths


def _run_zero_order_chunked(
    method, backend, z, key, params, *, backend_args, factory_mode,
    record_noises, noise, jit, chunk, anchor=None, salt=(),
):
    """zero_order/eps_greedy with one device dispatch per chunk of timesteps
    (chunk=1 == the old per_step mode). The chunk start index is a traced
    scalar, so one compile serves every equal-length chunk; a lax.scan over
    the chunk amortizes the per-dispatch launch/tunnel overhead that made
    per_step 3.5x slower than the steady-state expansion unit."""
    import functools

    import jax.numpy as jnp

    from diffusion_tts_tpu.search.zero_order import zero_order_timestep

    eps_val = params.eps if method == "eps_greedy" else 0.0

    def run_chunk(bargs, x, start, key, inj, *, length):
        be = backend(bargs) if factory_mode else backend

        def body(x, off):
            return zero_order_timestep(
                be, x, key, start + off, params, explore_eps=eps_val,
                record_noises=record_noises, noise=inj,
            )

        return jax.lax.scan(body, x, jnp.arange(length, dtype=jnp.int32))

    def finish(bargs, x):
        be = backend(bargs) if factory_mode else backend
        images = be.final_images(x)
        return images, be.score(images)

    # donate the carried latents: each dispatch rebinds x, so in-place
    # update keeps per-step memory flat (matches the whole-program scan)
    anchor = backend if anchor is None else anchor
    base_key = ("zo_chunk", method, _params_key(params), record_noises,
                factory_mode, salt)

    def chunk_fn(length):
        def build():
            f = functools.partial(run_chunk, length=length)
            return jax.jit(f, donate_argnums=(1,)) if jit else f

        if not jit:
            return build()
        return _cached_program(anchor, base_key + (length,), build)

    finish_fn = (
        _cached_program(anchor, ("finish", factory_mode, salt),
                        lambda: jax.jit(finish))
        if jit else finish
    )
    bargs = backend_args if factory_mode else None
    be0 = backend(backend_args) if factory_mode else backend

    x = be0.init_latents(z)
    noises = []
    for start, length in zip(*_chunk_schedule(be0.num_steps, chunk)):
        x, nz = chunk_fn(length)(bargs, x, jnp.asarray(start, jnp.int32), key, noise)
        if record_noises:
            noises.append(nz)
    images, score = finish_fn(bargs, x)

    scorer = getattr(be0, "scorer", None)
    if scorer is not None and not getattr(scorer, "final_score_is_exact", True):
        score = be0.score(jax.device_get(images))
    return SearchResult(
        x=x, images=images, score=score,
        best_noises=jnp.concatenate(noises, axis=0) if record_noises else None,
    )


def _run_mcts_chunked(
    backend, z, key, params, *, backend_args, factory_mode, rollout_batch,
    noise, jit, chunk, fresh_expansion=False, anchor=None, salt=(),
):
    """MCTS with one device dispatch per chunk of timesteps (chunk=1 == the
    old per_step mode) — the tree arena stays on device between dispatches;
    only the scan over chunks moves to the host. The flagship MCTS program
    is by far the largest single program (every timestep embeds expansion +
    full rollouts-to-terminal), so its chunk default is the per_step-safe 1
    unless the caller asks for more."""
    import functools

    import jax.numpy as jnp

    from diffusion_tts_tpu.search.mcts import (
        mcts_init, mcts_result, mcts_timestep,
    )

    def init(bargs, z, key, inj):
        be = backend(bargs) if factory_mode else backend
        return mcts_init(be, z, key, params, rollout_batch=rollout_batch, noise=inj)

    def run_chunk(bargs, tree, noise_tab, start, key, *, length):
        be = backend(bargs) if factory_mode else backend

        def body(tree, off):
            return mcts_timestep(be, tree, noise_tab, key, start + off, params,
                                 rollout_batch=rollout_batch,
                                 fresh_expansion=fresh_expansion), None

        tree, _ = jax.lax.scan(body, tree, jnp.arange(length, dtype=jnp.int32))
        return tree

    def finish(bargs, tree):
        be = backend(bargs) if factory_mode else backend
        x = mcts_result(tree).x
        images = be.final_images(x)
        return x, images, be.score(images)

    # donate the tree arena (arg 1): the [B, MAXN, *feat] states buffer is
    # the dominant allocation; without donation every dispatch double-
    # buffers it (noise_tab, arg 2, is reused across steps — not donated)
    anchor = backend if anchor is None else anchor
    base_key = ("mcts_chunk", _params_key(params), rollout_batch,
                fresh_expansion, factory_mode, salt)

    def chunk_fn(length):
        def build():
            f = functools.partial(run_chunk, length=length)
            return jax.jit(f, donate_argnums=(1,)) if jit else f

        if not jit:
            return build()
        return _cached_program(anchor, base_key + (length,), build)

    if jit:
        init_fn = _cached_program(
            anchor, base_key + ("init",), lambda: jax.jit(init))
        finish_fn = _cached_program(
            anchor, base_key + ("finish",), lambda: jax.jit(finish))
    else:
        init_fn, finish_fn = init, finish
    bargs = backend_args if factory_mode else None
    be0 = backend(backend_args) if factory_mode else backend

    tree, noise_tab = init_fn(bargs, z, key, noise)
    # MCTS device programs are rollout-sized; default to per_step-safe 1.
    for start, length in zip(*_chunk_schedule(be0.num_steps, chunk or 1)):
        tree = chunk_fn(length)(bargs, tree, noise_tab,
                                jnp.asarray(start, jnp.int32), key)
    x, images, score = finish_fn(bargs, tree)

    scorer = getattr(be0, "scorer", None)
    if scorer is not None and not getattr(scorer, "final_score_is_exact", True):
        score = be0.score(jax.device_get(images))
    return SearchResult(x=x, images=images, score=score, best_noises=None)


__all__ = ["run_search", "SearchResult", "METHODS", "default_chunk_steps"]

"""Microbench: in-loop RNG cost on the current backend.

Context (PARITY round-3 note 6): the profiled flagship search shows
~128 ms of device IDLE per K-iteration. Each iteration draws two
[N, B, H, W, C] standard normals (directions + fresh candidates) with
keyed threefry. If threefry lowers to scalar-unit-heavy code on this
backend, the TensorCore sits idle while the draws run — which the
trace reports as IDLE, not as an op.

This bench times, per iteration of a length-`iters` scan:
  a) threefry normal draws at the search's shapes (production path)
  b) the same draws with the 'rbg' PRNG (XLA RngBitGenerator — the
     TPU's hardware RNG path)
  c) no draws at all (carry-only scan floor)
each summed into the carry so nothing is dead-code eliminated.

Usage: JAX_PLATFORMS=... python tools/rng_microbench.py [--N 4 --B 8
           --res 64 --ch 3 --iters 100 --reps 3]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--ch", type=int, default=3)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    shape = (args.N, args.B, args.res, args.res, args.ch)
    nelem = 1
    for s in shape:
        nelem *= s

    def body_draws(key):
        def body(c, k):
            kk = jax.random.fold_in(key, k)
            dirs = jax.random.normal(jax.random.fold_in(kk, 1), shape, jnp.float32)
            fresh = jax.random.normal(jax.random.fold_in(kk, 2), shape, jnp.float32)
            scales = jax.random.uniform(jax.random.fold_in(kk, 3), (args.N, args.B))
            bern = jax.random.uniform(jax.random.fold_in(kk, 4), (args.N,))
            return (c + dirs.sum() + fresh.sum() + scales.sum() + bern.sum()), None

        return body

    def body_nodraws(_key):
        def body(c, k):
            return c + jnp.float32(k), None

        return body

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(key, mode):
        body = body_nodraws(key) if mode == "none" else body_draws(key)
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(args.iters))
        return c

    results = {}
    for mode, impl in (("threefry", "threefry2x32"), ("rbg", "rbg"), ("none", None)):
        key = jax.random.key(0, impl=impl) if impl else jax.random.key(0)
        walls = []
        for _ in range(args.reps + 1):
            t0 = time.perf_counter()
            run(key, "none" if mode == "none" else "draw").block_until_ready()
            walls.append(time.perf_counter() - t0)
        per_iter = walls[-1] / args.iters
        results[mode] = per_iter
        print(
            f"{mode:9s} walls {', '.join(f'{w:.3f}' for w in walls)} s"
            f"  -> {per_iter * 1e3:8.3f} ms/iter"
            f"  ({2 * nelem * 4 / per_iter / 1e9:7.2f} GB/s of normals)"
            if mode != "none"
            else f"{mode:9s} walls {', '.join(f'{w:.3f}' for w in walls)} s"
            f"  -> {per_iter * 1e3:8.3f} ms/iter (loop floor)"
        )
    print(
        f"threefry/rbg per-iter ratio: {results['threefry'] / results['rbg']:.1f}x"
    )


if __name__ == "__main__":
    main()

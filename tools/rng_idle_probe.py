"""Attribute the flagship search's in-program idle time (PARITY r3 note 6).

The profiled steady-state flagship search shows 37.7% device IDLE
(~128 ms/K-iteration) that the expansion-unit bench (1.7% idle) does not.
The candidate suspect is the in-loop keyed RNG (threefry draws per
iteration). This probe runs the SAME search twice in-process, both ways:

  internal : keyed draws inside the compiled program (production path)
  injected : every draw precomputed via record_zero_order_draws and passed
             as arrays (InjectedNoise) — ZERO in-loop RNG, same outputs

and reports both steady-state walls. If `injected` is materially faster,
the idle is the RNG path; otherwise it is loop/runtime overhead.

Usage: python tools/rng_idle_probe.py [--arch imagenet64] [--K 20]
           [--seeds 0,1,2,3,4,5,6,7] [--dispatch chunked]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="imagenet64")
    ap.add_argument("--steps", type=int, default=18)
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--K", type=int, default=20)
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    ap.add_argument("--dispatch", default="chunked")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, load_network
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.search import record_zero_order_draws, run_search
    from diffusion_tts_tpu.search.backend import EDMSearchBackend
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    from diffusion_tts_tpu.utils.config import SearchParams

    enable_compilation_cache()
    net, variables = load_network(args.arch)
    cfg = NET_CONFIGS[args.arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    seeds = [int(s) for s in args.seeds.split(",")]
    b = len(seeds)
    labels = jnp.eye(label_dim)[jnp.asarray(seeds) % label_dim] if label_dim else None
    params = SearchParams(N=args.N, K=args.K)

    def make_backend(v):
        denoise = lambda x, s: net.apply(
            v, x, s,
            jnp.tile(labels, (x.shape[0] // b, 1)) if labels is not None else None,
        )
        sampler = EDMHeunSampler(denoise=denoise, num_steps=args.steps,
                                 S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003)
        return EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer())

    z = jnp.stack([
        jax.random.normal(jax.random.key(s), (res, res, ch)) for s in seeds
    ])
    key = jax.random.key(1234)
    draws = jax.tree_util.tree_map(
        jnp.asarray,
        record_zero_order_draws(key, args.steps, params, (b, res, res, ch)))
    jax.block_until_ready(draws.pivots)

    results = {}
    for mode, inj in (("internal", None), ("injected", draws)):
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = run_search("eps_greedy", make_backend, z, key, params,
                           backend_args=variables, dispatch=args.dispatch,
                           noise=inj)
            r.score.block_until_ready()
            walls.append(time.perf_counter() - t0)
        results[mode] = (walls, float(np.asarray(r.score).mean()))
        print(f"{mode:9s} walls: {', '.join(f'{w:.1f}' for w in walls)} s "
              f"(steady {walls[-1]:.1f})  reward {results[mode][1]:.5f}")
    speedup = results["internal"][0][-1] / results["injected"][0][-1]
    print(f"injected/internal steady-state speedup: {speedup:.2f}x "
          f"({'RNG is the idle source' if speedup > 1.15 else 'RNG is NOT the idle source'})")


if __name__ == "__main__":
    main()

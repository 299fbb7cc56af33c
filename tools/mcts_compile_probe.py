"""Measure MCTS end-to-end compile (trace + lower + XLA compile) time.

PARITY.md gap 5: the mcts program at the 56M cifar10 config took ~16 min to
compile on the TPU backend. This probe times the same program's compile on
the current backend so structural changes to search/mcts.py can be compared
cheaply (CPU) before paying a TPU compile.

Usage: [JAX_PLATFORMS=cpu] python tools/mcts_compile_probe.py
           [--arch cifar10] [--steps 18] [--S 8] [--N 4] [--rollout-batch 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar10")
    ap.add_argument("--steps", type=int, default=18)
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--rollout-batch", type=int, default=None)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--run", action="store_true", help="also execute one search")
    ap.add_argument("--shared-trace", action="store_true",
                    help="trace the Heun pair's denoiser once via a 2-iter "
                         "scan (EDMHeunSampler.trace_denoise_once)")
    args = ap.parse_args()

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, load_network
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.search.backend import EDMSearchBackend
    from diffusion_tts_tpu.search.mcts import mcts_search
    from diffusion_tts_tpu.utils.config import SearchParams

    # Deliberately NO persistent compile cache: we are timing the compile.
    net, variables = load_network(args.arch)
    cfg = NET_CONFIGS[args.arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    seeds = [int(s) for s in args.seeds.split(",")]
    b = len(seeds)
    labels = jnp.eye(label_dim)[jnp.asarray(seeds) % label_dim] if label_dim else None
    params = SearchParams(N=args.N, K=1, B=2, S=args.S)

    def go(v, z, key):
        denoise = lambda x, s: net.apply(
            v, x, s,
            jnp.tile(labels, (x.shape[0] // b, 1)) if labels is not None else None,
        )
        sampler = EDMHeunSampler(denoise=denoise, num_steps=args.steps,
                                 S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003,
                                 trace_denoise_once=args.shared_trace)
        be = EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer())
        return mcts_search(be, z, key, params,
                           rollout_batch=args.rollout_batch).x

    z = jax.random.normal(jax.random.key(0), (b, res, res, ch))
    key = jax.random.key(1)

    t0 = time.perf_counter()
    lowered = jax.jit(go).lower(variables, z, key)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    print(f"arch={args.arch} steps={args.steps} S={args.S} N={args.N} "
          f"rb={args.rollout_batch}")
    print(f"lower_s={t_lower:.1f} compile_s={t_compile:.1f}")
    if mem is not None:
        print(f"temp_bytes={getattr(mem, 'temp_size_in_bytes', '?')} "
              f"argument_bytes={getattr(mem, 'argument_size_in_bytes', '?')}")
    if args.run:
        t0 = time.perf_counter()
        out = compiled(variables, z, key)
        jax.block_until_ready(out)
        print(f"run_s={time.perf_counter() - t0:.1f}")


if __name__ == "__main__":
    main()

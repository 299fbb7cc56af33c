"""Reward-at-fixed-NFE benchmark: the north-star comparison (BASELINE.md).

Runs every search method on one configuration, counts denoiser NFEs
analytically (SURVEY.md §6 cost model), and reports reward, NFE, wallclock,
and reward-per-kNFE — the table the reference never ships.

Usage (CPU smoke / TPU):
  python tools/reward_bench.py [--arch tiny|cifar10|imagenet64]
      [--weights ckpt.npz] [--scorer brightness|compressibility]
      [--steps 18] [--N 4] [--K 20] [--seeds 0,1] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


from diffusion_tts_tpu.search.nfe import nfe_per_sample as nfe_count  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="tiny")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--scorer", default="brightness",
                    choices=["brightness", "compressibility"])
    ap.add_argument("--steps", type=int, default=18)
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--K", type=int, default=5)
    ap.add_argument("--B", type=int, default=2)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--methods", default="naive,rejection,beam,zero_order,eps_greedy,mcts")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, load_network
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.scorers import BrightnessScorer, CompressibilityScorer
    from diffusion_tts_tpu.search.api import run_search
    from diffusion_tts_tpu.search.backend import EDMSearchBackend
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    from diffusion_tts_tpu.utils.config import SearchParams

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    net, variables = load_network(args.arch, args.weights)
    cfg = NET_CONFIGS[args.arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    seeds = [int(s) for s in args.seeds.split(",")]
    b = len(seeds)
    scorer = (BrightnessScorer() if args.scorer == "brightness"
              else CompressibilityScorer(mode="dct"))
    params = SearchParams(N=args.N, K=args.K, B=args.B, S=args.S)

    labels = (jnp.eye(label_dim)[jnp.asarray(seeds) % label_dim]
              if label_dim else None)

    def make_backend(v):
        denoise = lambda x, s: net.apply(
            v, x, s,
            jnp.tile(labels, (x.shape[0] // b, 1)) if labels is not None else None,
        )
        sampler = EDMHeunSampler(
            denoise=denoise, num_steps=args.steps, S_churn=40.0, S_min=0.05,
            S_max=50.0, S_noise=1.003,
        )
        return EDMSearchBackend(sampler=sampler, scorer=scorer)

    z = jnp.stack([
        jax.random.normal(jax.random.key(s), (res, res, ch)) for s in seeds
    ])

    rows = []
    base_reward = None
    for method in args.methods.split(","):
        key = jax.random.key(1234)
        t0 = time.perf_counter()
        r = run_search(method, make_backend, z, key, params,
                       backend_args=variables)
        r.score.block_until_ready()
        wall = time.perf_counter() - t0
        reward = float(r.score.mean())
        nfe = nfe_count(method, args.steps, params, backend="edm")
        if method == "naive":
            base_reward = reward
        rows.append(dict(
            method=method, reward=round(reward, 5), nfe_per_sample=nfe,
            wallclock_s=round(wall, 2),
            reward_gain_vs_naive=(round((reward - base_reward) / max(abs(base_reward), 1e-9), 4)
                                  if base_reward is not None else None),
        ))
        print(f"{method:11s} reward {reward:.5f}  NFE {nfe:6d}  wall {wall:7.2f}s")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(config=vars(args), rows=rows), f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

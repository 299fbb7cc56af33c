"""Reward-vs-NFE curves: sweep the search budget per method.

Produces the curve VERDICT/BASELINE call for: reward at increasing NFE
budget for each method family — K for the iterated methods, N for
rejection, B for beam, S for MCTS — one JSON with every point.

Usage:
  python tools/reward_curve.py [--arch cifar10] [--scorer compressibility]
      [--steps 18] [--seeds 0..7] [--json REWARDS_curve.json]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar10")
    ap.add_argument("--scorer", default="compressibility")
    ap.add_argument("--steps", type=int, default=18)
    ap.add_argument("--seeds", default="0,1,2,3,4,5,6,7")
    ap.add_argument("--json", default=None)
    ap.add_argument("--quick", action="store_true", help="tiny sweep (CPU smoke)")
    args = ap.parse_args()

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, load_network
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.scorers import BrightnessScorer, CompressibilityScorer
    from diffusion_tts_tpu.search.api import run_search
    from diffusion_tts_tpu.search.backend import EDMSearchBackend
    from diffusion_tts_tpu.search.nfe import nfe_per_sample
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    from diffusion_tts_tpu.utils.config import SearchParams

    enable_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    net, variables = load_network(args.arch)
    cfg = NET_CONFIGS[args.arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    seeds = [int(s) for s in args.seeds.split(",")]
    b = len(seeds)
    scorer = (BrightnessScorer() if args.scorer == "brightness"
              else CompressibilityScorer(mode="jpeg"))
    labels = (jnp.eye(label_dim)[jnp.asarray(seeds) % label_dim]
              if label_dim else None)

    def make_backend(v):
        denoise = lambda x, s: net.apply(
            v, x, s,
            jnp.tile(labels, (x.shape[0] // b, 1)) if labels is not None else None,
        )
        sampler = EDMHeunSampler(denoise=denoise, num_steps=args.steps,
                                 S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003)
        return EDMSearchBackend(sampler=sampler, scorer=scorer)

    z = jnp.stack([
        jax.random.normal(jax.random.key(s), (res, res, ch)) for s in seeds
    ])

    if args.quick:
        sweep = [("eps_greedy", dict(K=2)), ("rejection", dict(N=2))]
    else:
        sweep = (
            [("naive", {})]
            + [("rejection", dict(N=n)) for n in (2, 4, 8)]
            + [("beam", dict(B=bb, N=4)) for bb in (2, 4)]
            + [("zero_order", dict(K=k, N=4)) for k in (2, 5, 20)]
            + [("eps_greedy", dict(K=k, N=4)) for k in (2, 5, 20)]
            + [("mcts", dict(S=s, N=4)) for s in (4, 8)]
        )

    rows = []
    for method, over in sweep:
        p = SearchParams().replace(**over)
        key = jax.random.key(1234)
        t0 = time.perf_counter()
        r = run_search(method, make_backend, z, key, p, backend_args=variables,
                       dispatch="auto")
        r.score.block_until_ready()
        wall = time.perf_counter() - t0
        per_seed = np.asarray(r.score, np.float64)
        row = dict(
            method=method, **over,
            reward=round(float(per_seed.mean()), 5),
            reward_std=round(float(per_seed.std()), 5),
            nfe_per_sample=nfe_per_sample(method, args.steps, p, backend="edm"),
            wallclock_s=round(wall, 2),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json:
        meta = dict(
            config=vars(args),
            weights="RANDOM-INIT (no pretrained weights in this environment)",
            device=str(jax.devices()[0].device_kind),
            rows=rows,
        )
        with open(args.json, "w") as f:
            json.dump(meta, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

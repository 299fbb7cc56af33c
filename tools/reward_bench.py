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
                    choices=["brightness", "compressibility", "compressibility_dct"])
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"],
                    help="model compute dtype; bf16 matches bench.py's "
                         "flagship unit (MXU native, ~2x HBM traffic saved)")
    ap.add_argument("--steps", type=int, default=18)
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--K", type=int, default=5)
    ap.add_argument("--B", type=int, default=2)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--eps", type=float, default=0.4)
    ap.add_argument("--lambda_", type=float, default=0.15)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--methods", default="naive,rejection,beam,zero_order,eps_greedy,mcts")
    ap.add_argument("--dispatch", default="auto",
                    choices=["auto", "whole", "per_step", "chunked"],
                    help="auto: chunked dispatch for zero_order/eps_greedy on "
                         "the large archs (keeps the device program chunk*K-sized)")
    ap.add_argument("--chunk_steps", type=int, default=None,
                    help="timesteps per dispatch for dispatch=chunked")
    ap.add_argument("--mcts_rollout_batch", type=int, default=None,
                    help="rollouts sharing pre-phase UCB stats (None = S, the "
                         "reference's batched form; 1 = textbook sequential)")
    ap.add_argument("--mcts_fresh_expansion", action="store_true",
                    help="draw new expansion noise per (timestep, phase, "
                         "iteration) instead of the reference's per-depth table")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run each method this many times in-process; wall "
                         "of the LAST run excludes one-time trace + "
                         "executable-cache-load overhead (steady state)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the LAST repeat "
                         "into DIR (inspect with tools/trace_summary.py)")
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

    net, variables = load_network(
        args.arch, args.weights,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32)
    cfg = NET_CONFIGS[args.arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    seeds = [int(s) for s in args.seeds.split(",")]
    b = len(seeds)
    if args.scorer == "brightness":
        scorer = BrightnessScorer()
    elif args.scorer == "compressibility":
        # mode="jpeg": the final reported score is always the EXACT byte
        # count (run_search re-scores finals on the host when the in-loop
        # path had to fall back to the DCT proxy; edm/scorers.py:207-244).
        scorer = CompressibilityScorer(mode="jpeg")
    else:
        scorer = CompressibilityScorer(mode="dct")
    params = SearchParams(N=args.N, K=args.K, B=args.B, S=args.S,
                          eps=args.eps, lambda_=args.lambda_)

    labels = (jnp.eye(label_dim)[jnp.asarray(seeds) % label_dim]
              if label_dim else None)

    def make_backend(v, shared_trace=False):
        denoise = lambda x, s: net.apply(
            v, x, s,
            jnp.tile(labels, (x.shape[0] // b, 1)) if labels is not None else None,
        )
        sampler = EDMHeunSampler(
            denoise=denoise, num_steps=args.steps, S_churn=40.0, S_min=0.05,
            S_max=50.0, S_noise=1.003, trace_denoise_once=shared_trace,
        )
        return EDMSearchBackend(sampler=sampler, scorer=scorer)

    z = jnp.stack([
        jax.random.normal(jax.random.key(s), (res, res, ch)) for s in seeds
    ])

    rows = []
    base_reward = None
    for method in args.methods.split(","):
        key = jax.random.key(1234)
        # mcts: share the denoiser trace across the Heun pair (its programs
        # are the trace/compile-heaviest of the six methods)
        factory = (lambda v: make_backend(v, shared_trace=True)) \
            if method == "mcts" else make_backend
        walls = []
        reps = max(args.repeat, 1)
        for rep in range(reps):
            profiling = args.profile and rep == reps - 1
            if profiling:
                from diffusion_tts_tpu.utils.misc import start_trace

                start_trace(args.profile)
            t0 = time.perf_counter()
            r = run_search(method, factory, z, key, params,
                           backend_args=variables, dispatch=args.dispatch,
                           chunk_steps=args.chunk_steps,
                           mcts_rollout_batch=args.mcts_rollout_batch,
                           mcts_fresh_expansion=args.mcts_fresh_expansion)
            r.score.block_until_ready()
            walls.append(time.perf_counter() - t0)
            if profiling:
                from diffusion_tts_tpu.utils.misc import stop_trace

                stop_trace()
                print(f"  profiler trace written to {args.profile}/")
        wall = walls[-1]  # steady state: traces + cache loads amortized
        if len(walls) > 1:
            print(f"  walls: {', '.join(f'{w:.1f}' for w in walls)} s "
                  "(first includes trace + executable-cache load)")
        per_seed = np.asarray(r.score, np.float64)
        reward = float(per_seed.mean())
        nfe = nfe_count(method, args.steps, params, backend="edm")
        if method == "naive":
            base_reward = reward
        rows.append(dict(
            method=method, reward=round(reward, 5),
            reward_std=round(float(per_seed.std()), 5),
            per_seed=[round(float(v), 5) for v in per_seed],
            nfe_per_sample=nfe,
            wallclock_s=round(wall, 2),
            reward_gain_vs_naive=(round((reward - base_reward) / max(abs(base_reward), 1e-9), 4)
                                  if base_reward is not None else None),
        ))
        print(f"{method:11s} reward {reward:.5f}  NFE {nfe:6d}  wall {wall:7.2f}s")
    if args.json:
        meta = dict(
            config=vars(args),
            weights=args.weights or "RANDOM-INIT (no pretrained weights in this environment)",
            # mode="jpeg" finals are exact even when the in-loop score had to
            # use the on-device DCT proxy (run_search host re-score).
            final_score_exact=args.scorer != "compressibility_dct",
            in_loop_proxy=(args.scorer == "compressibility"
                           and not getattr(scorer, "final_score_is_exact", True)),
            device=str(jax.devices()[0].device_kind),
        )
        with open(args.json, "w") as f:
            json.dump(dict(**meta, rows=rows), f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

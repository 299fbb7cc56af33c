"""SD reward-at-matched-NFE benchmark (VERDICT r4 #2): the reference's
headline text-to-image experiment — search-method reward tables — produced
by our pipeline at the REAL 860M SD-1.5 geometry (random-init weights,
honestly labeled: this environment is zero-egress).

Counterpart of the reference's SD experiments (sd/main.py:24-55 loops three
scorers over the modified pipeline; main.py:134-143 adds the rejection
restart loop), with the comparison the reference never ships: every method
at a MATCHED denoiser-NFE budget (search.nfe.nfe_per_sample, backend="sd"):

    naive                         18 NFE   (the no-search reference row)
    rejection  N=21              378 NFE
    zero_order K=5  N=4          378 NFE
    eps_greedy K=5  N=4          378 NFE
    beam       B=2  N=9          360 NFE   (closest lattice point)

--curve sweeps eps_greedy K in {1,2,5,10,20} for the reward-vs-NFE curve.

NFE convention: nfe_per_sample counts CFG-COMBINED model calls (one per
candidate lookahead + one base per step — what the search algorithm
spends); BASELINE.md's e2e bench (tools/sd_e2e_bench.py) counts raw UNet
forwards, x2 for the CFG batch, so its figures are 2x these at the same
config. Both are stated on every artifact; don't mix them.

Scorers: brightness (sd/scorers.py:25-76 luminance), dct (the on-device
JPEG-compressibility proxy), clip (CLIP similarity at the REAL
ViT-L/14 geometry — random-init weights + random text features; the
geometry/throughput row for sd/scorers.py:149-213).

Usage:
  python tools/sd_reward_bench.py --scorer brightness --seeds 0,1,2,3 --json out.json
  python tools/sd_reward_bench.py --scorer clip --seeds 0,1,2,3 --json out.json
  python tools/sd_reward_bench.py --curve --json curve.json
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

import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.search.nfe import nfe_per_sample  # noqa: E402
from diffusion_tts_tpu.utils.config import SearchParams  # noqa: E402

# Matched-budget method table (18 steps): ~378 NFE/sample each.
METHOD_PARAMS = {
    "naive": SearchParams(),
    "rejection": SearchParams(N=21),
    "zero_order": SearchParams(N=4, K=5, lambda_=0.15),
    "eps_greedy": SearchParams(N=4, K=5, eps=0.4, lambda_=0.15),
    "beam": SearchParams(B=2, N=9),
    # optional 6th row (not in the default set): S=2 rollouts/timestep is
    # the closest lattice point ABOVE the budget — 18*(4+2*(4+18)) = 864
    # NFE; reported, not matched (the reference's S=8 default would be
    # 3,528)
    "mcts": SearchParams(N=4, S=2),
}

# Real openai/clip-vit-large-patch14 geometry (sd/scorers.py:160) for the
# random-init CLIP reward: full-size image tower + text projection.
CLIP_L14_CONFIG = dict(
    vision_config=dict(hidden_size=1024, intermediate_size=4096,
                       num_attention_heads=16, num_hidden_layers=24,
                       image_size=224, patch_size=14),
    text_config=dict(hidden_size=768, intermediate_size=3072,
                     num_attention_heads=12, num_hidden_layers=12,
                     max_position_embeddings=77, vocab_size=49408),
    projection_dim=768,
)


def build_pipeline(tiny: bool):
    """Full 860M SD-1.5 geometry with host-synthesized random weights
    (sd_e2e_bench's loading pattern — per-param jax.random would compile
    hundreds of remote programs)."""
    from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
    from diffusion_tts_tpu.models.sd_vae import AutoencoderKL
    from diffusion_tts_tpu.pipelines.sd_pipeline import (
        StableDiffusionSearchPipeline,
    )

    if tiny:
        return StableDiffusionSearchPipeline.tiny_random(seed=0), 32
    rng = np.random.default_rng(0)

    def host_random(tree):
        return jax.tree_util.tree_map(
            lambda s: jax.device_put(
                (rng.standard_normal(s.shape, dtype=np.float32) * 0.02
                 ).astype(s.dtype)), tree)

    unet = UNet2DConditionModel(dtype=jnp.bfloat16)
    vae = AutoencoderKL(dtype=jnp.bfloat16)
    lat1 = jnp.zeros((2, 64, 64, 4), jnp.float32)
    uparams = host_random(jax.eval_shape(lambda: unet.init(
        {"params": jax.random.key(0)}, lat1, jnp.zeros((2,), jnp.float32),
        jnp.zeros((2, 77, 768), jnp.float32))))
    vparams = host_random(jax.eval_shape(lambda: vae.init(
        {"params": jax.random.key(1)},
        jnp.zeros((1, 512, 512, 3), jnp.float32), jax.random.key(0))))
    return StableDiffusionSearchPipeline(
        unet=unet, unet_params=uparams, vae=vae, vae_params=vparams), 768


def build_scorer(name: str, tiny: bool):
    """(scorer, scorer_cond, final_exact)."""
    from diffusion_tts_tpu.scorers import (
        BrightnessScorer, CLIPScorer, CompressibilityScorer,
    )

    if name == "brightness":
        return BrightnessScorer(), None
    if name == "dct":
        return CompressibilityScorer(mode="dct"), None
    if name == "clip":
        scorer = (CLIPScorer.random_init(seed=7) if tiny
                  else CLIPScorer.random_init(seed=7, **CLIP_L14_CONFIG))
        rng = np.random.default_rng(7)
        vocab = scorer.model.config.text_config.vocab_size
        ids = rng.integers(0, vocab, (1, 16))
        return scorer, scorer.text_features(jnp.asarray(ids))
    raise ValueError(name)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scorer", default="brightness",
                    choices=["brightness", "dct", "clip"])
    ap.add_argument("--steps", type=int, default=18)  # sd/main.py:49
    ap.add_argument("--seeds", default="0,1,2,3")
    ap.add_argument("--methods",
                    default="naive,rejection,zero_order,eps_greedy,beam")
    ap.add_argument("--curve", action="store_true",
                    help="eps_greedy reward-vs-NFE sweep instead of the "
                         "method table")
    ap.add_argument("--curve-K", default="1,2,5,10,20")
    ap.add_argument("--dispatch", default="auto")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tiny = args.tiny or jax.default_backend() == "cpu"
    pipe, ctx_dim = build_pipeline(tiny)
    scorer, scorer_cond = build_scorer(args.scorer, tiny)
    seeds = [int(s) for s in args.seeds.split(",")]
    t_all = time.perf_counter()

    def hb(msg):
        print(f"[sd_reward_bench +{time.perf_counter() - t_all:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    def run(method, sp, seed):
        rng = np.random.default_rng(10_000 + seed)
        emb = jnp.asarray(rng.standard_normal((1, 77, ctx_dim)), jnp.float32)
        t0 = time.perf_counter()
        _, scores = pipe(
            prompt_embeds=emb, num_inference_steps=args.steps, method=method,
            score_function=scorer, scorer_cond=scorer_cond, params=sp,
            key=jax.random.key(1234 + seed), dispatch=args.dispatch,
        )
        return float(np.asarray(scores)[0]), time.perf_counter() - t0

    if args.curve:
        jobs = [("eps_greedy",
                 SearchParams(N=4, K=int(k), eps=0.4, lambda_=0.15),
                 f"eps_greedy_K{k}")
                for k in args.curve_K.split(",")]
    else:
        jobs = [(m, METHOD_PARAMS[m], m) for m in args.methods.split(",")]

    rows, base_reward = [], None
    for method, sp, label in jobs:
        per_seed, walls = [], []
        for i, seed in enumerate(seeds):
            s, w = run(method, sp, seed)
            per_seed.append(s)
            walls.append(w)
            hb(f"{label} seed {seed}: reward {s:.5f} wall {w:.1f}s"
               + (" (incl. compile)" if i == 0 else ""))
        reward = float(np.mean(per_seed))
        if label == "naive":
            base_reward = reward
        nfe = nfe_per_sample(method, args.steps, sp, backend="sd")
        rows.append(dict(
            method=label, reward=round(reward, 5),
            reward_std=round(float(np.std(per_seed)), 5),
            per_seed=[round(v, 5) for v in per_seed],
            nfe_per_sample=nfe,
            params={"N": sp.N, "K": sp.K, "B": sp.B, "eps": sp.eps},
            wall_first_s=round(walls[0], 1),
            wall_steady_s=round(min(walls[1:]) if len(walls) > 1 else walls[0], 1),
            reward_gain_vs_naive=(
                round((reward - base_reward) / max(abs(base_reward), 1e-9), 4)
                if base_reward is not None else None),
        ))
        print(f"{label:16s} reward {reward:.5f}  NFE {nfe:5d}  "
              f"steady {rows[-1]['wall_steady_s']:6.1f}s")

    out = dict(
        config=dict(scorer=args.scorer, steps=args.steps, seeds=seeds,
                    curve=args.curve, dispatch=args.dispatch),
        weights="RANDOM-INIT (zero-egress environment; geometry is the "
                "real 860M SD-1.5 + full CLIP-L/14 for --scorer clip)",
        device=str(jax.devices()[0].device_kind),
        rows=rows,
    )
    print(json.dumps({"rows": len(rows), "scorer": args.scorer}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

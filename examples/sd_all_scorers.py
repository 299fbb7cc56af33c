"""Standalone SD driver: run one prompt through all three SD scorers.

Counterpart of the reference's sd/main.py (59 LoC): loads the SD pipeline,
loops over brightness / compressibility / CLIP scorers at 18 inference
steps with the MASTER_PARAMS defaults (sd/main.py:24-39,49), saves one PNG
per scorer and prints the best scores.

Usage:
  python examples/sd_all_scorers.py --sd-path /path/to/sd15 \
      --prompt "A beautiful landscape" [--method eps_greedy]
Zero-egress smoke (tiny random pipeline):
  python examples/sd_all_scorers.py --tiny
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sd-path", default=None)
    p.add_argument("--clip-path", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--prompt", default="A beautiful landscape")
    p.add_argument("--method", default="eps_greedy")
    p.add_argument("--steps", type=int, default=18)  # sd/main.py:49
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--outdir", default=".")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from diffusion_tts_tpu.pipelines import StableDiffusionSearchPipeline
    from diffusion_tts_tpu.scorers import (
        BrightnessScorer, CLIPScorer, CompressibilityScorer,
    )
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    from diffusion_tts_tpu.utils.config import SearchParams

    enable_compilation_cache()
    if args.tiny or not args.sd_path:
        pipe = StableDiffusionSearchPipeline.tiny_random()
    else:
        pipe = StableDiffusionSearchPipeline.from_pretrained(args.sd_path)

    clip = (CLIPScorer.from_pretrained(args.clip_path) if args.clip_path
            else CLIPScorer.random_init())
    scorers = {
        "brightness": (BrightnessScorer(), None),
        "compressibility": (CompressibilityScorer(max_size=150000.0), None),
        "clip": (clip, None),
    }
    # MASTER_PARAMS (sd/main.py:32-39)
    params = SearchParams(N=4, K=20, B=2, S=8, lambda_=0.15, eps=0.4)

    kwargs = {}
    if pipe.tokenizer is not None:
        kwargs["prompt"] = args.prompt
        tok = pipe.tokenizer([args.prompt], padding="max_length", truncation=True,
                             max_length=77, return_tensors="np")
        scorers["clip"] = (clip, clip.text_features(tok["input_ids"]))
    else:
        import jax.numpy as jnp

        kwargs["prompt_embeds"] = jax.random.normal(
            jax.random.key(args.seed + 1), (1, 7, pipe.unet.cross_attention_dim)
        )
        # no tokenizer: give the CLIP reward random token ids so the tiny
        # demo still exercises the text-image similarity path
        ids = jax.random.randint(jax.random.key(args.seed + 2), (1, 8), 0, 999)
        scorers["clip"] = (clip, clip.text_features(ids))

    os.makedirs(args.outdir, exist_ok=True)
    for name, (scorer, cond) in scorers.items():
        images, scores = pipe(
            num_inference_steps=args.steps, score_function=scorer,
            scorer_cond=cond, method=args.method, params=params,
            key=jax.random.key(args.seed), **kwargs,
        )
        out = os.path.join(args.outdir, f"sd_{args.method}_{name}.png")
        Image.fromarray((np.asarray(images[0]) * 255).astype(np.uint8)).save(out)
        print(f"[{name}] saved {out}  best score: {float(scores[0]):.5f}")


if __name__ == "__main__":
    main()

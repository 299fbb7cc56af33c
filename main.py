"""Unified CLI: test-time scaling of diffusion models via noise trajectory
search, TPU-native.

Flag surface matches the reference CLI (reference main.py:80-98):
  --backend {edm,sd} --scorer {brightness,compressibility,clip,imagenet}
  --method {naive,rejection,beam,mcts,zero_order,eps_greedy}
  --N --K --B --S --lambda_ --eps --seed --output --prompt
plus zero-egress loading flags (--weights/--sd-path/--arch) replacing the
reference's hub/CDN downloads (main.py:115-121,163-165).

Backend/scorer validation follows the reference (main.py:103-107):
imagenet is EDM-only, clip is SD-only.
"""
from __future__ import annotations

import argparse
import os
import sys

# Honor an explicit JAX_PLATFORMS even though the environment's
# sitecustomize pins a TPU platform.
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def get_scorer(backend: str, name: str, args):
    from diffusion_tts_tpu import scorers

    if name == "brightness":
        return scorers.BrightnessScorer(), False
    if name == "compressibility":
        # EDM 64x64 -> max_size=3000 (edm/scorers.py:177); SD 512 -> 150000
        # (sd/scorers.py:79)
        max_size = 3000.0 if backend == "edm" else 150000.0
        return scorers.CompressibilityScorer(
            quality=80, max_size=max_size, mode=args.compressibility_mode
        ), False
    if name == "imagenet":
        if args.classifier_weights:
            return scorers.ImageNetScorer.from_torch_checkpoint(args.classifier_weights), True
        print("WARNING: no --classifier-weights; ImageNet scorer uses random init "
              "(zero-egress environment cannot download 64x64_classifier.pt)")
        return scorers.ImageNetScorer(), True
    if name == "clip":
        if args.clip_path:
            return scorers.CLIPScorer.from_pretrained(args.clip_path), True
        print("WARNING: no --clip-path; CLIP scorer uses a tiny random model")
        return scorers.CLIPScorer.random_init(), True
    raise ValueError(f"unknown scorer {name}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Unified Diffusion Image Generator (EDM/SD), TPU-native",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--backend", choices=["edm", "sd"], required=True)
    parser.add_argument("--scorer", choices=["brightness", "compressibility", "clip", "imagenet"], required=True)
    parser.add_argument("--method", default="naive",
                        help="naive, rejection, beam, mcts, zero_order, eps_greedy")
    parser.add_argument("--prompt", default="YOUR PROMPT HERE",
                        help="Prompt for SD; '||' separates multiple prompts "
                             "batched through one search")
    parser.add_argument("--prompt-repeat", type=int, default=1,
                        help="replicate the prompt batch N times (fills the "
                             "MXU: SD batch 1 runs at ~55%% of batch-2 "
                             "throughput per image)")
    parser.add_argument("--output", default=None, help="Output filename (default: auto)")
    parser.add_argument("--N", type=int, default=4)
    parser.add_argument("--lambda_", type=float, default=0.15)
    parser.add_argument("--eps", type=float, default=0.4)
    parser.add_argument("--K", type=int, default=20)
    parser.add_argument("--B", type=int, default=2)
    parser.add_argument("--S", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--device", default="tpu", help="kept for CLI parity; jax picks devices")
    # zero-egress loading (replaces hub/CDN downloads)
    parser.add_argument("--arch", default="imagenet64", help="EDM arch: imagenet64|cifar10|tiny")
    parser.add_argument("--weights", default=None, help="EDM checkpoint .npz (tools/export_edm_checkpoint.py)")
    parser.add_argument("--sd-path", default=None, help="local SD-1.5 diffusers directory")
    parser.add_argument("--classifier-weights", default=None, help="local 64x64_classifier.pt")
    parser.add_argument("--clip-path", default=None, help="local CLIP checkpoint dir")
    parser.add_argument("--num-steps", type=int, default=None,
                        help="override: EDM default 18 (main.py:164), SD default 50 (main.py:137)")
    parser.add_argument("--compressibility-mode", choices=["jpeg", "dct"], default="jpeg")
    parser.add_argument("--record-noises", action="store_true",
                        help="dump selected noise trajectories for dmap analysis")
    parser.add_argument("--dtype", choices=["fp32", "bf16"], default="fp32",
                        help="EDM model compute dtype; bf16 is the TPU-native "
                             "fast path (~1.5x end-to-end search throughput "
                             "on the 296M flagship, tools/reward_bench.py)")
    args = parser.parse_args(argv)

    # validation (reference main.py:103-107)
    if args.backend == "sd" and args.scorer == "imagenet":
        raise ValueError("imagenet scorer is only available for edm backend")
    if args.backend == "edm" and args.scorer == "clip":
        raise ValueError("clip scorer is only available for sd backend")

    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from diffusion_tts_tpu.utils.config import SearchParams

    params = SearchParams(N=args.N, K=args.K, B=args.B, S=args.S,
                          lambda_=args.lambda_, eps=args.eps)
    scorer, needs_cond = get_scorer(args.backend, args.scorer, args)

    if args.backend == "sd":
        from diffusion_tts_tpu.pipelines import StableDiffusionSearchPipeline

        if args.sd_path:
            pipe = StableDiffusionSearchPipeline.from_pretrained(args.sd_path)
        else:
            print("WARNING: no --sd-path; using a tiny random SD pipeline "
                  "(zero-egress environment cannot download SD-1.5)")
            pipe = StableDiffusionSearchPipeline.tiny_random()
        # Prompt batching: '||'-separated prompts and/or --prompt_repeat fan
        # out the sample axis — on TPU a single 64x64-latent UNet forward
        # underfills the MXU (27 NFE/s at batch 1 vs 49 at batch 2,
        # tools/sd_bench.py), so batching prompts is nearly free throughput.
        prompts = [p.strip() for p in args.prompt.split("||")] * max(args.prompt_repeat, 1)
        kwargs = {}
        scorer_cond = None
        if pipe.tokenizer is not None:
            if args.scorer == "clip" and hasattr(scorer, "text_features"):
                tok = pipe.tokenizer(prompts, padding="max_length", truncation=True,
                                     max_length=77, return_tensors="np")
                scorer_cond = scorer.text_features(tok["input_ids"])
            kwargs["prompt"] = prompts
        else:
            import jax.numpy as jnp

            kwargs["prompt_embeds"] = jax.random.normal(
                jax.random.key(args.seed + 1),
                (len(prompts), 7, pipe.unet.cross_attention_dim),
            )
        images, scores = pipe(
            num_inference_steps=args.num_steps or 50,
            score_function=scorer, scorer_cond=scorer_cond, method=args.method,
            params=params, key=jax.random.key(args.seed),
            record_noises=args.record_noises, **kwargs,
        )
        outname = args.output or f"sd_{args.method}_{args.scorer}.png"
        _save_png(images[0], outname)
        for i in range(1, len(prompts)):
            base, ext = (outname.rsplit(".", 1) + ["png"])[:2]
            _save_png(images[i], f"{base}_p{i}.{ext}")
        best = ", ".join(f"{float(s):.5f}" for s in scores)
        print(f"\n[SD] Saved: {outname} ({len(prompts)} prompt(s))\n"
              f"Best score(s): {best}\n")
    else:
        from diffusion_tts_tpu.backends.edm_entry import generate_image_grid

        outname = args.output or f"edm_{args.method}_{args.scorer}.png"
        import jax.numpy as jnp

        generate_image_grid(
            arch=args.arch, weights=args.weights, dest_path=outname,
            scorer=scorer, scorer_needs_labels=needs_cond, method=args.method,
            params=params, seed=args.seed, num_steps=args.num_steps or 18,
            S_churn=40, S_min=0.05, S_max=50, S_noise=1.003,
            dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
            record_noises=args.record_noises,
        )
        print(f"\n[EDM] Saved: {outname}\n")


def _save_png(image01, path):
    import numpy as np
    from PIL import Image

    arr = (np.asarray(image01) * 255.0).astype(np.uint8)
    Image.fromarray(arr.squeeze()).save(path)


if __name__ == "__main__":
    main()

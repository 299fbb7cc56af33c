"""Static MXU roofline for a model forward (VERDICT r2 #8 / r3 #1a).

Walks the jaxpr of a model forward, extracts every convolution and matmul
with its shapes, and computes the per-op MXU tiling efficiency on a 128x128
systolic array (v5e, bf16): an op whose output-channel (lane) or
contraction dimension is not a multiple of 128 pays padding — e.g. the ADM
res-64 level's 192 output channels fill 1.5 lane tiles, so its ceiling is
75% regardless of software. The FLOP-weighted mean of these efficiencies is
the architecture's single-chip MXU ceiling; comparing a bench's measured
fraction-of-peak against it separates "kernel/fusion headroom" from
"inherent channel-geometry padding".

Arches: EDM configs from backends.edm_entry.NET_CONFIGS (imagenet64,
cifar10, ...), plus the SD geometry that sd_e2e_bench's SOL fraction is
defined against: `sd_unet` (one 860M UNet forward — a CFG forward for one
sample is --batch 2) and `sd_vae` (one VAE decode at --batch latents, the
scoring decode pipeline_stable_diffusion.py:1413-1414 runs per candidate).

Usage: [JAX_PLATFORMS=cpu] python tools/roofline.py [--arch imagenet64]
           [--batch 16] [--json out.json]
       python tools/roofline.py --arch sd_unet --batch 8
       python tools/roofline.py --arch sd_vae --batch 4
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from diffusion_tts_tpu.utils.roofline import (
    analyze_fn,
    canonical_formulation,
    sd_unet_flops,
    sd_vae_decode_flops,
)


def _edm_report(arch: str, batch: int) -> dict:
    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, PRECONDS

    cfg = dict(NET_CONFIGS[arch])
    net = PRECONDS["edm"](dtype=jnp.bfloat16, **cfg)
    res, ch, ld = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    x = jnp.zeros((batch, res, res, ch), jnp.float32)
    sigma = jnp.full((batch,), 10.0, jnp.float32)
    lab = jnp.zeros((batch, ld)) if ld else None
    shapes = jax.eval_shape(lambda: net.init(
        {"params": jax.random.key(0)}, x, sigma, lab))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    # canonical trace: on TPU machines the qkv/flash attention would
    # otherwise lower as Pallas custom calls, whose matmuls the walker
    # cannot see (PARITY note 9a)
    with canonical_formulation():
        return analyze_fn(lambda v: net.apply(v, x, sigma, lab), variables)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="imagenet64",
                    help="EDM config name, or sd_unet / sd_vae")
    ap.add_argument("--batch", type=int, default=16,
                    help="images per forward (bench.py's B*N expansion batch;"
                         " sd_unet: the CFG-doubled batch; sd_vae: latents)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if args.arch == "sd_unet":
        from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel

        rep = sd_unet_flops(UNet2DConditionModel(dtype=jnp.bfloat16), args.batch)
    elif args.arch == "sd_vae":
        from diffusion_tts_tpu.models.sd_vae import AutoencoderKL

        rep = sd_vae_decode_flops(AutoencoderKL(dtype=jnp.bfloat16), args.batch)
    else:
        rep = _edm_report(args.arch, args.batch)

    total, ceiling, rows = rep["total_flops"], rep["ceiling"], rep["ops"]
    from diffusion_tts_tpu.utils.roofline import roofline_seconds

    peak, bw = 197e12, 819e9  # v5e bf16 / HBM
    bw_ceiling = total / roofline_seconds(rep, peak, bw) / peak
    print(f"arch={args.arch} batch={args.batch} "
          f"total_matmul_flops={total:.3e} per forward")
    print(f"{'op':<58} {'flops%':>7} {'mxu_eff':>8}")
    for key, f, e, _by in rows[:18]:
        print(f"{str(key):<58} {100 * f / total:>6.1f}% {e:>8.3f}")
    print(f"\nFLOP-weighted MXU tiling ceiling: {ceiling:.3f}")
    print(f"bandwidth-aware ceiling (v5e 197TF/819GBs): {bw_ceiling:.3f}")
    print("(tiling: every matmul at its padding-limited rate, infinite HBM;"
          " bandwidth-aware: per matmul max(MXU time, mandatory operand/"
          "result traffic) — non-matmul passes (unfused GN, softmax, "
          "elementwise) push the real ceiling lower)")
    if args.json:
        import json

        with open(args.json, "w") as fjson:
            json.dump({
                "arch": args.arch, "batch": args.batch,
                "total_matmul_flops": total, "mxu_tiling_ceiling": ceiling,
                "hbm_aware_ceiling_v5e": bw_ceiling,
                "ops": [{"key": str(k), "flops_frac": f / total, "mxu_eff": e,
                         "hbm_bytes": by}
                        for k, f, e, by in rows],
            }, fjson, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

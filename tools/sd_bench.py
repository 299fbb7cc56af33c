"""SD-backend throughput: the eps-greedy lookahead unit on SD-1.5 geometry.

Counterpart of bench.py for the second backend: one compiled program runs
N candidate DDIM steps + same-t lookahead UNet forwards + VAE decode +
scoring — the unit the reference executes as a sequential Python loop with
a host sync per candidate (pipeline_stable_diffusion.py:1371-1425).
Random weights at the real SD-1.5 architecture (860M-param UNet, 64x64x4
latents); CFG doubles every UNet batch, matching the reference pipeline.

Usage: python tools/sd_bench.py [--batch 1] [--n 4] [--iters 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1, help="prompt batch")
    ap.add_argument("--n", type=int, default=4, help="candidates per iteration")
    ap.add_argument("--iters", type=int, default=4, help="iterations per dispatch")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one steady-state "
                         "dispatch into DIR (tools/trace_summary.py reads it)")
    args = ap.parse_args()

    from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
    from diffusion_tts_tpu.models.sd_vae import AutoencoderKL
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tiny = args.tiny or jax.default_backend() == "cpu"
    if tiny:
        unet = UNet2DConditionModel(
            sample_size=8, block_out_channels=(32, 64), layers_per_block=1,
            cross_attention_dim=64, attention_head_dim=8,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        )
        vae = AutoencoderKL(block_out_channels=(16, 32), layers_per_block=1,
                            norm_num_groups=8)
        res, ctx_dim = 8, 64
    else:
        unet = UNet2DConditionModel(dtype=jnp.bfloat16)
        vae = AutoencoderKL(dtype=jnp.bfloat16)
        res, ctx_dim = 64, 768

    b, n = args.batch, args.n
    rng = np.random.default_rng(0)

    def host_init(model, *shape_args):
        return jax.tree_util.tree_map(
            lambda s: jax.device_put(
                (rng.standard_normal(s.shape, dtype=np.float32) * 0.02).astype(s.dtype)
            ),
            jax.eval_shape(lambda: model.init(jax.random.key(0), *shape_args)),
        )

    lat1 = jnp.zeros((2 * b, res, res, 4), jnp.float32)
    t1 = jnp.zeros((2 * b,), jnp.float32)
    ctx1 = jnp.zeros((2 * b, 77, ctx_dim), jnp.float32)
    uvars = host_init(unet, lat1, t1, ctx1)
    vvars = jax.tree_util.tree_map(
        lambda s: jax.device_put(
            (rng.standard_normal(s.shape, dtype=np.float32) * 0.02).astype(s.dtype)
        ),
        jax.eval_shape(lambda: vae.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, res, res, 4), jnp.float32), method=vae.decode)),
    )

    ctx = jnp.asarray(rng.standard_normal((2 * b, 77, ctx_dim)), jnp.float32)

    @jax.jit
    def run(uvars, vvars, lat, eps):
        def body(lat, k):
            # candidate expansion: N DDIM-perturbed latents, CFG'd lookahead
            cands = lat[None] + 0.05 * eps * (k + 1.0)  # [N, B, ...]
            flat = cands.reshape((n * b,) + lat.shape[1:])
            inp = jnp.concatenate([flat, flat])  # CFG pair
            tt = jnp.full((2 * n * b,), 500.0)
            cc = jnp.tile(ctx, (n, 1, 1))
            pred = unet.apply(uvars, inp, tt, cc)
            uncond, cond = jnp.split(pred, 2)
            noise_pred = uncond + 7.5 * (cond - uncond)
            pred_x0 = flat - 0.8 * noise_pred
            images = vae.apply(vvars, pred_x0 / 0.18215, method=vae.decode)
            scores = images.mean(axis=(1, 2, 3)).reshape(n, b)
            best = jnp.argmax(scores, axis=0)
            new_lat = jnp.take_along_axis(
                cands, best.reshape((1, b, 1, 1, 1)), axis=0
            )[0]
            return new_lat.astype(lat.dtype), None

        out, _ = jax.lax.scan(body, lat, jnp.arange(args.iters, dtype=jnp.float32))
        return out

    lat = jnp.asarray(rng.standard_normal((b, res, res, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((n, b, res, res, 4)), jnp.float32)

    t0 = time.perf_counter()
    run(uvars, vvars, lat, eps).block_until_ready()
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4 if not tiny else 1):
        t0 = time.perf_counter()
        run(uvars, vvars, lat, eps).block_until_ready()
        best = min(best, time.perf_counter() - t0)

    if args.profile:
        from diffusion_tts_tpu.utils.misc import start_trace, stop_trace

        start_trace(args.profile)
        run(uvars, vvars, lat, eps).block_until_ready()
        stop_trace()
        print(f"profiler trace written to {args.profile}/", file=sys.stderr)

    # NFE = UNet forwards (CFG pair = 2 forwards, the reference's accounting)
    nfe = args.iters * n * b * 2
    out = dict(
        metric="sd15_eps_greedy_lookahead_NFE_per_s_per_chip" if not tiny
               else "sd_tiny (cpu smoke)",
        value=round(nfe / best, 2), unit="NFE/s",
        batch=b, n_candidates=n, compile_s=round(compile_s, 1),
        device=str(jax.devices()[0].device_kind),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

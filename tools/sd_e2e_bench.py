"""SD end-to-end search wall: the REAL pipeline at full SD-1.5 geometry.

Completes the benchmark matrix (bench.py = EDM unit, reward_bench = EDM
end-to-end, sd_bench = SD lookahead unit): this runs
`StableDiffusionSearchPipeline.__call__` — prompt embeds -> DDIM schedule
-> the actual search engine -> VAE decode -> scorer — at the real 860M
UNet + VAE geometry with host-synthesized random weights (zero-egress),
and reports steady-state walls over --repeat calls.

NFE convention matches BASELINE.md's derived cost model for the SD side:
steps x (1 + K*N*2) UNet forwards per sample for eps_greedy/zero_order
(the reference runs the identical work as sequential Python with a host
sync per candidate, pipeline_stable_diffusion.py:1371-1425).

Usage: python tools/sd_e2e_bench.py [--steps 18] [--K 5] [--N 4]
           [--method eps_greedy] [--repeat 3] [--batch 1]
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


PEAK_BF16_FLOPS = {
    "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
    "v6e": 918e12, "cpu": 1e12,
}
PEAK_HBM_BW = {
    "v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
    "v6e": 1640e9, "cpu": 100e9,
}


def _chip(table, default) -> float:
    kind = getattr(jax.devices()[0], "device_kind", "cpu").lower()
    for k, v in table.items():
        if k in kind:
            return v
    return default


def _peak_flops() -> float:
    return _chip(PEAK_BF16_FLOPS, 197e12)


def _search_flops(unet, vae, *, steps, K, N, b) -> dict:
    """Matmul FLOPs of one eps_greedy/zero_order SD search __call__ (the
    SOL numerator): per step ONE base CFG UNet at batch 2b, then K
    iterations of (CFG lookahead at 2Nb + scoring decode at Nb), plus the
    final decode (pipeline_stable_diffusion.py:1341-1435 semantics; our
    commit step reuses the winner's x_next). Returns two ceilings on the
    achievable SOL fraction: the FLOP-weighted MXU tiling bound (padding
    only — pretends HBM is infinite) and the bandwidth-aware bound
    (per matmul max(padded MXU time, mandatory operand/result HBM traffic)
    — the honest speed-of-light for the bandwidth-heavy 512x512 decoder).
    Each geometry is traced at its TRUE batch so weight streaming
    amortizes per call, not per image."""
    from diffusion_tts_tpu.utils.roofline import (
        practical_seconds,
        roofline_seconds,
        sd_unet_flops,
        sd_vae_decode_flops,
    )

    peak, bw = _peak_flops(), _chip(PEAK_HBM_BW, 819e9)
    # Canonical traces define the numerator and the structural ceilings;
    # the "executed" traces (Pallas off, algorithmic rewrites kept) define
    # the op mix the practical time model runs over. Round 4's bench
    # traced with the Pallas routes ACTIVE, whose custom-call matmuls are
    # invisible to the jaxpr walker — it undercounted the numerator ~3.4x
    # (published sol 0.188 at 61.27 NFE/s was really ~0.64).
    u_base = sd_unet_flops(unet, 2 * b)
    u_look = sd_unet_flops(unet, 2 * N * b)
    d_score = sd_vae_decode_flops(vae, N * b)
    d_final = sd_vae_decode_flops(vae, b)
    calls = [(u_base, steps), (u_look, steps * K), (d_score, steps * K),
             (d_final, 1)]
    ex_calls = [(sd_unet_flops(unet, 2 * b, formulation="executed"), steps),
                (sd_unet_flops(unet, 2 * N * b, formulation="executed"),
                 steps * K),
                (sd_vae_decode_flops(vae, N * b, formulation="executed"),
                 steps * K),
                (sd_vae_decode_flops(vae, b, formulation="executed"), 1)]
    total = sum(r["total_flops"] * n for r, n in calls)
    ideal_tile = sum(r["total_flops"] / r["ceiling"] * n for r, n in calls)
    ideal_bw_s = sum(roofline_seconds(r, peak, bw) * n for r, n in calls)
    prac_s = sum(practical_seconds(r, peak) * n for r, n in ex_calls)
    dec = d_score["total_flops"] * steps * K + d_final["total_flops"]
    return {
        "total_flops": total,
        "decode_flop_share": dec / total,
        "mxu_tiling_ceiling": total / ideal_tile,
        "hbm_aware_ceiling": total / ideal_bw_s / peak,
        # lane/VPU-aware envelope (roofline.practical_ceiling semantics):
        # canonical FLOPs over the practical-time model of the EXECUTED op
        # mix — the SOL fraction a maximally-tuned program can realistically
        # reach on one v5e. sol near this value means "at the envelope",
        # NOT 1/sol-fold headroom (VERDICT r4 weak #5).
        "practical_ceiling": total / prac_s / peak,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=18)
    ap.add_argument("--K", type=int, default=5)
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--eps", type=float, default=0.4)
    ap.add_argument("--method", default="eps_greedy")
    ap.add_argument("--batch", type=int, default=1, help="prompt batch")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the LAST repeat "
                         "(summarize with tools/trace_summary.py)")
    args = ap.parse_args()

    from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
    from diffusion_tts_tpu.models.sd_vae import AutoencoderKL
    from diffusion_tts_tpu.pipelines.sd_pipeline import StableDiffusionSearchPipeline
    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    from diffusion_tts_tpu.utils.config import SearchParams

    enable_compilation_cache()
    tiny = args.tiny or jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    def host_random(tree):
        return jax.tree_util.tree_map(
            lambda s: jax.device_put(
                (rng.standard_normal(s.shape, dtype=np.float32) * 0.02).astype(s.dtype)
            ),
            tree,
        )

    if tiny:
        pipe = StableDiffusionSearchPipeline.tiny_random(seed=0)
        ctx_dim = 32
    else:
        unet = UNet2DConditionModel(dtype=jnp.bfloat16)
        vae = AutoencoderKL(dtype=jnp.bfloat16)
        ctx_dim = 768
        lat1 = jnp.zeros((2, 64, 64, 4), jnp.float32)
        uparams = host_random(jax.eval_shape(lambda: unet.init(
            {"params": jax.random.key(0)}, lat1, jnp.zeros((2,), jnp.float32),
            jnp.zeros((2, 77, ctx_dim), jnp.float32))))
        vparams = host_random(jax.eval_shape(lambda: vae.init(
            {"params": jax.random.key(1)},
            jnp.zeros((1, 512, 512, 3), jnp.float32), jax.random.key(0))))
        pipe = StableDiffusionSearchPipeline(
            unet=unet, unet_params=uparams, vae=vae, vae_params=vparams)

    emb = jnp.asarray(
        rng.standard_normal((args.batch, 77, ctx_dim)), jnp.float32)
    sp = SearchParams(N=args.N, K=args.K, eps=args.eps)
    # ONE scorer instance across calls: the scorer is part of the pipeline's
    # program-cache salt, so a fresh instance per call would retrace the
    # whole search program every time.
    scorer = BrightnessScorer()

    walls, score = [], None
    reps = max(args.repeat, 1)
    t_start = time.perf_counter()

    def hb(msg):
        # stderr heartbeat so a driver-side timeout leaves diagnosable tail
        # output (VERDICT r4 weak #1 / next-round #1b)
        print(f"[sd_e2e_bench +{time.perf_counter() - t_start:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    hb(f"start: {args.method} steps={args.steps} K={args.K} N={args.N} "
       f"device={jax.devices()[0].device_kind} (first call pays any cold "
       f"compile; warm-cache call is ~wall below)")
    for rep in range(reps):
        profiling = args.profile and rep == reps - 1
        if profiling:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        images, scores = pipe(
            prompt_embeds=emb, num_inference_steps=args.steps,
            method=args.method, score_function=scorer,
            params=sp, key=jax.random.key(42),
        )
        score = float(np.asarray(scores)[0])
        walls.append(time.perf_counter() - t0)
        hb(f"rep {rep + 1}/{reps} wall {walls[-1]:.1f}s")
        if profiling:
            jax.profiler.stop_trace()
            print(f"  profiler trace written to {args.profile}/", file=sys.stderr)

    steady = min(walls[1:]) if len(walls) > 1 else walls[0]
    # BASELINE.md derived cost model (SD): steps x (1 + K*N*2) per sample
    nfe = args.steps * (1 + args.K * args.N * 2) * args.batch
    out = {
        "metric": "sd15_e2e_search_NFE_per_s_per_chip",
        "unit": "NFE/s",
        "method": args.method,
        "steps": args.steps, "K": args.K, "N": args.N, "batch": args.batch,
        "nfe": nfe,
        "walls_s": [round(w, 2) for w in walls],
        "steady_wall_s": round(steady, 2),
        "value": round(nfe / steady, 2),
        "score": round(score, 5),
        "device": jax.devices()[0].device_kind,
        "weights": "RANDOM-INIT (zero-egress environment)",
    }
    if not tiny and args.method in ("eps_greedy", "zero_order"):
        # SD speed-of-light accounting (VERDICT r3 #1a): matmul FLOPs the
        # search actually executes / wall / chip peak, plus the
        # padding-limited ceiling of the same mix.
        fl = _search_flops(pipe.unet, pipe.vae, steps=args.steps, K=args.K,
                           N=args.N, b=args.batch)
        out["sol"] = round(fl["total_flops"] / steady / _peak_flops(), 4)
        out["vs_baseline"] = out["sol"]  # bench.py --sd driver-line contract
        out["mxu_tiling_ceiling"] = round(fl["mxu_tiling_ceiling"], 4)
        out["hbm_aware_ceiling"] = round(fl["hbm_aware_ceiling"], 4)
        out["sol_of_hbm_ceiling"] = round(out["sol"] / fl["hbm_aware_ceiling"], 4)
        out["practical_ceiling"] = round(fl["practical_ceiling"], 4)
        out["sol_of_practical_ceiling"] = round(
            out["sol"] / fl["practical_ceiling"], 4)
        out["decode_flop_share"] = round(fl["decode_flop_share"], 4)
        out["total_matmul_flops"] = fl["total_flops"]
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()

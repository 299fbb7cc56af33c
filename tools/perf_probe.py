"""Perf probe: where does the flagship forward spend its time?

Measures the 296M ImageNet-64 ADM (the bench.py model) single-forward
throughput on the current backend across batch sizes and model variants,
reporting achieved TFLOP/s and fraction of bf16 speed-of-light. This is the
profiling companion to bench.py: the variants isolate attention cost and
GroupNorm fusion so BENCH regressions/improvements can be attributed.

Usage:
  python tools/perf_probe.py --batches 1,2,4,8,16
  python tools/perf_probe.py --variant noattn     # attention ablated
  python tools/perf_probe.py --tiny               # CPU smoke

Reference hot loop being modeled: edm/main.py:800-857 (the candidate-
expansion denoise batch).
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


def build_net(variant: str, tiny: bool):
    from diffusion_tts_tpu.models.preconds import EDMPrecond

    if tiny:
        kwargs = dict(model_channels=32, channel_mult=(1, 2), num_blocks=1,
                      attn_resolutions=(8,), dropout=0.0)
        res, label_dim = 16, 10
    else:
        kwargs = dict(model_channels=192, channel_mult=(1, 2, 3, 4), num_blocks=3,
                      attn_resolutions=(32, 16, 8), dropout=0.0)
        res, label_dim = 64, 1000
    if variant == "noattn":
        kwargs["attn_resolutions"] = ()
    net = EDMPrecond(
        img_resolution=res, img_channels=3, label_dim=label_dim,
        model_type="DhariwalUNet", model_kwargs=kwargs, dtype=jnp.bfloat16,
    )
    return net, res, label_dim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8,16")
    ap.add_argument("--variant", default="full", choices=["full", "noattn"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--inner", type=int, default=8,
                    help="forwards chained per timed dispatch (hides tunnel latency)")
    args = ap.parse_args()

    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import PEAK_BF16_FLOPS, _peak_flops  # reuse the bench's peak table

    tiny = args.tiny or jax.default_backend() == "cpu"
    net, res, label_dim = build_net(args.variant, tiny)
    peak = _peak_flops() if not tiny else PEAK_BF16_FLOPS["cpu"]

    rng = np.random.default_rng(1)
    x1 = jnp.zeros((1, res, res, 3), jnp.float32)
    variables = jax.tree_util.tree_map(
        lambda s: jax.device_put(
            (rng.standard_normal(s.shape, dtype=np.float32) * 0.05).astype(s.dtype)
        ),
        jax.eval_shape(lambda: net.init(
            {"params": jax.random.key(0)}, x1, jnp.ones((1,)),
            jnp.zeros((1, label_dim)))),
    )

    batches = [int(s) for s in args.batches.split(",")]

    # One cost analysis at the smallest batch; conv/matmul FLOPs scale
    # linearly in batch, so flops(b) = b/b0 * flops(b0). Saves one (multi-
    # minute, remote) compile per batch size.
    b0 = batches[0]
    x0 = jnp.zeros((b0, res, res, 3), jnp.float32)
    sig0 = jnp.full((b0,), 10.0, jnp.float32)
    lab0 = jnp.eye(label_dim, dtype=jnp.float32)[np.arange(b0) % label_dim]
    fwd = jax.jit(lambda v, xx: net.apply(v, xx, sig0, lab0))
    cost = fwd.lower(variables, x0).compile().cost_analysis()
    flops_b0 = float(cost.get("flops", 0.0)) if cost else 0.0
    print(json.dumps({"flops_per_fwd_b1": flops_b0 / b0}), flush=True)

    results = []
    for b in batches:
        x = jnp.asarray(rng.standard_normal((b, res, res, 3)), jnp.float32)
        sigma = jnp.full((b,), 10.0, jnp.float32)
        labels = jnp.eye(label_dim, dtype=jnp.float32)[np.arange(b) % label_dim]

        inner = args.inner

        @jax.jit
        def run(v, x):
            def body(h, _):
                d = net.apply(v, h, sigma, labels)
                # feed output back in so XLA cannot elide iterations
                return d * 0.5 + x * 0.5, None

            out, _ = jax.lax.scan(body, x, None, length=inner)
            return out

        flops_per_fwd = flops_b0 / b0 * b
        t0 = time.perf_counter()
        run(variables, x).block_until_ready()  # compile
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run(variables, x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ms = best / inner * 1e3
        achieved = flops_per_fwd * inner / best
        row = {
            "batch": b,
            "ms_per_fwd": round(ms, 3),
            "img_per_s": round(b * inner / best, 1),
            "TFLOPs": round(achieved / 1e12, 2),
            "pct_sol": round(100 * achieved / peak, 1),
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"variant": args.variant, "rows": results}), flush=True)


if __name__ == "__main__":
    main()

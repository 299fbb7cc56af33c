"""Training backward-conv probe (VERDICT r4 #5): isolate the imagenet64
flagship's per-level 3x3-conv BACKWARD forms and A/B XLA's lowerings
against the stacked Pallas kernel where a formulation exists.

The training-perf stop decision (PARITY note 8t: 0.425 whole-step SOL,
convs ~62% of step time at ~0.65 of peak in XLA's backward lowerings)
rested on forward-geometry evidence (note 8e: Pallas loses at <=64^2).
This probe closes it with direct measurements of the backward forms:

  dgrad (grad-vs-input):  dx = conv3x3(dy, flip(W))       — EXACTLY a 3x3
      SAME conv, so the stacked Pallas kernel applies as-is (run with
      DTTS_CONV_MIN_SPATIAL overridden to admit the 64^2/32^2 shapes);
  wgrad (grad-vs-kernel): dW[ky,kx,c,k] = sum_{B,H,W} x * shift(dy)
      — a [BHW x C]^T @ [BHW x K] contraction per tap; no Pallas
      formulation exists in this repo (the stacked kernel's row-band
      pipeline has no reduction-over-rows output form), so XLA's rate is
      measured against the MXU tiling floor and reported.

Shapes: the DhariwalUNet-192 levels (64^2 x192, 32^2 x384, 16^2 x576,
8^2 x768) at the training micro-batch. Timing per the verify-skill rules:
one compiled lax.scan of ITERS dependent applications, scalar-fetch
warmup, best-of-reps.

Usage: python tools/conv_bwd_probe.py [--batch 32] [--iters 8] [--json out]
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

PEAK = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
        "v6e": 918e12}


def _peak():
    kind = getattr(jax.devices()[0], "device_kind", "cpu").lower()
    for k, v in PEAK.items():
        if k in kind:
            return v
    return 1e12


def conv_fwd(x, w):
    # plain same-dtype conv (the MXU accumulates bf16 dots in fp32 anyway);
    # preferred_element_type=fp32 would break the vjp transpose's operand
    # dtype matching
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_scan(fn, ops_args, iters, reps):
    """Wall of ONE compiled scan of `iters` dependent fn applications.
    fn: (carry_like,) -> carry_like (same shape/dtype so the scan carries)."""

    @jax.jit
    def run(a):
        def body(c, _):
            return fn(c), None

        out, _ = jax.lax.scan(body, a, jnp.arange(iters))
        return out

    # warm up with the SAME scalar fetch used for timing (verify-skill
    # timing trap #2: the first slice fetch compiles its own program)
    float(jnp.asarray(run(ops_args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.asarray(run(ops_args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from diffusion_tts_tpu.ops.pallas import conv3x3 as pc
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch
    peak = _peak()
    if args.tiny or jax.default_backend() == "cpu":
        levels = [(16, 128, 128)]
        b = min(b, 4)
    else:
        # DhariwalUNet-192 imagenet64 levels (models/edm_nets.py flagship)
        levels = [(64, 192, 192), (32, 384, 384), (16, 576, 576),
                  (8, 768, 768)]

    rng = np.random.default_rng(0)
    rows = []
    for res, cin, cout in levels:
        x = jax.device_put(rng.standard_normal(
            (b, res, res, cin), np.float32).astype(dt))
        w = jax.device_put((rng.standard_normal(
            (3, 3, cin, cout), np.float32) * 0.05).astype(dt))
        dy = jax.device_put(rng.standard_normal(
            (b, res, res, cout), np.float32).astype(dt))
        flops = 2.0 * b * res * res * 9 * cin * cout

        row = {"res": res, "cin": cin, "cout": cout, "batch": b,
               "gflops": round(flops / 1e9, 1)}

        # forward (context row)
        t = time_scan(lambda c: conv_fwd(c, w) if cin == cout else c,
                      x, args.iters, args.reps)
        row["fwd_xla_s"] = t
        row["fwd_xla_sol"] = round(flops / t / peak, 3)

        # dgrad via jax.vjp of the conv wrt input (XLA's own transpose form)
        _, vjp = jax.vjp(lambda xx: conv_fwd(xx, w), x)

        def dgrad(c):
            return vjp(c)[0].astype(c.dtype) if cin == cout else c

        t = time_scan(dgrad, dy, args.iters, args.reps)
        row["dgrad_xla_s"] = t
        row["dgrad_xla_sol"] = round(flops / t / peak, 3)

        # dgrad as an explicit conv with the flipped kernel — the form the
        # stacked Pallas kernel can run directly
        wflip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # [3,3,K,C]
        if (jax.default_backend() != "cpu"
                and cout % 128 == 0 and cin % 128 == 0 and res % 16 == 0):
            saved = pc._MIN_SPATIAL
            pc._MIN_SPATIAL = min(pc._MIN_SPATIAL, res)
            try:
                def dgrad_pallas(c):
                    return pc.conv3x3_same(c, wflip).astype(c.dtype)

                t = time_scan(dgrad_pallas, dy, args.iters, args.reps)
                row["dgrad_pallas_s"] = t
                row["dgrad_pallas_sol"] = round(flops / t / peak, 3)
            finally:
                pc._MIN_SPATIAL = saved
        else:
            row["dgrad_pallas_s"] = None  # lane-alignment ineligible

        # wgrad via jax.vjp wrt the kernel; carry is dy (same shape class)
        _, vjp_w = jax.vjp(lambda ww: conv_fwd(x, ww), w)

        def wgrad(c):
            g = vjp_w(c)[0]  # [3,3,cin,cout]
            # fold the kernel grad back into a dy-shaped carry so the scan
            # iterations stay dependent without shape change
            return c + jnp.mean(g).astype(c.dtype)

        t = time_scan(wgrad, dy, args.iters, args.reps)
        row["wgrad_xla_s"] = t
        row["wgrad_xla_sol"] = round(flops / t / peak, 3)

        rows.append(row)
        print(json.dumps(row))

    out = {"device": jax.devices()[0].device_kind, "dtype": args.dtype,
           "iters": args.iters, "rows": rows}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

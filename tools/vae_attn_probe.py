"""Probe: the VAE mid-block single-head attention [B, 4096, 1, 512] on the
flash kernel (bf16 K/V resident: 8 MB — fits VMEM, unlike the fp32 form's
~17 MB that produced round-4's compile-time OOM, PARITY 8j) vs the XLA
batched single-head path that note 8j left as the winner.

Context: the K-STREAMING flash variant measured 89-98 ms vs XLA's 5-9 ms
and was removed. This probes the PLAIN kernel (full K/V as one VMEM block,
K sliced with pl.ds inside the kernel), which became viable only for bf16
inputs, plus the round-4 softmax-VPU cuts (ones-column l, exp2 FMA).

Usage: python tools/vae_attn_probe.py [--b 4] [--t 4096] [--d 512]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--inner", type=int, default=10)
    args = ap.parse_args()

    from diffusion_tts_tpu.ops.attention import _xla_attention
    from diffusion_tts_tpu.ops.pallas.attention import flash_attention
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    shape = (args.b, args.t, 1, args.d)
    key = jax.random.key(0)
    q = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)
    flops = 4.0 * args.b * args.t * args.t * args.d

    def timeit(fn):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                return fn(c, k, v), None

            out, _ = jax.lax.scan(body, q, None, length=args.inner)
            return out

        # warm up with the same scalar fetch used in the timed region
        # (axon timing trap #2: the first slice fetch compiles remotely)
        float(jnp.sum(many(q, k, v)))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(jnp.sum(many(q, k, v)))
            best = min(best, time.perf_counter() - t0)
        return best / args.inner

    variants = [("xla", _xla_attention)]
    for tq, tk in ((256, 1024), (128, 1024), (256, 2048), (512, 1024)):
        variants.append((
            f"flash_{tq}_{tk}",
            lambda q, k, v, tq=tq, tk=tk: flash_attention(q, k, v, tq=tq, tk=tk),
        ))
    for name, fn in variants:
        try:
            dt = timeit(fn)
            print(json.dumps(dict(impl=name, ms=round(dt * 1e3, 3),
                                  tflops=round(flops / dt / 1e12, 1))), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps(dict(impl=name, error=str(e)[:160])), flush=True)


if __name__ == "__main__":
    main()

"""Probe: flash-attention backward kernels vs the materializing backward.

Correctness (bf16 grad parity vs _attention_bwd_explicit) and timing at
the EDM res-32 training shape ([16, 1024, 6, 64] — 8 such sites dominate
the imagenet64 train step's attention backward: 9.9 ms of
convert_element_type + 17 ms of backward dots in the round-4 trace).

Timing discipline per .claude/skills/verify/SKILL.md: scan inner loop,
warmup and sync with the same scalar value fetch.

Usage: python tools/attn_bwd_probe.py [--shape 16,1024,6,64] [--inner 20]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--shape", default="16,1024,6,64")
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from diffusion_tts_tpu.ops.pallas.attention import (
        _attention_bwd_explicit,
        _attention_reference,
        _flash_attention_vjp,
    )
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b, t, h, d = (int(s) for s in args.shape.split(","))
    shape = (b, t, h, d)
    key = jax.random.key(0)
    mk = lambda i: jax.random.normal(jax.random.fold_in(key, i), shape,
                                     jnp.bfloat16)
    q, k, v, g = mk(0), mk(1), mk(2), mk(3)
    o = jax.jit(_attention_reference)(q, k, v)

    # --- correctness ---
    ref = jax.jit(_attention_bwd_explicit)(q, k, v, g)
    got = jax.jit(lambda *a: _flash_attention_vjp(*a))(q, k, v, o, g)
    for name, a, r in zip(("dq", "dk", "dv"), got, ref):
        a32, r32 = np.asarray(a, np.float32), np.asarray(r, np.float32)
        denom = np.abs(r32).max() or 1.0
        rel = np.abs(a32 - r32).max() / denom
        print(f"{name}: max|delta|/max|ref| = {rel:.2e}")
        assert rel < 4e-2, (name, rel)

    # --- timing: explicit (materializing) vs flash kernels ---
    def timed(fn, label):
        @jax.jit
        def many(q, k, v, o, g):
            def body(c, _):
                dq, dk, dv = fn(c, k, v, o, g)
                # chain iterations through dq so no dispatch can be elided
                return (c + 1e-3 * dq.astype(jnp.float32)).astype(c.dtype), None

            out, _ = jax.lax.scan(body, q, None, length=args.inner)
            return out

        r = many(q, k, v, o, g)
        float(r[0, 0, 0, 0])  # warmup WITH the scalar fetch
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = many(q, k, v, o, g)
            float(r[0, 0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / args.inner)
        # flash backward: 7 T*T*d MXU passes (stats 1, dq 3, dkv 4)
        fl = 14.0 * b * h * t * t * d
        print(f"{label}: {best * 1e3:.3f} ms  ({fl / best / 1e12:.1f} "
              f"TFLOP/s at 7-pass accounting)")
        return best

    te = timed(lambda q_, k_, v_, o_, g_:
               _attention_bwd_explicit(q_, k_, v_, g_), "explicit bwd")
    tf = timed(lambda q_, k_, v_, o_, g_:
               _flash_attention_vjp(q_, k_, v_, o_, g_), "flash bwd  ")
    print(f"speedup: {te / tf:.2f}x")


if __name__ == "__main__":
    main()

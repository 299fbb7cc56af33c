"""Micro-bench: flash-attention tile sizes vs XLA attention at the EDM
res-32 shape ([B=16, T=1024, H=6, D=64] — the bench.py hot attention).

The post-qkv-fix profile shows each flash call at ~0.9 ms (~29 TFLOP/s,
15% of peak); this sweeps (tq, tk) and the XLA path to pick the routing.

Usage: python tools/attn_bench.py [--shape 16,1024,6,64]
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
    ap.add_argument("--shape", default="16,1024,6,64")
    ap.add_argument("--inner", type=int, default=20)
    args = ap.parse_args()

    from diffusion_tts_tpu.ops.attention import _xla_attention
    from diffusion_tts_tpu.ops.pallas.attention import flash_attention
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b, t, h, d = (int(s) for s in args.shape.split(","))
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, t, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, t, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, t, h, d), jnp.bfloat16)
    flops = 4.0 * b * h * t * t * d

    def timeit(fn):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                o = fn(c, k, v)
                return o, None
            out, _ = jax.lax.scan(body, q, None, length=args.inner)
            return out

        many(q, k, v).block_until_ready()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = many(q, k, v)
            _ = float(jnp.sum(out))  # value-fetch barrier
            best = min(best, time.perf_counter() - t0)
        return best / args.inner

    rows = []
    for name, fn in [
        ("xla", _xla_attention),
        ("flash_512_512", lambda q, k, v: flash_attention(q, k, v, tq=512, tk=512)),
        ("flash_1024_1024", lambda q, k, v: flash_attention(q, k, v, tq=1024, tk=1024)),
        ("flash_256_1024", lambda q, k, v: flash_attention(q, k, v, tq=256, tk=1024)),
        ("flash_512_1024", lambda q, k, v: flash_attention(q, k, v, tq=512, tk=1024)),
    ]:
        try:
            dt = timeit(fn)
            rows.append(dict(impl=name, ms=round(dt * 1e3, 3),
                             tflops=round(flops / dt / 1e12, 1)))
            print(json.dumps(rows[-1]), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps(dict(impl=name, error=str(e)[:100])), flush=True)


if __name__ == "__main__":
    main()

"""Probe: does XLA fuse per-channel moment reductions into a conv epilogue?

If sum/sum-of-squares over a conv's output costs ~nothing on top of the conv
itself, GroupNorm statistics can ride the conv's output write and the Pallas
GN kernel can skip its phase-0 read — turning the 3-HBM-pass GN into 2
passes (PARITY round-3 note 7's named next step).

Times, per shape, inside one lax.scan each:
  conv            : conv3x3 alone
  conv+moments    : conv3x3 + per-channel colsum/colsumsq of the output
  moments         : the reductions alone (the unfused upper bound)

Usage: python tools/conv_epilogue_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=30, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):  # best-of-reps: tunnel dispatch-latency spikes
        t0 = time.perf_counter()
        r = fn(*args)
        # value-fetch barrier (axon block_until_ready unreliable with queues)
        leaves = jax.tree_util.tree_leaves(r)
        float(leaves[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    import sys

    dt = jnp.bfloat16
    shapes = [
        (16, 64, 64, 192),
        (16, 32, 32, 384),
        (16, 16, 16, 576),
    ]
    if "--vae" in sys.argv:
        # SD VAE decoder geometry (the sd_bench lookahead decodes batch 4)
        shapes = [
            (4, 512, 512, 128),
            (4, 256, 256, 256),
            (4, 128, 128, 512),
        ]
    rng = np.random.default_rng(0)
    iters = 30

    for (b, h, w, c) in shapes:
        x = jax.device_put(rng.standard_normal((b, h, w, c), np.float32).astype(dt))
        k = jax.device_put(
            (rng.standard_normal((3, 3, c, c), np.float32) * 0.05).astype(dt))

        def conv(xx, kk):
            return jax.lax.conv_general_dilated(
                xx, kk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def conv_only(xx, kk):
            def body(carry, _):
                y = conv(xx + carry, kk)
                return y.mean(dtype=jnp.float32).astype(dt), y[0, 0, 0, :1]
            return jax.lax.scan(body, jnp.zeros((), dt), None, length=iters)

        @jax.jit
        def conv_moments(xx, kk):
            def body(carry, _):
                y = conv(xx + carry, kk)
                yf = y.astype(jnp.float32)
                cs = yf.sum(axis=(0, 1, 2))
                csq = (yf * yf).sum(axis=(0, 1, 2))
                return y.mean(dtype=jnp.float32).astype(dt), (cs[:1], csq[:1])
            return jax.lax.scan(body, jnp.zeros((), dt), None, length=iters)

        @jax.jit
        def moments_only(xx, kk):
            def body(carry, _):
                yf = (xx + carry).astype(jnp.float32)
                cs = yf.sum(axis=(0, 1, 2))
                csq = (yf * yf).sum(axis=(0, 1, 2))
                return cs.mean().astype(dt), (cs[:1], csq[:1])
            return jax.lax.scan(body, jnp.zeros((), dt), None, length=iters)

        t_conv = timed(conv_only, x, k, iters=iters)
        t_cm = timed(conv_moments, x, k, iters=iters)
        t_m = timed(moments_only, x, k, iters=iters)
        print(f"[{b},{h},{w},{c}] conv {t_conv*1e3:7.3f} ms   "
              f"conv+moments {t_cm*1e3:7.3f} ms (+{(t_cm-t_conv)*1e3:6.3f})   "
              f"moments alone {t_m*1e3:7.3f} ms   "
              f"fused={'YES' if (t_cm - t_conv) < 0.5 * t_m else 'no'}")


if __name__ == "__main__":
    main()

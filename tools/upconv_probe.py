"""Probe: does the fused-upsample interleave poison its consumer conv?

The bench trace shows dec_*_up/conv1 running ~2.7x slower than encoder
convs of identical geometry ([16,64,64,192] 3x3). conv1's input descends
from nn_upsample2x_conv3x3's depth-to-space (shifted slices -> stacks ->
reshape), so the suspicion is layout: XLA may assign the interleaved
reshape a non-canonical physical layout that propagates into the consumer.

Cases (each timed inside one lax.scan, value-fetch barrier):
  fresh      : conv3x3 on an independent [B,2H,2W,O] input
  up+conv    : conv3x3 on nn_upsample2x_conv3x3 output (current path)
  up4+conv   : conv3x3 on a 4-separate-convs + canonical depth-to-space
               variant of the same math
  naive+conv : conv3x3 on explicit nearest-up + conv3x3 (reference form)

Usage: python tools/upconv_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3, phase_kernels


def conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def up4_conv(x, w_up):
    """Same math as nn_upsample2x_conv3x3 but via 4 separate 2x2 convs with
    phase-aligned padding and a canonical depth-to-space."""
    b, h, wd, _ = x.shape
    o = w_up.shape[3]
    wcat = phase_kernels(w_up)  # [2, 2, I, 4O], phases (dh, dw)
    outs = []
    for i, (dh, dw) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        k = wcat[..., i * o:(i + 1) * o]
        xp = jnp.pad(x, ((0, 0), (1 - dh, dh), (1 - dw, dw), (0, 0)))
        outs.append(lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))  # [B, H, W, O]
    z = jnp.stack(outs, axis=3).reshape(b, h, wd, 2, 2, o)
    z = jnp.swapaxes(z, 2, 3)  # [B, H, 2, W, 2, O]
    return z.reshape(b, 2 * h, 2 * wd, o)


def naive_up_conv(x, w_up):
    b, h, wd, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, wd, 2, c)
                         ).reshape(b, 2 * h, 2 * wd, c)
    return conv3x3(y, w_up)


def timed(fn, *args, iters=20, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):  # best-of-reps: tunnel dispatch spikes
        t0 = time.perf_counter()
        r = fn(*args)
        float(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    dt = jnp.bfloat16
    b, h, wd, ci, co = 16, 32, 32, 384, 192
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((b, h, wd, ci), np.float32).astype(dt))
    xfresh = jax.device_put(
        rng.standard_normal((b, 2 * h, 2 * wd, co), np.float32).astype(dt))
    w_up = jax.device_put(
        (rng.standard_normal((3, 3, ci, co), np.float32) * 0.05).astype(dt))
    w2 = jax.device_put(
        (rng.standard_normal((3, 3, co, co), np.float32) * 0.05).astype(dt))
    iters = 20

    def scan_of(body):
        @jax.jit
        def run(*args):
            def step(carry, _):
                y = body(carry, *args)
                return y.mean(dtype=jnp.float32).astype(dt), y[0, 0, 0, :1]
            return lax.scan(step, jnp.zeros((), dt), None, length=iters)
        return run

    cases = {
        "fresh      ": scan_of(lambda c, *_: conv3x3(xfresh + c, w2)),
        "up+conv    ": scan_of(
            lambda c, *_: conv3x3(nn_upsample2x_conv3x3(x + c, w_up), w2)),
        "up4+conv   ": scan_of(lambda c, *_: conv3x3(up4_conv(x + c, w_up), w2)),
        "naive+conv ": scan_of(lambda c, *_: conv3x3(naive_up_conv(x + c, w_up), w2)),
        "up only    ": scan_of(lambda c, *_: nn_upsample2x_conv3x3(x + c, w_up)),
        "up4 only   ": scan_of(lambda c, *_: up4_conv(x + c, w_up)),
    }
    # correctness of up4 vs fused
    a = nn_upsample2x_conv3x3(x, w_up)
    bb = up4_conv(x, w_up)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
    print(f"up4 max|diff| vs fused: {err:.4f}")
    for name, fn in cases.items():
        print(f"{name} {timed(fn, iters=iters)*1e3:7.3f} ms/iter")


if __name__ == "__main__":
    main()

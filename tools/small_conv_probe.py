"""Probe: why do XLA's convs run at ~0.36 of peak at 32x32 geometry?

PARITY note 7i / round-4 VERDICT #2: the 56M cifar10 config — the reward-
table workhorse — runs its search at ~0.34 SOL with convs 89.6% of device
time, and the in-model conv rate profiles at ~0.36 of peak at 32x32 spatial
vs 0.76 for the flagship's 64x64+ shapes, with lane-PERFECT channels
(128/256). This probe A/Bs candidate re-layouts at the model's real conv
shapes (search batch 32 = 8 seeds x N=4 candidates), same scan methodology
as vae_conv_probe.py (carry-dependence prevents hoisting; scalar fetch ends
timing; RELATIVE numbers only — the scan serializes at ~1 ms/iter floor).

Forms:
  direct     XLA NHWC conv SAME — the incumbent.
  collage    batch -> H merge: stack images vertically with 2 zero
             separator rows (exact for a 3x3 SAME conv — the kernel never
             reaches across a 2-row zero gap into the neighbor image's
             rows... it DOES read the separator rows, which are zero, so
             border outputs match SAME zero padding exactly). Turns
             [32,32,32,C] into [g, (32/g)*34, 32, C]: bigger spatial per
             conv, the geometry XLA is fast at.
  taps       9 shifted [BHW, C] x [C, K] matmuls accumulated in fp32 —
             bypasses XLA's conv lowering entirely with MXU-shaped dots.
  pallas     the stacked-form Pallas conv (min-spatial gate bypassed).
  nchw       NCHW dimension numbers (layout probe).

Usage: python tools/small_conv_probe.py [--shape I] [--forms a,b]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # v5e


def timed(fn, *args, iters, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        leaves = jax.tree_util.tree_leaves(r)
        float(np.asarray(leaves[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def conv_same(xx, kk):
    return jax.lax.conv_general_dilated(
        xx, kk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def collage(x, groups):
    """[B,H,W,C] -> [groups, (B/groups)*(H+2), W, C]: images stacked along
    H inside each group with a 1-row zero pad top+bottom per image (the
    separator between neighbors is 2 zero rows). Conv VALID-in-H on the
    collage == SAME on each image."""
    b, h, w, c = x.shape
    per = b // groups
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))  # [B, H+2, W, C]
    return xp.reshape(groups, per * (h + 2), w, c)


def uncollage(y, b, h):
    g = y.shape[0]
    per = b // g
    # conv VALID-in-H of the [per*(h+2)] collage gives per*(h+2)-2 rows;
    # image i occupies rows [i*(h+2) .. i*(h+2)+h) of that output.
    w, c = y.shape[2], y.shape[3]
    y = jnp.pad(y, ((0, 0), (0, 2), (0, 0), (0, 0)))  # back to per*(h+2)
    y = y.reshape(g, per, h + 2, w, c)[:, :, :h]
    return y.reshape(b, h, w, c)


def conv_valid_h(xx, kk):
    return jax.lax.conv_general_dilated(
        xx, kk, (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_collage(x, k, groups):
    b, h = x.shape[0], x.shape[1]
    return uncollage(conv_valid_h(collage(x, groups), k), b, h)


def conv_taps(x, k):
    """9 shifted matmuls, fp32 accumulate. Shift via pad+slice (static)."""
    b, h, w, c = x.shape
    kout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, w, kout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sh = jax.lax.slice(
                xp, (0, dy, dx, 0), (b, dy + h, dx + w, c))
            acc = acc + jax.lax.dot_general(
                sh.reshape(b * h * w, c), k[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(b, h, w, kout)
    return acc.astype(x.dtype)


def nchw(xx, kk):
    xt = jnp.transpose(xx, (0, 3, 1, 2))
    kt = jnp.transpose(kk, (3, 2, 0, 1))
    y = jax.lax.conv_general_dilated(
        xt, kt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(y, (0, 2, 3, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--shape", type=int, default=None)
    ap.add_argument("--forms", default=None)
    ap.add_argument("--custom", default=None, metavar="B,H,W,CIN,COUT",
                    help="probe one custom shape instead of the cifar10 set "
                         "(e.g. the flagship 64x64 levels for the candidate-10 "
                         "close-out)")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    iters = args.iters

    # the 56M cifar10 DDPM++ conv shapes at search batch 32
    shapes = [
        (32, 32, 32, 128, 128),
        (32, 16, 16, 256, 256),
        (32, 8, 8, 256, 256),
    ]
    if args.custom:
        shapes = [tuple(int(v) for v in args.custom.split(","))]
    elif args.shape is not None:
        shapes = [shapes[args.shape]]
    only = set(args.forms.split(",")) if args.forms else None

    print(f"{'shape':<26} {'form':<10} {'ms':>8} {'TF/s':>7} {'SOL':>6}")
    for (b, h, w, cin, cout) in shapes:
        x = jax.device_put(
            rng.standard_normal((b, h, w, cin), np.float32).astype(dt))
        k = jax.device_put(
            (rng.standard_normal((3, 3, cin, cout), np.float32) * 0.05).astype(dt))
        flops = 2.0 * b * h * w * 9 * cin * cout

        def scan_over(body_fn):
            @jax.jit
            def run(xx, kk):
                def body(carry, _):
                    y = body_fn(xx + carry, kk)
                    return y.mean(dtype=jnp.float32).astype(dt), y[0, 0, 0, :1]
                return jax.lax.scan(body, jnp.zeros((), dt), None, length=iters)
            return run

        forms = {"direct": scan_over(conv_same), "nchw": scan_over(nchw),
                 "taps": scan_over(conv_taps)}
        for g in (1, 2, 4, 8):
            if b % g == 0:
                forms[f"collage{g}"] = scan_over(
                    functools.partial(conv_collage, groups=g))

        if w % 16 == 0:
            from diffusion_tts_tpu.ops.pallas.conv3x3 import conv3x3_same

            forms["pallas"] = scan_over(
                lambda xx, kk: conv3x3_same(xx, kk))

        for name, fn in forms.items():
            if only and name not in only:
                continue
            sec = timed(fn, x, k, iters=iters)
            tfs = flops / sec / 1e12
            print(f"{str((b, h, w, cin, cout)):<26} {name:<10} "
                  f"{sec * 1e3:>8.2f} {tfs:>7.1f} {tfs * 1e12 / PEAK_BF16:>6.3f}",
                  flush=True)

        # exactness: collage == direct
        y0 = np.asarray(conv_same(x, k), np.float32)
        y4 = np.asarray(conv_collage(x, k, 4), np.float32)
        err = np.abs(y0 - y4).max()
        assert err == 0.0 or err < 1e-5, f"collage not exact: {err}"

    print("\n(relative A/Bs only: the scan floor is ~1 ms/iter — "
          "see PARITY note 7i)")


if __name__ == "__main__":
    main()

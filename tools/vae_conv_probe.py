"""Probe: can anything beat XLA's conv lowering at SD-VAE 512x512 geometry?

PARITY round-4 candidate 11: XLA runs the VAE decoder's large-spatial convs
at ~0.22-0.47 of bf16 peak in isolation — the worst rates in either model
family — and the scoring decode is 66% of SD device self-time. The tiling
roofline (tools/roofline.py --arch sd_vae) says the geometry itself is
~0.97-clean, so the deficiency is the lowering, not padding.

Formulations A/B'd per shape, each inside one lax.scan (same methodology as
conv_epilogue_probe.py; carry-dependence prevents hoisting, scalar fetch
ends timing):

  direct      XLA NHWC conv, SAME padding — the incumbent.
  band{2,4,8} H-banded space-to-batch: pad H by 1, slice into nb
              overlapping row bands (halo 1), stack into the batch dim,
              conv VALID-in-H / SAME-in-W, reassemble. Mathematically
              exact; trades spatial size for batch at the cost of one
              extra pad+concat pass of x.
  preband4    the conv alone on a pre-banded input (what a whole-decoder
              banded layout would pay per conv, amortizing the
              band/reassemble passes away).
  nchw        direct conv with NCHW dimension numbers (layout probe).

Usage: python tools/vae_conv_probe.py [--iters 20]
"""
from __future__ import annotations

import argparse
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


def conv_valid_h(xx, kk):
    return jax.lax.conv_general_dilated(
        xx, kk, (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def band(x, nb):
    """[B,H,W,C] -> [nb*B, H/nb + 2, W, C] overlapping row bands."""
    b, h, w, c = x.shape
    hb = h // nb
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return jnp.concatenate(
        [jax.lax.slice_in_dim(xp, i * hb, i * hb + hb + 2, axis=1)
         for i in range(nb)], axis=0)


def unband(yb, nb, b):
    return jnp.concatenate(
        [jax.lax.slice_in_dim(yb, i * b, (i + 1) * b, axis=0)
         for i in range(nb)], axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--shape", type=int, default=None,
                    help="only run shapes[i] (tunnel compiles are slow; "
                         "run one shape per invocation)")
    ap.add_argument("--forms", default=None,
                    help="comma-separated subset, e.g. direct,band4,preband4")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    iters = args.iters

    # the VAE decoder's FLOP-dominant conv shapes (roofline --arch sd_vae)
    shapes = [
        (4, 512, 512, 128, 128),
        (4, 512, 512, 256, 128),
        (4, 256, 256, 256, 256),
        (4, 128, 128, 512, 512),
    ]
    if args.shape is not None:
        shapes = [shapes[args.shape]]
    only = set(args.forms.split(",")) if args.forms else None

    print(f"{'shape':<28} {'form':<10} {'ms':>8} {'TF/s':>7} {'SOL':>6}")
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

        forms = {"direct": scan_over(conv_same)}

        for nb in (2, 4, 8):
            if h % nb:
                continue

            def banded(xx, kk, nb=nb):
                return unband(conv_valid_h(band(xx, nb), kk), nb, b)

            forms[f"band{nb}"] = scan_over(banded)

        # pre-banded: band once outside the scan; conv stays banded
        xb4 = jax.device_put(np.asarray(band(x, 4)))

        @jax.jit
        def preband4(xx, kk):
            def body(carry, _):
                y = conv_valid_h(xx + carry, kk)
                return y.mean(dtype=jnp.float32).astype(dt), y[0, 0, 0, :1]
            return jax.lax.scan(body, jnp.zeros((), dt), None, length=iters)

        def nchw(xx, kk):
            xt = jnp.transpose(xx, (0, 3, 1, 2))
            kt = jnp.transpose(kk, (3, 2, 0, 1))
            y = jax.lax.conv_general_dilated(
                xt, kt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return jnp.transpose(y, (0, 2, 3, 1))

        forms["nchw"] = scan_over(nchw)

        from diffusion_tts_tpu.ops.pallas.conv3x3 import conv3x3_same

        forms["pallas"] = scan_over(lambda xx, kk: conv3x3_same(xx, kk))

        for name, fn in forms.items():
            if only and name not in only:
                continue
            sec = timed(fn, x, k, iters=iters)
            tfs = flops / sec / 1e12
            print(f"{str((b, h, w, cin, cout)):<28} {name:<10} "
                  f"{sec * 1e3:>8.2f} {tfs:>7.1f} {tfs * 1e12 / PEAK_BF16:>6.3f}",
                  flush=True)

        if not only or "preband4" in only:
            sec = timed(preband4, xb4, k, iters=iters)
            tfs = flops / sec / 1e12
            print(f"{str((b, h, w, cin, cout)):<28} {'preband4':<10} "
                  f"{sec * 1e3:>8.2f} {tfs:>7.1f} {tfs * 1e12 / PEAK_BF16:>6.3f}",
                  flush=True)

        # numerics: banded == direct exactly (same math, same dtype)
        y0 = np.asarray(conv_same(x, k), np.float32)
        y4 = np.asarray(unband(conv_valid_h(band(x, 4), k), 4, b), np.float32)
        err = np.abs(y0 - y4).max()
        assert err == 0.0 or err < 1e-5, f"banding not exact: {err}"

    print("\n(SOL = fraction of v5e bf16 peak; banding is exact math — "
          "asserted per shape)")


if __name__ == "__main__":
    main()

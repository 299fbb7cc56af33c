"""Bisect the remote runtime's scan-carry leaf-count limit (VERDICT r2 #4).

Round 2 characterized grad_accum_rounds>1 failing at EXECUTION on the axon
TPU runtime with an opaque INVALID_ARGUMENT when the scanned accumulation
carries ~550 gradient leaves (56M model), while ~120-leaf carries run.
This probe reproduces the failure minimally — a lax.scan whose carry is
L same-size leaves, no model code — and bisects the failing L, separating
"axon rejects many-operand while-loops" from "something about our train
step". The fix shipped in train_step.py (accum_flat_carry) sidesteps the
limit by carrying one flattened vector regardless of model size.

Usage:  python tools/carry_probe.py [--sizes 100000] [--lo 64] [--hi 1024]
        JAX_PLATFORMS=cpu python tools/carry_probe.py   # control run
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


def try_leaves(n_leaves: int, size: int, rounds: int = 4) -> tuple[bool, str]:
    """One scan with an n_leaves-leaf carry; True if it executes."""
    try:
        def body(carry, x):
            return [c + x for c in carry], None

        @jax.jit
        def run(init):
            out, _ = jax.lax.scan(body, init, jnp.arange(rounds, dtype=jnp.float32))
            return sum(jnp.sum(c) for c in out)

        init = [jnp.full((size,), float(i % 7), jnp.float32)
                for i in range(n_leaves)]
        val = float(run(init))
        expected = sum(float(i % 7) for i in range(n_leaves)) * size + n_leaves * size * 6.0
        ok = abs(val - expected) / max(abs(expected), 1.0) < 1e-4
        return ok, f"value {val:.1f} (expected {expected:.1f})"
    except Exception as e:  # noqa: BLE001 — report any backend failure
        return False, f"{type(e).__name__}: {str(e)[:200]}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, default=100_000,
                    help="elements per carry leaf")
    ap.add_argument("--lo", type=int, default=64)
    ap.add_argument("--hi", type=int, default=1024)
    args = ap.parse_args(argv)

    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    lo, hi = args.lo, args.hi
    ok_lo, msg = try_leaves(lo, args.sizes)
    print(f"leaves={lo}: {'ok' if ok_lo else 'FAIL'} ({msg})")
    if not ok_lo:
        print("lower bound already fails; nothing to bisect")
        return
    ok_hi, msg = try_leaves(hi, args.sizes)
    print(f"leaves={hi}: {'ok' if ok_hi else 'FAIL'} ({msg})")
    if ok_hi:
        print(f"no failure up to {hi} leaves x {args.sizes} elems — "
              "the carry-count limit does not reproduce standalone at this size")
        return
    while hi - lo > 1:
        mid = (lo + hi) // 2
        ok, msg = try_leaves(mid, args.sizes)
        print(f"leaves={mid}: {'ok' if ok else 'FAIL'} ({msg})")
        if ok:
            lo = mid
        else:
            hi = mid
    print(f"threshold: {lo} leaves ok, {hi} leaves fail "
          f"(leaf size {args.sizes} fp32)")


if __name__ == "__main__":
    main()

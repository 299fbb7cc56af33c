"""Static MXU roofline for a model forward (VERDICT r2 #8: ceiling proof).

Walks the jaxpr of the flagship forward, extracts every convolution and
matmul with its shapes, and computes the per-op MXU tiling efficiency on a
128x128 systolic array (v5e, bf16): an op whose output-channel (lane) or
contraction dimension is not a multiple of 128 pays padding — e.g. the ADM
res-64 level's 192 output channels fill 1.5 lane tiles, so its ceiling is
75% regardless of software. The FLOP-weighted mean of these efficiencies is
the architecture's single-chip MXU ceiling; comparing `bench.py`'s measured
fraction-of-peak against it separates "kernel/fusion headroom" from
"inherent channel-geometry padding".

Usage: [JAX_PLATFORMS=cpu] python tools/roofline.py [--arch imagenet64]
           [--batch 16] [--json out.json]
"""
from __future__ import annotations

import argparse
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

MXU = 128  # systolic array edge (lanes and contraction tile)
SUBLANE = 8


def _tile_eff(dim: int, tile: int) -> float:
    """Fraction of the padded tile grid that holds real data."""
    return dim / (math.ceil(dim / tile) * tile) if dim else 1.0


def _walk(jaxpr, out):
    for eqn in jaxpr.eqns:
        for sub in jax.core.jaxprs_in_params(eqn.params) if hasattr(
                jax.core, "jaxprs_in_params") else []:
            _walk(sub, out)
        # recurse into nested jaxprs (scan/cond/pjit bodies)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                _walk(v.jaxpr, out)
            elif hasattr(v, "eqns"):  # Jaxpr
                _walk(v, out)
            elif isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, "jaxpr"):
                        _walk(u.jaxpr, out)
                    elif hasattr(u, "eqns"):
                        _walk(u, out)
        if eqn.primitive.name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            outv = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            # feature_group_count>1 (depthwise) barely shows on the MXU; skip
            if eqn.params.get("feature_group_count", 1) > 1:
                continue
            lhs_spec = dn.lhs_spec  # (batch, feature, *spatial) indices
            rhs_spec = dn.rhs_spec  # (out_f, in_f, *spatial)
            out_spec = dn.out_spec
            cin = rhs.shape[rhs_spec[1]]
            cout = rhs.shape[rhs_spec[0]]
            ksp = [rhs.shape[i] for i in rhs_spec[2:]]
            b = outv.shape[out_spec[0]]
            osp = [outv.shape[i] for i in out_spec[2:]]
            m = b * int(np.prod(osp))
            k = cin * int(np.prod(ksp))
            flops = 2.0 * m * k * cout
            eff = (_tile_eff(cout, MXU) * _tile_eff(k, MXU)
                   * _tile_eff(m, SUBLANE))
            key = ("conv", tuple(ksp), cin, cout, tuple(osp), b)
            out[key][0] += flops
            out[key][1] = eff
        elif eqn.primitive.name == "dot_general":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            m = int(np.prod([d for i, d in enumerate(lhs.shape)
                             if i not in lc and i not in lb]))
            n = int(np.prod([d for i, d in enumerate(rhs.shape)
                             if i not in rc and i not in rb]))
            k = int(np.prod([lhs.shape[i] for i in lc]))
            batch = int(np.prod([lhs.shape[i] for i in lb])) if lb else 1
            flops = 2.0 * batch * m * n * k
            eff = _tile_eff(n, MXU) * _tile_eff(k, MXU) * _tile_eff(m, SUBLANE)
            key = ("dot", m, k, n, batch)
            out[key][0] += flops
            out[key][1] = eff


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="imagenet64")
    ap.add_argument("--batch", type=int, default=16,
                    help="images per forward (bench.py's B*N expansion batch)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, PRECONDS

    cfg = dict(NET_CONFIGS[args.arch])
    net = PRECONDS["edm"](dtype=jnp.bfloat16, **cfg)
    res, ch, ld = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    x = jnp.zeros((args.batch, res, res, ch), jnp.float32)
    sigma = jnp.full((args.batch,), 10.0, jnp.float32)
    lab = jnp.zeros((args.batch, ld)) if ld else None

    shapes = jax.eval_shape(lambda: net.init(
        {"params": jax.random.key(0)}, x, sigma, lab))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    jaxpr = jax.make_jaxpr(lambda v: net.apply(v, x, sigma, lab))(variables)
    ops = defaultdict(lambda: [0.0, 1.0])
    _walk(jaxpr.jaxpr, ops)

    total = sum(f for f, _ in ops.values())
    ideal = sum(f / max(e, 1e-9) for f, e in ops.values())
    ceiling = total / ideal
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    print(f"arch={args.arch} batch={args.batch} "
          f"total_matmul_flops={total:.3e} per forward")
    print(f"{'op':<58} {'flops%':>7} {'mxu_eff':>8}")
    for key, (f, e) in rows[:18]:
        print(f"{str(key):<58} {100 * f / total:>6.1f}% {e:>8.3f}")
    print(f"\nFLOP-weighted MXU tiling ceiling: {ceiling:.3f}")
    print("(fraction of bf16 peak attainable if every matmul ran at its "
          "padding-limited rate with zero other overhead; bandwidth-bound "
          "ops — GN, attention softmax, elementwise — push the real ceiling "
          "lower)")
    if args.json:
        import json

        with open(args.json, "w") as fjson:
            json.dump({
                "arch": args.arch, "batch": args.batch,
                "total_matmul_flops": total, "mxu_tiling_ceiling": ceiling,
                "ops": [{"key": str(k), "flops_frac": f / total, "mxu_eff": e}
                        for k, (f, e) in rows],
            }, fjson, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""Static MXU roofline analysis: matmul/conv FLOPs + tiling efficiency.

Shared by tools/roofline.py (the CLI report) and the benches that report a
speed-of-light fraction (bench.py, tools/sd_e2e_bench.py). Walks a jaxpr,
extracts every convolution and dot_general with its shapes, and computes
per-op FLOPs plus the MXU 128x128 tiling efficiency (lane / contraction /
sublane padding). The FLOP totals define the SOL numerator ("useful matmul
FLOPs executed"); the FLOP-weighted efficiency is the padding-limited
ceiling no software can exceed at that geometry.

Tracing (jax.make_jaxpr) is backend-independent and cheap (~seconds even
for the 860M SD UNet) — no device compile involved.
"""
from __future__ import annotations

import math
from collections import defaultdict

import jax
import numpy as np

MXU = 128  # systolic array edge (lanes and contraction tile)
SUBLANE = 8


def tile_eff(dim: int, tile: int) -> float:
    """Fraction of the padded tile grid that holds real data."""
    return dim / (math.ceil(dim / tile) * tile) if dim else 1.0


def _io_bytes(eqn) -> float:
    """Mandatory HBM traffic of a matmul: operands read + output written
    once each (fusion can reduce elementwise traffic but cannot remove a
    matmul's own operand/result movement). Uses the aval dtypes."""
    total = 0.0
    for v in list(eqn.invars) + list(eqn.outvars):
        aval = v.aval
        if hasattr(aval, "shape"):
            total += float(np.prod(aval.shape, dtype=np.float64)) * np.dtype(
                aval.dtype).itemsize
    return total


def walk_jaxpr(jaxpr, out):
    """Accumulate {op-key: [flops, mxu_eff, bytes]} over all convs/dots in
    a jaxpr (recursing into scan/cond/pjit bodies)."""
    for eqn in jaxpr.eqns:
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                walk_jaxpr(v.jaxpr, out)
            elif hasattr(v, "eqns"):  # Jaxpr
                walk_jaxpr(v, out)
            elif isinstance(v, (list, tuple)):
                for u in v:
                    if hasattr(u, "jaxpr"):
                        walk_jaxpr(u.jaxpr, out)
                    elif hasattr(u, "eqns"):
                        walk_jaxpr(u, out)
        if eqn.primitive.name == "conv_general_dilated":
            rhs = eqn.invars[1].aval
            outv = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            # feature_group_count>1 (depthwise) barely shows on the MXU; skip
            if eqn.params.get("feature_group_count", 1) > 1:
                continue
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
            eff = (tile_eff(cout, MXU) * tile_eff(k, MXU)
                   * tile_eff(m, SUBLANE))
            key = ("conv", tuple(ksp), cin, cout, tuple(osp), b)
            out[key][0] += flops
            out[key][1] = eff
            out[key][2] += _io_bytes(eqn)
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
            eff = tile_eff(n, MXU) * tile_eff(k, MXU) * tile_eff(m, SUBLANE)
            key = ("dot", m, k, n, batch)
            out[key][0] += flops
            out[key][1] = eff
            out[key][2] += _io_bytes(eqn)


def analyze_fn(fn, *args) -> dict:
    """Trace fn(*args) and return {'total_flops', 'total_bytes', 'ceiling',
    'ops'} where ops is a flops-descending list of (key, flops, eff, bytes).
    'ceiling' is the tiling-only bound (no memory model)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    ops = defaultdict(lambda: [0.0, 1.0, 0.0])
    walk_jaxpr(jaxpr.jaxpr, ops)
    total = sum(f for f, _, _ in ops.values())
    ideal = sum(f / max(e, 1e-9) for f, e, _ in ops.values())
    rows = sorted(((k, f, e, by) for k, (f, e, by) in ops.items()),
                  key=lambda r: -r[1])
    return {
        "total_flops": total,
        "total_bytes": sum(by for _, _, by in ops.values()),
        "ceiling": (total / ideal) if ideal else 1.0,
        "ops": rows,
    }


def roofline_seconds(result: dict, peak_flops: float, hbm_bw: float) -> float:
    """Bandwidth-aware wall-seconds MODEL for the traced matmul mix: per op
    max(padded-tile MXU time, one-HBM-trip operand/result traffic time).
    The honest speed-of-light reference for memory-heavy graphs (the SD VAE
    decoder at 512x512): non-matmul passes are assumed perfectly fused
    (optimistic), while every matmul operand is charged one HBM trip
    (pessimistic where XLA fuses a producer into the conv so the input
    never materializes — the EDM flagship measures slightly above this
    model for exactly that reason). Use as a reference point, not a strict
    bound."""
    t = 0.0
    for _, flops, eff, by in result["ops"]:
        t += max(flops / max(eff, 1e-9) / peak_flops, by / hbm_bw)
    return t


def sd_unet_flops(unet, batch: int, ctx_len: int = 77) -> dict:
    """Matmul roofline of one SD UNet forward at `batch` images (a CFG
    forward for one sample is batch=2). Traces abstractly — no device
    allocation, safe to call from a process holding a TPU grant."""
    import jax.numpy as jnp

    res = unet.sample_size
    x = jax.ShapeDtypeStruct((batch, res, res, unet.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((batch, ctx_len, unet.cross_attention_dim),
                               jnp.float32)
    shapes = jax.eval_shape(
        lambda xx, tt, cc: unet.init({"params": jax.random.key(0)}, xx, tt, cc),
        x, t, ctx)
    return analyze_fn(lambda v, xx, tt, cc: unet.apply(v, xx, tt, cc),
                      shapes, x, t, ctx)


def sd_vae_decode_flops(vae, batch: int, latent_res: int = 64) -> dict:
    """Matmul roofline of one VAE decode at `batch` latents (abstract
    trace; see sd_unet_flops)."""
    import jax.numpy as jnp

    z = jax.ShapeDtypeStruct(
        (batch, latent_res, latent_res, vae.latent_channels), jnp.float32)
    x0 = jax.ShapeDtypeStruct(
        (1, latent_res * 8, latent_res * 8, vae.in_channels), jnp.float32)
    shapes = jax.eval_shape(
        lambda xx: vae.init({"params": jax.random.key(0)}, xx,
                            jax.random.key(0)), x0)
    return analyze_fn(
        lambda v, zz: vae.apply(v, zz, method=type(vae).decode), shapes, z)


__all__ = ["MXU", "SUBLANE", "tile_eff", "walk_jaxpr", "analyze_fn",
           "roofline_seconds", "sd_unet_flops", "sd_vae_decode_flops"]

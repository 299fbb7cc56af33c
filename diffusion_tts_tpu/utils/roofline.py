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

import contextlib
import math
from collections import defaultdict

import jax
import numpy as np


@contextlib.contextmanager
def canonical_formulation(*, keep_rewrites: bool = False):
    """Trace-time pin to an all-XLA program for FLOP accounting.

    The SOL numerator is defined as "useful matmul FLOPs of the reference
    formulation of this workload" — a property of the architecture, not of
    whichever kernels happen to execute it. On the TPU backend the model
    code routes eligible convs / attention / GEGLU through Pallas kernels,
    whose matmuls are custom calls INVISIBLE to both the jaxpr walker and
    XLA cost_analysis: a trace taken with those routes active undercounts
    the numerator (round 4's SD bench missed ~2/3 of the executed matmul
    FLOPs this way — the published sol 0.188 at 61.27 NFE/s was really
    ~0.64). This context flips every Pallas routing flag off for the
    duration of a trace; the flags are trace-time module constants, so
    flipping them is safe and local.

    keep_rewrites=False (canonical): additionally pins the FLOP-saving
    algorithmic rewrites (phased upsample+conv, GN-in-conv) to their
    reference formulation — the fixed workload the SOL numerator is
    defined against. keep_rewrites=True (executed mix): keeps the rewrites
    as routed, so the traced op list matches the shapes the program
    actually runs — the basis for the practical-ceiling time model."""
    from diffusion_tts_tpu.models import layers as edm_layers
    from diffusion_tts_tpu.models import sd_layers
    from diffusion_tts_tpu.ops import attention as attn
    from diffusion_tts_tpu.ops.pallas import conv3x3, geglu_ff

    saved = (edm_layers._NO_FUSED_UPSAMPLE, sd_layers._NO_FUSED_UPSAMPLE,
             sd_layers._GN_IN_CONV, attn._NO_PALLAS_ATTN,
             conv3x3._NO_PALLAS_CONV, geglu_ff._NO_PALLAS_FF)
    if not keep_rewrites:
        edm_layers._NO_FUSED_UPSAMPLE = True
        sd_layers._NO_FUSED_UPSAMPLE = True
        sd_layers._GN_IN_CONV = False
    attn._NO_PALLAS_ATTN = True
    conv3x3._NO_PALLAS_CONV = True
    geglu_ff._NO_PALLAS_FF = True
    try:
        yield
    finally:
        (edm_layers._NO_FUSED_UPSAMPLE, sd_layers._NO_FUSED_UPSAMPLE,
         sd_layers._GN_IN_CONV, attn._NO_PALLAS_ATTN,
         conv3x3._NO_PALLAS_CONV, geglu_ff._NO_PALLAS_FF) = saved

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


# Measured practical per-class efficiency envelopes on v5e (PARITY round-4
# notes 8a-8p, each backed by isolated A/B probes):
#   - attention dots at SD-1.5 head width D=40: 0.64 measured kernel
#     envelope relative to the structural lane floor (the fp32-softmax VPU
#     chain; pipelining probes were 22% slower) — note 8k. The 40/128 lane
#     floor itself is NOT part of the envelope: the walker's tile_eff
#     already charges it on the dot's n=40 (PV) / k=40 (QK) axis;
#   - 3x3 convs at >=128^2 spatial (the Pallas stacked kernel, 1.1-1.8x
#     past XLA): 0.60. Round 4's notes put these at 0.34-0.46, but those
#     rates carried the invisible-Pallas-FLOPs undercount this module now
#     fixes (canonical_formulation): re-deriving from the note-8k trace
#     with the canonical numerator — 20 decode calls x ~10e12 canonical
#     FLOPs in 1.463 s device time — gives ~0.60 of peak (the VPU
#     tap/combine chain bounds the rest; two direct probes showed Mosaic
#     already overlaps it with the MXU) — notes 8d, 8k + round-5 rebasis;
#   - <=64^2-spatial convs (XLA lowering wins over Pallas there): 0.62
#     measured — notes 8a, 8e, 8k;
#   - everything else (projections, GEGLU, time embeddings): 0.75 (XLA
#     measures 0.73-0.90 on these pools; low end taken) — note 8k.
_ENV_ATTN_D40 = 0.64
_ENV_CONV_LARGE = 0.60
_ENV_CONV_SMALL = 0.62
_ENV_OTHER = 0.75


def _class_envelope(key) -> float:
    if key[0] == "dot":
        _, m, k, n, batch = key
        if k == 40 or n == 40:  # SD attention QK / PV dots
            return _ENV_ATTN_D40
        return _ENV_OTHER
    _, ksp, cin, cout, osp, b = key
    if tuple(ksp) == (3, 3) and osp and max(osp) >= 128:
        return _ENV_CONV_LARGE
    if tuple(ksp) == (3, 3):
        return _ENV_CONV_SMALL
    return _ENV_OTHER


def practical_seconds(result: dict, peak_flops: float) -> float:
    """Practical wall-time model of a traced EXECUTED op mix: per op,
    FLOPs / (tiling efficiency x measured per-class envelope) / peak."""
    return sum(f / max(e * _class_envelope(k), 1e-9)
               for k, f, e, _ in result["ops"]) / peak_flops


def practical_ceiling(result: dict, executed: dict | None = None) -> float:
    """Lane/VPU-aware practical speed-of-light fraction: canonical FLOPs
    over the practical-time model of the EXECUTED op mix (per-op tiling
    efficiency x measured per-class envelope). Unlike the pure MXU-tiling
    ceiling — which credits no structural lane floors (D=40 attention) and
    no mandatory VPU chains (fp32 softmax, conv tap assembly, GEGLU) —
    this is the fraction of canonical-workload peak a maximally-tuned
    program can realistically reach on one v5e, per the round-4 per-pool
    measurement campaign (PARITY notes 8a-8p, rebased round 5). It can
    exceed the per-op envelopes when the executed program algorithmically
    beats the canonical formulation (the phased upsample+conv does ~4.5x
    fewer MACs than upsample-then-conv). An achieved SOL near this value
    means the program is at its envelope, not that 1/SOL-fold headroom
    remains.

    `result` is the canonical trace (numerator); `executed` the
    keep_rewrites trace (time model). With executed=None the canonical mix
    doubles as the time basis."""
    ex = executed if executed is not None else result
    denom = sum(f / max(e * _class_envelope(k), 1e-9)
                for k, f, e, _ in ex["ops"])
    return result["total_flops"] / denom if denom else 1.0


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


def sd_unet_flops(unet, batch: int, ctx_len: int = 77,
                  formulation: str = "canonical") -> dict:
    """Matmul roofline of one SD UNet forward at `batch` images (a CFG
    forward for one sample is batch=2). Traces abstractly — no device
    allocation, safe to call from a process holding a TPU grant.
    formulation: "canonical" (the reference-formulation numerator) or
    "executed" (Pallas disabled but algorithmic rewrites kept — the op
    mix the program actually runs, for the practical time model)."""
    import jax.numpy as jnp

    res = unet.sample_size
    x = jax.ShapeDtypeStruct((batch, res, res, unet.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((batch,), jnp.float32)
    ctx = jax.ShapeDtypeStruct((batch, ctx_len, unet.cross_attention_dim),
                               jnp.float32)
    shapes = jax.eval_shape(
        lambda xx, tt, cc: unet.init({"params": jax.random.key(0)}, xx, tt, cc),
        x, t, ctx)
    with canonical_formulation(keep_rewrites=formulation == "executed"):
        return analyze_fn(lambda v, xx, tt, cc: unet.apply(v, xx, tt, cc),
                          shapes, x, t, ctx)


def sd_vae_decode_flops(vae, batch: int, latent_res: int = 64,
                        formulation: str = "canonical") -> dict:
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
    with canonical_formulation(keep_rewrites=formulation == "executed"):
        return analyze_fn(
            lambda v, zz: vae.apply(v, zz, method=type(vae).decode), shapes, z)


__all__ = ["MXU", "SUBLANE", "tile_eff", "walk_jaxpr", "analyze_fn",
           "canonical_formulation", "practical_ceiling", "practical_seconds",
           "roofline_seconds", "sd_unet_flops", "sd_vae_decode_flops"]

"""Fused GEGLU feed-forward Pallas kernel for the SD UNet transformer FF.

The reference FF (diffusers attention.py FeedForward/GEGLU, vendored
pipeline driven per candidate by sd/main.py) is proj -> h * gelu(gate) ->
out-proj. Under XLA this lowers to TWO fused regions: the proj dot, and
the out-proj dot with the exact-erf gelu-gate fused into its OPERAND
load. The trace consequence (PARITY note 8k): net_0 runs at 0.73-0.90 of
peak, but net_2 measures 0.21-0.33 — the erf chain (~20+ VPU ops/elem
over [B*T, F]) serializes inside the dot's producer fusion, and the
[B*T, 2F] proj output round-trips HBM between the regions.

This kernel runs the WHOLE FF per M-tile of rows in VMEM:

    q    = x_tile @ w0 + b0          (fp32 accumulate, one MXU dot)
    g    = h * gelu_exact(gate)      (fp32 VPU, h|gate = q split at F)
    out  = g @ w2 + b2               (fp32 accumulate, one MXU dot)

so the intermediate never touches HBM, and Mosaic's grid pipelining
overlaps tile i's VPU gelu with tile i+1's MXU dots. Numerics: q is
rounded to the activation dtype after the bias add (nn.Dense's output
rounding), the gelu product runs in fp32 (XLA upcasts transcendentals
internally too), and both dots accumulate fp32 — bf16-epsilon-level
agreement with the XLA lowering (tests pin it).

Differentiable via custom_vjp with the jnp mirror as backward (the same
forward-only-kernel treatment as ops/pallas/{groupnorm,conv3x3}.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = int(os.environ.get("DTTS_FF_VMEM_MB", "12")) * 2**20
_NO_PALLAS_FF = bool(os.environ.get("DTTS_NO_PALLAS_FF"))


def _erf_as(z):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7 —
    four decimal orders below bf16 epsilon, the production dtype).
    Mosaic lowers neither the erf nor the erfc primitive, so the exact
    jax.nn.gelu is unavailable inside kernels; this costs one exp and a
    degree-5 polynomial on the VPU."""
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(z) * e


def _gelu_exact(z):
    # gelu(approximate=False) in erf form; see _erf_as for why the stock
    # jax.nn.gelu (erfc-based) cannot lower here.
    return 0.5 * z * (1.0 + _erf_as(z * (2.0 ** -0.5)))


def _geglu_kernel(x_ref, w0_ref, b0_ref, w2_ref, b2_ref, o_ref, *, f: int):
    x = x_ref[...]
    q = jnp.dot(x, w0_ref[...], preferred_element_type=jnp.float32) \
        + b0_ref[0].astype(jnp.float32)
    q = q.astype(x.dtype)  # nn.Dense output rounding
    h = q[:, 0:f].astype(jnp.float32)
    gate = q[:, f:2 * f].astype(jnp.float32)
    g = (h * _gelu_exact(gate)).astype(x.dtype)
    out = jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32) \
        + b2_ref[0].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _geglu_stream_kernel(x_ref, w0h_ref, b0h_ref, w0g_ref, b0g_ref,
                         w2_ref, b2_ref, o_ref, acc_ref, *, nj: int):
    """F-streamed FF: grid (m//tm, F//tf) with the f-tile j innermost.
    The 16²/8² SD blocks' weights (c=1280, F=5120: 39 MB bf16) can never
    be VMEM-resident, so this form streams F — per (i, j) step it
    computes the j-th column tile of q = x@w0+b0 (FULL c contraction, so
    the nn.Dense rounding point is elementwise-identical to the resident
    kernel), gates it, and accumulates the partial out-projection
    g_j @ w2[jf:(j+1)f] into an fp32 VMEM scratch; the [M, 2F]
    intermediate still never exists in HBM. x's block index ignores j so
    Mosaic fetches each row tile once per sweep; weights are re-fetched
    per m-tile (m/tm sweeps), which at the SD shapes is ~160 MB/call —
    0.2 ms of HBM against a 0.41 ms MXU floor, i.e. still compute-bound."""
    j = pl.program_id(1)
    x = x_ref[...]
    h = jnp.dot(x, w0h_ref[...], preferred_element_type=jnp.float32) \
        + b0h_ref[0].astype(jnp.float32)
    gate = jnp.dot(x, w0g_ref[...], preferred_element_type=jnp.float32) \
        + b0g_ref[0].astype(jnp.float32)
    # nn.Dense output rounding (same point as the resident kernel's
    # q.astype(x.dtype) — the bias-added projection, before the gate math)
    h = h.astype(x.dtype).astype(jnp.float32)
    gate = gate.astype(x.dtype).astype(jnp.float32)
    g = (h * _gelu_exact(gate)).astype(x.dtype)
    part = jnp.dot(g, w2_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == nj - 1)
    def _emit():
        o_ref[...] = (acc_ref[...]
                      + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_stream_tiles(m: int, c: int, f: int, itemsize: int):
    """(tm, tf) for the streaming form, or None. Budget accounting:
    x tile double-buffered + fp32 accumulator + 3 weight tiles
    double-buffered + the h/gate/g/part temporaries."""
    def est(tm, tf):
        return (2 * tm * c * itemsize        # x double-buffered
                + tm * c * 4                 # fp32 accumulator scratch
                + 6 * tf * c * itemsize      # w0h/w0g/w2 tiles, dbl-buffered
                + 2 * tm * tf * 4            # h/gate fp32
                + tm * tf * itemsize         # g
                + tm * c * 4)                # part fp32
    for tm in (256, 128, 512, 64, 32, 16, 8):
        if m % tm:
            continue
        for tf in (512, 640, 256, 1024, 128):
            if f % tf == 0 and est(tm, tf) <= _VMEM_BUDGET:
                return tm, tf
    return None


def _geglu_reference(x2, w0, b0, w2, b2):
    """jnp mirror of the kernel's numerics; VJP source and test oracle.
    Identical math to nn.Dense(proj) -> split -> h*gelu_exact(gate) ->
    nn.Dense(out) at the same dtypes."""
    f = w2.shape[0]
    q = (jnp.dot(x2, w0, preferred_element_type=jnp.float32)
         + b0.astype(jnp.float32)).astype(x2.dtype)
    h = q[:, 0:f].astype(jnp.float32)
    gate = q[:, f:2 * f].astype(jnp.float32)
    g = (h * jax.nn.gelu(gate, approximate=False)).astype(x2.dtype)
    out = (jnp.dot(g, w2, preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32))
    return out.astype(x2.dtype)


def _pick_tm(m: int, c: int, f: int, itemsize: int) -> int:
    def est(tm):
        return (2 * tm * c * itemsize          # x double-buffered
                + tm * 2 * f * 4               # q (fp32)
                + 2 * tm * f * 4               # h/gate fp32 views
                + tm * f * itemsize            # g
                + 2 * tm * c * itemsize        # out double-buffered
                + (c * 2 * f + f * c) * itemsize)  # weights resident

    for tm in (512, 256, 128, 64, 32, 16, 8):
        if m % tm == 0 and est(tm) <= _VMEM_BUDGET:
            return tm
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def _geglu_fwd_only(x2, w0, b0, w2, b2, *, interpret: bool = False):
    m, c = x2.shape
    f = w2.shape[0]
    tm = _pick_tm(m, c, f, x2.dtype.itemsize)
    if not tm:
        tm, tf = _pick_stream_tiles(m, c, f, x2.dtype.itemsize)
        nj = f // tf
        return pl.pallas_call(
            functools.partial(_geglu_stream_kernel, nj=nj),
            out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
            grid=(m // tm, nj),
            in_specs=[
                pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, tf), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tf), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, tf), lambda i, j: (0, j + nj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tf), lambda i, j: (0, j + nj),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tf, c), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(1.5 * _VMEM_BUDGET) + 2**20,
            ),
            cost_estimate=pl.CostEstimate(
                flops=6 * m * c * f,
                bytes_accessed=(2 * m * c * x2.dtype.itemsize
                                + (m // tm) * 3 * c * f * x2.dtype.itemsize),
                transcendentals=m * f,
            ),
        )(x2, w0, b0.reshape(1, 2 * f), w0, b0.reshape(1, 2 * f),
          w2, b2.reshape(1, c))
    return pl.pallas_call(
        functools.partial(_geglu_kernel, f=f),
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * _VMEM_BUDGET) + 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * m * c * f,
            bytes_accessed=(2 * m * c * x2.dtype.itemsize
                            + 3 * c * f * x2.dtype.itemsize),
            transcendentals=m * f,
        ),
    )(x2, w0, b0.reshape(1, 2 * f), w2, b2.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _geglu_diff(x2, w0, b0, w2, b2, interpret):
    return _geglu_fwd_only(x2, w0, b0, w2, b2, interpret=interpret)


def _geglu_diff_fwd(x2, w0, b0, w2, b2, interpret):
    return _geglu_diff(x2, w0, b0, w2, b2, interpret), (x2, w0, b0, w2, b2)


def _geglu_diff_bwd(interpret, res, g):
    _, vjp = jax.vjp(_geglu_reference, *res)
    return vjp(g)


_geglu_diff.defvjp(_geglu_diff_fwd, _geglu_diff_bwd)


def geglu_ff(x, w0, b0, w2, b2, *, interpret: bool = False):
    """GEGLU feed-forward, fused: (h * gelu_exact(gate)) @ w2 + b2 with
    [h|gate] = x @ w0 + b0. x: [..., C] (leading dims flattened to rows);
    w0 [C, 2F], b0 [2F], w2 [F, C], b2 [C]. Returns x.shape."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    out = _geglu_diff(x2, w0, b0, w2, b2, interpret)
    return out.reshape(*lead, c)


def geglu_ff_eligible(m: int, c: int, f: int, dtype) -> bool:
    """TPU only; F lane-tile aligned (the h|gate split slices q at lane
    offset F); a viable tiling must exist under the VMEM budget — either
    both weight matrices resident (the 64²/32² SD blocks) or the
    F-streamed form (16²/8², where the 39 MB of c=1280 weights can never
    be resident; DTTS_NO_STREAM_FF disables just that form for A/B).
    Kill-switch DTTS_NO_PALLAS_FF."""
    if _NO_PALLAS_FF:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if f % 128 or c % 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if _pick_tm(m, c, f, itemsize) >= 8:
        return True
    if os.environ.get("DTTS_NO_STREAM_FF"):
        return False
    return c % 128 == 0 and _pick_stream_tiles(m, c, f, itemsize) is not None


__all__ = ["geglu_ff", "geglu_ff_eligible"]

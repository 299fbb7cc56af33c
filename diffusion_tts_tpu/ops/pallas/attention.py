"""Fused flash-attention Pallas kernel for UNet self-attention.

Preserves the reference AttentionOp numerics (fp32 scores softmax(q.k /
sqrt(D)), edm/training/networks.py:113-126) while never materializing the
[T, T] score matrix in HBM — at SD resolutions (T=4096 latent tokens) the
unfused fp32 scores are 67MB per (batch, head), which is what makes plain
XLA attention HBM-bound. Online-softmax accumulation in fp32 VMEM scratch,
K/V streamed in blocks.

Layout: q, k, v [B, T, H, D] -> kernel runs on [B*H, T, D] with a grid of
(BH, T/TQ) and the full K/V for one bh resident in VMEM (T*D*4B — 1 MB at
T=4096, D=64).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fit_tile(t: int, want: int) -> int:
    """Largest divisor of t that is <= want."""
    tile = min(want, t)
    while t % tile:
        tile -= 1
    return tile


_LOG2E = 1.4426950408889634


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, tk: int, scale: float):
    # Matmul operands stay in the activation dtype: bf16 products are exact
    # in the MXU's fp32 accumulator (scale applied afterwards in fp32), and
    # the softmax weights are cast back for PV — the reference AttentionOp's
    # cast point (networks.py:122-124) — at ~4x the fp32 MXU rate.
    #
    # The softmax VPU chain is the kernel's wall at the SD attn1 shape
    # (measured 4.36 ms vs a ~2.8 ms MXU lane floor, PARITY 8k), so the
    # per-[TQ,TK]-element work is cut from the textbook five ops to three:
    #  - the row-sum l rides the PV dot as a ones-column of V (one extra
    #    output lane, 40->41 of the same 128-lane MXU tile: zero MXU cost;
    #    l's recurrence l' = l*alpha + sum(p) IS acc's recurrence). The sum
    #    is now of the bf16-cast p — the same rounding the PV numerator
    #    already has, ~1e-4 relative on l vs the 4e-3 bf16 output rounding.
    #  - exp(s*scale - m) becomes exp2(s*fma_scale - m2): the scale multiply
    #    folds into exp2's argument FMA instead of a standalone [TQ,TK]
    #    multiply (exp lowers through exp2 on the VPU anyway), and the
    #    running max m tracks RAW scores (max commutes with the positive
    #    scale).
    q = q_ref[0]  # [TQ, D]
    t = k_ref.shape[1]
    tq, d = q.shape
    num_kb = t // tk
    s2 = scale * _LOG2E

    def body(kb, carry):
        m, acc = carry  # m: raw-score running max [TQ,1]; acc [TQ, D+1]
        k = k_ref[0, pl.ds(kb * tk, tk), :]  # [TK, D]
        v = v_ref[0, pl.ds(kb * tk, tk), :]
        v_aug = jnp.concatenate(
            [v, jnp.ones((tk, 1), v.dtype)], axis=1)  # [TK, D+1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TQ, TK] fp32, raw (scale folded into the exp2 args below)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s * s2 - m_new * s2)
        alpha = jnp.exp2((m - m_new) * s2)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, acc_new

    m0 = jnp.full((tq, 1), _NEG_INF, jnp.float32)
    acc0 = jnp.zeros((tq, d + 1), jnp.float32)
    m, acc = jax.lax.fori_loop(0, num_kb, body, (m0, acc0))
    o_ref[0] = (acc[:, 0:d] / acc[:, d:d + 1]).astype(o_ref.dtype)


# NEGATIVE (round 4): a transpose-free [B,T,H,D]-native forward — head
# axis sliced by the grid (block (1, tq, 1, d), grid (b, h, t/tq)) to kill
# the four 21 MB [B,T,H,D]<->[B,H,T,D] relayouts around every SD attn1
# call — CANNOT lower on TPU: Mosaic requires the last two block dims be
# (8, 128)-divisible or span the full array dim, and the sliced head axis
# is a size-1 block in the sublane position for any H > 1 (error at
# [8,4096,8,40]: "last two dimensions of your block shape are divisible").
# The only shape where the relayout is material is exactly that multi-head
# attn1; the VAE mid-block has H=1 where the transpose is already a free
# reshape. Kernel removed; tools/attn_bench.py kept the probe rows'
# history in git (commit 3d6bfa3 added it probe-only).


def _attn_kernel_dual(q_ref, k_ref, v_ref, o_ref, *, tk: int, scale: float):
    """Two interleaved online-softmax streams over the q tile's halves.

    The single-stream kernel's loop body is a serial MXU -> VPU -> MXU
    chain (QK dot -> exp/max/sum -> PV dot); measured 4.36 ms at the SD
    attn1 shape vs a ~2.8 ms MXU lane floor, i.e. the softmax VPU work
    adds on top instead of overlapping. Splitting the q tile into two
    INDEPENDENT halves gives Mosaic same-iteration freedom to run half
    A's exp chain against half B's dots — no cross-iteration score carry
    (the pipelined-carry variant measured 22% WORSE; PARITY 8k).

    MEASURED NEUTRAL at [8,4096,8,40]: 6.78/6.75 ms (tq 1024/512) vs
    6.96/6.82 single-stream, tq=256 11% worse — halving the dot M-dim
    costs what the overlap buys. Ships default-OFF (PARITY 14)."""
    q = q_ref[0]
    t = k_ref.shape[1]
    tq, d = q.shape
    hq = tq // 2
    q1, q2 = q[0:hq], q[hq:tq]
    num_kb = t // tk

    def body(kb, carry):
        m1, l1, a1, m2, l2, a2 = carry
        k = k_ref[0, pl.ds(kb * tk, tk), :]
        v = v_ref[0, pl.ds(kb * tk, tk), :]

        def stream(qh, m, l, acc):
            s = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc_new

        m1, l1, a1 = stream(q1, m1, l1, a1)
        m2, l2, a2 = stream(q2, m2, l2, a2)
        return m1, l1, a1, m2, l2, a2

    init = (jnp.full((hq, 1), _NEG_INF, jnp.float32),
            jnp.zeros((hq, 1), jnp.float32),
            jnp.zeros((hq, d), jnp.float32)) * 2
    m1, l1, a1, m2, l2, a2 = jax.lax.fori_loop(0, num_kb, body, init)
    o_ref[0, 0:hq] = (a1 / l1).astype(o_ref.dtype)
    o_ref[0, hq:tq] = (a2 / l2).astype(o_ref.dtype)


# A/B probe flag: route flash_attention through the dual-stream kernel.
_ATTN_DUAL = os.environ.get("DTTS_ATTN_DUAL", "") not in ("", "0")


def _attention_reference(q, k, v):
    """jnp mirror of the kernel's numerics (fp32 scores softmax); VJP source
    for the differentiable wrapper — the Pallas kernel is forward-only."""
    orig = q.dtype
    d = q.shape[-1]
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32),
        k.astype(jnp.float32) * (1.0 / d**0.5),
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(orig)


def _attention_bwd_explicit(q, k, v, g):
    """Attention VJP with the six backward dots in the INPUT dtype.

    jax.vjp of ``_attention_reference`` inherits its fp32 upcasts, so for
    bf16 training every backward matmul ran as an fp32 dot — measured 24%
    of the whole imagenet64 train step (29 ms device time vs 2.7 ms for
    all Pallas forwards; tools/train_bench.py --profile, round 4). Here
    the dot OPERANDS stay in q.dtype (bf16 under training) while every
    accumulation, the softmax, and its VJP run in fp32 — the same
    numerics contract as the forward kernel (bf16 MXU passes, fp32
    renormalization), and the standard flash-attention backward recipe.
    For fp32 inputs this is the old math with the scale folded after the
    q.k dot.
    """
    orig = q.dtype
    f32 = jnp.float32
    scale = 1.0 / q.shape[-1] ** 0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=f32) * scale
    w = jax.nn.softmax(s, axis=-1)  # fp32 [B, H, Tq, Tk]
    wb = w.astype(orig)
    gb = g.astype(orig)
    dv = jnp.einsum("bhqk,bqhd->bkhd", wb, gb, preferred_element_type=f32)
    dw = jnp.einsum("bqhd,bkhd->bhqk", gb, v, preferred_element_type=f32)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))  # softmax VJP, fp32
    dsb = ds.astype(orig)
    dq = jnp.einsum("bhqk,bkhd->bqhd", dsb, k, preferred_element_type=f32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dsb, q, preferred_element_type=f32) * scale
    return dq.astype(orig), dk.astype(orig), dv.astype(orig)


def _attn_stats_kernel(q_ref, k_ref, l2_ref, *, tk: int, scale: float):
    """Row log2-sum-exp2 of the scaled scores: L2_i such that the softmax
    weights are exp2(s_ij*scale*log2e - L2_i). Same online recurrence (raw-
    score running max, scale folded into exp2) as the forward kernel."""
    q = q_ref[0]  # [TQ, D]
    t = k_ref.shape[1]
    tq = q.shape[0]
    num_kb = t // tk
    s2 = scale * _LOG2E

    def body(kb, carry):
        m, l = carry
        k = k_ref[0, pl.ds(kb * tk, tk), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        l_new = l * jnp.exp2((m - m_new) * s2) + jnp.sum(
            jnp.exp2(s * s2 - m_new * s2), axis=1, keepdims=True)
        return m_new, l_new

    m0 = jnp.full((tq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    m, l = jax.lax.fori_loop(0, num_kb, body, (m0, l0))
    l2_ref[0] = jnp.broadcast_to(m * s2 + jnp.log2(l), (tq, 8))


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l2_ref, dl_ref, dq_ref,
                        *, tk: int, scale: float):
    """dQ_i = scale * sum_j p_ij (dO_i.v_j - delta_i) k_j, K/V streamed.

    p is recomputed from the saved row statistics (one extra QK dot vs
    saving the weights — the flash-backward recompute recipe), so no
    [T, T] tensor ever reaches HBM. Dot operands stay in the input dtype
    (bf16 under training), accumulation fp32 — the forward's contract."""
    q = q_ref[0]        # [TQ, D]
    do = do_ref[0]      # [TQ, D]
    l2 = l2_ref[0][:, 0:1]  # [TQ, 1] fp32 row lse
    dl = dl_ref[0][:, 0:1]  # [TQ, 1] fp32 row delta
    t = k_ref.shape[1]
    tq, d = q.shape
    num_kb = t // tk
    s2 = scale * _LOG2E

    def body(kb, acc):
        k = k_ref[0, pl.ds(kb * tk, tk), :]
        v = v_ref[0, pl.ds(kb * tk, tk), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        p = jnp.exp2(s * s2 - l2)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - dl)
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((tq, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _attn_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, l2_ref, dl_ref,
                         dk_ref, dv_ref, *, tq: int, scale: float):
    """dV_j = sum_i p_ij dO_i;  dK_j = scale * sum_i p_ij (dP_ij - delta_i) q_i.

    Grid over k-blocks with Q/dO streamed; the transposed score block
    s^T = k q^T puts the q axis on LANES, so the row statistics arrive in
    the lane-oriented [BH, 8, T] layout (see _flash_attention_vjp)."""
    k = k_ref[0]  # [TK, D]
    v = v_ref[0]
    t = q_ref.shape[1]
    tk_, d = k.shape
    num_qb = t // tq
    s2 = scale * _LOG2E

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * tq, tq), :]       # [TQ, D]
        do = do_ref[0, pl.ds(qb * tq, tq), :]
        l2 = l2_ref[0, 0:1, pl.ds(qb * tq, tq)]   # [1, TQ]
        dl = dl_ref[0, 0:1, pl.ds(qb * tq, tq)]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        pt = jnp.exp2(st * s2 - l2)               # [TK, TQ]
        dv = dv + jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dst = pt * (dpt - dl)
        dk = dk + jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((tk_, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tq", "tk", "interpret"))
def _flash_attention_vjp(q, k, v, o, g, *, tq: int = 512, tk: int = 512,
                         interpret: bool = False):
    """Flash-attention backward on [B, T, H, D]: (dq, dk, dv).

    The materializing XLA backward was 24% of the imagenet64 train step —
    the fp32 [B,H,T,T] softmax weights and their bf16 casts alone move
    ~2-3 GB of HBM per 32x32 attention site (tools/train_bench.py
    --profile, round 4: 9.9 ms of convert_element_type + 17 ms of backward
    dots). Here the [T, T] blocks live only in VMEM: a stats kernel
    recovers each row's logsumexp (the forward kernel does not save it),
    then dQ (grid over q-blocks) and dK/dV (grid over k-blocks) recompute
    p blockwise from those statistics — 7 MXU passes total vs the
    forward's 2, the standard flash backward recipe.

    delta_i = dO_i . O_i is computed in XLA from the saved forward output
    (cheap elementwise+reduce); the row statistics are fed to the kernels
    twice — sublane-oriented [BH, T, 8] for dQ (rows of s) and
    lane-oriented [BH, 8, T] for dK/dV (rows of s^T) — because Mosaic
    block shapes must keep the last two dims tile-aligned or spanning, so
    a [BH, T] vector cannot be sliced along T in the sublane position.
    """
    b, t, h, d = q.shape
    tq = _fit_tile(t, tq)
    tk = _fit_tile(t, tk)
    scale = 1.0 / d**0.5
    bh = b * h

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, t, d)

    qf, kf, vf, gf = to_bh(q), to_bh(k), to_bh(v), to_bh(g)
    vspec = dict(memory_space=pltpu.VMEM)
    blk_q = pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0), **vspec)
    blk_k = pl.BlockSpec((1, tk, d), lambda i, j: (i, j, 0), **vspec)
    res_t = pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), **vspec)
    blk_r8 = pl.BlockSpec((1, tq, 8), lambda i, j: (i, j, 0), **vspec)
    res_l8 = pl.BlockSpec((1, 8, t), lambda i, j: (i, 0, 0), **vspec)

    l2r = pl.pallas_call(
        functools.partial(_attn_stats_kernel, tk=tk, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, 8), jnp.float32),
        grid=(bh, t // tq),
        in_specs=[blk_q, res_t],
        out_specs=blk_r8,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * t * t * d, bytes_accessed=2 * bh * t * d * 4,
            transcendentals=bh * t * t),
    )(qf, kf)

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    dbh = delta.transpose(0, 2, 1).reshape(bh, t)
    dr = jnp.broadcast_to(dbh[:, :, None], (bh, t, 8))
    l2bh = l2r[:, :, 0]
    l2l = jnp.broadcast_to(l2bh[:, None, :], (bh, 8, t))
    dll = jnp.broadcast_to(dbh[:, None, :], (bh, 8, t))

    dq = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, tk=tk, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=(bh, t // tq),
        in_specs=[blk_q, res_t, res_t, blk_q, blk_r8, blk_r8],
        out_specs=blk_q,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d, bytes_accessed=5 * bh * t * d * 4,
            transcendentals=bh * t * t),
    )(qf, kf, vf, gf, l2r, dr)

    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, tq=tq, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((bh, t, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), v.dtype)),
        grid=(bh, t // tk),
        in_specs=[blk_k, blk_k, res_t, res_t, res_l8, res_l8],
        out_specs=(blk_k, blk_k),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t * t * d, bytes_accessed=6 * bh * t * d * 4,
            transcendentals=bh * t * t),
    )(kf, vf, qf, gf, l2l, dll)

    def from_bh(x):
        return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)

    return from_bh(dq), from_bh(dk), from_bh(dv)


def _flash_bwd_eligible(t: int, d: int) -> bool:
    # T >= 1024: at the EDM res-32 training shape ([16,1024,6,64]) the
    # kernel pair measures 1.96x the materializing backward (4.21 -> 2.14
    # ms, tools/attn_bwd_probe.py); at T=256 (cifar10's res-16 sites) the
    # per-block [256,256]x[256,64] dots underfill the MXU and the step
    # measures ~2% SLOWER than XLA's batched dots (130.3/131.1 vs 128.3 ms
    # reproduced), so short rows keep the explicit backward. Tile rule as
    # the forward; the kernels handle any lane width that spans D.
    return t >= 1024 and _fit_tile(t, 512) >= 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_diff(q, k, v, tq, tk, interpret):
    return _flash_attention_fwd_only(q, k, v, tq=tq, tk=tk, interpret=interpret)


def _flash_diff_fwd(q, k, v, tq, tk, interpret):
    out = _flash_diff(q, k, v, tq, tk, interpret)
    return out, (q, k, v, out)


def _flash_diff_bwd(tq, tk, interpret, res, g):
    q, k, v, o = res
    t, d = q.shape[1], q.shape[3]
    if (interpret or jax.default_backend() not in ("tpu", "axon")
            or not _flash_bwd_eligible(t, d)):
        return _attention_bwd_explicit(q, k, v, g)
    return _flash_attention_vjp(q, k, v, o, g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, tq: int = 1024, tk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """q, k, v: [B, T, H, D] -> [B, T, H, D], fp32-softmax flash attention.

    Default 1024x1024 tiles: at the EDM res-32 hot shape ([16,1024,6,64])
    the whole-K single-block form beats 512/512 by ~8% and XLA by ~35%
    (tools/attn_bench.py); larger T (SD's 4096) still streams K/V in 1024
    blocks. Differentiable: backward is the VJP of the equivalent XLA
    attention (the kernel implements only the forward).

    Tile fitting degrades to the largest divisor of T; an unanticipated T
    (odd/prime — never produced by square feature maps) would fit tiles as
    small as 1, a pathologically slow kernel. Such shapes fall back to the
    XLA reference attention with a warning instead."""
    t = q.shape[1]
    d = q.shape[3]
    fitted = min(_fit_tile(t, tq), _fit_tile(t, tk))
    if fitted < 128 and fitted < t:
        import warnings

        warnings.warn(
            f"flash_attention: sequence length {t} only tiles at {fitted} "
            "(< 128); falling back to XLA attention", stacklevel=2)
        return _attention_reference(q, k, v)
    # Shrink the q tile until the kernel's VMEM footprint fits: resident
    # K/V (DOUBLE-buffered — Mosaic pipelines the (1, t, d) blocks across
    # grid steps even though their index only changes with bh; the round-5
    # axon AOT toolchain enforces this in its scoped-vmem stack accounting,
    # so a model that counts K/V once admits kernels that no longer
    # compile: the VAE mid-block's [*, 4096, 1, 512] bf16 — 17 MB vs the
    # 16 MB scoped limit — compiled under the round-4 stack and fails
    # under this one) + double-buffered q/out tiles + the fp32 score
    # block, its cast copy, and the fp32 accumulator. If no q tile fits,
    # fall back to the XLA reference path rather than ship an
    # uncompilable kernel.
    item = q.dtype.itemsize
    tk = _fit_tile(t, tk)

    def vmem(tq_):
        return (4 * t * d * item              # K/V resident, double-buffered
                + 4 * tq_ * d * item          # q/out tiles double-buffered
                + tq_ * tk * 4                # s fp32
                + tq_ * tk * item             # p cast
                + tq_ * (d + 1) * 4)          # acc fp32

    tq = _fit_tile(t, tq)
    while tq > 128 and vmem(tq) > 14 * 2**20:
        tq = _fit_tile(t, tq // 2)
    if vmem(tq) > 14 * 2**20:
        return _attention_reference(q, k, v)
    return _flash_diff(q, k, v, tq, tk, interpret)


@functools.partial(jax.jit, static_argnames=("tq", "tk", "interpret"))
def _flash_attention_fwd_only(
    q: jax.Array, k: jax.Array, v: jax.Array, *, tq: int = 1024, tk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    b, t, h, d = q.shape
    # largest divisor of T that fits the requested tile (T=4608 with a
    # 1024 request tiles at 512, etc.); T is always a multiple of the
    # feature-map width so a viable divisor exists
    tq = _fit_tile(t, tq)
    tk = _fit_tile(t, tk)
    scale = 1.0 / (d**0.5)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    grid = (b * h, t // tq)
    kern = _attn_kernel_dual if (_ATTN_DUAL and tq % 2 == 0
                                 and tq // 2 >= 8) else _attn_kernel
    out = pl.pallas_call(
        functools.partial(kern, tk=tk, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda bh, iq: (bh, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda bh, iq: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda bh, iq: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda bh, iq: (bh, iq, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * d, bytes_accessed=3 * b * h * t * d * 4,
            transcendentals=b * h * t * t,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


def _qkv_attn_kernel(qkv_ref, o_ref, *, heads: int, tq: int, scale: float):
    """All-heads attention on the projection's native [T, 3C] layout.

    One grid step handles every head for one (batch, q-tile): q/k/v for
    head h are STATIC 64-aligned lane slices of the single resident block,
    so no transpose or head-split relayout ever exists — the layout ops
    that cost 7.7% of device self-time in the round-3 xla2 bench trace.
    T is fully resident (image-attention T <= 4096 at these widths), so
    softmax is a plain full-row reduction, no online accumulation.
    """
    iq = pl.program_id(1)
    c3 = qkv_ref.shape[2]
    c = c3 // 3
    d = c // heads
    t = qkv_ref.shape[1]
    ones = jnp.ones((t, 1), jnp.float32)
    for h in range(heads):
        # fp32 operands: the kernel runs at ~95% of the fp32(x3-pass)
        # matmul roof and is bound by the 64-lane head slicing, not the
        # MXU — both an all-bf16 variant (592 -> 583 NFE/s) and a
        # bf16-QK^T-only variant (603.7 -> 601.9) measured no better on
        # the flagship bench, so the numerically-simplest form stays.
        # Softmax-VPU cuts (same as _attn_kernel): scale*log2e folds into
        # the q pre-multiply so p = exp2(s - m) with no per-[TQ,T]-element
        # multiply inside exp's lowering, and the row-sum l rides the PV
        # dot as a ones column of V (d -> d+1 lanes of the same tile).
        q = qkv_ref[0, pl.ds(iq * tq, tq), h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv_ref[0, :, c + h * d:c + (h + 1) * d].astype(jnp.float32)
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d].astype(jnp.float32)
        v_aug = jnp.concatenate([v, ones], axis=1)  # [T, D+1]
        s = jax.lax.dot_general(
            q * (scale * _LOG2E), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, T], log2e-scaled: exp2-normalization == softmax
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        o_aug = jax.lax.dot_general(
            p, v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o_aug[:, 0:d] / o_aug[:, d:d + 1]
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _qkv_attn_pair_kernel(qkv_ref, o_ref, *, heads: int, tq: int,
                          scale: float, pv_dtype):
    """Head-PAIR variant of _qkv_attn_kernel for bf16 operands.

    The single-head kernel's 64-lane slices split a 128-lane tile — fine
    for fp32 (Mosaic re-tiles cheaply there) but the reason both naive
    bf16 variants measured neutral-to-worse (round-3 negative result, see
    _qkv_attn_kernel). Here every slice is a 2-head 128-lane block, i.e.
    tile-aligned in bf16's (16, 128) layout, and the block-diagonal
    per-head contraction is recovered with masked K/V halves:

        sA = q2 @ (k2 * maskA)^T   -> head h scores   (lanes 64:128 of k2
        sB = q2 @ (k2 * maskB)^T   -> head h+1 scores  contribute zero)
        o2 = softmax(sA) @ (v2*maskA) + softmax(sB) @ (v2*maskB)

    Per head this is one 128-deep bf16 single-pass dot instead of a
    64-deep fp32 3-pass dot — 1.5x less MXU time — and zero unaligned
    slices. Numerics: QK^T products of bf16 inputs are exact in the fp32
    accumulator (identical to the fp32-operand kernel's scores); the PV
    dot runs with pv_dtype weights (bf16 = the flash kernel / reference
    AttentionOp cast point, networks.py:122-124)."""
    iq = pl.program_id(1)
    c3 = qkv_ref.shape[2]
    c = c3 // 3
    d = c // heads
    t = qkv_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * d), 1)
    mask_a = (lane < d).astype(qkv_ref.dtype)
    s2c = scale * _LOG2E  # exp(x*scale) == exp2(x*s2c); max commutes
    for p in range(heads // 2):
        lo = p * 2 * d
        q2 = qkv_ref[0, pl.ds(iq * tq, tq), lo:lo + 2 * d]
        k2 = qkv_ref[0, :, c + lo:c + lo + 2 * d]
        v2 = qkv_ref[0, :, 2 * c + lo:2 * c + lo + 2 * d]
        ka = k2 * mask_a
        kb = k2 - ka
        va = v2 * mask_a
        vb = v2 - va
        # scale folds into exp2's FMA (exp(x*scale) == exp2(x*s2c), max
        # commutes with the positive scale). NO ones-column here, unlike
        # _attn_kernel: the pair block is already a full 128-lane tile
        # (2d = 128), so augmenting to 129 lanes would add a SECOND MXU
        # tile column to each PV dot — measured 602.8 -> 588.0 NFE/s on
        # the flagship bench (+50% pair-PV MXU time), reverted. The trick
        # is only free when d+1 stays inside the existing lane tile.
        sa = jax.lax.dot_general(
            q2, ka, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sb = jax.lax.dot_general(
            q2, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        pa = jnp.exp2(sa * s2c - jnp.max(sa, axis=1, keepdims=True) * s2c)
        pb = jnp.exp2(sb * s2c - jnp.max(sb, axis=1, keepdims=True) * s2c)
        la = jnp.sum(pa, axis=1, keepdims=True)
        lb = jnp.sum(pb, axis=1, keepdims=True)
        oa = jax.lax.dot_general(
            pa.astype(pv_dtype), va, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ob = jax.lax.dot_general(
            pb.astype(pv_dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, lo:lo + 2 * d] = (oa / la + ob / lb).astype(o_ref.dtype)
    if heads % 2:
        # odd head count (e.g. 192-ch levels, 3 heads): last head takes the
        # single-head fp32 path — one 64-lane slice instead of all of them.
        h = heads - 1
        q = qkv_ref[0, pl.ds(iq * tq, tq), h * d:(h + 1) * d].astype(jnp.float32)
        k = qkv_ref[0, :, c + h * d:c + (h + 1) * d].astype(jnp.float32)
        v = qkv_ref[0, :, 2 * c + h * d:2 * c + (h + 1) * d].astype(jnp.float32)
        v_aug = jnp.concatenate([v, jnp.ones((t, 1), jnp.float32)], axis=1)
        s = jax.lax.dot_general(
            q * s2c, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        pp = jnp.exp2(s - m)
        o_aug = jax.lax.dot_general(
            pp, v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o = o_aug[:, 0:d] / o_aug[:, d:d + 1]
        o_ref[0, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _qkv_attention_reference(qkv, heads):
    """jnp mirror on the same [B, T, 3C] layout (VJP source and CPU path):
    identical numerics to _attention_reference after the head split."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    q = qkv[..., :c].reshape(b, t, heads, c // heads)
    k = qkv[..., c:2 * c].reshape(b, t, heads, c // heads)
    v = qkv[..., 2 * c:].reshape(b, t, heads, c // heads)
    return _attention_reference(q, k, v).reshape(b, t, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _qkv_attn_diff(qkv, heads, interpret):
    return _qkv_self_attention_fwd_only(qkv, heads=heads, interpret=interpret)


def _qkv_attn_diff_fwd(qkv, heads, interpret):
    out = _qkv_attn_diff(qkv, heads, interpret)
    return out, (qkv, out)


def _qkv_attn_diff_bwd(heads, interpret, res, g):
    # Same head split/merge as _qkv_attention_reference (pure relayout,
    # self-inverse). On TPU the dots run through the flash backward
    # kernels (_flash_attention_vjp) — the head-split transposes cost
    # ~0.1 ms of HBM traffic vs the ~3 ms/site the materializing XLA
    # backward paid in [T,T] weight round-trips; elsewhere the explicit
    # jnp backward keeps bf16 MXU-rate dots.
    qkv, o = res
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    q = qkv[..., :c].reshape(b, t, heads, d)
    k = qkv[..., c:2 * c].reshape(b, t, heads, d)
    v = qkv[..., 2 * c:].reshape(b, t, heads, d)
    g4 = g.reshape(b, t, heads, d)
    if (interpret or jax.default_backend() not in ("tpu", "axon")
            or not _flash_bwd_eligible(t, d)):
        dq, dk, dv = _attention_bwd_explicit(q, k, v, g4)
    else:
        dq, dk, dv = _flash_attention_vjp(
            q, k, v, o.reshape(b, t, heads, d), g4)
    return (jnp.concatenate(
        [dq.reshape(b, t, c), dk.reshape(b, t, c), dv.reshape(b, t, c)],
        axis=-1),)


_qkv_attn_diff.defvjp(_qkv_attn_diff_fwd, _qkv_attn_diff_bwd)


def qkv_self_attention_eligible(qkv: jax.Array, heads: int) -> bool:
    """Kernel constraints: 64-aligned head lanes (static lane slices), a
    viable q-tile, and the whole [T, 3C] block resident in VMEM."""
    if qkv.ndim != 3 or qkv.shape[2] % (3 * heads):
        return False
    t, c3 = qkv.shape[1], qkv.shape[2]
    d = c3 // 3 // heads
    # 4 MB single-buffer bound: Mosaic double-buffers the resident block
    # across grid steps and the round-5 axon AOT stack counts both buffers
    # against the 16 MB scoped-vmem limit (see _pallas_eligible /
    # flash_attention). Every EDM shape that routes here is <= 2.4 MB
    # (t=1024 x c3=1152 bf16), so nothing currently flips.
    return (
        d % 64 == 0
        and _fit_tile(t, 256) >= min(t, 128)
        and t * c3 * qkv.dtype.itemsize <= 4 * 2**20
    )


def qkv_self_attention(qkv: jax.Array, heads: int, *,
                       interpret: bool = False) -> jax.Array:
    """Fused all-heads self-attention: [B, T, 3C] -> [B, T, C].

    The input is the UNet qkv 1x1-projection output with q|k|v contiguous
    and head-major within each (the layout the torch->flax converter
    produces, torch_import._deinterleave_qkv). fp32-softmax numerics of the
    reference AttentionOp (edm/training/networks.py:113-126).
    Differentiable: backward is the VJP of the jnp mirror."""
    return _qkv_attn_diff(qkv, heads, interpret)


_ATTN_PAIR = os.environ.get("DTTS_ATTN_PAIR", "1") != "0"
# Head-pair bf16 kernel routing (read once at import, like the other
# kernel kill-switches). Only engages for bf16 operands — with fp32
# inputs the 128-deep 3-pass dots would be 2x MORE MXU work per head.


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def _qkv_self_attention_fwd_only(
    qkv: jax.Array, *, heads: int, interpret: bool = False
) -> jax.Array:
    b, t, c3 = qkv.shape
    assert c3 % 3 == 0 and (c3 // 3) % heads == 0
    c = c3 // 3
    d = c // heads
    tq = _fit_tile(t, 256)
    if _ATTN_PAIR and heads >= 2 and qkv.dtype == jnp.bfloat16:
        kern = functools.partial(
            _qkv_attn_pair_kernel, heads=heads, tq=tq,
            scale=1.0 / (d**0.5), pv_dtype=qkv.dtype)
    else:
        kern = functools.partial(_qkv_attn_kernel, heads=heads, tq=tq,
                                 scale=1.0 / (d**0.5))
    # The qkv block's index_map is constant in the q-tile axis, so Mosaic
    # fetches it once per batch element and revisits it from VMEM.
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        grid=(b, t // tq),
        in_specs=[
            pl.BlockSpec((1, t, c3), lambda bi, iq: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda bi, iq: (bi, iq, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * t * t * d,
            bytes_accessed=(3 + 1) * b * t * c * qkv.dtype.itemsize,
            transcendentals=b * heads * t * t,
        ),
    )(qkv)


__all__ = ["flash_attention", "qkv_self_attention", "qkv_self_attention_eligible"]

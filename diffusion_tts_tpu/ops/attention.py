"""Self-attention for UNet feature maps with fp32-softmax semantics.

The reference computes attention weights in fp32 regardless of activation
dtype (AttentionOp, edm/training/networks.py:113-126): softmax_k(q.k /
sqrt(d)) with q,k upcast, then w @ v in the original dtype. This module
keeps those numerics but in NHWC/[B,T,H,D] layout so XLA tiles the two
matmuls onto the MXU; a fused Pallas flash-attention kernel (ops/pallas/
attention.py) is used on TPU for large T when enabled.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Trace-time kill-switch for every Pallas attention route in this module
# (mirrors DTTS_NO_PALLAS_CONV / _FF / _GN). roofline.canonical_formulation
# flips the module constant directly so SOL numerators are computed on the
# all-XLA canonical program, where every matmul is a visible dot_general —
# FLOPs inside Pallas custom calls are invisible to both the jaxpr walker
# and XLA's cost_analysis.
_NO_PALLAS_ATTN = bool(os.environ.get("DTTS_NO_PALLAS_ATTN"))


def multihead_attention_fp32(
    q: jax.Array, k: jax.Array, v: jax.Array, *, use_pallas: bool | None = None
) -> jax.Array:
    """Attention with fp32 softmax.

    Args:
      q, k, v: [B, T, H, D] (batch, tokens, heads, head_dim), any float dtype.
      use_pallas: force/forbid the fused Pallas kernel; None = auto (TPU and
        shape-eligible).

    Returns:
      [B, T, H, D] in q.dtype. Matches the reference AttentionOp numerics:
      scores = (q_fp32) . (k/sqrt(D))_fp32, softmax over keys in fp32,
      output = w @ v computed in v.dtype.
    """
    if use_pallas is None:
        use_pallas = _pallas_eligible(q)
    if use_pallas:
        from diffusion_tts_tpu.ops.pallas.attention import flash_attention

        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)


def _pallas_eligible(q: jax.Array) -> bool:
    if _NO_PALLAS_ATTN or jax.default_backend() not in ("tpu", "axon"):
        return False
    b, t, h, d = q.shape
    # Pallas pays off once the score matrix stops fitting in registers/VMEM
    # comfortably; tiny feature maps are faster through plain XLA fusion.
    # Upper bound: the kernel keeps one head's FULL K/V resident in VMEM
    # (ops/pallas/attention.py BlockSpecs) and Mosaic DOUBLE-buffers those
    # blocks across grid steps, so the bound is 4*t*d*itemsize against the
    # 16 MB scoped-vmem limit (14 MB budget, matching flash_attention's
    # own model). History of the VAE mid-block's [4096, 512] single head:
    # a K-STREAMING grid variant measured 89 ms vs XLA's 5-9 ms and was
    # removed (round-4 note 8j); the round-4 bf16 PLAIN-kernel win there
    # (3.29 vs 4.75 ms) relied on the round-4 AOT stack accepting
    # single-buffered K/V accounting — the round-5 axon toolchain counts
    # the double buffer (17 MB > 16 MB scoped) and rejects the kernel at
    # compile time, so that shape now stays on XLA (~1% SD e2e cost,
    # PARITY round-5 notes).
    if t < 1024 or d % 8:
        return False
    return 4 * t * d * q.dtype.itemsize <= 14 * 2**20


def fused_qkv_self_attention(
    qkv: jax.Array, heads: int, *, use_pallas: bool | None = None
) -> jax.Array:
    """All-heads self-attention on the qkv projection's native layout.

    Args:
      qkv: [B, T, 3C] — q|k|v contiguous lane segments, head-major within
        each (the 1x1-conv output layout after torch_import's qkv
        de-interleave).
      heads: number of attention heads (C must divide by heads).

    Returns [B, T, C] in qkv.dtype, fp32-softmax semantics. On TPU with
    64-aligned head width this runs the fused Pallas kernel
    (ops/pallas/attention.py::qkv_self_attention) — no head-split relayout
    or [B,H,T,D] transpose ever materializes; elsewhere it falls back to
    splitting heads and the standard attention path.
    """
    from diffusion_tts_tpu.ops.pallas.attention import (
        qkv_self_attention,
        qkv_self_attention_eligible,
    )

    if use_pallas is None:
        use_pallas = (
            not _NO_PALLAS_ATTN
            and jax.default_backend() in ("tpu", "axon")
            and qkv_self_attention_eligible(qkv, heads)
        )
    if use_pallas:
        return qkv_self_attention(qkv, heads)
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    q = qkv[..., :c].reshape(b, t, heads, d)
    k = qkv[..., c:2 * c].reshape(b, t, heads, d)
    v = qkv[..., 2 * c:].reshape(b, t, heads, d)
    return multihead_attention_fp32(q, k, v).reshape(b, t, c)


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    orig_dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    qf = q.astype(jnp.float32)
    kf = (k.astype(jnp.float32)) * scale
    # [B, H, Tq, Tk]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kf, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(scores, axis=-1).astype(orig_dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


__all__ = ["multihead_attention_fp32", "fused_qkv_self_attention"]

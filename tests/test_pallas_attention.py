"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.ops.attention import _xla_attention
from diffusion_tts_tpu.ops.pallas.attention import flash_attention


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 256, 1, 64), (1, 512, 2, 64)])
def test_flash_attention_matches_xla(shape, dtype):
    b, t, h, d = shape
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, shape, dtype)
    k = jax.random.normal(kk, shape, dtype)
    v = jax.random.normal(kv, shape, dtype)
    ref = _xla_attention(q, k, v)
    out = flash_attention(q, k, v, tq=128, tk=128, interpret=True)
    # differentiability: VJP must match the XLA reference attention's grads
    gf = jax.grad(lambda a, b, c: jnp.sum(
        flash_attention(a, b, c, tq=128, tk=128, interpret=True) ** 2
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda a, b, c: jnp.sum(_xla_attention(a, b, c) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-2, rtol=2e-2)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


@pytest.mark.parametrize("dtype,t,heads,d", [
    (jnp.float32, 512, 2, 64),   # multi-tile q (tq=256 -> 2 q-tiles)
    (jnp.bfloat16, 64, 3, 64),   # odd heads: pair kernel + leftover head
    (jnp.bfloat16, 512, 4, 64),  # pure pair kernel, multi-tile q
])
def test_qkv_self_attention_matches_reference(t, heads, d, dtype):
    """The fused all-heads kernel on the native [B, T, 3C] projection
    layout vs splitting heads + standard attention (interpret mode)."""
    from diffusion_tts_tpu.ops.pallas.attention import (
        qkv_self_attention,
        _qkv_attention_reference,
    )

    b, c = 1, heads * d
    qkv = jax.random.normal(jax.random.key(5), (b, t, 3 * c), dtype)
    out = qkv_self_attention(qkv, heads, interpret=True)
    ref = _qkv_attention_reference(qkv, heads)
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)


def test_qkv_self_attention_grads():
    """Native-AD grads through the custom_vjp jnp mirror (small shape —
    interpret-mode forwards dominate suite time at larger T)."""
    from diffusion_tts_tpu.ops.pallas.attention import (
        qkv_self_attention,
        _qkv_attention_reference,
    )

    heads = 3
    qkv = jax.random.normal(jax.random.key(5), (2, 64, 3 * heads * 64),
                            jnp.float32)
    gf = jax.grad(lambda x: jnp.sum(
        qkv_self_attention(x, heads, interpret=True) ** 2))(qkv)
    gr = jax.grad(lambda x: jnp.sum(
        _qkv_attention_reference(x, heads) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(gr, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_qkv_wrapper_fallback_matches():
    """CPU route of fused_qkv_self_attention == the pallas kernel's
    numerics, and ineligible shapes (d=32) take the fallback."""
    from diffusion_tts_tpu.ops.attention import fused_qkv_self_attention
    from diffusion_tts_tpu.ops.pallas.attention import (
        qkv_self_attention_eligible,
        _qkv_attention_reference,
    )

    qkv = jax.random.normal(jax.random.key(9), (1, 128, 3 * 128), jnp.float32)
    out = fused_qkv_self_attention(qkv, 2)  # CPU -> fallback path
    ref = _qkv_attention_reference(qkv, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)
    assert qkv_self_attention_eligible(qkv, 2)
    assert not qkv_self_attention_eligible(qkv, 4)  # d=32: unaligned lanes


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 256, 2, 64), (1, 256, 1, 40)])
def test_flash_attention_vjp_kernels_match_reference(shape, dtype):
    """The flash backward kernel pair (stats -> dQ -> dK/dV recompute,
    interpret mode) vs jax.vjp of the materializing reference attention.
    This is the TPU training backward — the custom_vjp wrappers route to
    it on TPU; CPU tests must drive it explicitly."""
    from diffusion_tts_tpu.ops.pallas.attention import (
        _attention_reference,
        _flash_attention_vjp,
    )

    b, t, h, d = shape
    ks = jax.random.split(jax.random.key(3), 4)
    q, k, v, g = (jax.random.normal(kk, shape, dtype) for kk in ks)
    o, pull = jax.vjp(_attention_reference, q, k, v)
    dq_r, dk_r, dv_r = pull(g)
    dq, dk, dv = _flash_attention_vjp(q, k, v, o, g, tq=128, tk=128,
                                      interpret=True)
    tol = 2e-5 if dtype == jnp.float32 else 4e-2
    for a, r in zip((dq, dk, dv), (dq_r, dk_r, dv_r)):
        assert a.dtype == r.dtype
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=tol, rtol=tol)

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

"""Fused GroupNorm+SiLU kernel vs the reference jnp implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.ops.pallas.groupnorm import group_norm_silu


def ref_gn(x, scale, bias, groups, eps, silu):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    out = xn * scale + bias
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("silu", [True, False])
def test_group_norm_silu_matches(dtype, silu):
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 256), dtype) * 3 + 1
    scale = jax.random.normal(jax.random.fold_in(key, 1), (256,))
    bias = jax.random.normal(jax.random.fold_in(key, 2), (256,))
    got = group_norm_silu(x, scale, bias, groups=32, eps=1e-5, apply_silu=silu,
                          interpret=True)
    want = ref_gn(x, scale, bias, 32, 1e-5, silu)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol, rtol=tol
    )

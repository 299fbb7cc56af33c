"""Fused nearest-2x-upsample + conv3x3 (ops/resample.py): exact-equivalence
tests vs the explicit upsample-then-conv formulation, at op and module
level (SD Upsample2D and the EDM up-block conv)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3


@pytest.mark.parametrize("shape", [(5, 7, 3, 4), (8, 8, 16, 8), (1, 1, 2, 2)])
def test_op_matches_explicit_upsample_conv(shape):
    h, w, i, o = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, i)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, i, o)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    xup = jnp.broadcast_to(x[:, :, None, :, None, :], (2, h, 2, w, 2, i)
                           ).reshape(2, 2 * h, 2 * w, i)
    ref = jax.lax.conv_general_dilated(
        xup, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = nn_upsample2x_conv3x3(x, k, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sd_upsample2d_matches_unfused():
    from diffusion_tts_tpu.models import sd_layers

    m = sd_layers.Upsample2D(out_channels=8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 6, 6, 8)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    fused = m.apply(v, x)

    # reference path: explicit nearest-2x then the same conv params
    xup = jnp.broadcast_to(x[:, :, None, :, None, :], (2, 6, 2, 6, 2, 8)
                           ).reshape(2, 12, 12, 8)
    p = v["params"]["conv"]
    ref = jax.lax.conv_general_dilated(
        xup, p["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_edm_conv_up_matches_unfused():
    from diffusion_tts_tpu.models.layers import (
        EDMConv, _depthwise_conv_transpose, _resample_kernel,
    )

    m = EDMConv(features=6, kernel=3, up=True, resample_filter=(1, 1))
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 5, 5, 4)),
                    jnp.float32)
    v = m.init(jax.random.key(0), x)
    fused = m.apply(v, x)
    assert fused.shape == (2, 10, 10, 6)

    fk = _resample_kernel((1, 1), 4, up=True)
    xup = _depthwise_conv_transpose(x, fk, 2, 0)
    ref = jax.lax.conv_general_dilated(
        xup, v["params"]["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + v["params"]["bias"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_edm_conv_filter13_keeps_old_path():
    """Non-(1,1) filters (NCSN++) must keep the filtered-transpose path."""
    from diffusion_tts_tpu.models.layers import EDMConv

    m = EDMConv(features=6, kernel=3, up=True, resample_filter=(1, 3, 3, 1))
    x = jnp.ones((1, 4, 4, 4), jnp.float32)
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (1, 8, 8, 6)

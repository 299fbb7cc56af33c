"""Two-pass XLA GroupNorm (ops/groupnorm_xla.py) vs the reference jnp GN.

The xla2 path is the EDM-family TPU default (models/layers._fused_gn): moments ride the
producer's fused epilogue, normalize+affine+SiLU is one loop fusion. These
tests pin its numerics (raw-moment statistics in fp32) against the
mean/var-form reference for every call-site variant in models/layers.py,
and its differentiability (it replaces a custom_vjp Pallas kernel on the
training path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.ops.groupnorm_xla import group_norm_silu_xla
from tests.test_pallas_groupnorm import ref_gn


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("silu", [True, False])
def test_xla2_matches_reference(dtype, silu):
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 256), dtype) * 3 + 1
    scale = jax.random.normal(jax.random.fold_in(key, 1), (256,))
    bias = jax.random.normal(jax.random.fold_in(key, 2), (256,))
    got = group_norm_silu_xla(
        x, scale, bias, groups=32, eps=1e-5, apply_silu=silu)
    want = ref_gn(x, scale, bias, 32, 1e-5, silu)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


def test_xla2_per_sample_modulation():
    """[B, C] effective scale/bias (the folded-AdaGN form, UNetBlock norm1)."""
    key = jax.random.key(3)
    b, c = 3, 128
    x = jax.random.normal(key, (b, 4, 4, c), jnp.float32) * 2 - 0.5
    scale = jax.random.normal(jax.random.fold_in(key, 1), (b, c))
    bias = jax.random.normal(jax.random.fold_in(key, 2), (b, c))
    got = group_norm_silu_xla(
        x, scale, bias, groups=16, eps=1e-5, apply_silu=True)
    want_rows = [
        ref_gn(x[i:i + 1], scale[i], bias[i], 16, 1e-5, True) for i in range(b)
    ]
    np.testing.assert_allclose(
        np.asarray(got), np.concatenate([np.asarray(w) for w in want_rows]),
        atol=1e-5, rtol=1e-5)


def test_xla2_prebias_and_grads():
    """silu(GN(x + pre)) == reference add-then-GN, and grads flow (the xla2
    path has no custom_vjp — native AD must produce finite, matching grads)."""
    key = jax.random.key(7)
    b, c = 2, 64
    x = jax.random.normal(key, (b, 4, 4, c), jnp.float32)
    pre = jax.random.normal(jax.random.fold_in(key, 1), (b, c)) * 0.5
    scale = jnp.ones((c,)) * 1.3
    bias = jnp.zeros((c,)) + 0.1

    got = group_norm_silu_xla(
        x, scale, bias, groups=8, eps=1e-5, apply_silu=True, pre=pre)
    xin = x + pre[:, None, None, :]
    want = ref_gn(xin, scale, bias, 8, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    def loss_fused(xx, pp):
        return group_norm_silu_xla(
            xx, scale, bias, groups=8, eps=1e-5, apply_silu=True, pre=pp
        ).sum()

    def loss_ref(xx, pp):
        return ref_gn(xx + pp[:, None, None, :], scale, bias, 8, 1e-5, True).sum()

    gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, pre)
    rx, rp = jax.grad(loss_ref, argnums=(0, 1))(x, pre)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp), atol=1e-4, rtol=1e-4)


def test_xla2_constant_group_clamp():
    """Near-constant groups: raw-moment variance can cancel negative in
    fp32 — the clamp must keep rsqrt finite (same guard as the Pallas
    kernel)."""
    x = jnp.full((1, 8, 8, 64), 37.125, jnp.float32)
    out = group_norm_silu_xla(
        x, jnp.ones((64,)), jnp.zeros((64,)), groups=8, eps=1e-5,
        apply_silu=False)
    assert np.isfinite(np.asarray(out)).all()


def test_xla2_parts_equals_concat():
    """A tuple of channel parts (the decoder's unmaterialized cat(x, skip))
    must produce bit-identical output to the explicit concatenation —
    including group boundaries that do NOT align with the part boundary."""
    key = jax.random.key(13)
    a = jax.random.normal(key, (2, 4, 4, 80), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 48), jnp.float32)
    c = 128
    scale = jax.random.normal(jax.random.fold_in(key, 2), (c,))
    bias = jax.random.normal(jax.random.fold_in(key, 3), (c,))
    pre = jax.random.normal(jax.random.fold_in(key, 4), (2, c)) * 0.3
    # (a, b) splits at 80 = a whole number of groups (cg=8); (a2, b2)
    # splits at 76, INSIDE a group — stats for that group must still merge
    # exactly across the part boundary.
    a2, b2 = a[..., :76], jnp.concatenate([a[..., 76:], b], axis=-1)
    for silu in (True, False):
        want = group_norm_silu_xla(
            jnp.concatenate([a, b], axis=-1), scale, bias, groups=16,
            eps=1e-5, apply_silu=silu, pre=pre)
        got = group_norm_silu_xla(
            (a, b), scale, bias, groups=16, eps=1e-5, apply_silu=silu, pre=pre)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        got2 = group_norm_silu_xla(
            (a2, b2), scale, bias, groups=16, eps=1e-5, apply_silu=silu, pre=pre)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)

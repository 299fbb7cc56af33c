"""Pallas 3x3 SAME conv kernel (ops/pallas/conv3x3.py) vs the XLA conv.

The kernel exists for the SD VAE decode — XLA runs the 512x512-spatial
decoder convs at 0.18-0.25 of bf16 peak in isolation (tools/
vae_conv_probe.py) and the scoring decode is 66% of SD device self-time
(PARITY note 7e; the reference runs this decode per candidate in
sequential Python, pipeline_stable_diffusion.py:1413-1414).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.ops.pallas.conv3x3 import conv3x3_same, _conv3_reference


def _rand(shape, dtype, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [
    (2, 16, 16, 128, 128),   # square band tiling
    (1, 8, 16, 256, 128),    # single band (top and bottom boundary at once)
    (2, 32, 8, 128, 256),    # tall, K > C
])
def test_conv3x3_matches_xla(dtype, shape):
    b, h, w, c, k = shape
    x = _rand((b, h, w, c), dtype, 0)
    ker = (_rand((3, 3, c, k), dtype, 1) * 0.05).astype(dtype)
    got = conv3x3_same(x, ker, interpret=True)
    want = _conv3_reference(x, ker)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


def test_conv3x3_fused_bias_residual():
    """+bias +residual epilogue (the VAE resnet's skip add fused into the
    conv write — one fewer HBM pass than a separate add)."""
    x = _rand((2, 16, 16, 128), jnp.float32, 2)
    ker = (_rand((3, 3, 128, 128), jnp.float32, 3) * 0.05)
    bias = _rand((128,), jnp.float32, 4)
    res = _rand((2, 16, 16, 128), jnp.float32, 5)
    got = conv3x3_same(x, ker, bias, res, interpret=True)
    want = _conv3_reference(x, ker, bias, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_grads_match_xla():
    """custom_vjp backward == XLA conv VJP (training through the kernel)."""
    x = _rand((1, 8, 8, 128), jnp.float32, 6)
    ker = (_rand((3, 3, 128, 128), jnp.float32, 7) * 0.05)
    bias = _rand((128,), jnp.float32, 8)

    g1 = jax.grad(lambda a, b, c: conv3x3_same(a, b, c, interpret=True).sum(),
                  argnums=(0, 1, 2))(x, ker, bias)
    g2 = jax.grad(lambda a, b, c: _conv3_reference(a, b, c).sum(),
                  argnums=(0, 1, 2))(x, ker, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("form", ["stacked", "im2col"])
def test_conv3x3_gn_prologue(form):
    """GroupNorm+SiLU folded into the conv's input load: conv(silu(x*sc+sh))
    with per-(batch, channel) scale/shift, zero padding staying zero (SAME
    pads the conv's input space, i.e. AFTER normalization)."""
    b, h, w, c, k = 2, 8, 16, 128, 128
    x = _rand((b, h, w, c), jnp.float32, 0)
    ker = (_rand((3, 3, c, k), jnp.float32, 1) * 0.05)
    bias = _rand((k,), jnp.float32, 2)
    res = _rand((b, h, w, k), jnp.float32, 3)
    sc = (_rand((b, c), jnp.float32, 4) * 0.5 + 1.0)
    sh = _rand((b, c), jnp.float32, 5) * 0.1
    got = conv3x3_same(x, ker, bias, res, gn_scale=sc, gn_shift=sh,
                       interpret=True, form=form)
    want = _conv3_reference(x, ker, bias, res, sc, sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_gn_prologue_grads():
    b, h, w, c, k = 1, 8, 16, 128, 128
    x = _rand((b, h, w, c), jnp.float32, 0)
    ker = (_rand((3, 3, c, k), jnp.float32, 1) * 0.05)
    sc = (_rand((b, c), jnp.float32, 4) * 0.5 + 1.0)
    sh = _rand((b, c), jnp.float32, 5) * 0.1

    def f(x, ker, sc, sh):
        return conv3x3_same(x, ker, gn_scale=sc, gn_shift=sh,
                            interpret=True).sum()

    def fr(x, ker, sc, sh):
        return _conv3_reference(x, ker, None, None, sc, sh).sum()

    g = jax.grad(f, argnums=(0, 1, 2, 3))(x, ker, sc, sh)
    gr = jax.grad(fr, argnums=(0, 1, 2, 3))(x, ker, sc, sh)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [
    (2, 16, 16, 128, 128),   # multi-band tiling
    (1, 8, 16, 256, 128),    # single band (top+bottom boundary in one)
    (2, 32, 8, 128, 256),    # tall, K > C
])
def test_conv3x3_up2_matches_reference(dtype, shape):
    """Fused nearest-2x + conv == the jnp phased reference
    (ops/resample.py::nn_upsample2x_conv3x3), which itself is golden-pinned
    against explicit-upsample torch (diffusers Upsample2D semantics)."""
    from diffusion_tts_tpu.ops.pallas.conv3x3 import conv3x3_up2
    from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3

    b, h, w, c, k = shape
    x = _rand((b, h, w, c), dtype, 0)
    ker = (_rand((3, 3, c, k), dtype, 1) * 0.05).astype(dtype)
    bias = _rand((k,), dtype, 2)
    got = conv3x3_up2(x, ker, bias, interpret=True)
    want = nn_upsample2x_conv3x3(x, ker, bias)
    assert got.shape == (b, 2 * h, 2 * w, k)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


def test_conv3x3_up2_packed_layout_fallback():
    """DTTS_UP2_DIRECT=0 path: the packed [B,H,2,W,2K] store + caller-side
    reshape (the pre-8p layout) must keep matching the reference — it is
    the documented revert for the direct-store retile."""
    from diffusion_tts_tpu.ops.pallas.conv3x3 import _conv3_up2_fwd_only
    from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3

    b, h, w, c, k = 1, 8, 16, 128, 128
    x = _rand((b, h, w, c), jnp.float32, 40)
    ker = _rand((3, 3, c, k), jnp.float32, 41) * 0.05
    bias = _rand((k,), jnp.float32, 42)
    got = _conv3_up2_fwd_only(x, ker, bias, interpret=True, direct=False)
    want = nn_upsample2x_conv3x3(x, ker, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_stacked_bf16_combine(monkeypatch):
    """DTTS_CONV_COMBINE_BF16: the stacked form's post-dot dx combine in
    bf16 (static two-piece shifts, bf16 epilogue) — partials round to bf16
    before the 3-term sum, so parity with the fp32-combine reference holds
    at bf16 tolerance."""
    import diffusion_tts_tpu.ops.pallas.conv3x3 as c3

    monkeypatch.setattr(c3, "_COMBINE_BF16", True)
    b, h, w, c, k = 1, 12, 32, 128, 128  # unique shape: forces a retrace
    x = _rand((b, h, w, c), jnp.bfloat16, 20)
    ker = (_rand((3, 3, c, k), jnp.bfloat16, 21) * 0.05).astype(jnp.bfloat16)
    bias = _rand((k,), jnp.bfloat16, 22)
    res = _rand((b, h, w, k), jnp.bfloat16, 23)
    got = conv3x3_same(x, ker, bias, res, interpret=True, form="stacked")
    want = _conv3_reference(x, ker, bias, res)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=7e-2, rtol=7e-2)


def test_conv3x3_fused_shortcut():
    """shortcut=(sc_x, sc_w): the resnet's 1x1 conv_shortcut projection of
    a SECOND input fused into the conv epilogue — out += sc_x @ sc_w —
    with the GN+SiLU prologue active (the exact ResnetBlock2D fold)."""
    b, h, w, c, k, cres = 2, 8, 16, 128, 128, 256
    x = _rand((b, h, w, c), jnp.float32, 30)
    ker = (_rand((3, 3, c, k), jnp.float32, 31) * 0.05)
    bias = _rand((k,), jnp.float32, 32)
    sc_x = _rand((b, h, w, cres), jnp.float32, 33)
    sc_w = (_rand((cres, k), jnp.float32, 34) * 0.05)
    sc = (_rand((b, c), jnp.float32, 35) * 0.5 + 1.0)
    sh = _rand((b, c), jnp.float32, 36) * 0.1
    got = conv3x3_same(x, ker, bias, gn_scale=sc, gn_shift=sh,
                       shortcut=(sc_x, sc_w), interpret=True, form="stacked")
    want = _conv3_reference(x, ker, bias, None, sc, sh, sc_x, sc_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    # grads flow through sc_x and sc_w via the jnp-reference VJP
    g = jax.grad(lambda a, b_: conv3x3_same(
        x, ker, bias, shortcut=(a, b_), interpret=True, form="stacked"
    ).sum(), argnums=(0, 1))(sc_x, sc_w)
    gr = jax.grad(lambda a, b_: _conv3_reference(
        x, ker, bias, None, None, None, a, b_).sum(), argnums=(0, 1))(sc_x, sc_w)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_conv3x3_up2_grads_match_reference():
    from diffusion_tts_tpu.ops.pallas.conv3x3 import conv3x3_up2
    from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3

    x = _rand((1, 8, 16, 128), jnp.float32, 6)
    ker = (_rand((3, 3, 128, 128), jnp.float32, 7) * 0.05)
    bias = _rand((128,), jnp.float32, 8)
    g1 = jax.grad(lambda a, b, c: conv3x3_up2(a, b, c, interpret=True).sum(),
                  argnums=(0, 1, 2))(x, ker, bias)
    g2 = jax.grad(lambda a, b, c: nn_upsample2x_conv3x3(a, b, c).sum(),
                  argnums=(0, 1, 2))(x, ker, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_groupnorm_scale_shift_fold():
    """GroupNorm(return_scale_shift=True) folding == the module's own
    normalize+SiLU output (the contract the conv prologue relies on)."""
    from diffusion_tts_tpu.models.sd_layers import GroupNorm

    b, h, w, c, g = 2, 4, 4, 64, 32
    x = _rand((b, h, w, c), jnp.float32, 0)
    gn = GroupNorm(g, 1e-5, apply_silu=True)
    vars_ = gn.init(jax.random.key(0), x)
    # non-trivial affine params
    vars_ = jax.tree_util.tree_map(
        lambda a: a + 0.3 * _rand(a.shape, a.dtype, 7), vars_)
    want = gn.apply(vars_, x)
    sc, sh = gn.apply(vars_, x, return_scale_shift=True)
    xn = x * sc[:, None, None, :] + sh[:, None, None, :]
    got = xn * jax.nn.sigmoid(xn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

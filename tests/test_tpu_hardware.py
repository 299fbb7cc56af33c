"""Hardware-gated kernel tests: the COMPILED Pallas kernels vs the jnp
references on a real TPU (the rest of the suite exercises interpret mode
on CPU; Mosaic lowering bugs only show up here).

Run with: DTTS_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
(the conftest skips its CPU pin when DTTS_TEST_TPU is set). Skipped
automatically on CPU-only runs — the capability-gating pattern the
vendored diffusers suite uses for GPUs (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"), reason="needs TPU hardware"
)


@requires_tpu
@pytest.mark.parametrize("shape,groups", [((4, 16, 16, 192), 32), ((2, 8, 8, 256), 32)])
def test_group_norm_silu_compiled(shape, groups):
    from diffusion_tts_tpu.ops.pallas.groupnorm import group_norm_silu
    from tests.test_pallas_groupnorm import ref_gn

    b, _, _, c = shape
    key = jax.random.key(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    scale = jax.random.normal(jax.random.fold_in(key, 1), (c,))
    bias = jax.random.normal(jax.random.fold_in(key, 2), (c,))
    got = group_norm_silu(x, scale, bias, groups=groups, eps=1e-5, apply_silu=True)
    want = ref_gn(x, scale, bias, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=5e-2, rtol=5e-2)
    # per-sample (AdaGN) form
    ms = jax.random.normal(jax.random.fold_in(key, 3), (b, c))
    mb = jax.random.normal(jax.random.fold_in(key, 4), (b, c))
    got2 = group_norm_silu(x, ms, mb, groups=groups, eps=1e-5, apply_silu=True)
    want2 = jnp.concatenate([
        ref_gn(x[i:i + 1], ms[i], mb[i], groups, 1e-5, True) for i in range(b)
    ])
    np.testing.assert_allclose(np.asarray(got2, np.float32),
                               np.asarray(want2, np.float32), atol=5e-2, rtol=5e-2)


@requires_tpu
def test_group_norm_prebias_compiled():
    from diffusion_tts_tpu.ops.pallas.groupnorm import group_norm_silu_prebias
    from tests.test_pallas_groupnorm import ref_gn

    b, c = 3, 192
    key = jax.random.key(5)
    x = jax.random.normal(key, (b, 8, 8, c), jnp.bfloat16)
    pre = jax.random.normal(jax.random.fold_in(key, 1), (b, c))
    scale = jax.random.normal(jax.random.fold_in(key, 2), (c,))
    bias = jax.random.normal(jax.random.fold_in(key, 3), (c,))
    got = group_norm_silu_prebias(x, scale, bias, pre, groups=32, eps=1e-5)
    want = ref_gn(x.astype(jnp.float32) + pre[:, None, None, :], scale, bias,
                  32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=5e-2, rtol=5e-2)


@requires_tpu
def test_flash_attention_compiled():
    from diffusion_tts_tpu.ops.attention import _xla_attention
    from diffusion_tts_tpu.ops.pallas.attention import flash_attention

    key = jax.random.key(7)
    q = jax.random.normal(key, (2, 1024, 4, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 1024, 4, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 1024, 4, 64), jnp.bfloat16)
    got = flash_attention(q, k, v)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=3e-2, rtol=3e-2)


@requires_tpu
def test_train_step_grad_through_pallas():
    """One real training step on the ADM tiny config on TPU — the Pallas
    forward + jnp-mirror VJP path under jax.grad on hardware."""
    from diffusion_tts_tpu.models.preconds import EDMPrecond

    net = EDMPrecond(
        img_resolution=16, img_channels=3, label_dim=0,
        model_type="DhariwalUNet", dtype=jnp.bfloat16,
        model_kwargs=dict(model_channels=64, channel_mult=(1,), num_blocks=1,
                          attn_resolutions=(16,), dropout=0.0),
    )
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    sigma = jnp.full((2,), 1.0)
    variables = net.init({"params": jax.random.key(1)}, x, sigma, None)

    def loss(params):
        d = net.apply({"params": params["params"]}, x, sigma, None)
        return jnp.mean((d - x) ** 2)

    g = jax.jit(jax.grad(loss))(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


@requires_tpu
def test_gn_xla2_routed_compiled():
    """The xla2 producer-fusion GN (the EDM-default TPU route,
    models/layers._fused_gn prefer="xla2") under jit on hardware, with a
    conv producer so the moment reductions ride its epilogue — checks the
    routed module output against the unfused reference math."""
    from diffusion_tts_tpu.models.layers import _fused_gn
    from tests.test_pallas_groupnorm import ref_gn

    key = jax.random.key(11)
    x = jax.random.normal(key, (4, 16, 16, 192), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 192, 192),
                          jnp.bfloat16) * 0.05
    scale = jax.random.normal(jax.random.fold_in(key, 2), (192,))
    bias = jax.random.normal(jax.random.fold_in(key, 3), (192,))

    def conv(xx):
        return jax.lax.conv_general_dilated(
            xx, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def fused(xx):
        y = conv(xx)
        out = _fused_gn(y, scale, bias, groups=32, eps=1e-5, apply_silu=True,
                        prefer="xla2")
        assert out is not None, "xla2 route must be taken on TPU"
        return out

    got = fused(x)
    want = ref_gn(conv(x), scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@requires_tpu
@pytest.mark.parametrize("dtype,heads", [
    (jnp.bfloat16, 6),   # head-PAIR bf16 kernel (even heads)
    (jnp.bfloat16, 3),   # pair kernel + odd leftover head
    (jnp.float32, 6),    # single-head fp32 kernel (parity mode)
])
def test_qkv_self_attention_compiled(dtype, heads):
    """The fused all-heads qkv attention kernel COMPILED on hardware vs the
    jnp mirror, at the EDM res-32 hot shape — covers the bf16 head-pair
    formulation, its odd-head fallback, and the fp32 single-head kernel."""
    from diffusion_tts_tpu.ops.pallas.attention import (
        qkv_self_attention,
        _qkv_attention_reference,
    )

    d = 64
    qkv = jax.random.normal(jax.random.key(4), (4, 1024, 3 * heads * d),
                            dtype)
    got = qkv_self_attention(qkv, heads)
    want = _qkv_attention_reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_conv3x3_stacked_compiled(dtype):
    """The stacked-form Pallas conv COMPILED on hardware (the pltpu.roll
    post-dot combine only exists in the Mosaic lowering) vs the XLA conv,
    with the fused bias+residual epilogue, at a real VAE decoder shape."""
    from diffusion_tts_tpu.ops.pallas.conv3x3 import (
        conv3x3_same,
        _conv3_reference,
    )

    b, h, w, c, k = 2, 128, 128, 256, 128
    key = jax.random.key(7)
    x = jax.random.normal(key, (b, h, w, c), dtype)
    ker = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, k), dtype) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2), (k,), dtype)
    res = jax.random.normal(jax.random.fold_in(key, 3), (b, h, w, k), dtype)
    got = conv3x3_same(x, ker, bias, res)
    want = _conv3_reference(x, ker, bias, res)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_conv3x3_up2_compiled(dtype):
    """The fused nearest-2x-upsample + conv kernel COMPILED on hardware
    (phase-major output + bitcast reshape) vs the jnp phased reference, at
    a real VAE decoder upsampler shape."""
    from diffusion_tts_tpu.ops.pallas.conv3x3 import conv3x3_up2
    from diffusion_tts_tpu.ops.resample import nn_upsample2x_conv3x3

    b, h, w, c, k = 2, 128, 128, 256, 256
    key = jax.random.key(13)
    x = jax.random.normal(key, (b, h, w, c), dtype)
    ker = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, k), dtype) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2), (k,), dtype)
    got = conv3x3_up2(x, ker, bias)
    want = nn_upsample2x_conv3x3(x, ker, bias)
    # fp32: the kernel's dots ride the MXU's DEFAULT (bf16-product)
    # precision — the same contract as XLA's default conv lowering — but
    # the contraction SHAPES differ from the reference conv's, so the two
    # bf16 roundings diverge by ~2e-3 relative (measured; interpret mode
    # matches at 1e-4 in true fp32).
    tol = 1e-2 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


@requires_tpu
def test_conv3x3_fused_shortcut_compiled():
    """The fused 1x1 conv_shortcut projection COMPILED on hardware at a
    real fold shape (up_blocks_3.resnets_0 geometry, reduced spatial),
    with the GN+SiLU prologue — the exact ResnetBlock2D fold."""
    from diffusion_tts_tpu.ops.pallas.conv3x3 import (
        conv3x3_same,
        _conv3_reference,
    )

    b, h, w, c, cres = 2, 128, 128, 128, 256
    key = jax.random.key(17)
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    ker = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, c),
                            jnp.bfloat16) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2), (c,), jnp.bfloat16)
    scx = jax.random.normal(jax.random.fold_in(key, 3), (b, h, w, cres),
                            jnp.bfloat16)
    scw = jax.random.normal(jax.random.fold_in(key, 4), (cres, c),
                            jnp.bfloat16) * 0.05
    gs = jax.random.normal(jax.random.fold_in(key, 5), (b, c), jnp.float32) \
        * 0.3 + 1.0
    gh = jax.random.normal(jax.random.fold_in(key, 6), (b, c), jnp.float32) * 0.1
    got = conv3x3_same(x, ker, bias, gn_scale=gs, gn_shift=gh,
                       shortcut=(scx, scw))
    want = _conv3_reference(x, ker, bias, None, gs, gh, scx, scw)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_conv3x3_gn_prologue_compiled(dtype):
    """GN+SiLU prologue COMPILED on hardware at a real VAE decoder shape:
    conv(silu(x*scale + shift)) with the fused bias+residual epilogue."""
    from diffusion_tts_tpu.ops.pallas.conv3x3 import (
        conv3x3_same,
        _conv3_reference,
    )

    b, h, w, c, k = 2, 128, 128, 256, 128
    key = jax.random.key(11)
    x = jax.random.normal(key, (b, h, w, c), dtype)
    ker = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, k), dtype) * 0.05
    bias = jax.random.normal(jax.random.fold_in(key, 2), (k,), dtype)
    res = jax.random.normal(jax.random.fold_in(key, 3), (b, h, w, k), dtype)
    sc = jax.random.normal(jax.random.fold_in(key, 4), (b, c), jnp.float32) * 0.5 + 1.0
    sh = jax.random.normal(jax.random.fold_in(key, 5), (b, c), jnp.float32) * 0.1
    got = conv3x3_same(x, ker, bias, res, gn_scale=sc, gn_shift=sh)
    want = _conv3_reference(x, ker, bias, res, sc, sh)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=tol, rtol=tol)


@requires_tpu
def test_naive_search_golden_slice_on_tpu():
    """The full search stack (load_network -> Heun sampler -> run_search ->
    scorer) executed ON HARDWARE against the same checked-in golden slice
    the CPU suite pins (tests/test_golden_slices.py) — end-to-end numerics,
    not just per-kernel parity, must survive the TPU lowering."""
    import jax.numpy as jnp
    from diffusion_tts_tpu.backends.edm_entry import load_network
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.search.api import run_search
    from diffusion_tts_tpu.search.backend import EDMSearchBackend
    from diffusion_tts_tpu.utils.config import SearchParams
    from tests.test_golden_slices import EXPECTED_SLICE, EXPECTED_SCORES

    net, variables = load_network("tiny", None)
    labels = jnp.eye(10)[jnp.asarray([0, 1]) % 10]

    def make_backend(v):
        denoise = lambda x, s: net.apply(v, x, s, jnp.tile(labels, (x.shape[0] // 2, 1)))
        sampler = EDMHeunSampler(num_steps=6, S_churn=40.0, S_min=0.05,
                                 S_max=50.0, S_noise=1.003, denoise=denoise)
        return EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer())

    z = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    r = run_search("naive", make_backend, z, jax.random.key(42), SearchParams(),
                   backend_args=variables)
    np.testing.assert_allclose(
        np.asarray(r.images[0, 8, 4:12, 0]), EXPECTED_SLICE, atol=1e-2)
    np.testing.assert_allclose(np.asarray(r.score), EXPECTED_SCORES, atol=1e-3)

"""Fused GEGLU feed-forward kernel (ops/pallas/geglu_ff.py) vs the jnp
mirror and the original unfused FF math (interpret mode on CPU).

The kernel exists because XLA lowers the SD transformer FF as two fused
regions with the exact-erf gelu-gate serialized inside net_2's operand
load — net_2 measures 0.21-0.33 of peak in the SD trace (PARITY 8k).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.ops.pallas.geglu_ff import (
    geglu_ff,
    _geglu_reference,
)


def _rand(shape, dtype, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("m,c,f", [(64, 320, 1280), (32, 64, 128)])
def test_geglu_ff_matches_reference(dtype, m, c, f):
    x = _rand((m, c), dtype, 0)
    w0 = (_rand((c, 2 * f), dtype, 1) * 0.05).astype(dtype)
    b0 = _rand((2 * f,), dtype, 2)
    w2 = (_rand((f, c), dtype, 3) * 0.05).astype(dtype)
    b2 = _rand((c,), dtype, 4)
    got = geglu_ff(x, w0, b0, w2, b2, interpret=True)
    want = _geglu_reference(x, w0, b0, w2, b2)
    # fp32 tol 1e-4: the in-kernel erf is the A&S 7.1.26 rational form
    # (1.5e-7 max err), accumulated through the 1280-deep second dot
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


def test_geglu_ff_stream_matches_reference(monkeypatch):
    """The F-streamed form (used when the weights exceed the VMEM budget —
    the 16²/8² SD blocks) == the jnp mirror. Forced here by shrinking the
    budget so the resident form is ineligible at a small shape."""
    import diffusion_tts_tpu.ops.pallas.geglu_ff as G

    monkeypatch.setattr(G, "_VMEM_BUDGET", 2 * 2**20)
    m, c, f = 64, 256, 1024
    x = _rand((m, c), jnp.float32, 20)
    w0 = _rand((c, 2 * f), jnp.float32, 21) * 0.05
    b0 = _rand((2 * f,), jnp.float32, 22)
    w2 = _rand((f, c), jnp.float32, 23) * 0.05
    b2 = _rand((c,), jnp.float32, 24)
    assert G._pick_tm(m, c, f, 4) == 0          # resident form ineligible
    assert G._pick_stream_tiles(m, c, f, 4)     # streaming tiles exist
    got = G._geglu_fwd_only(x, w0, b0, w2, b2, interpret=True)
    want = _geglu_reference(x, w0, b0, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_geglu_reference_matches_unfused_ff():
    """The jnp mirror == the original unfused formulation (nn.Dense ->
    split -> h*gelu_exact(gate) -> nn.Dense) at matching dtypes."""
    m, c, f = 16, 64, 128
    x = _rand((m, c), jnp.float32, 5)
    w0 = _rand((c, 2 * f), jnp.float32, 6) * 0.05
    b0 = _rand((2 * f,), jnp.float32, 7)
    w2 = _rand((f, c), jnp.float32, 8) * 0.05
    b2 = _rand((c,), jnp.float32, 9)
    q = jnp.dot(x, w0) + b0
    h, gate = jnp.split(q, 2, axis=-1)
    want = jnp.dot(h * jax.nn.gelu(gate, approximate=False), w2) + b2
    got = _geglu_reference(x, w0, b0, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_geglu_ff_grads():
    m, c, f = 16, 64, 128
    args = [
        _rand((m, c), jnp.float32, 10),
        _rand((c, 2 * f), jnp.float32, 11) * 0.05,
        _rand((2 * f,), jnp.float32, 12),
        _rand((f, c), jnp.float32, 13) * 0.05,
        _rand((c,), jnp.float32, 14),
    ]
    g1 = jax.grad(lambda *a: geglu_ff(*a, interpret=True).sum(),
                  argnums=tuple(range(5)))(*args)
    g2 = jax.grad(lambda *a: _geglu_reference(*a).sum(),
                  argnums=tuple(range(5)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_feedforward_module_unchanged_on_cpu():
    """FeedForward's param tree and output are unchanged by the fused-FF
    routing (CPU takes the unfused path; params must stay nn.Dense-shaped
    for checkpoint interchange)."""
    from diffusion_tts_tpu.models.sd_layers import FeedForward

    x = _rand((2, 16, 64), jnp.float32, 15)
    ff = FeedForward(dim=64, mult=2)
    v = ff.init(jax.random.key(0), x)
    p = v["params"]
    assert p["net_0"]["proj"]["kernel"].shape == (64, 256)
    assert p["net_0"]["proj"]["bias"].shape == (256,)
    assert p["net_2"]["kernel"].shape == (128, 64)
    assert p["net_2"]["bias"].shape == (64,)
    y = ff.apply(v, x)
    q = x @ p["net_0"]["proj"]["kernel"] + p["net_0"]["proj"]["bias"]
    h, gate = jnp.split(q, 2, axis=-1)
    want = (h * jax.nn.gelu(gate, approximate=False)) @ p["net_2"]["kernel"] \
        + p["net_2"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

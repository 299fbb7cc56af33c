"""Sampler parity vs reference goldens (analytic denoiser, recorded noise).

Goldens from tools/make_sampler_goldens.py: the reference edm_sampler
(edm/generate.py:25-60), ablation_sampler (:66-176), and the vendored
stochastic DDIM scheduler run in torch with D(x,s)=x/(1+s^2) and recorded
noise. Our samplers consume the identical noise and must match in fp32.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.samplers.ddim import StochasticDDIMSampler
from diffusion_tts_tpu.samplers.edm import AblationSampler, EDMHeunSampler

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def denoise(x, sigma):
    sigma = jnp.reshape(sigma, (-1, 1, 1, 1)).astype(jnp.float32)
    return x / (1.0 + sigma**2)


def _load(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: {name} (run tools/make_sampler_goldens.py)")
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_edm_heun_parity():
    d = _load("sampler_edm_heun")
    s = EDMHeunSampler(
        denoise=denoise, num_steps=18, sigma_min=0.002, sigma_max=80.0, rho=7.0,
        S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003,
    )
    # reference latents are pre-multiplied by sigma_max inside edm_sampler
    z = jnp.asarray(_nhwc(d["latents"]))
    eps = jnp.asarray(np.stack([_nhwc(n) for n in d["noise"]]))
    out, _ = s.sample(z, eps)
    np.testing.assert_allclose(np.asarray(out), _nhwc(d["out"]), atol=5e-4, rtol=5e-4)


ABL_CASES = {
    "abl_euler_vp_vp_vp": dict(solver="euler", discretization="vp", schedule="vp", scaling="vp"),
    "abl_heun_ve_ve_none": dict(solver="heun", discretization="ve", schedule="ve", scaling="none"),
    "abl_heun_iddpm_lin_none": dict(solver="heun", discretization="iddpm", schedule="linear", scaling="none"),
    "abl_heun_edm_lin_none_churn": dict(
        solver="heun", discretization="edm", schedule="linear", scaling="none",
        S_churn=30.0, S_min=0.1, S_max=30.0, S_noise=1.007,
    ),
    "abl_euler_edm_lin_vp_alpha": dict(
        solver="heun", discretization="edm", schedule="linear", scaling="vp", alpha=0.7,
    ),
}


@pytest.mark.parametrize("name", sorted(ABL_CASES))
def test_ablation_sampler_parity(name):
    d = _load(f"sampler_{name}")
    s = AblationSampler(denoise=denoise, num_steps=12, **ABL_CASES[name])
    z = jnp.asarray(_nhwc(d["latents"]))
    if d["noise"].ndim > 1:
        eps = jnp.asarray(np.stack([_nhwc(n) for n in d["noise"]]))
    else:
        eps = jnp.zeros((12,) + z.shape)
    out = s.sample(z, eps)
    np.testing.assert_allclose(np.asarray(out), _nhwc(d["out"]), atol=1e-3, rtol=1e-3)


def test_ddim_parity():
    d = _load("sampler_ddim")

    def eps_model(x, t):
        return 0.3 * x + 0.05

    s = StochasticDDIMSampler(eps_model=eps_model, num_steps=20, eta=1.0)
    np.testing.assert_array_equal(np.asarray(s.timesteps), d["timesteps"])
    z = jnp.asarray(_nhwc(d["latents"]))
    eps = jnp.asarray(np.stack([_nhwc(n) for n in d["noise"]]))
    out, pred_x0 = s.sample(z, eps)
    np.testing.assert_allclose(np.asarray(out), _nhwc(d["out"]), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(pred_x0), _nhwc(d["pred_x0_last"]), atol=2e-4, rtol=2e-4
    )


def test_heun_step_uniform_vs_peeled():
    """step() with the masked last iteration must agree with sample()'s
    peeled final Euler step (search methods use the uniform form)."""
    s = EDMHeunSampler(denoise=denoise, num_steps=6, S_churn=10.0, S_max=50.0)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)
    eps = jnp.asarray(np.random.default_rng(1).normal(size=(6, 2, 8, 8, 3)), jnp.float32)
    ref, _ = s.sample(z, eps)
    x = s.init_latents(z)
    for i in range(6):
        x, _ = s.step(x, jnp.asarray(i), eps[i])
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-5, rtol=1e-5)

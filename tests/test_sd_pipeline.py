"""SD pipeline tests: candidate-lookahead parity vs the vendored torch chain,
and end-to-end search through the tiny pipeline (all six methods)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.models.sd_import import convert_diffusers_state_dict
from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
from diffusion_tts_tpu.models.sd_vae import AutoencoderKL
from diffusion_tts_tpu.pipelines import StableDiffusionSearchPipeline
from diffusion_tts_tpu.samplers.ddim import StochasticDDIMSampler
from diffusion_tts_tpu.scorers import BrightnessScorer
from diffusion_tts_tpu.search.api import METHODS, run_search
from diffusion_tts_tpu.search.sd_backend import SDSearchBackend
from diffusion_tts_tpu.utils.config import SearchParams

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.slow
def test_sd_lookahead_chain_parity():
    """Our expand() must reproduce the reference's candidate evaluation:
    step -> lookahead unet at same t -> step -> vae decode -> uint8 grid
    (pipeline_stable_diffusion.py:1384-1420)."""
    path = os.path.join(GOLDENS, "sd_lookahead.npz")
    if not os.path.exists(path):
        pytest.skip("run tools/make_sd_goldens.py")
    with np.load(os.path.join(GOLDENS, "sd_unet.npz")) as f:
        unet_state = {k[4:]: f[k] for k in f.files if k.startswith("sd::")}
    with np.load(os.path.join(GOLDENS, "sd_vae.npz")) as f:
        vae_state = {k[4:]: f[k] for k in f.files if k.startswith("sd::")}
    with np.load(path) as f:
        d = {k: f[k] for k in f.files}

    unet = UNet2DConditionModel(
        sample_size=16, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=2, attention_head_dim=8,
        cross_attention_dim=32,
    )
    unet_params = convert_diffusers_state_dict(unet_state)
    vae = AutoencoderKL(block_out_channels=(32, 64), layers_per_block=1)
    vae_params = convert_diffusers_state_dict(vae_state)

    ctx = jnp.asarray(d["ctx"])
    eps_model = lambda x, t: unet.apply(unet_params, x, t, jnp.tile(ctx, (x.shape[0], 1, 1)))
    sampler = StochasticDDIMSampler(eps_model=eps_model, num_steps=10, eta=1.0)
    backend = SDSearchBackend(
        sampler=sampler,
        vae_decode=lambda lat: vae.apply(vae_params, lat / 0.18215, method=AutoencoderKL.decode),
        scorer=BrightnessScorer(),
    )
    x = jnp.asarray(_nhwc(d["latents"]))
    cand = jnp.asarray(_nhwc(d["cand"]))[None]  # [N=1, B=1, ...]
    aux = backend.base_step(x, int(d["step_index"]))
    lat_cand, images = backend.expand(x, int(d["step_index"]), aux, cand)
    np.testing.assert_allclose(
        np.asarray(lat_cand[0]), _nhwc(d["lat_cand"]), atol=5e-4, rtol=5e-4
    )
    ref_img01 = _nhwc(d["image"]).astype(np.float32) / 255.0
    got = np.asarray(images)
    assert (np.abs(got - ref_img01) <= (1.0 / 255.0) + 1e-6).mean() > 0.999, (
        f"decoded image grid mismatch: max {np.abs(got - ref_img01).max()}"
    )


@pytest.fixture(scope="module")
def tiny_pipe():
    return StableDiffusionSearchPipeline.tiny_random(seed=0)


@pytest.mark.slow
def test_sd_pipeline_naive_and_search(tiny_pipe):
    emb = jax.random.normal(jax.random.key(5), (1, 7, 32))
    params = SearchParams(N=2, K=2, B=2, S=2)
    images, scores = tiny_pipe(
        prompt_embeds=emb, num_inference_steps=4, method="naive",
        score_function=BrightnessScorer(), params=params, key=jax.random.key(1),
    )
    assert images.shape == (1, 32, 32, 3)
    assert np.isfinite(images).all() and 0 <= images.min() and images.max() <= 1
    base = float(scores[0])
    images2, scores2 = tiny_pipe(
        prompt_embeds=emb, num_inference_steps=4, method="eps_greedy",
        score_function=BrightnessScorer(), params=params, key=jax.random.key(1),
    )
    assert float(scores2[0]) > base


@pytest.mark.parametrize("method", [m for m in METHODS if m not in ("naive", "eps_greedy")])
@pytest.mark.slow
def test_sd_pipeline_all_methods(tiny_pipe, method):
    emb = jax.random.normal(jax.random.key(5), (1, 7, 32))
    images, scores = tiny_pipe(
        prompt_embeds=emb, num_inference_steps=3, method=method,
        score_function=BrightnessScorer(), params=SearchParams(N=2, K=2, B=2, S=2),
        key=jax.random.key(2),
    )
    assert images.shape == (1, 32, 32, 3) and np.isfinite(images).all()


@pytest.mark.slow
def test_sd_pipeline_params_dict_compat(tiny_pipe):
    """The reference passes params as a dict with key 'lambda'
    (main.py:124-131)."""
    emb = jax.random.normal(jax.random.key(5), (1, 7, 32))
    images, _ = tiny_pipe(
        prompt_embeds=emb, num_inference_steps=2, method="zero_order",
        score_function=BrightnessScorer(),
        params={"N": 2, "K": 1, "B": 2, "S": 2, "lambda": 0.1, "eps": 0.4},
        key=jax.random.key(3),
    )
    assert np.isfinite(images).all()


@pytest.mark.slow
def test_sd_pipeline_program_cache_shared_across_calls(tiny_pipe):
    """The jitted search programs must be reused across __call__ invocations
    (cache_anchor=pipeline): rebuilding the factory closure per call used to
    retrace the whole program every time — tens of seconds per call at SD
    scale (PARITY round-3)."""
    from diffusion_tts_tpu.search.api import _PROGRAM_CACHE

    emb = jax.random.normal(jax.random.key(5), (1, 7, 32))
    params = SearchParams(N=2, K=2)
    scorer = BrightnessScorer()  # same instance: part of the cache salt
    _PROGRAM_CACHE.pop(tiny_pipe, None)
    _, s1 = tiny_pipe(prompt_embeds=emb, num_inference_steps=3,
                      method="eps_greedy", score_function=scorer,
                      params=params, key=jax.random.key(1))
    progs = dict(_PROGRAM_CACHE.get(tiny_pipe, {}))
    assert progs, "pipeline call did not populate the program cache"
    _, s2 = tiny_pipe(prompt_embeds=emb, num_inference_steps=3,
                      method="eps_greedy", score_function=scorer,
                      params=params, key=jax.random.key(1))
    after = dict(_PROGRAM_CACHE.get(tiny_pipe, {}))
    assert set(after) == set(progs), "second identical call rebuilt programs"
    for k in progs:
        assert after[k] is progs[k], f"program {k} was rebuilt"
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))

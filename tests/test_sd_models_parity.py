"""Parity of the flax SD UNet / VAE vs the vendored torch diffusers."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.models.sd_import import convert_diffusers_state_dict
from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
from diffusion_tts_tpu.models.sd_vae import AutoencoderKL

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"run tools/make_sd_goldens.py ({name})")
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    state = {k[4:]: v for k, v in data.items() if k.startswith("sd::")}
    return state, data


def _check_congruent(variables, converted):
    ref = {jax.tree_util.keystr(p) for p, _ in
           jax.tree_util.tree_leaves_with_path(variables["params"])}
    conv = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(converted["params"])}
    assert ref == conv, f"missing {sorted(ref-conv)[:4]} extra {sorted(conv-ref)[:4]}"


@pytest.mark.slow  # ~30 s warm; the pipeline goldens (test_sd_pipeline.py)
# keep the SD model path in the default run, full parity under `pytest -m ""`
def test_sd_unet_parity():
    state, data = _load("sd_unet")
    model = UNet2DConditionModel(
        sample_size=16, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=2, attention_head_dim=8,
        cross_attention_dim=32,
    )
    x = np.transpose(data["in::x"], (0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.key(0)}, x, data["in::t"], data["in::ctx"]
    )
    converted = convert_diffusers_state_dict(state)
    _check_congruent(variables, converted)
    y = model.apply(converted, x, jnp.asarray(data["in::t"]), data["in::ctx"])
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), data["out::y"], atol=3e-4, rtol=3e-4
    )


@pytest.mark.slow  # ~19 s (encode+decode torch-golden compiles); the SD
# model path stays in the default run via the test_sd_pipeline.py goldens
def test_sd_vae_parity():
    state, data = _load("sd_vae")
    model = AutoencoderKL(block_out_channels=(32, 64), layers_per_block=1)
    img = np.transpose(data["in::img"], (0, 2, 3, 1))
    lat = np.transpose(data["in::lat"], (0, 2, 3, 1))
    variables = model.init({"params": jax.random.key(0)}, img, jax.random.key(1))
    converted = convert_diffusers_state_dict(state)
    _check_congruent(variables, converted)
    post = model.apply(converted, img, method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(post.mean), (0, 3, 1, 2)), data["out::mean"],
        atol=3e-4, rtol=3e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(post.logvar), (0, 3, 1, 2)), data["out::logvar"],
        atol=3e-4, rtol=3e-4,
    )
    dec = model.apply(converted, lat, method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(dec), (0, 3, 1, 2)), data["out::dec"],
        atol=3e-4, rtol=3e-4,
    )

"""Forward parity of the flax EDM nets vs torch reference goldens.

Fixtures in tests/goldens/*.npz were produced by tools/make_goldens.py:
tiny reference networks with fully randomized weights, fixed inputs, and
recorded fp32 outputs. Our NHWC flax forward (weights converted with
models/torch_import.py) must match within fp32 tolerance.
"""
import os

import jax
import numpy as np
import pytest

from diffusion_tts_tpu.models import edm_nets, preconds
from diffusion_tts_tpu.models.torch_import import convert_state_dict

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

SONG_KW = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
               attn_resolutions=(8,), dropout=0.0)
ADM_KW = dict(model_channels=64, channel_mult=(1,), num_blocks=1,
              attn_resolutions=(16,), dropout=0.0)

NET_CASES = {
    "songunet_ddpmpp": lambda: edm_nets.SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=10, **SONG_KW),
    "songunet_ncsnpp": lambda: edm_nets.SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=0,
        embedding_type="fourier", channel_mult_noise=2, encoder_type="residual",
        decoder_type="skip", resample_filter=(1, 3, 3, 1), **SONG_KW),
    "songunet_skipenc": lambda: edm_nets.SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=0,
        encoder_type="skip", **SONG_KW),
    "dhariwal": lambda: edm_nets.DhariwalUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=10, **ADM_KW),
}

PRECOND_CASES = {
    "precond_vp": lambda: preconds.VPPrecond(
        img_resolution=16, img_channels=3, label_dim=10,
        model_type="SongUNet", model_kwargs=SONG_KW),
    "precond_ve": lambda: preconds.VEPrecond(
        img_resolution=16, img_channels=3, label_dim=10,
        model_type="SongUNet", model_kwargs=SONG_KW),
    "precond_iddpm": lambda: preconds.iDDPMPrecond(
        img_resolution=16, img_channels=3, label_dim=10,
        model_type="DhariwalUNet", model_kwargs=ADM_KW),
    "precond_edm": lambda: preconds.EDMPrecond(
        img_resolution=16, img_channels=3, label_dim=10,
        model_type="DhariwalUNet", model_kwargs=ADM_KW),
}


def _load(name):
    path = os.path.join(GOLDENS, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture missing: {name}.npz (run tools/make_goldens.py)")
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    state = {k[4:]: v for k, v in data.items() if k.startswith("sd::")}
    inputs = {k[4:]: v for k, v in data.items() if k.startswith("in::")}
    golden = data["out::y"]
    return state, inputs, golden


def _check_all_params_loaded(variables, converted):
    """Every flax param must be filled from the torch state (no silent
    random-init leftovers)."""
    ref_flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    conv_flat = jax.tree_util.tree_leaves_with_path(converted["params"])
    ref_paths = {jax.tree_util.keystr(p) for p, _ in ref_flat}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in conv_flat}
    assert ref_paths == conv_paths, (
        f"missing: {sorted(ref_paths - conv_paths)[:5]} "
        f"extra: {sorted(conv_paths - ref_paths)[:5]}"
    )


# songunet_ddpmpp is the slowest single compile in the default suite
# (~48 s warm on one core); dhariwal/ncsnpp/skipenc keep the UNet parity
# path covered by default, and `pytest -m ""` still runs every flavor.
@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.slow) if n == "songunet_ddpmpp"
     else n for n in sorted(NET_CASES)],
)
def test_unet_forward_parity(name):
    state, inputs, golden = _load(name)
    model = NET_CASES[name]()
    x = np.transpose(inputs["x"], (0, 2, 3, 1))  # NCHW -> NHWC
    args = dict(
        noise_labels=inputs["noise_labels"],
        class_labels=inputs.get("class_labels"),
    )
    variables = model.init({"params": jax.random.key(0)}, x, **args)
    converted = convert_state_dict(state)
    _check_all_params_loaded(variables, converted)
    if "buffers" in variables:
        assert "buffers" in converted
    y = model.apply(converted, x, **args)
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, golden, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("name", sorted(PRECOND_CASES))
def test_precond_forward_parity(name):
    state, inputs, golden = _load(name)
    model = PRECOND_CASES[name]()
    x = np.transpose(inputs["x"], (0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.key(0)}, x, inputs["sigma"], inputs["class_labels"]
    )
    converted = convert_state_dict(state)
    _check_all_params_loaded(variables, converted)
    y = model.apply(converted, x, inputs["sigma"], inputs["class_labels"])
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, golden, atol=2e-4, rtol=2e-4)

"""Parity of the flax EncoderUNetModel vs the torch reference classifier."""
import os

import jax
import numpy as np
import pytest

from diffusion_tts_tpu.models.classifier import (
    EncoderUNetModel,
    convert_classifier_state_dict,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def test_classifier_forward_parity():
    path = os.path.join(GOLDENS, "classifier.npz")
    if not os.path.exists(path):
        pytest.skip("run tools/make_classifier_goldens.py")
    with np.load(path) as f:
        data = {k: f[k] for k in f.files}
    state = {k[4:]: v for k, v in data.items() if k.startswith("sd::")}

    model = EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
        pool="attention", dropout=0.0,
    )
    x = np.transpose(data["in::x"], (0, 2, 3, 1))
    variables = model.init({"params": jax.random.key(0)}, x, data["in::t"])
    converted = convert_classifier_state_dict(state)

    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(variables["params"])}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_leaves_with_path(converted["params"])}
    assert ref_paths == conv_paths, (
        f"missing {sorted(ref_paths - conv_paths)[:4]} extra {sorted(conv_paths - ref_paths)[:4]}"
    )
    y = model.apply(converted, x, data["in::t"])
    np.testing.assert_allclose(np.asarray(y), data["out::y"], atol=3e-4, rtol=3e-4)

"""Checkpoint round-trips: snapshot save/load, state dump/resume, transfer."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.models.preconds import EDMPrecond
from diffusion_tts_tpu.training import checkpoints
from diffusion_tts_tpu.training.train_step import TrainConfig, TrainState, make_optimizer
from diffusion_tts_tpu.utils.misc import copy_params_and_buffers

KW = dict(model_channels=16, channel_mult=(1,), num_blocks=1,
          attn_resolutions=(), dropout=0.0)


def _make_state():
    net = EDMPrecond(img_resolution=8, img_channels=3, label_dim=4,
                     model_type="SongUNet", model_kwargs=KW)
    v = net.init({"params": jax.random.key(0)}, jnp.zeros((1, 8, 8, 3)),
                 jnp.ones((1,)), jnp.zeros((1, 4)))
    tx = make_optimizer(TrainConfig())
    return net, TrainState.create(v["params"], tx)


def test_snapshot_roundtrip(tmp_path):
    net, state = _make_state()
    cfg = {"precond": "edm", "img_resolution": 8, "model_kwargs": KW}
    path = str(tmp_path / "network-snapshot-000001")
    checkpoints.save_snapshot(path, jax.device_get(state.ema_params), cfg)
    params, cfg2 = checkpoints.load_snapshot(path, like=jax.device_get(state.ema_params))
    import json

    # JSON normalizes tuples; save stamps the parameter-layout version
    assert cfg2 == json.loads(json.dumps(
        dict(cfg, ckpt_format_version=checkpoints.CKPT_FORMAT_VERSION)))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_state_dump_resume(tmp_path):
    net, state = _make_state()
    state = state.replace(nimg=state.nimg + 4096)
    path = str(tmp_path / "training-state-000004")
    checkpoints.save_state(path, jax.device_get(state))
    restored = checkpoints.load_state(path, like=jax.device_get(state))
    assert int(restored.nimg) == 4096
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unversioned_checkpoint_fails_loudly(tmp_path):
    """A pre-qkv-deinterleave checkpoint (no format marker) must not load
    silently: the version-1 layout would channel-permute attention outputs
    (ADVICE r2: models/torch_import.py qkv layout change)."""
    import json

    import pytest

    net, state = _make_state()
    ema = jax.device_get(state.ema_params)
    snap = str(tmp_path / "network-snapshot-000001")
    checkpoints.save_snapshot(snap, ema, {"precond": "edm"})
    # simulate a round-1-era snapshot: strip the version key
    with open(snap + ".config.json") as f:
        cfg = json.load(f)
    del cfg["ckpt_format_version"]
    with open(snap + ".config.json", "w") as f:
        json.dump(cfg, f)
    with pytest.raises(ValueError, match="layout version"):
        checkpoints.load_snapshot(snap, like=ema)

    st = str(tmp_path / "training-state-000004")
    checkpoints.save_state(st, jax.device_get(state))
    os.remove(st + ".format.json")  # round-1 state dumps had no sidecar
    with pytest.raises(ValueError, match="layout version"):
        checkpoints.load_state(st, like=jax.device_get(state))


def test_migrate_qkv_layout_roundtrip():
    """migrate_qkv_layout applies the de-interleave permutation to qkv
    kernels/biases: converting an interleaved-layout tree must equal
    converting the de-interleaved state dict directly."""
    import numpy as np

    from diffusion_tts_tpu.models.torch_import import (
        _deinterleave_qkv, migrate_qkv_layout,
    )

    rng = np.random.default_rng(0)
    kern = rng.standard_normal((1, 1, 8, 24), dtype=np.float32)
    bias = rng.standard_normal(24, dtype=np.float32)
    other = rng.standard_normal((3, 3, 8, 8), dtype=np.float32)
    v1_tree = {"params": {"block": {"qkv": {"kernel": kern, "bias": bias},
                                    "conv": {"kernel": other}}}}
    migrated = migrate_qkv_layout(v1_tree)
    np.testing.assert_array_equal(
        migrated["params"]["block"]["qkv"]["kernel"], _deinterleave_qkv(kern))
    np.testing.assert_array_equal(
        migrated["params"]["block"]["qkv"]["bias"], _deinterleave_qkv(bias))
    np.testing.assert_array_equal(
        migrated["params"]["block"]["conv"]["kernel"], other)


def test_parse_kimg_from_name():
    assert checkpoints.parse_kimg_from_name("runs/x/training-state-001234") == 1234
    assert checkpoints.parse_kimg_from_name("network-snapshot-000050.npz") == 50


def test_transfer_learning_partial_load():
    """Transfer: EMA weights only, require_all=False (train.py:165-169)."""
    net, state = _make_state()
    donor = jax.tree_util.tree_map(lambda x: x + 1.0, state.ema_params)
    # drop one inner subtree from the donor to simulate arch mismatch
    donor_partial = jax.tree_util.tree_map(lambda x: x, donor)
    inner = donor_partial["model"]
    dropped = next(iter(inner))
    del inner[dropped]
    merged = copy_params_and_buffers(donor_partial, state.params, require_all=False)
    changed = unchanged = 0
    flat_m = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(merged)}
    flat_o = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(state.params)}
    for k in flat_m:
        if np.array_equal(np.asarray(flat_m[k]), np.asarray(flat_o[k])):
            unchanged += 1
        else:
            changed += 1
    assert changed > 0 and unchanged > 0  # partial transfer happened

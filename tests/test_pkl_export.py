"""End-to-end source-pickled checkpoint flow (VERDICT r1 missing #2/next #10).

Builds a tiny EDMPrecond with the reference's torch classes, pickles it THE
REFERENCE'S WAY (persistence-wrapped 'ema' dict, the exact format of
network-snapshot-*.pkl — training_loop.py:177-189, persistence.py:34-140),
exports it with tools/export_edm_checkpoint.py in a CLEAN subprocess (so
reconstruction must come from the pickle's embedded source, like loading a
downloaded NVIDIA checkpoint would), converts to flax, and checks forward
parity — the full pkl -> npz -> flax path.
"""
from __future__ import annotations

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_EDM = "/root/reference/edm"


@pytest.mark.reference
def test_source_pickled_checkpoint_export_roundtrip(tmp_path):
    sys.path.insert(0, REF_EDM)
    try:
        import torch
        from training import networks as ref_networks
    finally:
        sys.path.remove(REF_EDM)

    torch.manual_seed(7)
    kw = dict(model_channels=64, channel_mult=[1], num_blocks=1,
              attn_resolutions=[16], dropout=0.0)
    net = ref_networks.EDMPrecond(
        img_resolution=16, img_channels=3, label_dim=10,
        model_type="DhariwalUNet", **kw)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    net.eval()

    x = torch.randn(2, 3, 16, 16)
    sigma = torch.tensor([1.5, 7.0])
    labels = torch.eye(10)[:2]
    with torch.no_grad():
        y_ref = net(x, sigma, labels).numpy()

    # snapshot format: {'ema': persistent module} (training_loop.py:177-189)
    pkl = tmp_path / "network-snapshot-test.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(dict(ema=net), f)
    raw = pkl.read_bytes()
    assert b"class EDMPrecond" in raw, "pickle should embed module source"

    # export in a clean subprocess: reconstruction must use the embedded
    # source via torch_utils.persistence, not this process's imports
    npz = tmp_path / "exported.npz"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_edm_checkpoint.py"),
         str(pkl), str(npz)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, f"export failed:\n{proc.stdout}\n{proc.stderr}"

    import jax

    from diffusion_tts_tpu.models import preconds
    from diffusion_tts_tpu.models.torch_import import convert_state_dict

    with np.load(npz) as f:
        state = {k: f[k] for k in f.files}
    converted = convert_state_dict(state)
    model = preconds.EDMPrecond(
        img_resolution=16, img_channels=3, label_dim=10,
        model_type="DhariwalUNet",
        model_kwargs=dict(model_channels=64, channel_mult=(1,), num_blocks=1,
                          attn_resolutions=(16,), dropout=0.0))
    x_nhwc = np.transpose(x.numpy(), (0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.key(0)}, x_nhwc, sigma.numpy(), labels.numpy())
    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    conv_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(converted["params"])}
    assert ref_paths == conv_paths

    y = model.apply(converted, x_nhwc, sigma.numpy(), labels.numpy())
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, y_ref, atol=2e-4, rtol=2e-4)

"""Env-gated integration with REAL pretrained checkpoints (VERDICT r3 #8).

Everything in the suite runs with random weights (zero-egress environment);
the moment a machine has the reference's checkpoints on disk, this file
runs the paper comparison in one command:

    DTTS_WEIGHTS_DIR=/path/to/ckpts python -m pytest tests/test_real_weights.py -m "" -v

Recognized files (the reference's checkpoint names, main.py:117-121 and
the NVIDIA EDM release):

    edm-imagenet-64x64-cond-adm.pkl   -> arch "imagenet64"
    edm-cifar10-32x32-cond-vp.pkl     -> arch "cifar10"

.pkl files are exported to .npz next to themselves on first run (via
tools/export_edm_checkpoint.py — needs /root/reference for the
source-pickle machinery); a pre-exported `<name>.npz` is used directly
(and is the only option on machines without /root/reference).

Covers, per checkpoint found:
  1. per-seed naive image parity vs the reference sampler
     (SURVEY §7 stage 3; edm/generate.py:25-60 semantics via
     edm/main.py's naive branch) — identical injected noise, terminal
     uint8 images equal to +-1;
  2. a real reward row — eps_greedy vs naive at a small matched budget,
     brightness reward — appended to DTTS_WEIGHTS_DIR/real_reward_rows.json
     (the paper's +164%-class comparison, README.md:9, at real weights).

Skips cleanly when DTTS_WEIGHTS_DIR is unset or contains no recognized
checkpoint.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS_DIR = os.environ.get("DTTS_WEIGHTS_DIR", "")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not WEIGHTS_DIR, reason="DTTS_WEIGHTS_DIR not set"),
]

# reference checkpoint name -> (arch, sampler config of the unified CLI's
# EDM path, main.py:197-213)
KNOWN = {
    "edm-imagenet-64x64-cond-adm": ("imagenet64", 64, 1000),
    "edm-cifar10-32x32-cond-vp": ("cifar10", 32, 10),
}
SAMPLER_KW = dict(num_steps=18, sigma_min=0.002, sigma_max=80.0, rho=7.0,
                  S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003)
B = 2  # seeds per checkpoint


def _found_checkpoints():
    out = []
    if not WEIGHTS_DIR or not os.path.isdir(WEIGHTS_DIR):
        return out
    for stem, meta in KNOWN.items():
        pkl = os.path.join(WEIGHTS_DIR, stem + ".pkl")
        npz = os.path.join(WEIGHTS_DIR, stem + ".npz")
        if os.path.exists(pkl) or os.path.exists(npz):
            out.append((stem, pkl if os.path.exists(pkl) else None, npz, meta))
    return out


CHECKPOINTS = _found_checkpoints()
if WEIGHTS_DIR and not CHECKPOINTS:
    pytestmark.append(pytest.mark.skip(
        reason=f"no recognized checkpoint in {WEIGHTS_DIR} "
               f"(expected one of {sorted(KNOWN)} as .pkl or .npz)"))


def _ensure_npz(pkl: str | None, npz: str) -> str:
    if not os.path.exists(npz):
        assert pkl, "no .npz and no .pkl to export it from"
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "export_edm_checkpoint.py"),
             pkl, npz],
            check=True, cwd=REPO,
        )
    return npz


def _latents_and_labels(res: int, label_dim: int):
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((B, 3, res, res)).astype(np.float32)
    labels = np.eye(label_dim, dtype=np.float32)[np.arange(B) % label_dim]
    return latents, labels


def _my_backend(arch: str, npz: str, labels: np.ndarray, scorer=None):
    import jax.numpy as jnp

    from diffusion_tts_tpu.backends.edm_entry import load_network
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.search.backend import EDMSearchBackend

    net, variables = load_network(arch, weights=npz)
    lab = jnp.asarray(labels)

    def denoise(x, sigma):
        return net.apply(variables, x, sigma, jnp.tile(lab, (x.shape[0] // B, 1)))

    sampler = EDMHeunSampler(denoise=denoise, **SAMPLER_KW)
    return EDMSearchBackend(sampler=sampler, scorer=scorer or BrightnessScorer())


@pytest.mark.reference
@pytest.mark.parametrize("stem,pkl,npz,meta", CHECKPOINTS,
                         ids=[c[0] for c in CHECKPOINTS])
def test_naive_image_parity_real_weights(stem, pkl, npz, meta):
    """Terminal naive images == the reference sampler's, per seed, at real
    weights (the round-1..3 parity claims were all RANDOM-INIT)."""
    if not pkl:
        pytest.skip("only .npz present — torch-side reference run needs the .pkl")
    import jax

    from test_search_reference_parity import (  # shared reference rig
        _assert_images_close,
        _import_ref_main,
        _my_uint8,
    )

    arch, res, label_dim = meta
    _ensure_npz(pkl, npz)
    ref = _import_ref_main()
    import torch

    latents, labels = _latents_and_labels(res, label_dim)
    rng = np.random.default_rng(7)
    eps = rng.standard_normal((SAMPLER_KW["num_steps"], B, 3, res, res)).astype(np.float32)

    out_png = os.path.join(WEIGHTS_DIR, f"{stem}.naive_parity.png")
    orig = torch.randn_like
    stream = list(eps)

    def fake_randn_like(t, **kw):
        assert stream, "reference drew more randn_like() than scripted"
        v = torch.as_tensor(np.asarray(stream.pop(0), np.float32))
        return v.to(t.dtype)

    torch.randn_like = fake_randn_like
    # the source-pickled checkpoint references torch_utils.persistence at
    # unpickle time (persistence.py:185) — the reference tree must be on
    # sys.path for pickle.load, exactly as for a downloaded NVIDIA .pkl
    sys.path.insert(0, "/root/reference/edm")
    try:
        ref.generate_image_grid(
            pkl, out_png, torch.as_tensor(latents), torch.as_tensor(labels),
            seed=0, gridw=B, gridh=1, device=torch.device("cpu"),
            sampling_method=ref.SamplingMethod.NAIVE, sampling_params={},
            **{k: v for k, v in SAMPLER_KW.items()},
        )
    finally:
        torch.randn_like = orig
        sys.path.remove("/root/reference/edm")

    import PIL.Image

    grid = np.asarray(PIL.Image.open(out_png))
    ref_imgs = np.stack(np.split(grid, B, axis=1))

    from diffusion_tts_tpu.search import InjectedNoise, run_search

    backend = _my_backend(arch, npz, labels)
    result = run_search(
        "naive", backend, np.transpose(latents, (0, 2, 3, 1)),
        jax.random.key(0),
        noise=InjectedNoise(step_noise=np.transpose(eps, (0, 1, 3, 4, 2))))
    _assert_images_close(_my_uint8(result.images), ref_imgs, exact_frac=0.9)


@pytest.mark.parametrize("stem,pkl,npz,meta", CHECKPOINTS,
                         ids=[c[0] for c in CHECKPOINTS])
def test_real_reward_row(stem, pkl, npz, meta):
    """One real reward row: eps_greedy (paper defaults, small K) vs naive,
    brightness reward, appended to DTTS_WEIGHTS_DIR/real_reward_rows.json."""
    import jax

    from diffusion_tts_tpu.search import run_search
    from diffusion_tts_tpu.utils.config import SearchParams

    arch, res, label_dim = meta
    _ensure_npz(pkl, npz)
    latents, labels = _latents_and_labels(res, label_dim)
    backend = _my_backend(arch, npz, labels)
    z = np.transpose(latents, (0, 2, 3, 1))

    r_naive = run_search("naive", backend, z, jax.random.key(1))
    r_eps = run_search("eps_greedy", backend, z, jax.random.key(1),
                       SearchParams(N=4, K=4, eps=0.4), dispatch="auto")
    naive_r = float(np.mean(np.asarray(r_naive.score)))
    eps_r = float(np.mean(np.asarray(r_eps.score)))

    row = {
        "checkpoint": stem, "arch": arch, "weights": "REAL-PRETRAINED",
        "scorer": "brightness", "seeds": B,
        "naive_reward": naive_r, "eps_greedy_reward": eps_r,
        "params": {"N": 4, "K": 4, "eps": 0.4}, "sampler": SAMPLER_KW,
    }
    path = os.path.join(WEIGHTS_DIR, "real_reward_rows.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)

    # search must not lose to naive at a 32x budget
    assert eps_r >= naive_r - 1e-4, row

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

SD-1.5 (VERDICT r4 #3): a diffusers-layout checkpoint directory (unet/ +
vae/ [+ text_encoder/ + tokenizer/ + scheduler/]) anywhere directly under
DTTS_WEIGHTS_DIR — e.g. `stable-diffusion-v1-5/` — is recognized too
(`_find_sd_dir`); `StableDiffusionSearchPipeline.from_pretrained` loads it.
Covers, when found:
  1. per-seed naive 50-step image parity vs the vendored reference pipeline
     with scripted noise (main.py:111-147 semantics; steps overridable via
     DTTS_SD_PARITY_STEPS for a quicker first smoke — the 512x512 fp32
     CPU reference run is minutes-scale);
  2. a real CLIP reward row (needs a CLIP checkpoint dir with "clip" in
     its name under DTTS_WEIGHTS_DIR, e.g. `clip-vit-large-patch14/`):
     eps_greedy vs naive at a small matched budget, appended to
     real_reward_rows.json.
The plumbing (dir recognition, from_pretrained, scripted-noise parity
machinery) is dry-run TODAY against a random-weight fixture in
tests/test_sd_weights_fast_path.py.

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


def _find_sd_dir(root: str | None = None):
    """A diffusers-layout SD checkpoint: the root (DTTS_WEIGHTS_DIR) itself
    or a first-level subdirectory with unet/config.json + vae/config.json
    (the layout `StableDiffusionSearchPipeline.from_pretrained` loads,
    i.e. the reference's runwayml/stable-diffusion-v1-5 snapshot,
    main.py:117-121)."""
    root = WEIGHTS_DIR if root is None else root
    if not root or not os.path.isdir(root):
        return None
    cands = [root] + [
        os.path.join(root, d) for d in sorted(os.listdir(root))
        if os.path.isdir(os.path.join(root, d))
    ]
    for d in cands:
        if (os.path.isfile(os.path.join(d, "unet", "config.json"))
                and os.path.isfile(os.path.join(d, "vae", "config.json"))):
            return d
    return None


def _find_clip_dir(root: str | None = None):
    """A local CLIP checkpoint for the real reward row (the reference's
    openai/clip-vit-large-patch14, sd/scorers.py:160)."""
    root = WEIGHTS_DIR if root is None else root
    if not root or not os.path.isdir(root):
        return None
    for d in sorted(os.listdir(root)):
        p = os.path.join(root, d)
        if os.path.isdir(p) and "clip" in d.lower() and \
                os.path.isfile(os.path.join(p, "config.json")):
            return p
    return None


CHECKPOINTS = _found_checkpoints()
SD_DIR = _find_sd_dir()
if WEIGHTS_DIR and not CHECKPOINTS and not SD_DIR:
    pytestmark.append(pytest.mark.skip(
        reason=f"no recognized checkpoint in {WEIGHTS_DIR} "
               f"(expected one of {sorted(KNOWN)} as .pkl or .npz, or a "
               f"diffusers-layout SD directory with unet/ + vae/)"))


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


# ------------------------------------------------------------------ SD-1.5

REF_DIFFUSERS = "/root/reference/sd/diffusers/src"
SD_GS = 7.5  # the reference pipeline's CFG default (main.py:135-141)
SD_STEPS = int(os.environ.get("DTTS_SD_PARITY_STEPS", "50"))  # main.py:137


def load_sd_reference_pipeline(sd_dir: str):
    """The vendored reference pipeline from a local checkpoint dir,
    component-wise (main.py:111-121 semantics without the hub): UNet + VAE
    from their subfolders, DDIM scheduler from scheduler/ when present
    (SD-1.5 defaults otherwise), fp32 on CPU."""
    if REF_DIFFUSERS not in sys.path:
        sys.path.insert(0, REF_DIFFUSERS)
    import torch
    from diffusers import AutoencoderKL as TVae
    from diffusers import UNet2DConditionModel as TUnet
    from diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion import (
        StableDiffusionPipeline,
    )
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    unet = TUnet.from_pretrained(os.path.join(sd_dir, "unet"),
                                 torch_dtype=torch.float32)
    unet.eval()
    vae = TVae.from_pretrained(os.path.join(sd_dir, "vae"),
                               torch_dtype=torch.float32)
    vae.eval()
    sch_dir = os.path.join(sd_dir, "scheduler")
    if os.path.isdir(sch_dir):
        sch = DDIMScheduler.from_pretrained(sch_dir)
    else:
        sch = DDIMScheduler(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="scaled_linear", clip_sample=False,
            set_alpha_to_one=False, steps_offset=1,
            prediction_type="epsilon",
        )
    pipe = StableDiffusionPipeline(
        vae=vae, text_encoder=None, tokenizer=None, unet=unet, scheduler=sch,
        safety_checker=None, feature_extractor=None,
        requires_safety_checker=False,
    )
    pipe.set_progress_bar_config(disable=True)
    return pipe


def run_sd_naive_parity(sd_dir: str, *, steps: int, gs: float = SD_GS,
                        seed: int = 0):
    """Shared core of the SD weights-present fast path: drive the vendored
    reference's naive branch (pipeline_stable_diffusion.py:1335-1366,1435)
    and our `from_pretrained` pipeline from the SAME checkpoint dir with
    identical scripted noise; assert terminal uint8 images equal +-1.
    Dry-run TODAY at tiny geometry by test_sd_weights_fast_path.py."""
    import jax
    import jax.numpy as jnp

    from test_sd_search_reference_parity import (  # shared SD parity rig
        _assert_images_close,
        _my_uint8,
        _nhwc,
        _RecordingScorer,
    )

    from diffusion_tts_tpu.pipelines import StableDiffusionSearchPipeline
    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.search import InjectedNoise, run_search

    my_pipe = StableDiffusionSearchPipeline.from_pretrained(sd_dir)
    lat_res = my_pipe.unet.sample_size
    lat_shape = (1, my_pipe.unet.in_channels, lat_res, lat_res)  # torch NCHW
    ctx_dim = my_pipe.unet.cross_attention_dim

    rng = np.random.default_rng(seed)
    lat0 = rng.standard_normal(lat_shape).astype(np.float32)
    eps = rng.standard_normal((steps,) + lat_shape).astype(np.float32)
    pe = rng.standard_normal((1, 77, ctx_dim)).astype(np.float32)
    ne = rng.standard_normal((1, 77, ctx_dim)).astype(np.float32)

    # --- reference side, scripted noise (naive: 1 randn_like per step)
    ref_pipe = load_sd_reference_pipeline(sd_dir)
    import torch

    recorder = _RecordingScorer(torch)
    queue = [e for e in eps]
    orig = torch.randn_like

    def fake_randn_like(t, **kw):
        assert queue, "reference drew more randn_like() than scripted"
        return torch.as_tensor(np.asarray(queue.pop(0), np.float32)).to(t.dtype)

    torch.randn_like = fake_randn_like
    try:
        out, ms = ref_pipe(
            prompt=None, prompt_embeds=torch.as_tensor(pe),
            negative_prompt_embeds=torch.as_tensor(ne),
            num_inference_steps=steps, guidance_scale=gs, eta=1.0,
            latents=torch.as_tensor(lat0), output_type="np",
            score_function=recorder, method="naive", params={},
        )
    finally:
        torch.randn_like = orig
    assert not queue, f"{len(queue)} scripted draws unconsumed"
    ref_u8 = np.rint(np.asarray(out.images) * 255.0).astype(np.uint8)

    # --- our side, the same weights through from_pretrained + InjectedNoise
    bargs = {"unet": my_pipe.unet_params, "vae": my_pipe.vae_params,
             "uncond": jnp.asarray(ne), "cond": jnp.asarray(pe)}
    backend = my_pipe.make_backend(
        bargs, BrightnessScorer(), num_inference_steps=steps, eta=1.0,
        guidance_scale=gs, batch=1,
    )
    res = run_search(
        "naive", backend, _nhwc(lat0), jax.random.key(0),
        noise=InjectedNoise(step_noise=np.stack([_nhwc(e) for e in eps])))
    _assert_images_close(_my_uint8(res.images), ref_u8, exact_frac=0.9)
    return float(np.asarray(res.score)[0]), float(ms)


@pytest.mark.reference
@pytest.mark.skipif(not SD_DIR, reason="no diffusers-layout SD checkpoint dir")
def test_sd_naive_image_parity_real_weights():
    """Per-seed naive image parity at REAL SD-1.5 weights: the reference's
    512x512 naive branch vs ours from the same safetensors, scripted noise
    (the weights-present counterpart of the random-init
    test_sd_search_reference_parity naive golden)."""
    my_score, ref_score = run_sd_naive_parity(SD_DIR, steps=SD_STEPS)
    np.testing.assert_allclose(my_score, ref_score, atol=2e-3)


@pytest.mark.skipif(not SD_DIR, reason="no diffusers-layout SD checkpoint dir")
def test_sd_real_clip_reward_row():
    """One real SD reward row: eps_greedy vs naive at a small matched
    budget with the CLIP reward (sd/scorers.py:149-213) when a local CLIP
    checkpoint exists, brightness otherwise; appended to
    real_reward_rows.json (the paper's text-to-image comparison,
    main.py:134-143, at real weights)."""
    import jax
    import jax.numpy as jnp

    from diffusion_tts_tpu.pipelines import StableDiffusionSearchPipeline
    from diffusion_tts_tpu.scorers import BrightnessScorer, CLIPScorer
    from diffusion_tts_tpu.utils.config import SearchParams

    my_pipe = StableDiffusionSearchPipeline.from_pretrained(SD_DIR)
    prompt = "a photograph of an astronaut riding a horse"
    clip_dir = _find_clip_dir()
    scorer_cond = None
    if clip_dir:
        scorer = CLIPScorer.from_pretrained(clip_dir)
        scorer_name = os.path.basename(clip_dir)
        assert my_pipe.tokenizer is not None, \
            "CLIP reward row needs the SD tokenizer/ for the text features"
        tok = my_pipe.tokenizer([prompt], padding="max_length",
                                truncation=True, max_length=77,
                                return_tensors="np")
        scorer_cond = scorer.text_features(tok["input_ids"])
    else:
        scorer, scorer_name = BrightnessScorer(), "brightness"

    steps, sp = 10, SearchParams(N=4, K=2, eps=0.4)
    kw = dict(num_inference_steps=steps, score_function=scorer,
              scorer_cond=scorer_cond, key=jax.random.key(3))
    if my_pipe.tokenizer is not None and my_pipe.text_encoder is not None:
        kw["prompt"] = prompt
    else:
        rng = np.random.default_rng(5)
        kw["prompt_embeds"] = jnp.asarray(rng.standard_normal(
            (1, 77, my_pipe.unet.cross_attention_dim)), jnp.float32)
    _, naive_s = my_pipe(method="naive", **kw)
    _, eps_s = my_pipe(method="eps_greedy", params=sp, dispatch="auto", **kw)

    row = {
        "checkpoint": os.path.basename(SD_DIR) or SD_DIR, "arch": "sd15",
        "weights": "REAL-PRETRAINED", "scorer": scorer_name,
        "prompt": prompt, "steps": steps,
        "naive_reward": float(naive_s[0]),
        "eps_greedy_reward": float(eps_s[0]),
        "params": {"N": sp.N, "K": sp.K, "eps": sp.eps},
    }
    path = os.path.join(WEIGHTS_DIR, "real_reward_rows.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    assert float(eps_s[0]) >= float(naive_s[0]) - 1e-4, row

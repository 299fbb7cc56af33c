"""SD search-engine decision parity vs the vendored reference pipeline
(VERDICT r3 #3).

The EDM search engine has decision-level golden parity
(test_search_reference_parity.py); this file gives the SD side the same
treatment: the reference's modified ``StableDiffusionPipeline.__call__``
(sd/diffusers/.../pipeline_stable_diffusion.py — eps_greedy/zero_order
:1368-1435, beam :1045-1170, naive else-path) is driven on CPU with tiny
components (the vendored suite's own fast-test scale) and fully scripted
noise (monkeypatched torch.randn_like / torch.rand / torch.randn), and our
``run_search`` over an ``SDSearchBackend`` built from the SAME weights
(through the safetensors-layout converter) and the SAME scripted noise via
``InjectedNoise`` must make identical decisions:

  * eps_greedy / zero_order: identical candidate argmax at every
    (timestep, K-iteration), pinned via the reference's recorded
    per-candidate scores and our recorded best-noise trajectory;
  * beam: identical per-step top-B candidate SETS (the reference's global
    sort over beam-major scores vs our on-device top_k over
    candidate-major scores), and the identical final best-of-B winner;
  * naive: identical trajectory;
  * all: terminal uint8 images equal up to quantization rounding
    (the reference postprocesses with round-half-even at x*127.5+127.5;
    we score/return the floor grid at x*127.5+128 — both within 1).

Reference draw accounting (scripted exactly, queues asserted empty):
  eps_greedy/zero_order, per timestep: 1 randn_like (pivot), then per
  (k, n): 1 rand (Bernoulli; compared against eps only for eps_greedy),
  1 randn_like (the fresh draw OR the direction — one draw either way),
  and 1 more rand (the scale) only on the exploit arm; each candidate
  evaluation's second scheduler.step (eta=1, variance_noise=None) draws
  one internal torch.randn whose result never reaches any used output —
  scripted as zeros. beam, per timestep: N randn_like per beam in beam
  order. naive: 1 randn_like per step.
"""
from __future__ import annotations

import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

REF_DIFFUSERS = "/root/reference/sd/diffusers/src"

STEPS, K, N = 5, 2, 3
BEAM_M = 2
GS = 3.0  # guidance scale (CFG on, as the reference defaults)
EPS = 0.4
LAMBDA = 0.15

# the vendored fast-test scale (make_sd_goldens.py / diffusers
# tests/pipelines/stable_diffusion/test_stable_diffusion.py:133-191)
UNET_CFG = dict(
    sample_size=16, in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2, attention_head_dim=8,
    cross_attention_dim=32, norm_num_groups=32,
)
VAE_CFG = dict(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=32,
    down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
    up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
)
LAT_SHAPE = (1, 4, 16, 16)  # torch NCHW


def _stub_module(name):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
    return sys.modules[name]


@pytest.fixture(scope="module")
def rig():
    """Tiny vendored pipeline (torch, CPU) + converted flax weights."""
    os.environ.setdefault("MPLBACKEND", "Agg")
    sys.path.insert(0, REF_DIFFUSERS)
    import torch
    from diffusers import AutoencoderKL as TVae
    from diffusers import UNet2DConditionModel as TUnet
    from diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion import (
        StableDiffusionPipeline,
    )
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    def randomize(net, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in net.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.15)

    unet = TUnet(**UNET_CFG)
    unet.eval()
    randomize(unet, 1)
    vae = TVae(**VAE_CFG)
    vae.eval()
    randomize(vae, 3)
    sch = DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", clip_sample=False,
        set_alpha_to_one=False, steps_offset=1, prediction_type="epsilon",
    )
    pipe = StableDiffusionPipeline(
        vae=vae, text_encoder=None, tokenizer=None, unet=unet, scheduler=sch,
        safety_checker=None, feature_extractor=None,
        requires_safety_checker=False,
    )
    pipe.set_progress_bar_config(disable=True)

    rng = np.random.default_rng(77)
    pe = rng.standard_normal((1, 7, 32)).astype(np.float32)
    ne = rng.standard_normal((1, 7, 32)).astype(np.float32)
    lat0 = rng.standard_normal(LAT_SHAPE).astype(np.float32)

    return dict(
        torch=torch, pipe=pipe,
        unet_state={k: v.numpy() for k, v in unet.state_dict().items()},
        vae_state={k: v.numpy() for k, v in vae.state_dict().items()},
        pe=pe, ne=ne, lat0=lat0,
    )


class _RecordingScorer:
    """Brightness reward with the reference SD scorer's exact uint8->[0,1]
    luminance math (sd/scorers.py:25-76), recording every score — the
    per-candidate argmax inputs of the K loop (pipeline:1429-1433)."""

    def __init__(self, torch):
        self.torch = torch
        self.calls: list[float] = []

    def __call__(self, images, prompts, timesteps):
        torch = self.torch
        img = images[0]
        if img.dim() == 3:
            img = img[None]
        x = img.float() / 255.0  # [B, 3, H, W]
        w = torch.tensor([0.2126, 0.7152, 0.0722]).view(1, 3, 1, 1)
        lum = (x * w).sum(dim=1).mean(dim=(1, 2)).clamp(0.0, 1.0)
        score = lum[0]
        self.calls.append(float(score))
        return score


def _run_reference(rig, method, params, randn_like_q, rand_q):
    """Drive the vendored __call__ with scripted noise. Returns
    (terminal uint8 images [B,H,W,3], per-call scores, max_score)."""
    torch = rig["torch"]
    recorder = _RecordingScorer(torch)
    rl_q, r_q = list(randn_like_q), list(rand_q)

    orig_randn_like, orig_rand, orig_randn = (
        torch.randn_like, torch.rand, torch.randn)

    def fake_randn_like(t, **kw):
        assert rl_q, "reference drew more randn_like() than scripted"
        v = torch.as_tensor(np.asarray(rl_q.pop(0), np.float32))
        assert v.shape == t.shape, (v.shape, t.shape)
        return v.to(t.dtype)

    def fake_rand(*size, **kw):
        assert r_q, "reference drew more rand() than scripted"
        return torch.full([1], float(r_q.pop(0)))

    def fake_randn(*size, **kw):
        # the lookahead-eval scheduler.step's internal variance draw
        # (scheduling_ddim.py:457-460 via randn_tensor) — its result feeds
        # only the unused next_tminusone, so zeros keep accounting honest
        if len(size) == 1 and isinstance(size[0], (tuple, list, torch.Size)):
            size = tuple(size[0])
        return torch.zeros(*size, dtype=kw.get("dtype") or torch.float32)

    torch.randn_like, torch.rand, torch.randn = (
        fake_randn_like, fake_rand, fake_randn)
    try:
        out, max_score = rig["pipe"](
            prompt=None,
            prompt_embeds=torch.as_tensor(rig["pe"]),
            negative_prompt_embeds=torch.as_tensor(rig["ne"]),
            num_inference_steps=STEPS, guidance_scale=GS, eta=1.0,
            latents=torch.as_tensor(rig["lat0"]),
            output_type="np", score_function=recorder,
            method=method, params=params,
        )
    finally:
        torch.randn_like, torch.rand, torch.randn = (
            orig_randn_like, orig_rand, orig_randn)
    assert not rl_q, f"{len(rl_q)} scripted randn_like draws unconsumed"
    assert not r_q, f"{len(r_q)} scripted rand draws unconsumed"
    imgs_u8 = np.rint(np.asarray(out.images) * 255.0).astype(np.uint8)
    ms = float(max_score) if not hasattr(max_score, "item") else float(max_score.item())
    return imgs_u8, recorder.calls, ms


def _my_backend(rig):
    import jax.numpy as jnp

    from diffusion_tts_tpu.models.sd_import import convert_diffusers_state_dict
    from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
    from diffusion_tts_tpu.models.sd_vae import AutoencoderKL
    from diffusion_tts_tpu.pipelines import StableDiffusionSearchPipeline
    from diffusion_tts_tpu.scorers import BrightnessScorer

    unet = UNet2DConditionModel(**UNET_CFG)
    vae = AutoencoderKL(**{k: v for k, v in VAE_CFG.items()
                           if k not in ("down_block_types", "up_block_types")})
    pipe = StableDiffusionSearchPipeline(
        unet=unet, unet_params=convert_diffusers_state_dict(rig["unet_state"]),
        vae=vae, vae_params=convert_diffusers_state_dict(rig["vae_state"]),
        guidance_scale=GS,
    )
    bargs = {"unet": pipe.unet_params, "vae": pipe.vae_params,
             "uncond": jnp.asarray(rig["ne"]), "cond": jnp.asarray(rig["pe"])}
    backend = pipe.make_backend(
        bargs, BrightnessScorer(), num_inference_steps=STEPS, eta=1.0,
        guidance_scale=GS, batch=1,
    )
    return backend


def _nhwc(a):
    return np.moveaxis(np.asarray(a, np.float32), -3, -1)


def _my_uint8(images01):
    return np.rint(np.asarray(images01, np.float64) * 255.0).astype(np.uint8)


def _assert_images_close(mine_u8, ref_u8, exact_frac=0.95):
    diff = np.abs(mine_u8.astype(np.int32) - ref_u8.astype(np.int32))
    assert diff.max() <= 1, f"terminal images diverge: max uint8 diff {diff.max()}"
    frac = (diff == 0).mean()
    assert frac >= exact_frac, f"only {frac:.3f} of pixels exactly equal"


@pytest.mark.reference
@pytest.mark.slow
class TestSDSearchDecisionParity:
    def test_naive_trajectory_parity(self, rig):
        import jax

        from diffusion_tts_tpu.search import InjectedNoise, run_search

        rng = np.random.default_rng(5)
        eps = rng.standard_normal((STEPS,) + LAT_SHAPE).astype(np.float32)
        ref_imgs, calls, ms = _run_reference(
            rig, "naive", {}, randn_like_q=list(eps), rand_q=[])
        assert len(calls) == 1  # only the final unconditional score

        backend = _my_backend(rig)
        res = run_search(
            "naive", backend, _nhwc(rig["lat0"]), jax.random.key(0),
            noise=InjectedNoise(step_noise=np.stack([_nhwc(e) for e in eps])))
        _assert_images_close(_my_uint8(res.images), ref_imgs)
        np.testing.assert_allclose(float(np.asarray(res.score)[0]), ms, atol=2e-3)

    @pytest.mark.parametrize("method", ["zero_order", "eps_greedy"])
    def test_iterated_search_selection_parity(self, rig, method):
        import jax

        from diffusion_tts_tpu.search import InjectedNoise, run_search
        from diffusion_tts_tpu.utils.config import SearchParams

        rng = np.random.default_rng(6 if method == "eps_greedy" else 7)
        pivots = rng.standard_normal((STEPS,) + LAT_SHAPE).astype(np.float32)
        draws = rng.standard_normal((STEPS, K, N) + LAT_SHAPE).astype(np.float32)
        scales01 = rng.random((STEPS, K, N))
        if method == "eps_greedy":
            explore = rng.random((STEPS, K, N)) < EPS
        else:
            explore = np.zeros((STEPS, K, N), bool)

        # reference draw order (pipeline:1368-1381): pivot, then per (k,n)
        # one rand (Bernoulli), one randn_like (fresh OR direction), and on
        # the exploit arm one more rand (the scale)
        rl_q, r_q = [], []
        for i in range(STEPS):
            rl_q.append(pivots[i])
            for k in range(K):
                for n in range(N):
                    r_q.append(0.2 if explore[i, k, n] else 0.9)
                    rl_q.append(draws[i, k, n])
                    if not explore[i, k, n]:
                        r_q.append(scales01[i, k, n])

        ref_imgs, calls, _ = _run_reference(
            rig, method,
            {"N": N, "K": K, "eps": EPS, "lambda": LAMBDA},
            randn_like_q=rl_q, rand_q=r_q)
        assert len(calls) == STEPS * K * N  # one per candidate; no final call
        ref_sel = np.asarray(calls).reshape(STEPS, K, N).argmax(axis=2)

        backend = _my_backend(rig)
        to5 = lambda a: np.stack(
            [np.stack([np.stack([_nhwc(a[i, k, n]) for n in range(N)])
                       for k in range(K)]) for i in range(STEPS)])
        inj = InjectedNoise(
            pivots=np.stack([_nhwc(pivots[i]) for i in range(STEPS)]),
            directions=to5(draws), fresh=to5(draws),
            scales01=np.broadcast_to(
                scales01[..., None], (STEPS, K, N, 1)).astype(np.float32).copy(),
            explore01=np.where(explore, 0.0, 0.99).astype(np.float32),
        )
        res = run_search(
            method, backend, _nhwc(rig["lat0"]), jax.random.key(0),
            SearchParams(N=N, K=K, eps=EPS, lambda_=LAMBDA),
            record_noises=True, noise=inj)

        # Reconstruct the candidate sets along the reference's pivot chain;
        # our recorded selected pivot must equal the reference's argmax
        # candidate at every (timestep, iteration).
        feat_axes = (1, 2, 3)
        lam = LAMBDA * np.sqrt(np.prod(LAT_SHAPE[1:]))
        my_best = np.asarray(res.best_noises)  # [steps, K, B=1, H, W, C]
        for i in range(STEPS):
            pivot = _nhwc(pivots[i]).astype(np.float64)
            for k in range(K):
                cands = []
                for n in range(N):
                    d = _nhwc(draws[i, k, n]).astype(np.float64)
                    if explore[i, k, n]:
                        cands.append(d)
                    else:
                        d = d / np.sqrt((d ** 2).sum(axis=feat_axes, keepdims=True))
                        cands.append(pivot + scales01[i, k, n] * lam * d)
                cands = np.stack(cands)  # [N, 1, H, W, C]
                dist = np.abs(
                    cands[:, 0] - my_best[i, k, 0]).reshape(N, -1).max(axis=1)
                my_sel = int(dist.argmin())
                assert dist[my_sel] < 1e-3, (
                    f"step {i} iter {k}: recorded pivot matches no candidate "
                    f"(min dist {dist[my_sel]:.2e})")
                assert my_sel == ref_sel[i, k], (
                    f"selection diverged at step {i} iter {k}: "
                    f"ours {my_sel} vs reference {ref_sel[i, k]}")
                pivot = cands[ref_sel[i, k]]

        _assert_images_close(_my_uint8(res.images), ref_imgs)

    def test_beam_topB_set_parity(self, rig):
        import jax

        from diffusion_tts_tpu.search import InjectedNoise, run_search
        from diffusion_tts_tpu.utils.config import SearchParams

        m = BEAM_M
        rng = np.random.default_rng(8)
        # reference beam draw order (pipeline:1080): per step, per beam j
        # (rank order), N randn_like candidates
        beam_draws = rng.standard_normal(
            (STEPS, m, N) + LAT_SHAPE).astype(np.float32)
        rl_q = [beam_draws[i, j, n]
                for i in range(STEPS) for j in range(m) for n in range(N)]
        ref_imgs, calls, ms = _run_reference(
            rig, "beam", {"B": m, "N": N}, randn_like_q=rl_q, rand_q=[])
        # steps * (m*N) candidate scores + m final best-of-B scores
        assert len(calls) == STEPS * m * N + m
        per_step = np.asarray(calls[: STEPS * m * N]).reshape(STEPS, m * N)
        final_scores = np.asarray(calls[STEPS * m * N:])
        # reference keeps the global top-B, rank-ordered (pipeline:1131-1134)
        ref_sets = [
            {(int(f) // N, int(f) % N)  # (beam j, candidate n)
             for f in np.argsort(-per_step[i], kind="stable")[:m]}
            for i in range(STEPS)
        ]

        backend = _my_backend(rig)
        # ours is [steps, N, M, B, ...]: beam_noise[i, n, j] = ref draw (j, n)
        inj = InjectedNoise(beam_noise=np.stack([
            np.stack([np.stack([_nhwc(beam_draws[i, j, n]) for j in range(m)])
                      for n in range(N)]) for i in range(STEPS)]))
        res = run_search(
            "beam", backend, _nhwc(rig["lat0"]), jax.random.key(0),
            SearchParams(B=m, N=N), record_noises=True, noise=inj)

        picks = np.asarray(res.best_noises)  # [steps, B=1, M] flat n*M + m
        for i in range(STEPS):
            mine = {(int(f) % m, int(f) // m)  # -> (beam j, candidate n)
                    for f in picks[i, 0]}
            assert mine == ref_sets[i], (
                f"top-B set diverged at step {i}: ours {sorted(mine)} vs "
                f"reference {sorted(ref_sets[i])}")

        _assert_images_close(_my_uint8(res.images), ref_imgs)
        np.testing.assert_allclose(
            float(np.asarray(res.score)[0]), final_scores.max(), atol=2e-3)
        np.testing.assert_allclose(float(np.asarray(res.score)[0]), ms, atol=2e-3)

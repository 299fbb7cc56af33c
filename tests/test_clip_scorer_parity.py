"""CLIP scorer cross-implementation parity (VERDICT r3 #4).

The reference scores through ``CLIPProcessor`` (PIL shortest-edge bicubic
resize in uint8 + center crop + rescale + normalize,
/root/reference/sd/scorers.py:170-177); ours preprocesses on device with
``jax.image.resize`` bicubic (antialiased, float) + jnp normalization
(scorers/clip.py). For square 512x512 inputs the geometry coincides but
the interpolation pipelines differ (PIL resizes the raw uint8 values and
re-quantizes; jax resizes in float) — this file runs BOTH pipelines on
shared tiny CLIP weights (torch state_dict -> Flax via from_pt) over random
512x512 uint8 candidate batches and pins the measured delta:

  measured (20 batches x 4 candidates, half uint8 noise / half smooth
  upsampled fields, seed 0): max |dscore| = 0.0014, argmax flips = 0/20,
  mean per-batch candidate spread = 0.060 — the preprocessing delta is
  ~2% of a typical candidate spread, far below decision relevance.

Pinned bounds leave ~4x headroom on the score delta and demand zero
argmax flips on the fixed seed. The weight draw is part of the golden:
on unseeded tiny-CLIP draws the ~0.001 preprocessing delta occasionally
flips an argmax whose candidate pair is closer than that (observed 1/20
on one draw) — at 16-dim projections the candidate spread floor is
artificially tiny; the spread assertion below keeps the claim honest.
"""
from __future__ import annotations

import numpy as np
import pytest

NBATCH, NCAND = 20, 4
IMG = 512
VISION_SIZE = 64  # 8x downsample — a real resize, unlike 224-from-512's 2.3x


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    import torch
    from transformers import (
        CLIPConfig,
        CLIPImageProcessor,
        CLIPModel,
        FlaxCLIPModel,
    )

    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_attention_heads=4, num_hidden_layers=2,
                         max_position_embeddings=77, vocab_size=1000),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_attention_heads=4, num_hidden_layers=2,
                           image_size=VISION_SIZE, patch_size=16),
        projection_dim=16,
    )
    # CLIPModel(cfg) draws its init from torch's GLOBAL RNG: without this
    # seed the tiny weights depend on whatever torch code ran earlier in
    # the process (the full slow suite reproducibly produced a weight draw
    # with 1/20 argmax flips), and the pinned zero-flip golden below is
    # only a claim about the fixed draw.
    torch.manual_seed(0)
    tmodel = CLIPModel(cfg)
    tmodel.eval()
    d = tmp_path_factory.mktemp("clip")
    tmodel.save_pretrained(d)
    fmodel = FlaxCLIPModel.from_pretrained(str(d), from_pt=True)

    # the openai/clip-vit-large-patch14 processor settings at this tiny
    # vision size (resample=3 is PIL BICUBIC — sd/scorers.py:170)
    proc = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": VISION_SIZE}, resample=3,
        do_center_crop=True,
        crop_size={"height": VISION_SIZE, "width": VISION_SIZE},
        do_rescale=True, do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711],
    )
    return dict(torch=torch, tmodel=tmodel, fmodel=fmodel, proc=proc)


@pytest.mark.reference
@pytest.mark.slow
def test_clip_scorer_pipeline_parity(rig):
    import jax
    import jax.numpy as jnp

    from diffusion_tts_tpu.scorers.clip import CLIPScorer

    torch, tmodel, proc = rig["torch"], rig["tmodel"], rig["proc"]
    fmodel = rig["fmodel"]
    scorer = CLIPScorer(fmodel, fmodel.params, image_size=VISION_SIZE)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 999, (1, 12)).astype(np.int64)
    with torch.no_grad():
        te = tmodel.get_text_features(input_ids=torch.as_tensor(ids))
        te = te / te.norm(dim=-1, keepdim=True)

    def torch_scores(u8_batch):
        # the reference feeds CHW uint8 tensors (sd/scorers.py:170-177)
        imgs = [torch.as_tensor(np.moveaxis(x, -1, 0)) for x in u8_batch]
        inp = proc(images=imgs, return_tensors="pt")
        with torch.no_grad():
            ie = tmodel.get_image_features(**inp)
            ie = ie / ie.norm(dim=-1, keepdim=True)
        return (ie * te).sum(-1).numpy()

    max_d, flips, spreads = 0.0, 0, []
    for b in range(NBATCH):
        u8 = rng.integers(0, 256, (NCAND, IMG, IMG, 3)).astype(np.uint8)
        if b % 2:  # smooth fields — closer to real VAE decodes
            base = rng.integers(0, 256, (NCAND, 16, 16, 3)).astype(np.float32)
            u8 = np.clip(np.asarray(jax.image.resize(
                jnp.asarray(base), (NCAND, IMG, IMG, 3), "bicubic")),
                0, 255).astype(np.uint8)
        ts = torch_scores(u8)
        ms = np.asarray(scorer(
            jnp.asarray(u8, jnp.float32) / 255.0, cond=jnp.asarray(ids)))
        max_d = max(max_d, float(np.abs(ts - ms).max()))
        spreads.append(float(ts.max() - ts.min()))
        flips += int(ts.argmax() != ms.argmax())

    assert max_d < 0.006, (
        f"PIL-vs-jnp preprocessing moved CLIP scores by {max_d:.4f} "
        f"(pinned headroom 4x over the measured 0.0014)")
    assert flips == 0, f"{flips}/{NBATCH} candidate argmaxes flipped"
    # the delta must stay an order below typical candidate spreads
    assert max_d < 0.2 * np.mean(spreads), (max_d, np.mean(spreads))

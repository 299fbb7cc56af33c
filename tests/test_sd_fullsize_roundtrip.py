"""Full-geometry SD-1.5 safetensors -> flax round-trip (VERDICT r2 missing #2).

The tiny-scale goldens (test_sd_models_parity.py) prove the layer math; this
file proves the ACTUAL import path at the real SD-1.5 geometry: the vendored
torch diffusers UNet (860M params) / VAE with random weights are saved to a
real .safetensors file, read back by the dependency-free numpy parser
(models/sd_import.load_safetensors), converted, and forward-compared against
torch at the production shapes (64x64 latents, 77-token context, 512px VAE
decode). Pretrained weights stay unavailable in this environment (zero
egress) — geometry, naming, and numerics of the full pipeline path are what
this pins.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF_DIFFUSERS = "/root/reference/sd/diffusers/src"

SD15_UNET = dict(
    sample_size=64, in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                      "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D"),
    block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
    attention_head_dim=8, cross_attention_dim=768, norm_num_groups=32,
)
SD15_VAE = dict(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(128, 256, 512, 512), layers_per_block=2,
    norm_num_groups=32,
    down_block_types=("DownEncoderBlock2D",) * 4,
    up_block_types=("UpDecoderBlock2D",) * 4,
)


def _torch_and_diffusers():
    sys.path.insert(0, REF_DIFFUSERS)
    try:
        import torch
        from diffusers import AutoencoderKL, UNet2DConditionModel
    finally:
        sys.path.remove(REF_DIFFUSERS)
    return torch, UNet2DConditionModel, AutoencoderKL


def _randomize(torch, net, seed, scale=0.03):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def _check_congruent(shapes_init, converted):
    import jax

    ref = {jax.tree_util.keystr(p): v.shape for p, v in
           jax.tree_util.tree_leaves_with_path(shapes_init["params"])}
    conv = {jax.tree_util.keystr(p): np.shape(v) for p, v in
            jax.tree_util.tree_leaves_with_path(converted["params"])}
    assert set(ref) == set(conv), (
        f"missing {sorted(set(ref) - set(conv))[:4]} "
        f"extra {sorted(set(conv) - set(ref))[:4]}")
    bad = {k: (ref[k], conv[k]) for k in ref if tuple(ref[k]) != tuple(conv[k])}
    assert not bad, f"shape mismatches: {list(bad.items())[:4]}"


@pytest.mark.reference
@pytest.mark.slow
def test_sd15_unet_fullsize_safetensors_roundtrip(tmp_path):
    import jax

    from diffusion_tts_tpu.models.sd_import import (
        convert_diffusers_state_dict, load_safetensors,
    )
    from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel

    torch, TorchUNet, _ = _torch_and_diffusers()
    from safetensors.torch import save_file

    unet = TorchUNet(**SD15_UNET)
    unet.eval()
    _randomize(torch, unet, 1)
    n_params = sum(p.numel() for p in unet.parameters())
    assert n_params > 800_000_000, f"not the SD-1.5 geometry: {n_params}"

    st_path = str(tmp_path / "unet.safetensors")
    save_file(unet.state_dict(), st_path)

    g = torch.Generator().manual_seed(2)
    x = torch.randn(1, 4, 64, 64, generator=g)
    t = torch.tensor([981])
    ctx = torch.randn(1, 77, 768, generator=g)
    with torch.no_grad():
        y_ref = unet(x, t, encoder_hidden_states=ctx).sample.numpy()
    del unet

    state = load_safetensors(st_path)
    assert len(state) > 600, f"unexpected tensor count {len(state)}"
    converted = convert_diffusers_state_dict(state)

    model = UNet2DConditionModel(**{
        k: v for k, v in SD15_UNET.items() if k != "norm_num_groups"})
    xn = np.transpose(x.numpy(), (0, 2, 3, 1))
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, xn,
                           t.numpy().astype(np.int32), ctx.numpy()))
    _check_congruent(shapes, converted)

    y = model.apply(converted, xn, t.numpy().astype(np.int32), ctx.numpy())
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, y_ref, atol=2e-3, rtol=2e-3)


@pytest.mark.reference
@pytest.mark.slow
def test_sd15_vae_fullsize_safetensors_roundtrip(tmp_path):
    import jax

    from diffusion_tts_tpu.models.sd_import import (
        convert_diffusers_state_dict, load_safetensors,
    )
    from diffusion_tts_tpu.models.sd_vae import AutoencoderKL

    torch, _, TorchVAE = _torch_and_diffusers()
    from safetensors.torch import save_file

    vae = TorchVAE(**SD15_VAE)
    vae.eval()
    _randomize(torch, vae, 3)
    n_params = sum(p.numel() for p in vae.parameters())
    assert n_params > 80_000_000, f"not the SD-1.5 VAE geometry: {n_params}"

    st_path = str(tmp_path / "vae.safetensors")
    save_file(vae.state_dict(), st_path)

    g = torch.Generator().manual_seed(4)
    lat = torch.randn(1, 4, 64, 64, generator=g)
    with torch.no_grad():
        dec_ref = vae.decode(lat).sample.numpy()  # [1, 3, 512, 512]
    del vae

    state = load_safetensors(st_path)
    converted = convert_diffusers_state_dict(state)
    model = AutoencoderKL(block_out_channels=SD15_VAE["block_out_channels"],
                          layers_per_block=SD15_VAE["layers_per_block"])
    latn = np.transpose(lat.numpy(), (0, 2, 3, 1))
    dec = model.apply(converted, latn, method=AutoencoderKL.decode)
    dec = np.transpose(np.asarray(dec), (0, 3, 1, 2))
    assert dec.shape == (1, 3, 512, 512)
    np.testing.assert_allclose(dec, dec_ref, atol=2e-3, rtol=2e-3)

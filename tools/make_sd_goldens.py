"""Golden fixtures for the SD backend: run the VENDORED torch diffusers
UNet2DConditionModel / AutoencoderKL / DDIM pipeline math on CPU at tiny
configs (the vendored suite's own fast-test scale,
tests/pipelines/stable_diffusion/test_stable_diffusion.py:133-191) with
randomized weights, record inputs/outputs.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF_DIFFUSERS = "/root/reference/sd/diffusers/src"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

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


def main():
    sys.path.insert(0, REF_DIFFUSERS)
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel

    os.makedirs(OUT, exist_ok=True)

    def randomize(net, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in net.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.15)

    # UNet
    unet = UNet2DConditionModel(**UNET_CFG)
    unet.eval()
    randomize(unet, 1)
    g = torch.Generator().manual_seed(2)
    x = torch.randn(2, 4, 16, 16, generator=g)
    t = torch.tensor([981, 1])
    ctx = torch.randn(2, 7, 32, generator=g)
    with torch.no_grad():
        y = unet(x, t, encoder_hidden_states=ctx).sample
    data = {f"sd::{k}": v.numpy() for k, v in unet.state_dict().items()}
    data.update({"in::x": x.numpy(), "in::t": t.numpy().astype(np.int32),
                 "in::ctx": ctx.numpy(), "out::y": y.numpy()})
    np.savez_compressed(os.path.join(OUT, "sd_unet.npz"), **data)
    print("sd_unet:", y.shape, float(y.abs().mean()))

    # VAE
    vae = AutoencoderKL(**VAE_CFG)
    vae.eval()
    randomize(vae, 3)
    g = torch.Generator().manual_seed(4)
    img = torch.randn(2, 3, 32, 32, generator=g)
    lat = torch.randn(2, 4, 16, 16, generator=g)
    with torch.no_grad():
        post = vae.encode(img).latent_dist
        dec = vae.decode(lat).sample
    data = {f"sd::{k}": v.numpy() for k, v in vae.state_dict().items()}
    data.update({
        "in::img": img.numpy(), "in::lat": lat.numpy(),
        "out::mean": post.mean.numpy(), "out::logvar": post.logvar.numpy(),
        "out::dec": dec.numpy(),
    })
    np.savez_compressed(os.path.join(OUT, "sd_vae.npz"), **data)
    print("sd_vae:", dec.shape, float(dec.abs().mean()))

    # One full candidate-evaluation chain (pipeline_stable_diffusion.py:
    # 1384-1420): scheduler.step(base noise_pred, variance_noise=cand) ->
    # lookahead unet at same t -> scheduler.step -> vae.decode(pred_x0/sf).
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    sch = DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", clip_sample=False, set_alpha_to_one=False,
        steps_offset=1, prediction_type="epsilon",
    )
    sch.set_timesteps(10)
    g = torch.Generator().manual_seed(5)
    latents = torch.randn(1, 4, 16, 16, generator=g)
    ctx = torch.randn(1, 7, 32, generator=g)
    cand = torch.randn(1, 4, 16, 16, generator=g)
    t = sch.timesteps[2]
    with torch.no_grad():
        base_pred = unet(latents, t, encoder_hidden_states=ctx).sample
        lat_cand, _ = sch.step(base_pred, t, latents, eta=1.0,
                               variance_noise=cand, return_dict=False)
        pred2 = unet(lat_cand, t, encoder_hidden_states=ctx).sample
        _, pred_x0_2 = sch.step(pred2, t, lat_cand, eta=0.0, return_dict=False)
        image = vae.decode(pred_x0_2 / 0.18215).sample
        img_uint8 = (image * 127.5 + 128).clip(0, 255).to(torch.uint8)
    np.savez_compressed(
        os.path.join(OUT, "sd_lookahead.npz"),
        latents=latents.numpy(), ctx=ctx.numpy(), cand=cand.numpy(),
        step_index=np.int32(2), lat_cand=lat_cand.numpy(),
        image=img_uint8.numpy(),
    )
    print("sd_lookahead:", img_uint8.shape, float(image.abs().mean()))


if __name__ == "__main__":
    main()

"""Golden trajectories from the reference samplers, run on CPU with an
analytic denoiser and recorded noise injections.

Fake net: D(x, sigma) = x / (1 + sigma^2) — linear, so numeric differences
stay at fp32 roundoff. Noise draws are recorded so our sampler consumes the
identical sequence (the precomputed_noise mechanism, edm/main.py:54).
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


class FakeNet:
    sigma_min = 0.0
    sigma_max = float("inf")

    def __init__(self, torch):
        self.t = torch

    def round_sigma(self, sigma):
        return self.t.as_tensor(sigma)

    def __call__(self, x, sigma, class_labels=None):
        sigma = self.t.as_tensor(sigma, dtype=self.t.float64)
        return x / (1.0 + sigma**2)


def main():
    sys.path.insert(0, os.path.join(REF, "edm"))
    import torch
    from generate import edm_sampler, ablation_sampler

    os.makedirs(OUT, exist_ok=True)
    net = FakeNet(torch)

    g = torch.Generator().manual_seed(123)
    latents = torch.randn(2, 3, 8, 8, generator=g, dtype=torch.float64)

    recorded = []

    def randn_like(x):
        n = torch.randn(x.shape, generator=g, dtype=x.dtype)
        recorded.append(n.numpy().astype(np.float32))
        return n

    # EDM Heun with churn (the search engine's configuration).
    recorded.clear()
    out = edm_sampler(
        net, latents.clone(), num_steps=18, sigma_min=0.002, sigma_max=80.0,
        rho=7.0, S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003,
        randn_like=randn_like,
    )
    np.savez_compressed(
        os.path.join(OUT, "sampler_edm_heun.npz"),
        latents=latents.numpy().astype(np.float32),
        noise=np.stack(recorded),
        out=out.numpy().astype(np.float32),
    )
    print("edm_heun:", float(out.abs().mean()))

    # Ablation sampler configurations.
    cfgs = {
        "abl_euler_vp_vp_vp": dict(solver="euler", discretization="vp", schedule="vp", scaling="vp"),
        "abl_heun_ve_ve_none": dict(solver="heun", discretization="ve", schedule="ve", scaling="none"),
        "abl_heun_iddpm_lin_none": dict(solver="heun", discretization="iddpm", schedule="linear", scaling="none"),
        "abl_heun_edm_lin_none_churn": dict(
            solver="heun", discretization="edm", schedule="linear", scaling="none",
            S_churn=30.0, S_min=0.1, S_max=30.0, S_noise=1.007,
        ),
        "abl_euler_edm_lin_vp_alpha": dict(
            solver="heun", discretization="edm", schedule="linear", scaling="vp", alpha=0.7,
        ),
    }
    for name, kw in cfgs.items():
        recorded.clear()
        out = ablation_sampler(net, latents.clone(), num_steps=12, randn_like=randn_like, **kw)
        np.savez_compressed(
            os.path.join(OUT, f"sampler_{name}.npz"),
            latents=latents.numpy().astype(np.float32),
            noise=np.stack(recorded) if recorded else np.zeros((0,)),
            out=out.numpy().astype(np.float32),
        )
        print(name, float(out.abs().mean()))

    # Stochastic DDIM 20-step trajectory via the vendored fork's scheduler.
    sys.path.insert(0, os.path.join(REF, "sd", "diffusers", "src"))
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    sch = DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", clip_sample=False, set_alpha_to_one=False,
        steps_offset=1, prediction_type="epsilon",
    )
    sch.set_timesteps(20)
    g2 = torch.Generator().manual_seed(9)
    x = torch.randn(2, 4, 8, 8, generator=g2)
    x0 = x.clone()
    noises, preds = [], []
    for t in sch.timesteps:
        model_output = 0.3 * x + 0.05  # analytic eps model
        vn = torch.randn(x.shape, generator=g2)
        noises.append(vn.numpy())
        x, px0 = sch.step(model_output, t, x, eta=1.0, variance_noise=vn, return_dict=False)
        preds.append(px0.numpy())
    np.savez_compressed(
        os.path.join(OUT, "sampler_ddim.npz"),
        latents=x0.numpy(), noise=np.stack(noises), out=x.numpy(),
        pred_x0_last=preds[-1], timesteps=sch.timesteps.numpy(),
    )
    print("ddim:", float(x.abs().mean()))


if __name__ == "__main__":
    main()

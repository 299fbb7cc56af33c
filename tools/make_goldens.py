"""Generate golden parity fixtures by running the torch reference on CPU.

Instantiates tiny reference networks (random init, fixed seeds), runs a
forward pass, and dumps {state_dict, input, sigma/noise_labels, labels,
output} to tests/goldens/*.npz. Tests then load the fixture, convert the
weights with models/torch_import.py, and assert our flax forward matches.

Run (needs /root/reference mounted):
    python tools/make_goldens.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _to_npz_dict(net) -> dict:
    return {f"sd::{k}": v.detach().cpu().numpy() for k, v in net.state_dict().items()}


def make_edm_net_goldens():
    sys.path.insert(0, os.path.join(REF, "edm"))
    import torch
    from training import networks  # reference module

    torch.manual_seed(0)
    os.makedirs(OUT, exist_ok=True)

    cases = {}

    # SongUNet DDPM++ flavor (standard/standard, positional).
    cases["songunet_ddpmpp"] = networks.SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=10,
        model_channels=16, channel_mult=[1, 2], num_blocks=1,
        attn_resolutions=[8], dropout=0.0,
    )
    # SongUNet NCSN++ flavor (fourier, residual encoder, skip decoder).
    cases["songunet_ncsnpp"] = networks.SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=0,
        model_channels=16, channel_mult=[1, 2], num_blocks=1,
        attn_resolutions=[8], dropout=0.0, embedding_type="fourier",
        channel_mult_noise=2, encoder_type="residual", decoder_type="skip",
        resample_filter=[1, 3, 3, 1],
    )
    # SongUNet skip-encoder flavor (exercises aux_down/aux_skip).
    cases["songunet_skipenc"] = networks.SongUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=0,
        model_channels=16, channel_mult=[1, 2], num_blocks=1,
        attn_resolutions=[8], dropout=0.0, encoder_type="skip",
    )
    # DhariwalUNet (ADM) — model_channels=64 so attention has >=1 head.
    cases["dhariwal"] = networks.DhariwalUNet(
        img_resolution=16, in_channels=3, out_channels=3, label_dim=10,
        model_channels=64, channel_mult=[1], num_blocks=1,
        attn_resolutions=[16], dropout=0.0,
    )

    def randomize(net, seed):
        # Zero-init output layers would make the parity test vacuous; give
        # every parameter a real value so the whole body contributes.
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for p in net.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.2)

    for name, net in cases.items():
        net.eval()
        randomize(net, hash(name) % (2**31))
        g = torch.Generator().manual_seed(42)
        x = torch.randn(2, 3, 16, 16, generator=g)
        noise = torch.rand(2, generator=g) * 3.0
        labels = None
        if getattr(net, "map_label", None) is not None:
            labels = torch.eye(10)[torch.randint(0, 10, (2,), generator=g)]
        with torch.no_grad():
            y = net(x, noise, labels)
        data = _to_npz_dict(net)
        data["in::x"] = x.numpy()
        data["in::noise_labels"] = noise.numpy()
        if labels is not None:
            data["in::class_labels"] = labels.numpy()
        data["out::y"] = y.numpy()
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **data)
        print(f"{name}: out mean {y.abs().mean():.6f} -> {name}.npz")

    # Preconditioners over tiny inner models.
    import torch as _t

    song_kwargs = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
                       attn_resolutions=[8], dropout=0.0)
    adm_kwargs = dict(model_channels=64, channel_mult=[1], num_blocks=1,
                      attn_resolutions=[16], dropout=0.0)
    precond_cases = {
        "precond_vp": networks.VPPrecond(img_resolution=16, img_channels=3, label_dim=10,
                                         model_type="SongUNet", **song_kwargs),
        "precond_ve": networks.VEPrecond(img_resolution=16, img_channels=3, label_dim=10,
                                         model_type="SongUNet", **song_kwargs),
        "precond_iddpm": networks.iDDPMPrecond(img_resolution=16, img_channels=3, label_dim=10,
                                               model_type="DhariwalUNet", **adm_kwargs),
        "precond_edm": networks.EDMPrecond(img_resolution=16, img_channels=3, label_dim=10,
                                           model_type="DhariwalUNet", **adm_kwargs),
    }
    for name, net in precond_cases.items():
        net.eval()
        randomize(net, hash(name) % (2**31))
        g = _t.Generator().manual_seed(7)
        x = _t.randn(2, 3, 16, 16, generator=g)
        sigma = _t.tensor([0.5, 7.0])
        labels = _t.eye(10)[_t.randint(0, 10, (2,), generator=g)]
        with _t.no_grad():
            y = net(x, sigma, labels)
        data = _to_npz_dict(net)
        data["in::x"] = x.numpy()
        data["in::sigma"] = sigma.numpy()
        data["in::class_labels"] = labels.numpy()
        data["out::y"] = y.numpy()
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **data)
        print(f"{name}: out mean {y.abs().mean():.6f} -> {name}.npz")


if __name__ == "__main__":
    make_edm_net_goldens()

"""Golden fixture for the guided-diffusion classifier (EncoderUNetModel).

Runs the reference edm/unet.py EncoderUNetModel on CPU with randomized
weights at a tiny config exercising every component the 64x64 checkpoint
uses (scale-shift norm, resblock up/down, legacy attention, attention pool).
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def main():
    sys.path.insert(0, os.path.join(REF, "edm"))
    import torch
    from unet import EncoderUNetModel

    net = EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
        pool="attention", dropout=0.0,
    )
    net.eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
    x = torch.randn(2, 3, 16, 16, generator=g)
    t = torch.tensor([0.0, 17.0])
    with torch.no_grad():
        y = net(x, t)
    data = {f"sd::{k}": v.numpy() for k, v in net.state_dict().items()}
    data["in::x"] = x.numpy()
    data["in::t"] = t.numpy()
    data["out::y"] = y.numpy()
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "classifier.npz"), **data)
    print("classifier:", y.shape, float(y.abs().mean()))


if __name__ == "__main__":
    main()

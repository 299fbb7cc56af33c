"""Convert diffusers-format state dicts (UNet2DConditionModel,
AutoencoderKL, safetensors or torch) to the flax trees of models/sd_unet.py
and models/sd_vae.py.

Generic rename: dotted module paths with numeric indices become linen
``name_{i}`` components (``down_blocks.0.resnets.1.norm1.weight`` ->
down_blocks_0/resnets_1/norm1/scale); conv weights OIHW->HWIO, linear
weights transposed, norm gains renamed to 'scale'.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np


def _flax_path(mods: list[str]) -> list[str]:
    path: list[str] = []
    for p in mods:
        if p.isdigit() and path:
            path[-1] = f"{path[-1]}_{p}"
        else:
            path.append(p)
    return path


def convert_diffusers_state_dict(state: Mapping[str, np.ndarray]) -> dict:
    params: dict = {}
    for name, value in state.items():
        parts = name.split(".")
        leaf = parts[-1]
        mods = _flax_path(parts[:-1])
        value = np.asarray(value, np.float32)
        if leaf == "weight":
            if value.ndim == 4:
                leaf, value = "kernel", value.transpose(2, 3, 1, 0)
            elif value.ndim == 2:
                leaf, value = "kernel", value.transpose(1, 0)
            elif value.ndim == 1:
                leaf = "scale"  # GroupNorm / LayerNorm gain
            else:
                raise ValueError(f"unexpected weight rank {value.shape} at {name}")
        elif leaf != "bias":
            raise ValueError(f"unmapped leaf {name}")
        node = params
        for p in mods:
            node = node.setdefault(p, {})
        if leaf in node:
            raise ValueError(f"duplicate {name}")
        node[leaf] = value
    return {"params": params}


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Read a .safetensors file without torch (pure numpy parser)."""
    import json
    import struct

    dtype_map = {
        "F32": np.float32, "F16": np.float16, "BF16": None, "I64": np.int64,
        "I32": np.int32, "U8": np.uint8, "BOOL": np.bool_, "F64": np.float64,
    }
    out: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        base = 8 + hlen
        data = np.memmap(path, dtype=np.uint8, mode="r", offset=base)
        for key, meta in header.items():
            if key == "__metadata__":
                continue
            start, end = meta["data_offsets"]
            raw = np.asarray(data[start:end])
            if meta["dtype"] == "BF16":
                u16 = raw.view(np.uint16).astype(np.uint32) << 16
                arr = u16.view(np.float32)
            else:
                arr = raw.view(dtype_map[meta["dtype"]])
            out[key] = arr.reshape(meta["shape"]).astype(np.float32, copy=False)
    return out


__all__ = ["convert_diffusers_state_dict", "load_safetensors"]

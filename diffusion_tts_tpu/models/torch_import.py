"""Convert reference-style torch state dicts to flax variable trees.

The reference ships checkpoints as source-pickled torch modules
(edm/torch_utils/persistence.py); the TPU loading path is: unpickle once
with torch on host (or receive an exported ``{name: ndarray}`` dict), then
rename/transpose into our NHWC flax layout:

  torch Linear.weight [out, in]      -> kernel [in, out]
  torch Conv2d.weight [O, I, k, k]   -> kernel [k, k, I, O]
  torch GroupNorm.weight/bias        -> scale/bias
  enc.<name>.<sub>  /  dec.<name>.<sub> -> enc_<name>/<sub> (linen dict naming)
  FourierEmbedding.freqs buffer      -> 'buffers' collection
  resample_filter / u buffers        -> dropped (recomputed statically)

Works for SongUNet, DhariwalUNet, any of the four preconditioner wrappers
(prefix ``model.``), and the guided-diffusion classifier family that uses
the same primitive set.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np

_SKIP_LEAVES = {"resample_filter", "u"}


def _deinterleave_qkv(arr: np.ndarray, axis: int = -1) -> np.ndarray:
    """Reorder UNetBlock qkv projection output channels from the reference's
    interleaved ((head, d), 3) layout (networks.py:183 reshapes conv output
    as [N*heads, cph, 3, HW]) to contiguous (3, (head, d)).

    On TPU the interleaved layout forces lane-strided q/k/v slices (reading
    every 3rd lane — a gather); contiguous thirds slice on full lane tiles.
    The consumption side (models/layers.py UNetBlock) matches this order, so
    forwards are bit-identical to the reference layout."""
    c3 = arr.shape[axis]
    assert c3 % 3 == 0
    arr = np.moveaxis(arr, axis, -1)
    shape = arr.shape
    arr = arr.reshape(shape[:-1] + (c3 // 3, 3))
    arr = np.swapaxes(arr, -1, -2).reshape(shape)
    return np.moveaxis(arr, -1, axis)


def _is_norm_module(module_name: str) -> bool:
    return "norm" in module_name.split("_")[-1] or module_name in ("out_norm",)


def convert_state_dict(state: Mapping[str, np.ndarray]) -> dict:
    """Translate a torch ``state_dict`` (values as numpy arrays) into
    ``{"params": ..., "buffers": ...}`` for the flax counterparts."""
    params: dict = {}
    buffers: dict = {}

    for name, value in state.items():
        parts = name.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        if leaf in _SKIP_LEAVES:
            continue
        value = np.asarray(value, dtype=np.float32)

        # linen names dict-valued submodules attr_key: enc.8x8_conv -> enc_8x8_conv
        path: list[str] = []
        i = 0
        while i < len(mods):
            if mods[i] in ("enc", "dec") and i + 1 < len(mods):
                path.append(f"{mods[i]}_{mods[i+1]}")
                i += 2
            else:
                path.append(mods[i])
                i += 1

        if leaf == "freqs":  # FourierEmbedding buffer
            _set(buffers, path + ["freqs"], value)
            continue

        owner = path[-1] if path else ""
        if leaf == "weight":
            if value.ndim == 4:
                kernel = value.transpose(2, 3, 1, 0)
                if owner == "qkv":
                    kernel = _deinterleave_qkv(kernel, axis=-1)
                _set(params, path + ["kernel"], kernel)
            elif value.ndim == 2:
                _set(params, path + ["kernel"], value.transpose(1, 0))
            elif value.ndim == 1:  # GroupNorm gain
                _set(params, path + ["scale"], value)
            else:
                raise ValueError(f"unexpected weight rank for {name}: {value.shape}")
        elif leaf == "bias":
            if owner == "qkv" and value.ndim == 1 and value.shape[0] % 3 == 0:
                value = _deinterleave_qkv(value, axis=-1)
            _set(params, path + ["bias"], value)
        else:
            raise ValueError(f"unmapped leaf {name}")

    out = {"params": params}
    if buffers:
        out["buffers"] = buffers
    return out


def _set(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate parameter path {'/'.join(path)}")
    node[path[-1]] = value


def migrate_qkv_layout(tree: dict) -> dict:
    """Migrate a version-1 flax tree (reference-interleaved qkv channels) to
    the current contiguous-thirds layout (CKPT_FORMAT_VERSION 2,
    training/checkpoints.py): applies _deinterleave_qkv to every ``qkv``
    module's kernel output axis and bias. Idempotence is NOT guaranteed —
    run exactly once, on a tree known to be version 1."""
    def walk(node, under_qkv=False):
        if isinstance(node, Mapping):
            return {k: walk(v, under_qkv or k == "qkv") for k, v in node.items()}
        if under_qkv and hasattr(node, "shape") and node.shape and node.shape[-1] % 3 == 0:
            return _deinterleave_qkv(np.asarray(node), axis=-1)
        return node

    return walk(tree)


def state_dict_from_npz(path: str) -> dict[str, np.ndarray]:
    """Load a ``{torch_name: array}`` dict from an .npz file (the exchange
    format tools/make_goldens.py and the checkpoint exporter emit)."""
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


__all__ = ["convert_state_dict", "state_dict_from_npz", "migrate_qkv_layout"]

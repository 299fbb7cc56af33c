"""Checkpoint / resume with Orbax.

Counterpart of the reference's two-tier scheme (training_loop.py:177-193;
SURVEY.md §5): (1) EMA *snapshots* — in the reference, source-pickled
modules (torch_utils/persistence.py); here, Orbax param trees plus a
config.json that fully reconstructs the flax module (config-versioned
checkpoints replace source pickling); (2) full *state dumps* — TrainState
(params, EMA, optimizer, nimg) for exact resume.
"""
from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp

# On-disk parameter-layout version. Bump whenever the flax tree layout
# changes incompatibly. History:
#   1 (implicit, no marker) — round-1 layout: qkv projection channels in the
#     reference's interleaved ((head, d), 3) order.
#   2 — qkv channels de-interleaved to contiguous (3, head, d) thirds
#     (models/torch_import._deinterleave_qkv); UNetBlock consumes contiguous
#     q/k/v slices. A version-1 tree loads without shape errors but silently
#     permutes attention channels, so loads hard-fail on mismatch.
CKPT_FORMAT_VERSION = 2


def _mgr(path: str) -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def _check_format_version(found: int | None, path: str) -> None:
    if found == CKPT_FORMAT_VERSION:
        return
    raise ValueError(
        f"checkpoint {path} has parameter-layout version {found} "
        f"(expected {CKPT_FORMAT_VERSION}). A pre-qkv-deinterleave tree would "
        "load cleanly but silently channel-permute attention outputs. "
        "Re-export from the source weights, or migrate the loaded tree with "
        "diffusion_tts_tpu.models.torch_import.migrate_qkv_layout(params)."
    )


def save_snapshot(path: str, ema_params: Any, config: dict) -> None:
    """EMA snapshot + reconstruction config (network-snapshot-*.pkl
    counterpart, training_loop.py:177-189)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckpt = _mgr(path)
    ckpt.save(path, ema_params, force=True)
    ckpt.wait_until_finished()  # async save must not race interpreter exit
    with open(path + ".config.json", "w") as f:
        json.dump(dict(config, ckpt_format_version=CKPT_FORMAT_VERSION), f, indent=2)


def load_snapshot(path: str, like: Any = None) -> tuple[Any, dict]:
    path = os.path.abspath(path)
    ckpt = _mgr(path)
    params = ckpt.restore(path, target=like)
    with open(path + ".config.json") as f:
        config = json.load(f)
    _check_format_version(config.get("ckpt_format_version"), path)
    return params, config


def save_state(path: str, state: Any) -> None:
    """Full training state dump (training-state-*.pt counterpart,
    training_loop.py:191-193)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckpt = _mgr(path)
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()
    with open(path + ".format.json", "w") as f:
        json.dump({"ckpt_format_version": CKPT_FORMAT_VERSION}, f)


def load_state(path: str, like: Any) -> Any:
    path = os.path.abspath(path)
    version = None
    try:
        with open(path + ".format.json") as f:
            version = json.load(f).get("ckpt_format_version")
    except FileNotFoundError:
        pass
    _check_format_version(version, path)
    return _mgr(path).restore(path, target=like)


def parse_kimg_from_name(path: str) -> int:
    """Resume kimg from the filename (train.py:170-176:
    training-state-<kimg>.*)."""
    import re

    m = re.search(r"-(\d+)(?:\.[^.]*)?$", os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else 0


__all__ = [
    "save_snapshot", "load_snapshot", "save_state", "load_state",
    "parse_kimg_from_name", "CKPT_FORMAT_VERSION",
]

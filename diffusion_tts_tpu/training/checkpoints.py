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


def _mgr(path: str) -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_snapshot(path: str, ema_params: Any, config: dict) -> None:
    """EMA snapshot + reconstruction config (network-snapshot-*.pkl
    counterpart, training_loop.py:177-189)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckpt = _mgr(path)
    ckpt.save(path, ema_params, force=True)
    ckpt.wait_until_finished()  # async save must not race interpreter exit
    with open(path + ".config.json", "w") as f:
        json.dump(config, f, indent=2)


def load_snapshot(path: str, like: Any = None) -> tuple[Any, dict]:
    path = os.path.abspath(path)
    ckpt = _mgr(path)
    params = ckpt.restore(path, target=like)
    with open(path + ".config.json") as f:
        config = json.load(f)
    return params, config


def save_state(path: str, state: Any) -> None:
    """Full training state dump (training-state-*.pt counterpart,
    training_loop.py:191-193)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckpt = _mgr(path)
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def load_state(path: str, like: Any) -> Any:
    return _mgr(os.path.abspath(path)).restore(os.path.abspath(path), target=like)


def parse_kimg_from_name(path: str) -> int:
    """Resume kimg from the filename (train.py:170-176:
    training-state-<kimg>.*)."""
    import re

    m = re.search(r"-(\d+)(?:\.[^.]*)?$", os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else 0


__all__ = [
    "save_snapshot", "load_snapshot", "save_state", "load_state",
    "parse_kimg_from_name",
]

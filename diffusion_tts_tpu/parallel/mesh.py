"""Device-mesh parallelism: the TPU-native replacement for the reference's
NCCL layer (edm/torch_utils/distributed.py; SURVEY.md §2c).

The reference's collectives — DDP bucket all-reduce, barrier, broadcast,
all_reduce of training stats — all become shardings on a
``jax.sharding.Mesh``: annotate the batch axis with the ``data`` axis,
replicate parameters, and XLA inserts the psum over ICI. No explicit
barriers exist; program order and ``block_until_ready`` replace them
(SURVEY.md §5). Multi-host: ``jax.distributed.initialize()`` +
``jax.process_index()==0`` instead of rank-0 gating.

Mesh axes used across the framework:
  data       — batch / seed sharding (training DP, rejection restarts)
  candidate  — search-candidate sharding (the N axis of expansion)
  model      — reserved for tensor-parallel sharding of the UNet
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: dict[str, int] | None = None, *, devices: Sequence[Any] | None = None
) -> Mesh:
    """Mesh over the given axis sizes; defaults to all devices on 'data'."""
    devices = list(devices) if devices is not None else jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} needs {int(np.prod(shape))} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh: Mesh, *, data_axis: str = "data",
                     model_sharded_state: bool = False,
                     batch_lead_dims: int = 1):
    """jit a train step over the mesh: per-round microbatches sharded on the
    batch axis, key replicated. The gradient mean over the sharded batch IS
    the DDP all-reduce (training_loop.py:89,123-132) — inserted by XLA as a
    psum over ICI.

    model_sharded_state=False (pure DP): state pinned replicated.
    model_sharded_state=True (DP x TP): the state keeps whatever per-leaf
    shardings it arrived with (see sharding_rules.shard_state) and GSPMD
    propagates them — outputs inherit the input layout.

    batch_lead_dims: unsharded axes before the batch axis — 1 for a single
    step's [rounds, batch, ...], 2 for a multi-step dispatch's
    [steps, rounds, batch, ...] (make_train_multi_step)."""
    batch_sh = NamedSharding(
        mesh, P(*([None] * batch_lead_dims), data_axis))  # [..., batch, ...]
    key_sh = replicated(mesh)
    if model_sharded_state:
        return jax.jit(step_fn, in_shardings=(None, batch_sh, batch_sh, key_sh))
    state_sh = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, batch_sh, key_sh),
        out_shardings=(state_sh, state_sh),
    )


def shard_array(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_train_step", "shard_array"]

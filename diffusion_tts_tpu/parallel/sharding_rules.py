"""Parameter sharding rules: tensor-parallel layout for the UNet zoo.

The reference has no tensor parallelism (SURVEY.md §2c) — this is TPU-native
headroom: shard every large kernel's output-feature dimension over the
'model' mesh axis and let GSPMD insert the collectives (all-gather on use,
reduce-scatter on grads). Works uniformly for conv kernels (HWIO, shard O)
and dense kernels ([in, out], shard out); biases/norm gains follow their
producer's output sharding when large enough, otherwise replicate.

Because Adam moments and the EMA tree mirror parameter shapes, one
shape-keyed rule shards the whole TrainState consistently.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(leaf, axis: str, axis_size: int, min_size: int = 2) -> P:
    """PartitionSpec for one array: shard the last dim if divisible and
    meaningfully larger than the axis."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 1 and shape[-1] % axis_size == 0 and shape[-1] >= min_size * axis_size:
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def shard_state(state: Any, mesh: Mesh, axis: str = "model", min_size: int = 64) -> Any:
    """device_put every array leaf of a TrainState/param tree with the
    model-parallel layout (scalars and small vectors replicate)."""
    if axis not in mesh.shape:
        return jax.device_put(state, NamedSharding(mesh, P()))
    size = mesh.shape[axis]

    def put(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(leaf, axis, size, min_size))
        )

    return jax.tree_util.tree_map(put, state)


def describe_sharding(tree: Any, max_rows: int = 20) -> str:
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "sharding"):
            spec = getattr(leaf.sharding, "spec", None)
            if spec is not None and any(s is not None for s in spec):
                rows.append(f"{jax.tree_util.keystr(path)}: {leaf.shape} -> {spec}")
    out = "\n".join(rows[:max_rows])
    if len(rows) > max_rows:
        out += f"\n... {len(rows) - max_rows} more sharded leaves"
    return out or "(fully replicated)"


__all__ = ["param_spec", "shard_state", "describe_sharding"]

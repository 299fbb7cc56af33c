"""Worker for the 2-process x 4-virtual-device sharded train-step test
(test_multiprocess.py::test_two_process_sharded_train_step).

The first COMPILED cross-process collective in the suite: each process
hosts 4 virtual CPU devices (XLA_FLAGS set by the parent), the two
processes form one 8-device global mesh, and ONE data-parallel train step
runs with the global batch sharded across all 8 devices — the gradient
mean over the sharded batch is XLA's psum over the process boundary, the
compiled counterpart of the reference's DDP bucket all-reduce
(edm/training/training_loop.py:89). Each process then recomputes the same
step single-process on its 4 local devices and asserts the updated
parameters agree — check_ddp_consistency (misc.py:180-193) as an equality
theorem instead of a broadcast-and-compare.

Prints one RESULT: JSON line for the parent.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffusion_tts_tpu.models.preconds import EDMPrecond
    from diffusion_tts_tpu.parallel.distributed import distributed_init
    from diffusion_tts_tpu.parallel.mesh import make_mesh, shard_train_step
    from diffusion_tts_tpu.training.loss import EDMLoss
    from diffusion_tts_tpu.training.train_step import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )

    assert distributed_init(), "coordinator env set but init returned False"
    rank, world = jax.process_index(), jax.process_count()
    assert world == 2 and jax.local_device_count() == 4, (
        world, jax.local_device_count())
    assert len(jax.devices()) == 8

    net = EDMPrecond(
        img_resolution=8, img_channels=3, label_dim=4, model_type="SongUNet",
        model_kwargs=dict(model_channels=16, channel_mult=(1,), num_blocks=1,
                          attn_resolutions=(), dropout=0.0))

    rng = np.random.default_rng(0)
    imgs = (rng.standard_normal((1, 8, 8, 8, 3)) * 0.5).astype(np.float32)
    labels = np.tile(np.eye(4, dtype=np.float32)[np.arange(8) % 4],
                     (1, 1)).reshape(1, 8, 4)
    variables = jax.device_get(net.init(
        {"params": jax.random.key(1)},
        jnp.asarray(imgs[0]), jnp.ones((8,)), jnp.asarray(labels[0])))

    cfg = TrainConfig(grad_accum_rounds=1, total_batch=8)
    tx = make_optimizer(cfg)
    denoise_apply = lambda p, x, s, l, al, rng=None: net.apply(
        {"params": p}, x, s, l, augment_labels=al)
    step_fn = make_train_step(EDMLoss(), denoise_apply, cfg, tx)
    key = jax.random.key(2)

    # ---- global 8-device (2-process) step: batch sharded ACROSS processes
    mesh_g = make_mesh({"data": 8})

    def gmake(x, spec):
        sh = NamedSharding(mesh_g, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    imgs_g = gmake(imgs, P(None, "data"))
    labels_g = gmake(labels, P(None, "data"))
    state_g = jax.tree_util.tree_map(
        lambda x: gmake(np.asarray(x), P()),
        TrainState.create(variables["params"], tx))
    step_g = shard_train_step(step_fn, mesh_g)
    new_state_g, metrics_g = step_g(state_g, imgs_g, labels_g, key)
    loss_g = float(metrics_g["loss"])

    # ---- local single-process reference on this process's 4 devices
    mesh_l = make_mesh({"data": 4}, devices=jax.local_devices())
    state_l = TrainState.create(variables["params"], tx)
    step_l = shard_train_step(step_fn, mesh_l)
    new_state_l, metrics_l = step_l(state_l, jnp.asarray(imgs),
                                    jnp.asarray(labels), key)
    loss_l = float(metrics_l["loss"])

    # replicated outputs are fully addressable on every process
    pg = jax.device_get(new_state_g.params)
    pl = jax.device_get(new_state_l.params)
    diffs = [float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max())
             for a, b in zip(jax.tree_util.tree_leaves(pg),
                             jax.tree_util.tree_leaves(pl))]

    print("RESULT:" + json.dumps({
        "rank": rank,
        "world": world,
        "n_global_devices": len(jax.devices()),
        "loss_global": loss_g,
        "loss_local": loss_l,
        "max_param_diff": max(diffs),
        "n_param_leaves": len(diffs),
    }), flush=True)


if __name__ == "__main__":
    main()

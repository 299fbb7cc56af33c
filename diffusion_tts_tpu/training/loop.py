"""The training loop: data-parallel diffusion training with ticks,
snapshots, stats.jsonl, and resume.

Counterpart of the reference training loop (edm/training/training_loop.py:
25-216), re-architected for TPU: the whole optimization step — gradient
accumulation scan, Adam, EMA — is ONE pjit-compiled program over the
device mesh (make_train_step + shard_train_step); the host loop only feeds
batches, tracks ticks, and writes snapshots/stats. DDP wrapping, no_sync
grad accumulation, barriers, and check_ddp_consistency have no equivalents
— replication is a sharding, the all-reduce is compiled in, and parameter
consistency is structural.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.parallel.mesh import make_mesh, shard_train_step
from diffusion_tts_tpu.training import checkpoints
from diffusion_tts_tpu.training.train_step import (
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_multi_step,
    make_train_step,
)
from diffusion_tts_tpu.utils.logging_utils import format_time, print0
from diffusion_tts_tpu.utils.stats import Collector, JsonlLogger


# Max pending-loss device scalars held between ticks: the backlog is
# drained into the Collector once it reaches this many dispatches, so a
# kimg-scale tick cannot pin thousands of live device buffers. By drain
# time the oldest entry is this many dispatches behind the enqueue
# frontier, so the host fetch never stalls the pipeline.
MAX_PENDING_LOSSES = 64


@dataclasses.dataclass
class LoopConfig:
    run_dir: str = "runs/exp"
    total_kimg: int = 200000  # training_loop.py defaults
    kimg_per_tick: int = 50
    snapshot_ticks: int = 50
    state_dump_ticks: int = 500
    seed: int = 0
    batch_size: int = 512  # global
    batch_gpu: int | None = None  # microbatch per step per device group
    # Optimizer steps per compiled dispatch (lax.scan over the train step,
    # make_train_multi_step). >1 pays the per-program dispatch overhead
    # once per S steps — the training counterpart of the search engine's
    # chunked dispatch. Training math is bit-identical for any value
    # (pinned by tests/test_training.py): the host key-split schedule and
    # batch order are unchanged, only the program boundary moves.
    steps_per_dispatch: int = 1


def training_loop(
    *,
    net: Any,  # flax precond module
    net_config: dict,
    data_iter: Iterator[tuple[np.ndarray, np.ndarray]],  # global batches
    loss_fn: Callable,
    train_cfg: TrainConfig,
    loop_cfg: LoopConfig,
    augment_fn: Callable | None = None,
    mesh=None,
    resume_state_path: str | None = None,
    transfer_snapshot_path: str | None = None,
    max_ticks: int | None = None,
) -> TrainState:
    mesh = mesh or make_mesh()
    os.makedirs(loop_cfg.run_dir, exist_ok=True)
    key = jax.random.key(loop_cfg.seed)

    # Initialize network + state.
    images0, labels0 = next(data_iter)
    rounds = train_cfg.grad_accum_rounds
    micro = images0.shape[0] // rounds
    init_imgs = jnp.asarray(images0[:micro])
    init_labels = jnp.asarray(labels0[:micro])
    init_aug = None
    if augment_fn is not None and getattr(augment_fn, "label_dim", 0):
        init_aug = jnp.zeros((micro, augment_fn.label_dim), jnp.float32)
    variables = net.init(
        {"params": jax.random.key(0)}, init_imgs, jnp.ones((micro,)), init_labels,
        init_aug,
    )

    def denoise_apply(params, x, sigma, labels, augment_labels, rng=None):
        rngs = None
        if rng is not None:
            rngs = {"dropout": rng, "label_dropout": jax.random.fold_in(rng, 1)}
        return net.apply({"params": params}, x, sigma, labels,
                         augment_labels=augment_labels, train=True, rngs=rngs)

    from diffusion_tts_tpu.utils.misc import print_module_summary

    if jax.process_index() == 0:
        print_module_summary(variables["params"], max_rows=0)
    tx = make_optimizer(train_cfg)
    init_params = variables["params"]
    if transfer_snapshot_path:
        # transfer learning: initialize from a donor EMA snapshot, keeping
        # randomly-initialized values for any missing leaves
        # (train.py:165-169, misc.py:155-166)
        from diffusion_tts_tpu.utils.misc import copy_params_and_buffers

        donor, _ = checkpoints.load_snapshot(
            transfer_snapshot_path, like=jax.device_get(init_params)
        )
        init_params = copy_params_and_buffers(donor, init_params, require_all=False)
        print0(f"transferred weights from {transfer_snapshot_path}")
    state = TrainState.create(init_params, tx)
    if resume_state_path:
        state = checkpoints.load_state(resume_state_path, like=state)
        print0(f"resumed from {resume_state_path} at nimg={int(state.nimg)}")

    steps_per_dispatch = max(1, loop_cfg.steps_per_dispatch)
    if steps_per_dispatch == 1:
        step_fn = shard_train_step(
            make_train_step(loss_fn, denoise_apply, train_cfg, tx, augment_fn),
            mesh,
        )
    else:
        step_fn = shard_train_step(
            make_train_multi_step(loss_fn, denoise_apply, train_cfg, tx, augment_fn),
            mesh, batch_lead_dims=2,
        )

    collector = Collector()
    jsonl = JsonlLogger(os.path.join(loop_cfg.run_dir, "stats.jsonl"))
    tick = 0
    # nimg is tracked on the HOST (state.nimg advances by total_batch per
    # step inside the program, deterministically) so the loop never fetches
    # device values between dispatches — fetching would serialize the
    # enqueue-ahead pipeline on a per-step/dispatch round trip.
    nimg = int(state.nimg)
    tick_start_nimg = nimg
    tick_start_time = start_time = time.time()
    # device arrays; drained at tick boundaries and at MAX_PENDING_LOSSES
    pending_losses: list = []

    def reshape_batch(images, labels):
        img = np.asarray(images, np.float32).reshape((rounds, micro) + images.shape[1:])
        lab = np.asarray(labels, np.float32).reshape((rounds, micro) + labels.shape[1:])
        return img, lab

    batches = [(images0, labels0)]
    while len(batches) < steps_per_dispatch:
        batches.append(next(data_iter))
    while True:
        pairs = [reshape_batch(*b) for b in batches]
        subs = []
        for _ in range(steps_per_dispatch):
            key, sub = jax.random.split(key)
            subs.append(sub)
        if steps_per_dispatch == 1:
            state, metrics = step_fn(
                state, jnp.asarray(pairs[0][0]), jnp.asarray(pairs[0][1]), subs[0])
        else:
            img = jnp.asarray(np.stack([p[0] for p in pairs]))
            lab = jnp.asarray(np.stack([p[1] for p in pairs]))
            state, metrics = step_fn(state, img, lab, jnp.stack(subs))
        pending_losses.append(metrics["loss"])
        if len(pending_losses) >= MAX_PENDING_LOSSES:
            for v in pending_losses:
                collector.report("Loss/loss", v)
            pending_losses.clear()
        nimg += train_cfg.total_batch * steps_per_dispatch

        done = nimg >= loop_cfg.total_kimg * 1000
        tick_done = nimg >= tick_start_nimg + loop_cfg.kimg_per_tick * 1000
        if tick_done or done:
            now = time.time()
            for v in pending_losses:
                collector.report("Loss/loss", v)
            pending_losses.clear()
            collector.report0("Timing/sec_per_kimg",
                              (now - tick_start_time) / max((nimg - tick_start_nimg) / 1000, 1e-8))
            # cross-process moment reduction per tick (the reference's
            # Collector.update() all_reduce, training_stats.py:233-266;
            # called at training_loop.py:196). Single-process: no-op.
            collector.sync()
            print0(
                f"tick {tick:<5d} kimg {nimg / 1000:<9.1f} "
                f"loss {collector.mean('Loss/loss'):<8.4f} "
                f"time {format_time(now - start_time)}"
            )
            jsonl.write(collector, tick=tick, kimg=nimg / 1000)
            collector.reset()
            tick += 1
            tick_start_nimg = nimg
            tick_start_time = now

            if loop_cfg.snapshot_ticks and tick % loop_cfg.snapshot_ticks == 0:
                checkpoints.save_snapshot(
                    os.path.join(loop_cfg.run_dir, f"network-snapshot-{nimg // 1000:06d}"),
                    jax.device_get(state.ema_params), net_config,
                )
            if loop_cfg.state_dump_ticks and tick % loop_cfg.state_dump_ticks == 0:
                checkpoints.save_state(
                    os.path.join(loop_cfg.run_dir, f"training-state-{nimg // 1000:06d}"),
                    jax.device_get(state),
                )
            if max_ticks is not None and tick >= max_ticks:
                break
        if done:
            break
        batches = [next(data_iter) for _ in range(steps_per_dispatch)]

    jsonl.close()
    # final snapshot
    checkpoints.save_snapshot(
        os.path.join(loop_cfg.run_dir, "network-snapshot-final"),
        jax.device_get(state.ema_params), net_config,
    )
    return state


__all__ = ["training_loop", "LoopConfig"]

"""Training stack tests: losses, train step (accumulation/EMA/ramp),
augment pipe labels, dataset sampling, full loop on an 8-device mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.models.preconds import EDMPrecond
from diffusion_tts_tpu.parallel.mesh import make_mesh, shard_train_step
from diffusion_tts_tpu.training.augment import AugmentPipe, edm_augment_pipe
from diffusion_tts_tpu.training.dataset import ImageDataset, InfiniteSampler, batch_iterator
from diffusion_tts_tpu.training.loss import EDMLoss, VELoss, VPLoss
from diffusion_tts_tpu.training.train_step import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)

KW = dict(model_channels=16, channel_mult=(1,), num_blocks=1,
          attn_resolutions=(), dropout=0.0)


def make_net(augment_dim=0):
    kw = dict(KW)
    if augment_dim:
        kw["augment_dim"] = augment_dim
    return EDMPrecond(img_resolution=8, img_channels=3, label_dim=4,
                      model_type="SongUNet", model_kwargs=kw)


def test_losses_shapes_and_weighting():
    net = make_net()
    imgs = jax.random.normal(jax.random.key(0), (4, 8, 8, 3)) * 0.5
    labels = jnp.eye(4)[jnp.array([0, 1, 2, 3])]
    variables = net.init({"params": jax.random.key(1)}, imgs, jnp.ones((4,)), labels)
    denoise = lambda x, s, l, al: net.apply(variables, x, s, l, augment_labels=al)
    loss = EDMLoss()(denoise, imgs, labels, jax.random.key(2))
    assert loss.shape == imgs.shape
    assert np.isfinite(np.asarray(loss)).all()


@pytest.mark.slow  # each loss traces the net eagerly (~5 s apiece on CPU);
# EDMLoss stays in the fast test above
def test_vp_ve_losses_shapes_and_weighting():
    net = make_net()
    imgs = jax.random.normal(jax.random.key(0), (4, 8, 8, 3)) * 0.5
    labels = jnp.eye(4)[jnp.array([0, 1, 2, 3])]
    variables = net.init({"params": jax.random.key(1)}, imgs, jnp.ones((4,)), labels)
    denoise = lambda x, s, l, al: net.apply(variables, x, s, l, augment_labels=al)
    for loss_fn in (VPLoss(), VELoss()):
        loss = loss_fn(denoise, imgs, labels, jax.random.key(2))
        assert loss.shape == imgs.shape
        assert np.isfinite(np.asarray(loss)).all()


def test_train_step_reduces_loss_and_updates_ema():
    net = make_net()
    imgs = jax.random.normal(jax.random.key(0), (2, 4, 8, 8, 3)) * 0.5  # [R, micro,...]
    labels = jnp.tile(jnp.eye(4)[jnp.array([0, 1, 2, 3])], (2, 1, 1))
    variables = net.init(
        {"params": jax.random.key(1)}, imgs[0], jnp.ones((4,)), labels[0]
    )
    cfg = TrainConfig(lr=1e-3, grad_accum_rounds=2, total_batch=8,
                      lr_rampup_kimg=0.0, ema_halflife_kimg=0.01)
    tx = make_optimizer(cfg)
    state = TrainState.create(variables["params"], tx)
    denoise_apply = lambda p, x, s, l, al, rng=None: net.apply({"params": p}, x, s, l, augment_labels=al)
    step = jax.jit(make_train_step(EDMLoss(), denoise_apply, cfg, tx))

    # fixed key: identical noise/sigma draws per step, so the loss on this
    # one batch must decrease monotonically under Adam
    losses = []
    for i in range(8):
        state, metrics = step(state, imgs, labels, jax.random.key(7))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"loss did not go down: {losses}"
    assert int(state.nimg) == 8 * 8
    # EMA must move but differ from params
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema_params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_multi_step_dispatch_matches_sequential():
    """make_train_multi_step (S steps in one lax.scan program — the
    training counterpart of chunked dispatch) is bit-identical to S
    sequential single-step dispatches given the same pre-split keys.
    (The slow suite re-proves the same guarantee end-to-end through
    training_loop via test_training_loop_steps_per_dispatch_identical.)"""
    from diffusion_tts_tpu.training.train_step import make_train_multi_step

    net = make_net()
    S = 3
    imgs = jax.random.normal(jax.random.key(0), (S, 2, 4, 8, 8, 3)) * 0.5
    labels = jax.random.permutation(
        jax.random.key(3), jnp.tile(jnp.eye(4), (S, 2, 1, 1)).reshape(-1, 4)
    ).reshape(S, 2, 4, 4)
    variables = net.init(
        {"params": jax.random.key(1)}, imgs[0, 0], jnp.ones((4,)), labels[0, 0]
    )
    cfg = TrainConfig(lr=1e-3, grad_accum_rounds=2, total_batch=8,
                      lr_rampup_kimg=0.0, ema_halflife_kimg=0.01)
    tx = make_optimizer(cfg)
    denoise_apply = lambda p, x, s, l, al, rng=None: net.apply(
        {"params": p}, x, s, l, augment_labels=al)
    keys = jax.random.split(jax.random.key(7), S)

    step = jax.jit(make_train_step(EDMLoss(), denoise_apply, cfg, tx))
    state_seq = TrainState.create(variables["params"], tx)
    seq_losses = []
    for i in range(S):
        state_seq, m = step(state_seq, imgs[i], labels[i], keys[i])
        seq_losses.append(float(m["loss"]))

    multi = jax.jit(make_train_multi_step(EDMLoss(), denoise_apply, cfg, tx))
    state_multi = TrainState.create(variables["params"], tx)
    state_multi, ms = multi(state_multi, imgs, labels, keys)

    np.testing.assert_array_equal(np.asarray(ms["loss"]), np.asarray(seq_losses))
    assert int(state_multi.nimg) == int(state_seq.nimg) == S * 8
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_multi.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_seq.params))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_multi.ema_params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_seq.ema_params))):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_training_loop_steps_per_dispatch_identical(tmp_path):
    """The loop's steps_per_dispatch only moves the program boundary: the
    key-split schedule and batch order are unchanged, so training is
    bit-identical for any value. (Slow: compiles training_loop twice on a
    2-device mesh, ~30 s; the default suite keeps the same guarantee at
    the train_step layer via test_multi_step_dispatch_matches_sequential.)"""
    from diffusion_tts_tpu.training.dataset import batch_iterator
    from diffusion_tts_tpu.training.loop import LoopConfig, training_loop

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (16, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (16,))
    net = make_net()

    def run(spd):
        ds = ImageDataset(images=images, labels=labels)
        # 1000 images at batch 100 = exactly 10 steps for BOTH dispatch
        # widths (10 % 2 == 0), so the two runs see identical step counts.
        return training_loop(
            net=net, net_config={"img_resolution": 8},
            data_iter=batch_iterator(ds, 100),
            loss_fn=EDMLoss(),
            train_cfg=TrainConfig(lr=1e-3, grad_accum_rounds=2, total_batch=100),
            loop_cfg=LoopConfig(run_dir=str(tmp_path / f"spd{spd}"),
                                total_kimg=1, kimg_per_tick=1,
                                snapshot_ticks=0, state_dump_ticks=0,
                                steps_per_dispatch=spd),
            mesh=make_mesh({"data": 2}, devices=jax.devices()[:2]),
        )

    s1, s2 = run(1), run(2)
    assert int(s1.nimg) == int(s2.nimg) > 0
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_accum_modes_agree():
    """The three accumulation forms — flat-carry scan (default: 4-operand
    while-loop carry, the remote-runtime-safe one), pytree-carry scan, and
    unroll — are the same math and must produce the same step."""
    net = make_net()
    imgs = jax.random.normal(jax.random.key(0), (3, 4, 8, 8, 3)) * 0.5
    labels = jnp.tile(jnp.eye(4), (3, 1, 1))
    variables = net.init(
        {"params": jax.random.key(1)}, imgs[0], jnp.ones((4,)), labels[0]
    )
    denoise_apply = lambda p, x, s, l, al, rng=None: net.apply(
        {"params": p}, x, s, l, augment_labels=al)

    results = {}
    for name, kw in (
        ("flat", dict(accum_flat_carry=True)),
        ("tree", dict(accum_flat_carry=False)),
        ("unroll", dict(accum_flat_carry=False, accum_unroll=True)),
    ):
        cfg = TrainConfig(lr=1e-3, grad_accum_rounds=3, total_batch=12, **kw)
        tx = make_optimizer(cfg)
        state = TrainState.create(variables["params"], tx)
        step = jax.jit(make_train_step(EDMLoss(), denoise_apply, cfg, tx))
        state, metrics = step(state, imgs, labels, jax.random.key(7))
        results[name] = (jax.device_get(state.params), float(metrics["loss"]))

    for name in ("tree", "unroll"):
        assert np.isclose(results[name][1], results["flat"][1], rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(results[name][0]),
                        jax.tree_util.tree_leaves(results["flat"][0])):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # ~24 s (two full train-step compiles); the sharded
# train path is also certified every round by the driver's dryrun_multichip
def test_sharded_train_step_8_devices():
    mesh = make_mesh({"data": 8})
    net = make_net()
    imgs = jax.random.normal(jax.random.key(0), (1, 8, 8, 8, 3)) * 0.5
    labels = jnp.tile(jnp.eye(4)[jnp.arange(4) % 4], (2, 1)).reshape(1, 8, 4)
    variables = net.init({"params": jax.random.key(1)}, imgs[0], jnp.ones((8,)), labels[0])
    cfg = TrainConfig(grad_accum_rounds=1, total_batch=8)
    tx = make_optimizer(cfg)
    state = TrainState.create(variables["params"], tx)
    denoise_apply = lambda p, x, s, l, al, rng=None: net.apply({"params": p}, x, s, l, augment_labels=al)
    step = shard_train_step(make_train_step(EDMLoss(), denoise_apply, cfg, tx), mesh)
    state2, metrics = step(state, imgs, labels, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    # sharded result matches unsharded within fp tolerance
    step_ref = jax.jit(make_train_step(EDMLoss(), denoise_apply, cfg, tx))
    state3, metrics_ref = step_ref(state, imgs, labels, jax.random.key(2))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-5
    )


@pytest.mark.slow
def test_augment_pipe_edm_config():
    pipe = edm_augment_pipe(p=0.5)
    assert pipe.label_dim == 9
    imgs = jax.random.uniform(jax.random.key(0), (8, 16, 16, 3)) * 2 - 1
    out, labels = pipe(imgs, jax.random.key(1))
    assert out.shape == imgs.shape and labels.shape == (8, 9)
    assert np.isfinite(np.asarray(out)).all()
    # p=0: all labels zero, images unchanged
    pipe0 = edm_augment_pipe(p=0.0)
    out0, labels0 = pipe0(imgs, jax.random.key(1))
    # xflip has multiplier 1e8 so it fires regardless of p -> exclude col 0
    assert np.abs(np.asarray(labels0[:, 1:])).max() == 0
    # full color config exercises the remaining ops
    pipe_full = AugmentPipe(p=1.0, brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
    out_c, labels_c = pipe_full(imgs, jax.random.key(2))
    assert labels_c.shape == (8, 6) and np.isfinite(np.asarray(out_c)).all()


@pytest.mark.slow  # ~15 s of augment-pipe tracing; augment math itself is
# covered by the fast test_augment_parity.py goldens
def test_augment_trains_with_labels():
    """augment labels flow into the loss via the precond's augment path."""
    pipe = edm_augment_pipe(p=0.5)
    net = make_net(augment_dim=9)
    imgs = jax.random.normal(jax.random.key(0), (4, 8, 8, 3)) * 0.5
    labels = jnp.eye(4)[jnp.arange(4)]
    variables = net.init(
        {"params": jax.random.key(1)}, imgs, jnp.ones((4,)), labels,
        jnp.zeros((4, 9)),
    )
    denoise = lambda x, s, l, al: net.apply(variables, x, s, l, augment_labels=al)
    loss = EDMLoss()(denoise, imgs, labels, jax.random.key(2), augment_fn=pipe)
    assert np.isfinite(np.asarray(loss)).all()


def test_dataset_and_sampler():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (10, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (10,))
    ds = ImageDataset(images=images, labels=labels, xflip=True, max_size=8)
    assert len(ds) == 16  # 8 after max_size, doubled by xflip
    assert ds.label_dim == 4
    img0, lab0 = ds[0]
    img_flip, _ = ds[8]
    np.testing.assert_array_equal(img_flip, ds[0][0][:, ::-1, :])
    assert lab0.shape == (4,) and lab0.sum() == 1.0

    # shards partition the stream
    it0 = iter(InfiniteSampler(10, shard=0, num_shards=2, seed=1))
    it1 = iter(InfiniteSampler(10, shard=1, num_shards=2, seed=1))
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= i < 10 for i in a + b)

    batch = next(batch_iterator(ds, 4))
    assert batch[0].shape == (4, 8, 8, 3) and batch[0].min() >= -1 and batch[0].max() <= 1


@pytest.mark.slow  # ~22 s warm end-to-end loop; train-step/EMA/sharding
# behavior stays covered by the fast tests above
def test_training_loop_smoke(tmp_path, monkeypatch):
    from diffusion_tts_tpu.training import loop as loop_mod
    from diffusion_tts_tpu.training.loop import LoopConfig, training_loop
    from diffusion_tts_tpu.training.dataset import batch_iterator

    # Exercise the pending-loss backlog drain (loop.py MAX_PENDING_LOSSES):
    # with the cap at 2, the ~63 dispatches of this 1-kimg run drain ~31
    # times between ticks instead of holding 63 live device scalars; the
    # tick's Loss/loss count must still see every step exactly once.
    monkeypatch.setattr(loop_mod, "MAX_PENDING_LOSSES", 2)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (16, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (16,))
    ds = ImageDataset(images=images, labels=labels)
    net = make_net()
    state = training_loop(
        net=net, net_config={"img_resolution": 8},
        data_iter=batch_iterator(ds, 16),
        loss_fn=EDMLoss(),
        train_cfg=TrainConfig(lr=1e-3, grad_accum_rounds=2, total_batch=16),
        loop_cfg=LoopConfig(run_dir=str(tmp_path), total_kimg=1, kimg_per_tick=1,
                            snapshot_ticks=1, state_dump_ticks=0),
        mesh=make_mesh({"data": 8}),
        max_ticks=1,
    )
    assert int(state.nimg) > 0
    assert os.path.exists(os.path.join(str(tmp_path), "stats.jsonl"))
    assert os.path.exists(os.path.join(str(tmp_path), "network-snapshot-final.config.json"))
    import json

    with open(os.path.join(str(tmp_path), "stats.jsonl")) as f:
        rec = json.loads(f.readline())
    # every optimizer step reported exactly once despite the capped backlog
    assert rec["Loss/loss"]["num"] == int(state.nimg) // 16


@pytest.mark.slow
def test_training_loop_transfer_and_resume(tmp_path):
    """transfer: EMA-snapshot init (train.py:165-169); resume: exact state
    restore (training_loop.py:92-109)."""
    from diffusion_tts_tpu.training import checkpoints
    from diffusion_tts_tpu.training.loop import LoopConfig, training_loop
    from diffusion_tts_tpu.training.dataset import batch_iterator

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (16, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (16,))
    ds = ImageDataset(images=images, labels=labels)
    net = make_net()
    run1 = str(tmp_path / "r1")
    state1 = training_loop(
        net=net, net_config={"img_resolution": 8},
        data_iter=batch_iterator(ds, 16), loss_fn=EDMLoss(),
        train_cfg=TrainConfig(lr=1e-3, grad_accum_rounds=2, total_batch=16),
        loop_cfg=LoopConfig(run_dir=run1, total_kimg=1, kimg_per_tick=1,
                            snapshot_ticks=1, state_dump_ticks=1),
        mesh=make_mesh({"data": 8}), max_ticks=1,
    )
    snap = os.path.join(run1, "network-snapshot-final")
    state_dump = [f for f in os.listdir(run1) if f.startswith("training-state-")
                  and not f.endswith(".json")]
    assert state_dump

    # transfer: new run starts from the snapshot's EMA weights
    run2 = str(tmp_path / "r2")
    state2 = training_loop(
        net=net, net_config={"img_resolution": 8},
        data_iter=batch_iterator(ds, 16), loss_fn=EDMLoss(),
        train_cfg=TrainConfig(lr=0.0, grad_accum_rounds=2, total_batch=16,
                              lr_rampup_kimg=0.0),
        loop_cfg=LoopConfig(run_dir=run2, total_kimg=1, kimg_per_tick=1,
                            snapshot_ticks=0, state_dump_ticks=0),
        mesh=make_mesh({"data": 8}),
        transfer_snapshot_path=snap, max_ticks=1,
    )
    # lr=0 -> params stay at the transferred EMA values
    a = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    b = jax.tree_util.tree_leaves(jax.device_get(state1.ema_params))
    for pa, pb in zip(a, b):
        np.testing.assert_allclose(pa, pb, atol=1e-7)

    # resume: nimg restored from the dump
    run3 = str(tmp_path / "r3")
    state3 = training_loop(
        net=net, net_config={"img_resolution": 8},
        data_iter=batch_iterator(ds, 16), loss_fn=EDMLoss(),
        train_cfg=TrainConfig(lr=1e-3, grad_accum_rounds=2, total_batch=16),
        loop_cfg=LoopConfig(run_dir=run3, total_kimg=1, kimg_per_tick=1,
                            snapshot_ticks=0, state_dump_ticks=0),
        mesh=make_mesh({"data": 8}),
        resume_state_path=os.path.join(run1, state_dump[0]), max_ticks=1,
    )
    assert int(state3.nimg) > int(state1.nimg)


def test_stats_collector_sync_and_report0():
    """Cross-process stats reduction (reference training_stats.py:233-266).
    Single-process: sync() must be an exact no-op on the moments; report0
    must register names on every rank (rank 0 is the only contributor)."""
    from diffusion_tts_tpu.utils.stats import Collector

    c = Collector()
    c.report("Loss/loss", [1.0, 2.0, 3.0])
    c.report0("Timing/sec_per_kimg", 7.0)
    before = {k: v.copy() for k, v in c._moments.items()}
    c.sync()  # jax.process_count() == 1 -> no-op
    assert set(c._moments) == set(before)
    for k in before:
        np.testing.assert_array_equal(c._moments[k], before[k])
    assert c.mean("Loss/loss") == 2.0
    assert c.mean("Timing/sec_per_kimg") == 7.0


def test_distributed_init_noop_without_env(monkeypatch):
    """distributed_init is a guarded no-op on single-host launches: no
    coordinator env vars -> returns False without touching jax.distributed."""
    import diffusion_tts_tpu.parallel.distributed as dist

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("DTTS_MULTIHOST", raising=False)
    monkeypatch.setattr(dist, "_initialized", False)
    assert dist.distributed_init() is False
    assert dist.is_main_process()

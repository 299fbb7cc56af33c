"""Parallelism tests: TP sharding rules, DPxTP train step, candidate-sharded
search on the 8-device virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_tts_tpu.models.preconds import EDMPrecond
from diffusion_tts_tpu.parallel.mesh import make_mesh, shard_train_step
from diffusion_tts_tpu.parallel.sharding_rules import param_spec, shard_state
from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
from diffusion_tts_tpu.scorers import BrightnessScorer
from diffusion_tts_tpu.search import EDMSearchBackend, run_search
from diffusion_tts_tpu.training.loss import EDMLoss
from diffusion_tts_tpu.training.train_step import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)
from diffusion_tts_tpu.utils.config import SearchParams

KW = dict(model_channels=16, channel_mult=(1,), num_blocks=1,
          attn_resolutions=(), dropout=0.0)


def _net():
    return EDMPrecond(img_resolution=8, img_channels=3, label_dim=4,
                      model_type="SongUNet", model_kwargs=KW)


def test_param_spec_rules():
    class L:  # fake leaf
        def __init__(self, shape):
            self.shape = shape

    assert param_spec(L((3, 3, 16, 16)), "model", 2, 2) == P(None, None, None, "model")
    assert param_spec(L((16,)), "model", 2, 64) == P()  # too small
    assert param_spec(L((3, 3, 16, 15)), "model", 2, 2) == P()  # not divisible


@pytest.mark.slow
def test_dp_tp_train_step_matches_dp():
    mesh_tp = make_mesh({"data": 4, "model": 2})
    mesh_dp = make_mesh({"data": 8})
    net = _net()
    imgs = jax.random.normal(jax.random.key(0), (1, 8, 8, 8, 3)) * 0.5
    labels = jnp.tile(jnp.eye(4)[jnp.arange(4) % 4], (2, 1)).reshape(1, 8, 4)
    variables = net.init({"params": jax.random.key(1)}, imgs[0], jnp.ones((8,)), labels[0])
    cfg = TrainConfig(grad_accum_rounds=1, total_batch=8)
    tx = make_optimizer(cfg)
    denoise_apply = lambda p, x, s, l, al, rng=None: net.apply(
        {"params": p}, x, s, l, augment_labels=al)
    step_fn = make_train_step(EDMLoss(), denoise_apply, cfg, tx)

    state_dp = TrainState.create(variables["params"], tx)
    dp = shard_train_step(step_fn, mesh_dp)
    _, m_dp = dp(state_dp, imgs, labels, jax.random.key(2))

    state_tp = shard_state(TrainState.create(variables["params"], tx),
                           mesh_tp, axis="model", min_size=2)
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(state_tp.params)
        if any(s is not None for s in getattr(leaf.sharding, "spec", ()))
    )
    assert n_sharded > 0, "no parameter got model-sharded"
    tp = shard_train_step(step_fn, mesh_tp, model_sharded_state=True)
    state_tp2, m_tp = tp(state_tp, imgs, labels, jax.random.key(2))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]), rtol=1e-4)
    # updated params stay numerically equal to the DP run
    a = jax.device_get(state_tp2.params)
    b_ = jax.device_get(dp(state_dp, imgs, labels, jax.random.key(2))[0].params)
    for pa, pb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b_)):
        np.testing.assert_allclose(pa, pb, rtol=2e-4, atol=2e-5)


def test_candidate_sharded_search_matches_unsharded():
    mesh = make_mesh({"data": 8})

    def denoise(x, s):
        s = jnp.reshape(s, (-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
        return x / (1.0 + s**2)

    sampler = EDMHeunSampler(denoise=denoise, num_steps=4, sigma_max=10.0,
                             S_churn=20.0, S_min=0.01, S_max=50.0)
    z = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
    params = SearchParams(N=8, K=2)

    plain = EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer())
    sharded = EDMSearchBackend(
        sampler=sampler, scorer=BrightnessScorer(),
        candidate_sharding=NamedSharding(mesh, P("data")),
    )
    r0 = run_search("eps_greedy", plain, z, jax.random.key(1), params)
    r1 = run_search("eps_greedy", sharded, z, jax.random.key(1), params)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x), rtol=1e-5, atol=1e-6)
    assert float(r1.score[0]) > 0

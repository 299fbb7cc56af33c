"""Compiled training step: grad accumulation, LR ramp, EMA, Adam.

Counterpart of the reference training loop's inner iteration
(training/training_loop.py:123-148): gradient accumulation rounds (there:
``ddp_sync`` no-sync loops; here: ``lax.scan`` over microbatches inside ONE
compiled program, so the gradient all-reduce happens once via the sharded
psum XLA inserts), LR ramp-up, NaN-scrubbed grads (``nan_to_num``,
:137-139), Adam, and ramped EMA (:142-148).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    ema_params: Any
    opt_state: Any
    nimg: jax.Array  # images seen (the reference's cur_nimg counter)

    @classmethod
    def create(cls, params, tx):
        return cls(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=tx.init(params),
            nimg=jnp.asarray(0, jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-8
    lr_rampup_kimg: float = 10000.0  # train.py:73 / training_loop.py:135-136
    ema_halflife_kimg: float = 500.0  # training_loop.py:142-148
    ema_rampup_ratio: float = 0.05
    grad_accum_rounds: int = 1
    total_batch: int = 512  # global batch per step (nimg increment)
    # Unroll the accumulation loop instead of lax.scan: larger HLO (rounds
    # copies of fwd+bwd) but no while-loop — a workaround for backends that
    # reject the scanned form (see PARITY.md round-2 notes).
    accum_unroll: bool = False
    # Carry the accumulated gradient through the scan as ONE flattened
    # vector instead of a per-parameter pytree. Same math and memory, but
    # the while-loop carry drops from ~(2 + n_params_leaves) operands to 4 —
    # the remote TPU runtime rejects large-model scans with many-hundred-
    # leaf carries at execution (opaque INVALID_ARGUMENT; PARITY.md
    # round-2/3 notes), and tools/carry_probe.py bisects the leaf-count
    # threshold. Flat is the default; the pytree carry remains for A/B.
    accum_flat_carry: bool = True


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # LR ramp is folded in via inject_hyperparams so one compiled step
    # serves the whole run.
    def schedule_less_adam(lr):
        return optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)

    return optax.inject_hyperparams(schedule_less_adam)(lr=cfg.lr)


def make_train_step(
    loss_fn: Callable,  # loss_fn(denoise, images, labels, key, augment_fn)
    denoise_apply: Callable,  # (params, x, sigma, labels, augment_labels, rng=None) -> D_x
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    augment_fn: Callable | None = None,
):
    """Returns step(state, images [R, micro, H, W, C], labels [R, micro, L],
    key) -> (state, metrics). R = grad accumulation rounds."""

    def microbatch_loss(params, images, labels, key):
        k_loss, k_drop = jax.random.split(key)
        denoise = lambda x, s, l, al: denoise_apply(params, x, s, l, al, rng=k_drop)
        loss = loss_fn(denoise, images, labels, k_loss, augment_fn)
        return jnp.mean(loss)

    grad_fn = jax.value_and_grad(microbatch_loss)

    def step(state: TrainState, images, labels, key):
        r = cfg.grad_accum_rounds
        keys = jax.random.split(key, r)

        def accum(carry, inp):
            loss_sum, grad_sum = carry
            img, lab, k = inp
            loss, grads = grad_fn(state.params, img, lab, k)
            return (
                loss_sum + loss,
                jax.tree_util.tree_map(jnp.add, grad_sum, grads),
            ), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        if r == 1:
            # no accumulation: skip the scan (and the flat-carry flatten,
            # which would re-layout model-sharded gradients — with tensor-
            # parallel params the concatenated vector cannot preserve
            # per-leaf shardings; rounds>1 + TP should prefer
            # accum_flat_carry=False)
            lab0 = None if labels is None else labels[0]
            loss_sum, grad_sum = grad_fn(state.params, images[0], lab0, keys[0])
        elif cfg.accum_unroll:
            carry = (jnp.zeros(()), zero_grads)
            for j in range(r):
                lab_j = None if labels is None else labels[j]
                carry, _ = accum(carry, (images[j], lab_j, keys[j]))
            loss_sum, grad_sum = carry
        elif cfg.accum_flat_carry:
            from jax.flatten_util import ravel_pytree

            zero_flat, unravel = ravel_pytree(zero_grads)

            def accum_flat(carry, inp):
                loss_sum, gflat = carry
                img, lab, k = inp
                loss, grads = grad_fn(state.params, img, lab, k)
                return (loss_sum + loss, gflat + ravel_pytree(grads)[0]), None

            (loss_sum, gflat), _ = jax.lax.scan(
                accum_flat, (jnp.zeros(()), zero_flat), (images, labels, keys)
            )
            grad_sum = unravel(gflat)
        else:
            (loss_sum, grad_sum), _ = jax.lax.scan(
                accum, (jnp.zeros(()), zero_grads), (images, labels, keys)
            )
        loss = loss_sum / r
        grads = jax.tree_util.tree_map(
            lambda g: jnp.nan_to_num(g / r, nan=0.0, posinf=1e5, neginf=-1e5),
            grad_sum,
        )

        # LR ramp-up (training_loop.py:135-136)
        ramp = jnp.minimum(
            state.nimg.astype(jnp.float32) / max(cfg.lr_rampup_kimg * 1000.0, 1e-8), 1.0
        )
        opt_state = state.opt_state
        opt_state.hyperparams["lr"] = cfg.lr * ramp
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # EMA with ramp-up (training_loop.py:142-148)
        nimg_new = state.nimg + cfg.total_batch
        halflife_nimg = cfg.ema_halflife_kimg * 1000.0
        halflife_nimg = jnp.minimum(
            halflife_nimg, nimg_new.astype(jnp.float32) * cfg.ema_rampup_ratio
        )
        ema_beta = 0.5 ** (cfg.total_batch / jnp.maximum(halflife_nimg, 1e-8))
        ema_params = jax.tree_util.tree_map(
            lambda e, p: p + (e - p) * ema_beta, state.ema_params, params
        )

        new_state = state.replace(
            params=params, ema_params=ema_params, opt_state=opt_state, nimg=nimg_new
        )
        metrics = {"loss": loss, "lr": cfg.lr * ramp, "ema_beta": ema_beta}
        return new_state, metrics

    return step


def make_train_multi_step(
    loss_fn: Callable,
    denoise_apply: Callable,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    augment_fn: Callable | None = None,
):
    """S optimizer steps inside ONE compiled program (lax.scan over the
    single step) — the training counterpart of the search engine's chunked
    dispatch. The per-program dispatch overhead (measured ~13 ms/step on
    the tunneled v5e even with dependent executions enqueued ahead) is paid
    once per S steps instead of once per step; device work is unchanged.

    Returns ``multi(state, images [S, R, micro, ...], labels [S, R, micro,
    ...], keys [S] key-array) -> (state, metrics stacked [S])``. ``keys``
    is one PRNG key per step (pre-split by the caller, so a host loop that
    splits sequentially produces bit-identical training to the single-step
    path — pinned by tests/test_training.py).
    """
    step = make_train_step(loss_fn, denoise_apply, cfg, tx, augment_fn)

    def multi(state: TrainState, images, labels, keys):
        def body(st, inp):
            img, lab, k = inp
            return step(st, img, lab, k)

        return jax.lax.scan(body, state, (images, labels, keys))

    return multi


__all__ = [
    "TrainState", "TrainConfig", "make_optimizer", "make_train_step",
    "make_train_multi_step",
]

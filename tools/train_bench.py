"""Training-throughput benchmark: images/sec and sec/kimg for one chip.

The reference defines its training speed metric as sec/kimg in the tick log
(edm/training/training_loop.py:162-163) but ships no recorded numbers; this
tool produces them for the TPU build. One compiled pjit step (grad-accum
scan + Adam + ramped EMA — training/train_step.py) over synthetic data.

Usage:
  python tools/train_bench.py [--arch cifar10] [--batch 128] [--rounds 1]
      [--steps 8] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="cifar10")
    ap.add_argument("--batch", type=int, default=128, help="micro-batch per round")
    ap.add_argument("--rounds", type=int, default=1, help="grad-accum rounds")
    ap.add_argument("--steps", type=int, default=8, help="timed optimizer steps")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable buffer donation (timing cross-check)")
    ap.add_argument("--unroll", action="store_true",
                    help="unroll grad accumulation (workaround for backends "
                         "that reject the scanned form; see TrainConfig)")
    ap.add_argument("--tree-carry", action="store_true",
                    help="A/B: carry the gradient pytree through the scan "
                         "instead of the default flat vector (the form the "
                         "remote runtime rejects at many-leaf model sizes)")
    ap.add_argument("--scan", type=int, default=1, metavar="S",
                    help="run S optimizer steps inside ONE compiled program "
                         "(lax.scan over the step — make_train_multi_step); "
                         "pays the per-program dispatch overhead once per S "
                         "steps. step_ms reports per-step time.")
    ap.add_argument("--chain", type=int, default=1, metavar="N",
                    help="dispatch N dependent steps per timed rep and sync "
                         "once at the end — amortizes the tunnel's "
                         "per-dispatch round trip over N steps (the shape a "
                         "production loop uses: enqueue ahead, sync rarely)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one steady-state "
                         "step into DIR (tools/trace_summary.py reads it)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, PRECONDS
    from diffusion_tts_tpu.training.loss import EDMLoss
    from diffusion_tts_tpu.training.train_step import (
        TrainConfig, TrainState, make_optimizer, make_train_step,
    )
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg_net = dict(NET_CONFIGS[args.arch])
    net = PRECONDS["edm"](dtype=getattr(jnp, args.dtype), **cfg_net)
    res, ch, label_dim = (cfg_net["img_resolution"], cfg_net["img_channels"],
                          cfg_net["label_dim"])

    rng = np.random.default_rng(0)
    micro = args.batch
    x0 = jnp.zeros((micro, res, res, ch), jnp.float32)
    lab0 = jnp.zeros((micro, label_dim), jnp.float32) if label_dim else None
    variables = net.init({"params": jax.random.key(0)}, x0, jnp.ones((micro,)), lab0)

    def denoise_apply(params, x, sigma, labels, augment_labels, rng=None):
        rngs = {"label_dropout": rng} if rng is not None else None
        return net.apply({"params": params}, x, sigma, labels,
                         augment_labels=augment_labels, train=True, rngs=rngs)

    total_batch = micro * args.rounds
    cfg = TrainConfig(lr=1e-4, grad_accum_rounds=args.rounds, total_batch=total_batch,
                      accum_unroll=args.unroll,
                      accum_flat_carry=not args.tree_carry)
    tx = make_optimizer(cfg)
    state = TrainState.create(variables["params"], tx)

    images = jnp.asarray(
        rng.normal(size=(args.rounds, micro, res, res, ch)), jnp.float32)
    labels = (jnp.asarray(
        np.eye(label_dim)[rng.integers(0, label_dim, (args.rounds, micro))],
        jnp.float32) if label_dim else jnp.zeros((args.rounds, micro, 0)))

    if args.scan > 1:
        from diffusion_tts_tpu.training.train_step import make_train_multi_step

        multi = make_train_multi_step(EDMLoss(), denoise_apply, cfg, tx)
        raw = jax.jit(multi, donate_argnums=() if args.no_donate else (0,))
        # One shared batch repeated S times (stacked once, outside timing).
        images = jnp.tile(images[None], (args.scan,) + (1,) * images.ndim)
        labels = jnp.tile(labels[None], (args.scan,) + (1,) * labels.ndim)

        def step(state, images, labels, key):
            st, ms = raw(state, images, labels, jax.random.split(key, args.scan))
            return st, jax.tree_util.tree_map(lambda m: m[-1], ms)
    else:
        step = jax.jit(make_train_step(EDMLoss(), denoise_apply, cfg, tx),
                       donate_argnums=() if args.no_donate else (0,))

    t0 = time.perf_counter()
    state, metrics = step(state, images, labels, jax.random.key(1))
    jax.block_until_ready(state.params)
    compile_s = time.perf_counter() - t0

    # Speed-of-light accounting (same convention as bench.py): XLA's own
    # cost_analysis FLOPs for the WHOLE compiled step (fwd + bwd + Adam +
    # EMA) over the measured step time, as a fraction of the chip's dense
    # bf16 peak. The lowering hits the persistent compile cache, so this
    # costs one cache lookup, not a recompile.
    flops_per_step = 0.0
    try:
        if args.scan > 1:
            cost = raw.lower(
                state, images, labels,
                jax.random.split(jax.random.key(1), args.scan),
            ).compile().cost_analysis()
        else:
            cost = step.lower(
                state, images, labels, jax.random.key(1)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        # NOTE: XLA cost_analysis counts a while-loop (scan) body ONCE, so
        # the scanned multi-step program reports the same FLOPs as one step.
        flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

    # CANONICAL numerator (round-5 rebasis; bench.py's v2 convention): the
    # executed step routes attention through Pallas custom calls whose
    # matmul FLOPs are INVISIBLE to cost_analysis — the r4-reported
    # sol=0.425 undercounted the numerator by the flash fwd+bwd attention
    # FLOPs. Lower the single-step program once under
    # canonical_formulation() (all-XLA) and cache the count on disk.
    canonical_flops = 0.0
    if flops_per_step and jax.default_backend() != "cpu":
        import hashlib

        fp = hashlib.md5(repr(
            (args.arch, args.batch, args.rounds, args.dtype, args.unroll,
             not args.tree_carry)).encode()).hexdigest()[:10]
        cache_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache", "canonical_flops.json")
        key_ = f"train_step_v2_{fp}"
        try:
            with open(cache_path) as f:
                canonical_flops = float(json.load(f).get(key_, 0.0))
        except (OSError, ValueError):
            pass
        if not canonical_flops:
            from diffusion_tts_tpu.utils.roofline import canonical_formulation

            print("# lowering canonical step for the SOL numerator "
                  "(one-time, cached)", file=sys.stderr)
            try:
                img1 = images[0] if args.scan > 1 else images
                lab1 = labels[0] if args.scan > 1 else labels
                with canonical_formulation():
                    cstep = jax.jit(
                        make_train_step(EDMLoss(), denoise_apply, cfg, tx))
                    ccost = cstep.lower(
                        state, img1, lab1,
                        jax.random.key(1)).compile().cost_analysis()
                if isinstance(ccost, (list, tuple)):
                    ccost = ccost[0]
                canonical_flops = float(ccost.get("flops", 0.0)) if ccost else 0.0
                if canonical_flops:
                    try:
                        try:
                            with open(cache_path) as f:
                                d = json.load(f)
                        except (OSError, ValueError):
                            d = {}
                        d[key_] = canonical_flops
                        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
                        with open(cache_path, "w") as f:
                            json.dump(d, f)
                    except OSError:
                        pass
            except Exception as e:  # pragma: no cover
                print(f"# canonical lowering unavailable: {e}", file=sys.stderr)
    if canonical_flops:
        flops_per_step = canonical_flops
    peak = 197e12 if "v5" in str(jax.devices()[0].device_kind).lower() else 0.0

    # Timing: best-of-reps of ONE dispatch ended by a VALUE fetch. Two
    # tunnel pathologies force this shape: block_until_ready returns early
    # when dependent dispatches queue up (measured 14x-peak "throughput"),
    # and the tunnel intermittently stalls for minutes mid-queue (averages
    # meaningless). Use --rounds to amortize per-dispatch overhead: the
    # grad-accum scan processes rounds*batch images inside one program.
    # With --chain N, each rep enqueues N dependent dispatches and fetches
    # ONE scalar from the last step's metrics: the data dependency forces
    # all N to complete, the fetch is the reliable sync, and the tunnel's
    # per-dispatch round trip (~50 ms) is paid once per rep instead of once
    # per step. Same compiled program either way.
    keys = iter(jax.random.key(2 + i) for i in range(args.steps * args.chain))
    best = float("inf")
    for _ in range(args.steps):
        t0 = time.perf_counter()
        for _ in range(args.chain):
            # rebind: the input state was donated to this dispatch
            state, metrics = step(state, images, labels, next(keys))
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / (args.chain * args.scan))
    dt = best

    if args.profile:
        from diffusion_tts_tpu.utils.misc import start_trace, stop_trace

        start_trace(args.profile)
        state, metrics = step(state, images, labels, jax.random.key(99))
        float(metrics["loss"])
        stop_trace()
        print(f"profiler trace written to {args.profile}/", file=sys.stderr)

    img_per_s = total_batch / dt
    out = dict(
        arch=args.arch, params=int(sum(
            np.prod(l.shape) for l in jax.tree_util.tree_leaves(state.params))),
        batch=total_batch, dtype=args.dtype, chain=args.chain,
        device=str(jax.devices()[0].device_kind),
        scan=args.scan,
        img_per_s=round(img_per_s, 1),
        sec_per_kimg=round(1000.0 / img_per_s, 2),
        step_ms=round(dt * 1e3, 1),
        compile_s=round(compile_s, 1),
        loss=float(metrics["loss"]),
        step_gflops=round(flops_per_step / 1e9, 1),
        model_tflops_s=round(flops_per_step / dt / 1e12, 2),
        sol=round(flops_per_step / dt / peak, 4) if peak and flops_per_step else None,
    )
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

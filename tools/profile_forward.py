"""Decompose flagship-model forward time on the TPU.

Times the 296M ImageNet-64 ADM forward (the bench.py denominator) under
ablations — flash attention on/off, fused Pallas GroupNorm on/off,
attention removed entirely, several effective batch sizes — so perf work
targets the real bottleneck instead of guesses (VERDICT.md weak #1: nobody
profiled where the non-MXU 73% goes).

Run on TPU:  python tools/profile_forward.py
Each variant is one compiled lax.scan of ITERS forwards; reported number is
best-of-reps to shed tunnel dispatch jitter.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def make_net(attn: bool, dtype):
    import __graft_entry__ as ge
    from diffusion_tts_tpu.models.preconds import EDMPrecond

    kwargs = dict(model_channels=192, channel_mult=(1, 2, 3, 4), num_blocks=3,
                  attn_resolutions=(32, 16, 8) if attn else (), dropout=0.0)
    return EDMPrecond(img_resolution=64, img_channels=3, label_dim=1000,
                      model_type="DhariwalUNet", model_kwargs=kwargs, dtype=dtype)


def synth_weights(net, batch):
    x = jnp.zeros((batch, 64, 64, 3), jnp.float32)
    sigma = jnp.full((batch,), 10.0, jnp.float32)
    labels = jnp.eye(1000, dtype=jnp.float32)[jnp.arange(batch) % 1000]
    rng = np.random.default_rng(1)
    shapes = jax.eval_shape(
        lambda: net.init({"params": jax.random.key(0)}, x, sigma, labels))
    variables = jax.tree_util.tree_map(
        lambda s: jax.device_put(
            (rng.standard_normal(s.shape, dtype=np.float32) * 0.05).astype(s.dtype)),
        shapes)
    return variables, x, sigma, labels


def time_variant(name, net, batch, iters=10, reps=3):
    variables, x, sigma, labels = synth_weights(net, batch)

    @jax.jit
    def run(v, x0):
        def body(x, _):
            out = net.apply(v, x, sigma, labels)
            return out.astype(x.dtype), None
        y, _ = jax.lax.scan(body, x0, None, length=iters)
        return y

    run(variables, x).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(variables, x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    per_fwd_ms = best / iters * 1e3
    cost = jax.jit(lambda v, xx: net.apply(v, xx, sigma, labels)).lower(
        variables, x).compile().cost_analysis()
    gflop = float(cost.get("flops", 0)) / 1e9
    sol = gflop / 1e9 * 1e3 / per_fwd_ms / 197.0 * 1e3  # fraction of 197 TF/s
    print(json.dumps({"variant": name, "batch": batch,
                      "ms_per_batched_fwd": round(per_fwd_ms, 3),
                      "gflop_per_batched_fwd": round(gflop, 1),
                      "frac_sol_bf16": round(gflop / 197.0 / per_fwd_ms, 4)}),
          flush=True)
    return per_fwd_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,noflash,nognp,noattn,b8,b16,fp32")
    args = ap.parse_args()
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import diffusion_tts_tpu.ops.attention as attn_mod
    import diffusion_tts_tpu.ops.pallas.groupnorm as gn_mod

    want = set(args.variants.split(","))
    orig_attn_elig = attn_mod._pallas_eligible
    orig_gn_elig = gn_mod.pallas_gn_eligible

    if "base" in want:
        time_variant("base b4 bf16", make_net(True, jnp.bfloat16), 4)
    if "noflash" in want:
        attn_mod._pallas_eligible = lambda q: False
        time_variant("xla attention (no flash)", make_net(True, jnp.bfloat16), 4)
        attn_mod._pallas_eligible = orig_attn_elig
    if "nognp" in want:
        gn_mod.pallas_gn_eligible = lambda x: False
        time_variant("no pallas groupnorm", make_net(True, jnp.bfloat16), 4)
        gn_mod.pallas_gn_eligible = orig_gn_elig
    if "noattn" in want:
        time_variant("attention removed", make_net(False, jnp.bfloat16), 4)
    if "b8" in want:
        time_variant("base b8 bf16", make_net(True, jnp.bfloat16), 8)
    if "b16" in want:
        time_variant("base b16 bf16", make_net(True, jnp.bfloat16), 16)
    if "fp32" in want:
        time_variant("base b4 fp32", make_net(True, jnp.float32), 4)


if __name__ == "__main__":
    main()

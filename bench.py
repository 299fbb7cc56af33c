"""Benchmark: denoise throughput of the flagship search configuration.

Measures NFE/s/chip for the eps-greedy candidate-expansion step on the
full-size EDM ImageNet-64 model (the north-star denominator, BASELINE.md):
one compiled program steps N candidates through the Heun pair and scores
them — the unit the reference executes as a Python loop with per-candidate
host syncs (edm/main.py:800-857).

vs_baseline = achieved model FLOP/s divided by the chip's peak bf16 FLOP/s
(fraction of speed-of-light; the reference repo publishes no numbers to
compare against — BASELINE.json published:{}).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — plus, on
TPU when the compile cache is warm, an "sd" sub-object carrying the SD-1.5
paper-headline e2e metric (tools/sd_e2e_bench.py at sd/main.py defaults), so
both backends land in the driver artifact (VERDICT r4 #1c). Progress
heartbeats go to stderr so a driver-side timeout leaves diagnosable output.
`--no-sd` restricts to the EDM metric; `--sd` runs the SD bench alone.
"""
from __future__ import annotations

import json
import os
import time

import jax

# The environment's sitecustomize force-registers the axon TPU platform; an
# explicit JAX_PLATFORMS from the caller must still win (CPU smoke runs).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp


PEAK_BF16_FLOPS = {
    # per-chip dense peak
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
    "cpu": 1e12,  # nominal, for local smoke runs
}


def _peak_flops() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for k, v in PEAK_BF16_FLOPS.items():
        if k in kind:
            return v
    return 197e12


_T0 = time.perf_counter()


def _hb(msg: str) -> None:
    """stderr heartbeat: phase + elapsed, so a driver-side timeout leaves
    diagnosable tail output instead of nothing (round 4's BENCH_r04 was a
    silent rc=124 — VERDICT r4 #1b)."""
    import sys

    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _load_sd_bench_module():
    import importlib.util

    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tools", "sd_e2e_bench.py")
    spec = importlib.util.spec_from_file_location("sd_e2e_bench", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import sys

    if "--sd" in sys.argv:
        # Secondary metric (VERDICT r3 #1c): the SD end-to-end search at the
        # reference sd/main.py paper defaults (18 steps, K=20, N=4), with
        # speed-of-light accounting. Same one-JSON-line contract
        # (vs_baseline = SOL fraction).
        mod = _load_sd_bench_module()
        if jax.default_backend() == "cpu":  # tiny smoke: compile-bound
            sys.argv = [sys.argv[0], "--steps", "6", "--K", "2", "--N", "4",
                        "--repeat", "2", "--tiny"]
        else:
            sys.argv = [sys.argv[0], "--steps", "18", "--K", "20", "--N", "4",
                        "--repeat", "3"]
        return mod.main()

    from diffusion_tts_tpu.scorers import BrightnessScorer
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.search.backend import EDMSearchBackend
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache
    import __graft_entry__ as ge

    enable_compilation_cache()
    on_tpu = jax.default_backend() != "cpu"
    _hb(f"start: backend={jax.default_backend()} "
        f"device={jax.devices()[0].device_kind}")
    net, res, label_dim = ge._flagship(tiny=not on_tpu)
    # B=2 samples x N=8 candidates: the paper-default sample batch (B=2,
    # edm/main.py:35-43) at the top of the VERDICT-recommended candidate
    # range — 16 images/step fills the MXU where the reference's per-sample
    # loop (edm/main.py:800-809) never exceeds N=4 images.
    batch, n_cand = (2, 8) if on_tpu else (1, 2)

    x = jnp.zeros((batch, res, res, 3), jnp.float32)
    sigma = jnp.full((batch,), 10.0, jnp.float32)
    labels = jnp.eye(label_dim, dtype=jnp.float32)[jnp.arange(batch) % label_dim]
    # Host-side weight synthesis: per-param jax.random calls would trigger
    # one (remote) compile each — hundreds of compiles for the full model.
    import numpy as np

    rng = np.random.default_rng(1)
    variables = jax.tree_util.tree_map(
        lambda s: jax.device_put(
            (rng.standard_normal(s.shape, dtype=np.float32) * 0.05).astype(s.dtype)
        ),
        jax.eval_shape(lambda: net.init({"params": jax.random.key(0)}, x, sigma, labels)),
    )

    def make_backend(v):
        denoise = lambda xx, ss: net.apply(
            v, xx, ss, jnp.tile(labels, (xx.shape[0] // batch, 1))
        )
        sampler = EDMHeunSampler(
            denoise=denoise, num_steps=18, sigma_min=0.002, sigma_max=80.0,
            S_churn=40.0, S_min=0.05, S_max=50.0, S_noise=1.003,
        )
        return EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer())

    # The eps-greedy inner iteration — expand N candidates (Heun pair =
    # 2 NFE each) + score + argmax — is the hot loop of the search engine.
    # Params are a jit ARGUMENT (closing over them would bake 296M floats
    # into the HLO and blow up the remote compile), and `iters` iterations
    # run inside ONE compiled lax.scan so per-dispatch tunnel latency
    # cannot pollute the timing.
    iters = 20 if on_tpu else 3

    @jax.jit
    def run_iters(v, x_cur, eps):
        backend = make_backend(v)

        def body(pivot, k):
            cands = eps + 0.01 * pivot[None] * k  # vary candidates per iter
            _, images = backend.expand(x_cur, 3, None, cands)
            scores = backend.score(images).reshape(n_cand, batch)
            best = jnp.argmax(scores, axis=0)
            new_pivot = jnp.take_along_axis(
                cands, best.reshape((1, batch, 1, 1, 1)), axis=0
            )[0]
            return new_pivot, None

        pivot, _ = jax.lax.scan(
            body, jnp.zeros_like(x_cur), jnp.arange(iters, dtype=jnp.float32)
        )
        return pivot

    x_cur = make_backend(variables).init_latents(
        jax.random.normal(jax.random.key(2), x.shape)
    )
    eps = jax.random.normal(jax.random.key(3), (n_cand, batch, res, res, 3))
    _hb("weights on device; compiling run_iters (seconds warm from "
        ".jax_cache, ~5-10 min on a cold cache)")
    run_iters(variables, x_cur, eps).block_until_ready()  # compile
    _hb("run_iters compiled")

    # Model FLOPs per single forward, from XLA's own cost analysis — of the
    # CANONICAL (reference-formulation) program: the fused upsample+conv
    # rewrite (ops/resample.py) computes the same NFE with ~4% fewer FLOPs,
    # and the speed-of-light fraction is defined against the fixed workload
    # "one Heun-pair NFE of the reference formulation", not against whatever
    # cheaper program this repo happens to execute (else every FLOP-saving
    # rewrite would *lower* the reported efficiency at equal throughput).
    # roofline.canonical_formulation pins every trace-time routing flag:
    # crucially it ALSO disables the Pallas attention routes — a custom
    # call's matmuls are invisible to cost_analysis, so rounds 1-4 lowered
    # the canonical program with flash attention active and UNDERCOUNTED
    # the numerator by the attention FLOPs (key bumped to v2; vs_baseline
    # is slightly higher and now exact).
    # The count is a property of (model, resolution, batch), so cache it on
    # disk — the extra remote compile is paid once ever, not per bench run.
    # Key includes a fingerprint of the full model config: changing channels/
    # blocks/attention at the same (res, label_dim, batch) must invalidate the
    # cached FLOP count or the reported SOL fraction silently skews.
    import hashlib

    cfg_fp = hashlib.md5(
        repr((net.model_type, sorted(net.model_kwargs.items()),
              net.img_channels, str(net.dtype))).encode()
    ).hexdigest()[:10]
    flops_key = f"canonical_fwd_v2_res{res}_ld{label_dim}_b{batch}_{cfg_fp}"
    flops_cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache",
        "canonical_flops.json")
    flops_per_fwd = 0.0
    try:
        with open(flops_cache_path) as f:
            flops_per_fwd = float(json.load(f).get(flops_key, 0.0))
    except (OSError, ValueError):
        pass
    if not flops_per_fwd:
        from diffusion_tts_tpu.utils.roofline import canonical_formulation

        _hb("no cached canonical FLOP count: lowering+compiling the "
            "canonical forward once (cached forever after)")
        with canonical_formulation():
            fwd = jax.jit(lambda v, xx, ss: net.apply(v, xx, ss, labels))
            cost = fwd.lower(variables, x, sigma).compile().cost_analysis()
        flops_per_fwd = (
            float(cost["flops"]) / batch if cost and "flops" in cost else 0.0)
        if flops_per_fwd and on_tpu:
            try:
                try:
                    with open(flops_cache_path) as f:
                        d = json.load(f)
                except (OSError, ValueError):
                    d = {}
                d[flops_key] = flops_per_fwd
                os.makedirs(os.path.dirname(flops_cache_path), exist_ok=True)
                with open(flops_cache_path, "w") as f:
                    json.dump(d, f)
            except OSError:
                pass

    profile_dir = None
    if "--profile" in sys.argv:
        from diffusion_tts_tpu.utils.misc import start_trace

        profile_dir = "bench_trace"
        start_trace(profile_dir)
    # Best-of-reps: the development tunnel adds multi-second dispatch-latency
    # spikes; the fastest rep is the honest device throughput. Each rep ends
    # with a scalar VALUE fetch, not block_until_ready — on axon the latter
    # can return early with dispatches still queued (observed: an impossible
    # 809k NFE/s rep, which best-of-reps would happily report).
    reps = 4 if on_tpu else 1
    best_dt = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        float(run_iters(variables, x_cur, eps)[0, 0, 0, 0])
        best_dt = min(best_dt, time.perf_counter() - t0)
        _hb(f"rep {rep + 1}/{reps} wall {time.perf_counter() - t0:.2f}s")
    if profile_dir:
        from diffusion_tts_tpu.utils.misc import stop_trace

        stop_trace()
        print(f"profiler trace written to {profile_dir}/", file=sys.stderr)

    nfe = iters * n_cand * batch * 2  # Heun pair per candidate
    nfe_per_s = nfe / best_dt
    achieved = nfe_per_s * flops_per_fwd
    vs = achieved / _peak_flops()

    out = {
        "metric": "edm_imagenet64_eps_greedy_expand_NFE_per_s_per_chip"
                  if on_tpu else "edm_tiny_eps_greedy_expand_NFE_per_s (cpu smoke)",
        "value": round(nfe_per_s, 2),
        "unit": "NFE/s",
        "vs_baseline": round(vs, 4),
    }

    # Secondary metric in the SAME driver artifact (VERDICT r4 #1c): the SD
    # paper-headline e2e search. Only attempted when the EDM phase ran at
    # warm-cache speed — a cold cache means this invocation is already
    # minutes deep in compiles and the SD programs would be cold too, so we
    # skip-with-notice rather than risk the whole artifact on a timeout.
    # Warm/cold discriminator: a warm run's EDM phase is ~200-220 s (the
    # dominant cost is deserializing the 68 MB cached run_iters executable
    # over the tunnel, measured 160-210 s); a cold compile pushes it past
    # 600 s. 360 s separates the two with margin on both sides.
    edm_elapsed = time.perf_counter() - _T0
    if on_tpu and "--no-sd" not in sys.argv:
        if edm_elapsed < 360.0:
            _hb(f"EDM phase warm ({edm_elapsed:.0f}s); running SD e2e "
                "(paper defaults, 2 calls)")
            try:
                import contextlib
                import io

                mod = _load_sd_bench_module()
                saved_argv = sys.argv
                sys.argv = [sys.argv[0], "--steps", "18", "--K", "20",
                            "--N", "4", "--repeat", "2"]
                try:
                    with contextlib.redirect_stdout(io.StringIO()):
                        sd = mod.main()
                finally:
                    sys.argv = saved_argv
                out["sd"] = {k: sd[k] for k in
                             ("metric", "value", "unit", "steady_wall_s",
                              "sol", "practical_ceiling",
                              "sol_of_practical_ceiling", "hbm_aware_ceiling")
                             if k in sd}
            except Exception as e:  # the EDM line must survive an SD failure
                _hb(f"SD e2e failed ({type(e).__name__}: {e}); "
                    "emitting EDM metric alone")
                out["sd"] = {"error": str(e)}
        else:
            _hb(f"EDM phase took {edm_elapsed:.0f}s (cold cache); skipping "
                "SD e2e to protect the artifact — run `python bench.py --sd` "
                "after warming")
            out["sd"] = {"skipped": f"cold cache (edm phase {edm_elapsed:.0f}s)"}

    _hb("done")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

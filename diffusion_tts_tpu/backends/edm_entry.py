"""EDM backend entry point: load a network, run noise-trajectory search,
save the image grid.

Counterpart of the reference's generate_image_grid (edm/main.py:47-886):
the unified CLI calls this with the ImageNet-64 ADM config (main.py:
197-213: 18 steps, S_churn=40, S_min=0.05, S_max=50, S_noise=1.003).
Loading is zero-egress: an exported torch state dict (.npz, via
tools/export_edm_checkpoint.py), an orbax snapshot from our trainer, or
random init for smoke runs.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.models.preconds import EDMPrecond, VEPrecond, VPPrecond, iDDPMPrecond
from diffusion_tts_tpu.models.torch_import import convert_state_dict, state_dict_from_npz
from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
from diffusion_tts_tpu.search.api import run_search
from diffusion_tts_tpu.search.backend import EDMSearchBackend
from diffusion_tts_tpu.utils.config import SearchParams

PRECONDS = {"edm": EDMPrecond, "vp": VPPrecond, "ve": VEPrecond, "iddpm": iDDPMPrecond}

IMAGENET64_ADM = dict(
    img_resolution=64, img_channels=3, label_dim=1000, model_type="DhariwalUNet",
    model_kwargs=dict(model_channels=192, channel_mult=(1, 2, 3, 4), num_blocks=3,
                      attn_resolutions=(32, 16, 8), dropout=0.0),
)
CIFAR10_DDPMPP = dict(
    img_resolution=32, img_channels=3, label_dim=10, model_type="SongUNet",
    model_kwargs=dict(model_channels=128, channel_mult=(2, 2, 2), num_blocks=4,
                      attn_resolutions=(16,), dropout=0.0, embedding_type="positional",
                      encoder_type="standard", decoder_type="standard",
                      resample_filter=(1, 1), channel_mult_noise=1),
)
TINY_SMOKE = dict(
    img_resolution=16, img_channels=3, label_dim=10, model_type="SongUNet",
    model_kwargs=dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
                      attn_resolutions=(8,), dropout=0.0),
)
NET_CONFIGS = {
    "imagenet64": IMAGENET64_ADM, "cifar10": CIFAR10_DDPMPP, "tiny": TINY_SMOKE,
}


def load_network(
    arch: str = "imagenet64", weights: str | None = None, precond: str = "edm",
    dtype=jnp.float32,
):
    """Returns (net module, variables). weights: .npz torch export or None
    (random init)."""
    cfg = dict(NET_CONFIGS[arch])
    net = PRECONDS[precond](dtype=dtype, **cfg)
    res, ch, ld = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    dummy_lab = jnp.zeros((1, ld)) if ld else None
    # ONE compiled init program: eager net.init dispatches one tiny pjit per
    # parameter (264 for the 56M config — ~78 s of the old CPU probe, and a
    # remote round-trip each on the TPU tunnel).
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, res, res, ch)),
        jnp.ones((1,)), dummy_lab,
    ))()
    if weights is not None:
        state = state_dict_from_npz(weights)
        converted = convert_state_dict(state)
        ref = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(variables["params"])}
        got = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(converted["params"])}
        if ref != got:
            raise ValueError(
                f"checkpoint/model mismatch; missing={sorted(ref - got)[:4]} "
                f"extra={sorted(got - ref)[:4]}"
            )
        variables = converted
    return net, variables


def generate_image_grid(
    *,
    arch: str = "imagenet64",
    weights: str | None = None,
    dest_path: str | None = None,
    scorer: Any,
    scorer_needs_labels: bool = False,
    method: str = "eps_greedy",
    params: SearchParams | None = None,
    seed: int = 0,
    gridw: int = 1,
    gridh: int = 1,
    num_steps: int = 18,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    S_churn: float = 40.0,
    S_min: float = 0.05,
    S_max: float = 50.0,
    S_noise: float = 1.003,
    class_idx: int | None = None,
    dtype=jnp.float32,
    record_noises: bool = False,
    dispatch: str = "auto",
):
    """Run search and (optionally) save a gridh x gridw PNG. Returns
    (images01 [B,H,W,C], scores [B], best_noises)."""
    net, variables = load_network(arch, weights, dtype=dtype)
    cfg = NET_CONFIGS[arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    n_img = gridw * gridh

    key = jax.random.key(seed)
    if label_dim:
        if class_idx is None:
            cls = jax.random.randint(jax.random.fold_in(key, 1), (n_img,), 0, label_dim)
        else:
            cls = jnp.full((n_img,), class_idx, jnp.int32)
        labels = jnp.eye(label_dim, dtype=jnp.float32)[cls]
    else:
        labels = None

    # Model (and scorer) weights ride through jit as arguments — closing
    # over them would bake hundreds of MB of constants into the HLO.
    bargs = {"net": variables}
    scorer_has_vars = hasattr(scorer, "variables") or hasattr(scorer, "params")
    if hasattr(scorer, "variables"):
        bargs["scorer"] = scorer.variables
    elif hasattr(scorer, "params"):
        bargs["scorer"] = scorer.params

    def make_backend(b):
        denoise = lambda x, s: net.apply(
            b["net"], x, s,
            jnp.tile(labels, (x.shape[0] // n_img, 1)) if labels is not None else None,
        )
        sampler = EDMHeunSampler(
            denoise=denoise, num_steps=num_steps, sigma_min=sigma_min,
            sigma_max=sigma_max, rho=rho, S_churn=S_churn, S_min=S_min,
            S_max=S_max, S_noise=S_noise,
            # MCTS is by far the most trace/compile-heavy program (rollouts
            # to terminal inside every timestep); sharing the Heun pair's
            # denoiser trace cuts its lower time ~3x (9.5 s vs 29.3 s on
            # the 56M config, tools/mcts_compile_probe.py).
            trace_denoise_once=(method == "mcts"),
        )
        if "scorer" in b and hasattr(scorer, "variables"):
            sc = lambda img, cond, t=None: scorer(img, cond, t, variables=b["scorer"])
        elif "scorer" in b:
            sc = lambda img, cond, t=None: scorer(img, cond, t, params=b["scorer"])
        else:
            sc = scorer
        return EDMSearchBackend(sampler=sampler, scorer=sc,
                                scorer_cond=labels if scorer_needs_labels else None)

    # dispatch="auto" resolves inside run_search (per-timestep dispatches
    # for iterated methods on >100M-parameter models — the whole-program
    # form exceeds device program limits at paper-default K).
    z = jax.random.normal(jax.random.fold_in(key, 0), (n_img, res, res, ch))
    result = run_search(method, make_backend, z, key, params or SearchParams(),
                        backend_args=bargs, record_noises=record_noises,
                        dispatch=dispatch)
    print(f"Average score: {float(result.score.mean())}")

    if dest_path:
        img = np.asarray(result.images * 255.0).astype(np.uint8)
        grid = img.reshape(gridh, gridw, res, res, ch)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(gridh * res, gridw * res, ch)
        from PIL import Image

        Image.fromarray(grid.squeeze(), "RGB" if ch == 3 else "L").save(dest_path)
        print(f'Saved image grid to "{dest_path}"')
    return result


__all__ = ["generate_image_grid", "load_network", "NET_CONFIGS"]

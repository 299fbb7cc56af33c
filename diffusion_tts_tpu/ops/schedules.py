"""Noise schedules for the EDM and SD backends.

Covers the schedule math of the reference:
  * Karras rho-schedule used by the EDM search engine and samplers
    (reference edm/main.py:78-80, edm/generate.py:35-38).
  * VP / VE / iDDPM discretizations of the ablation sampler
    (reference edm/generate.py:85-115).
  * DDIM beta/alpha-bar tables used by Stable Diffusion's stochastic DDIM
    scheduler (reference sd/diffusers/src/diffusers/schedulers/
    scheduling_ddim.py:180-240,342-487).

Everything here is plain array math computed once at trace time with static
shapes, so it folds into the compiled XLA program as constants.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# EDM (Karras et al.) sigma schedules
# ---------------------------------------------------------------------------


def karras_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    *,
    dtype=jnp.float32,
    append_zero: bool = True,
) -> jnp.ndarray:
    """Karras rho-spaced sigma schedule, optionally with terminal sigma=0.

    sigma_i = (smax^(1/rho) + i/(N-1) * (smin^(1/rho) - smax^(1/rho)))^rho
    (reference edm/main.py:78-80).
    """
    steps = np.arange(num_steps, dtype=np.float64)
    inv_rho = 1.0 / rho
    sigmas = (
        sigma_max**inv_rho
        + steps / max(num_steps - 1, 1) * (sigma_min**inv_rho - sigma_max**inv_rho)
    ) ** rho
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, dtype=dtype)


def vp_sigmas(
    num_steps: int,
    beta_d: float = 19.9,
    beta_min: float = 0.1,
    epsilon_s: float = 1e-3,
    *,
    dtype=jnp.float32,
    append_zero: bool = True,
) -> jnp.ndarray:
    """VP discretization of the ablation sampler (reference edm/generate.py:97-101).

    sigma(t) = sqrt(exp(beta_d/2 * t^2 + beta_min * t) - 1), t linearly spaced
    from 1 to epsilon_s.
    """
    steps = np.arange(num_steps, dtype=np.float64)
    t = 1.0 + steps / max(num_steps - 1, 1) * (epsilon_s - 1.0)
    sigmas = np.sqrt(np.exp(beta_d / 2.0 * t**2 + beta_min * t) - 1.0)
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, dtype=dtype)


def vp_betas_for_range(
    sigma_min: float, sigma_max: float, epsilon_s: float = 1e-3
) -> tuple[float, float]:
    """Solve (beta_d, beta_min) so the VP sigma(t) hits sigma_min at t=eps_s
    and sigma_max at t=1 (reference edm/generate.py:100-102)."""
    beta_d = (
        2.0
        * (math.log(sigma_min**2 + 1.0) / epsilon_s - math.log(sigma_max**2 + 1.0))
        / (epsilon_s - 1.0)
    )
    beta_min = math.log(sigma_max**2 + 1.0) - 0.5 * beta_d
    return beta_d, beta_min


def vp_ablation_sigmas(
    num_steps: int,
    sigma_min: float | None = None,
    sigma_max: float | None = None,
    epsilon_s: float = 1e-3,
    *,
    dtype=jnp.float32,
    append_zero: bool = True,
) -> jnp.ndarray:
    """VP discretization as the ablation sampler builds it: default range from
    the canonical beta_d=19.9/beta_min=0.1 schedule, betas re-solved for the
    clipped range (reference edm/generate.py:88-104)."""
    canon = lambda t: math.sqrt(math.exp(0.5 * 19.9 * t**2 + 0.1 * t) - 1.0)
    if sigma_min is None:
        sigma_min = canon(epsilon_s)
    if sigma_max is None:
        sigma_max = canon(1.0)
    beta_d, beta_min = vp_betas_for_range(sigma_min, sigma_max, epsilon_s)
    return vp_sigmas(
        num_steps, beta_d=beta_d, beta_min=beta_min, epsilon_s=epsilon_s,
        dtype=dtype, append_zero=append_zero,
    )


def ve_sigmas(
    num_steps: int,
    sigma_min: float = 0.02,
    sigma_max: float = 100.0,
    *,
    dtype=jnp.float32,
    append_zero: bool = True,
) -> jnp.ndarray:
    """VE geometric sigma schedule (reference edm/generate.py:102-104)."""
    steps = np.arange(num_steps, dtype=np.float64)
    sigmas = sigma_max**2 * (sigma_min**2 / sigma_max**2) ** (
        steps / max(num_steps - 1, 1)
    )
    sigmas = np.sqrt(sigmas)
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, dtype=dtype)


def iddpm_sigma_table(M: int = 1000, C_1: float = 0.001, C_2: float = 0.008) -> np.ndarray:
    """The iDDPM u-table: u[M-1..0] built by the reverse recursion
    (reference edm/generate.py:106-112 and training/networks.py:584-590).

    Returns u as a length-(M+1) float64 array with u[M] = 0 implicit start.
    """
    u = np.zeros(M + 1, dtype=np.float64)

    # The reference evaluates alpha_bar in float32: torch promotes
    # python_scalar * int64_tensor to the default dtype, so the whole sin()
    # chain runs in fp32 before entering the fp64 recursion. Replicated here
    # bit-for-bit so the discretized sigma values match exactly.
    def alpha_bar(j: int) -> np.float32:
        t = np.float32(np.float32(np.float32(np.float32(0.5 * math.pi) * j) / M) / (C_2 + 1))
        s = np.float32(np.sin(t))
        return np.float32(s * s)  # x*x, not x**2: numpy pow rounds differently

    for j in range(M, 0, -1):  # M, M-1, ..., 1
        ratio = np.float64(max(np.float32(alpha_bar(j - 1) / alpha_bar(j)), np.float32(C_1)))
        u[j - 1] = math.sqrt((u[j] ** 2 + 1.0) / ratio - 1.0)
    return u


def iddpm_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 81.0,
    M: int = 1000,
    C_1: float = 0.001,
    C_2: float = 0.008,
    *,
    dtype=jnp.float32,
    append_zero: bool = True,
) -> jnp.ndarray:
    """iDDPM discretization: evenly strided entries of the u-table restricted to
    [sigma_min, sigma_max] (reference edm/generate.py:106-112)."""
    u = iddpm_sigma_table(M=M, C_1=C_1, C_2=C_2)
    # u is descending in index (u[0] largest, u[M]=0), so the filtered table is
    # already ordered high->low and linear index striding yields a descending
    # schedule (reference edm/generate.py:111-112).
    u_filtered = u[np.logical_and(u >= sigma_min, u <= sigma_max)]
    idx = (
        (np.arange(num_steps, dtype=np.float64)) * (len(u_filtered) - 1) / max(num_steps - 1, 1)
    ).round().astype(np.int64)
    sigmas = u_filtered[idx]
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, dtype=dtype)


# ---------------------------------------------------------------------------
# DDIM (Stable Diffusion) tables
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed DDIM tables + the timestep subsequence for a run.

    Mirrors the configuration of SD-1.5's scheduler: 1000 training steps,
    scaled_linear betas in [0.00085, 0.012], leading timestep spacing,
    clip_sample=False, set_alpha_to_one=False (reference
    sd/diffusers/.../schedulers/scheduling_ddim.py:180-240 and SD-1.5's
    scheduler_config.json).
    """

    alphas_cumprod: jnp.ndarray  # [num_train_timesteps]
    timesteps: jnp.ndarray  # [num_inference_steps] descending int32
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_train_timesteps: int
    num_inference_steps: int
    init_noise_sigma: float = 1.0


def ddim_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    set_alpha_to_one: bool = False,
    steps_offset: int = 1,
    *,
    dtype=jnp.float32,
    as_numpy: bool = False,
) -> DDIMSchedule:
    """Build the alpha-bar table and the 'leading'-spaced timestep subsequence
    (reference scheduling_ddim.py:305-341; SD-1.5 uses steps_offset=1)."""
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    elif beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    else:
        raise ValueError(f"unsupported beta_schedule: {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if set_alpha_to_one else alphas_cumprod[0]

    # 'leading' spacing (scheduling_ddim.py:322-329): arange * (T // S) + offset,
    # reversed to run high-noise -> low-noise.
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy()
    timesteps = timesteps + steps_offset

    if as_numpy:
        # host-side fp64 tables (samplers build their step tables from these
        # at construction time, possibly inside a trace)
        return DDIMSchedule(
            alphas_cumprod=alphas_cumprod,
            timesteps=timesteps.astype(np.int64),
            final_alpha_cumprod=np.float64(final),
            num_train_timesteps=num_train_timesteps,
            num_inference_steps=num_inference_steps,
        )
    return DDIMSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        final_alpha_cumprod=jnp.asarray(final, dtype=dtype),
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
    )


__all__ = [
    "karras_sigmas",
    "vp_sigmas",
    "vp_ablation_sigmas",
    "vp_betas_for_range",
    "ve_sigmas",
    "iddpm_sigmas",
    "iddpm_sigma_table",
    "DDIMSchedule",
    "ddim_schedule",
]

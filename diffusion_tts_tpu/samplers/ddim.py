"""Stochastic DDIM sampler (the SD backend's scheduler).

Behavioral counterpart of the vendored fork's DDIMScheduler.step with its
eta=1.0 default (reference sd/diffusers/.../scheduling_ddim.py:342-487;
the fork flips upstream's eta=0.0 to 1.0 at :347 so the per-step variance
noise becomes the searchable degree of freedom).

TPU design: the alpha-bar gathers and variance coefficients are tabulated
per inference step on host, and the step math is split from the model call
(``step_math``) so search methods can reuse one UNet forward across many
candidate variance noises — the reference instead re-runs scheduler.step
per candidate in Python (pipeline_stable_diffusion.py:1384).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.ops.schedules import DDIMSchedule, ddim_schedule

# eps_model(x, t_index_array) -> predicted noise (already CFG-combined)
EpsModelFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class StochasticDDIMSampler:
    """DDIM with eta-scaled stochastic variance injection.

    Per-step fp64 host tables:
      sqrt_a_t, sqrt_1m_a_t        (current alpha-bar terms)
      sqrt_a_prev                  (previous alpha-bar)
      dir_coef = sqrt(1 - a_prev - std^2)
      std      = eta * sqrt((1-a_prev)/(1-a_t) * (1 - a_t/a_prev))
    """

    eps_model: EpsModelFn
    num_steps: int = 50
    eta: float = 1.0
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    clip_sample: bool = False
    set_alpha_to_one: bool = False
    steps_offset: int = 1
    init_noise_sigma: float = 1.0

    def __post_init__(self):
        assert self.prediction_type in ("epsilon", "sample", "v_prediction")
        sched = ddim_schedule(
            self.num_steps,
            num_train_timesteps=self.num_train_timesteps,
            beta_start=self.beta_start,
            beta_end=self.beta_end,
            beta_schedule=self.beta_schedule,
            set_alpha_to_one=self.set_alpha_to_one,
            steps_offset=self.steps_offset,
            as_numpy=True,  # tables may be built inside a trace
        )
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        ts = np.asarray(sched.timesteps, np.int64)
        prev_ts = ts - self.num_train_timesteps // self.num_steps
        a_t = acp[ts]
        a_prev = np.where(prev_ts >= 0, acp[np.maximum(prev_ts, 0)], float(sched.final_alpha_cumprod))
        variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        std = self.eta * np.sqrt(variance)
        tab = dict(
            timesteps=ts.astype(np.int32),
            sqrt_a_t=np.sqrt(a_t),
            sqrt_1m_a_t=np.sqrt(1.0 - a_t),
            sqrt_a_prev=np.sqrt(a_prev),
            dir_coef=np.sqrt(np.maximum(1.0 - a_prev - std**2, 0.0)),
            std=std,
        )
        object.__setattr__(
            self,
            "_tab",
            {
                k: jnp.asarray(v, jnp.int32 if k == "timesteps" else jnp.float32)
                for k, v in tab.items()
            },
        )
        object.__setattr__(self, "_schedule", sched)

    @property
    def timesteps(self) -> jax.Array:
        return self._tab["timesteps"]

    @property
    def schedule(self) -> DDIMSchedule:
        return self._schedule

    def init_latents(self, z: jax.Array) -> jax.Array:
        return z.astype(jnp.float32) * self.init_noise_sigma

    def step_math(
        self, x: jax.Array, i: jax.Array, model_output: jax.Array, eps: jax.Array | None
    ) -> tuple[jax.Array, jax.Array]:
        """Scheduler step given the model output (reference
        scheduling_ddim.py:398-463). eps is the injected variance noise; None
        means deterministic (eta effectively 0 for this call — the zero-noise
        rollouts MCTS uses)."""
        tab = self._tab
        i = jnp.asarray(i, jnp.int32)
        # i may be a scalar or per-element [B]; reshape gathers to broadcast
        bc = lambda v: v.reshape(v.shape + (1,) * (x.ndim - v.ndim))
        sqrt_a_t = bc(tab["sqrt_a_t"][i])
        sqrt_1m_a_t = bc(tab["sqrt_1m_a_t"][i])
        mo = model_output.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            pred_x0 = (xf - sqrt_1m_a_t * mo) / sqrt_a_t
            pred_eps = mo
        elif self.prediction_type == "sample":
            pred_x0 = mo
            pred_eps = (xf - sqrt_a_t * pred_x0) / sqrt_1m_a_t
        else:  # v_prediction
            pred_x0 = sqrt_a_t * xf - sqrt_1m_a_t * mo
            pred_eps = sqrt_a_t * mo + sqrt_1m_a_t * xf
        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        prev = bc(tab["sqrt_a_prev"][i]) * pred_x0 + bc(tab["dir_coef"][i]) * pred_eps
        if eps is not None:
            prev = prev + bc(tab["std"][i]) * eps.astype(jnp.float32)
        return prev, pred_x0

    def step(
        self, x: jax.Array, i: jax.Array, eps: jax.Array | None
    ) -> tuple[jax.Array, jax.Array]:
        """Model forward + scheduler math: (x_next, pred_x0)."""
        t = jnp.broadcast_to(self._tab["timesteps"][jnp.asarray(i, jnp.int32)], (x.shape[0],))
        model_output = self.eps_model(x, t)
        return self.step_math(x, i, model_output, eps)

    def sample(self, z: jax.Array, eps_all: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Naive trajectory under lax.scan; eps_all [num_steps, *z.shape]."""
        x = self.init_latents(z)

        def body(x, inp):
            i, eps = inp
            x_next, pred_x0 = self.step(x, i, eps)
            return x_next, pred_x0

        idx = jnp.arange(self.num_steps, dtype=jnp.int32)
        x, pred_x0s = jax.lax.scan(body, x, (idx, eps_all))
        return x, pred_x0s[-1]


__all__ = ["StochasticDDIMSampler"]

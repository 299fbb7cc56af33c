"""EDM samplers: Heun-with-churn and the generalized ablation sampler.

Behavioral counterparts of the reference's samplers (edm/main.py:82-96 step
closure; edm/generate.py:25-60 edm_sampler; :66-176 ablation_sampler),
re-architected for TPU:

  * Every data-independent scalar (sigma schedule, churn gammas, noise
    scales, Heun coefficients) is precomputed on host in float64 — exactly
    the precision the reference uses for its sampler math — and baked into
    [num_steps] tables. The compiled program only does fp32 tensor ops and
    table gathers, so there is no data-dependent control flow inside jit.
  * ``step(x, i, eps) -> (x_next, pred_x0)`` has a uniform signature with a
    traced step index, which is what lets search methods drive it under
    ``lax.scan`` with vmapped candidate batches. The searched variable is
    ``eps`` — the churn noise injection (SURVEY.md §2b).
  * The last step masks off the 2nd-order correction with a select instead
    of Python control flow; the extra denoise at the final step is avoided
    in ``sample()`` by peeling the last iteration out of the scan.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.ops import schedules

# denoise(x, sigma[B]) -> D_x  (a preconditioned model forward)
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class EDMHeunSampler:
    """Heun 2nd-order sampler with stochastic churn (Karras Algorithm 2).

    Tables (host fp64 -> fp32 constants):
      t_steps[N+1], t_hat[N], noise_scale[N] = sqrt(t_hat^2-t^2)*S_noise,
      h[N] = t_next - t_hat, use_heun[N].
    """

    denoise: DenoiseFn
    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    S_churn: float = 0.0
    S_min: float = 0.0
    S_max: float = float("inf")
    S_noise: float = 1.0
    # Express the Heun pair as a 2-iteration lax.scan so the denoiser is
    # traced/lowered ONCE per step call site instead of twice — the same
    # math bit-for-bit, but UNet trace time and XLA program size halve.
    # Matters for large models where tracing dominates (MCTS on the 56M
    # config: 308 s of Python trace on the TPU tunnel). Off by default to
    # keep the inlined form for peak steady-state fusion.
    trace_denoise_once: bool = False

    def __post_init__(self):
        si = np.arange(self.num_steps, dtype=np.float64)
        t = (
            self.sigma_max ** (1 / self.rho)
            + si / max(self.num_steps - 1, 1)
            * (self.sigma_min ** (1 / self.rho) - self.sigma_max ** (1 / self.rho))
        ) ** self.rho
        t_steps = np.concatenate([t, [0.0]])
        gamma = np.where(
            (t_steps[:-1] >= self.S_min) & (t_steps[:-1] <= self.S_max),
            min(self.S_churn / self.num_steps, math.sqrt(2.0) - 1.0),
            0.0,
        )
        t_hat = t_steps[:-1] + gamma * t_steps[:-1]
        noise_scale = np.sqrt(np.maximum(t_hat**2 - t_steps[:-1] ** 2, 0.0)) * self.S_noise
        h = t_steps[1:] - t_hat
        object.__setattr__(self, "_t_steps", jnp.asarray(t_steps, jnp.float32))
        object.__setattr__(self, "_t_hat", jnp.asarray(t_hat, jnp.float32))
        object.__setattr__(self, "_noise_scale", jnp.asarray(noise_scale, jnp.float32))
        object.__setattr__(self, "_h", jnp.asarray(h, jnp.float32))

    @property
    def t_steps(self) -> jax.Array:
        return self._t_steps

    def init_latents(self, z: jax.Array) -> jax.Array:
        """x_0 = z * sigma_max (reference edm/main.py:99)."""
        return z.astype(jnp.float32) * self._t_steps[0]

    def step(
        self, x: jax.Array, i: jax.Array, eps: jax.Array, *, second_order: bool = True
    ) -> tuple[jax.Array, jax.Array]:
        """One churn+Euler(+Heun) step (reference edm/main.py:82-96).

        i may be traced (inside scan) and may be a scalar or a per-element
        [batch] vector (MCTS expands nodes at different depths in one call).
        Returns (x_next, denoised) where denoised is the prediction the
        reference scores (D2 when the Heun correction ran, else D1).
        """
        i = jnp.asarray(i, jnp.int32)
        bc = lambda v: v.reshape(v.shape + (1,) * (x.ndim - v.ndim))  # [B]->[B,1,1,1]
        t_hat = bc(self._t_hat[i])
        t_next = bc(self._t_steps[i + 1])
        h = bc(self._h[i])
        x_hat = x + bc(self._noise_scale[i]) * eps
        # sigma argument for the denoiser: flatten [B,1,..]/[1,..] -> [B]
        flat = lambda t: jnp.broadcast_to(t[(...,) + (0,) * (x.ndim - 1)], (x.shape[0],))
        if self.trace_denoise_once and second_order:
            is_last = bc(jnp.asarray(i >= self.num_steps - 1))
            t_next_safe = jnp.where(is_last, jnp.float32(1.0), t_next)

            def body(carry, k):
                x_in, t_in, slope_a = carry
                d = self.denoise(x_in, flat(t_in))
                slope = (x_in - d) / t_in
                is0 = k == 0
                x_eul_k = x_hat + h * slope
                carry = (
                    jnp.where(is0, x_eul_k, x_in),
                    jnp.where(is0, t_next_safe, t_in),
                    jnp.where(is0, slope, slope_a),
                )
                return carry, (d, slope)

            carry0 = (x_hat, t_hat, jnp.zeros_like(x))
            _, (ds, slopes) = jax.lax.scan(
                body, carry0, jnp.arange(2, dtype=jnp.int32)
            )
            x_eul = x_hat + h * slopes[0]
            x_heun = x_hat + h * (0.5 * slopes[0] + 0.5 * slopes[1])
            x_next = jnp.where(is_last, x_eul, x_heun)
            denoised = jnp.where(is_last, ds[0], ds[1])
            return x_next, denoised

        d1 = self.denoise(x_hat, flat(t_hat))
        d_cur = (x_hat - d1) / t_hat
        x_eul = x_hat + h * d_cur
        if not second_order:
            return x_eul, d1
        is_last = bc(jnp.asarray(i >= self.num_steps - 1))
        t_next_safe = jnp.where(is_last, jnp.float32(1.0), t_next)
        d2 = self.denoise(x_eul, flat(t_next_safe))
        d_prime = (x_eul - d2) / t_next_safe
        x_heun = x_hat + h * (0.5 * d_cur + 0.5 * d_prime)
        x_next = jnp.where(is_last, x_eul, x_heun)
        denoised = jnp.where(is_last, d1, d2)
        return x_next, denoised

    def sample(self, z: jax.Array, eps_all: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Full trajectory under lax.scan with injected noise eps_all
        [num_steps, *z.shape]; returns (x_final, pred_x0_final).

        The last step (Euler-only) is peeled out of the scan so the scan
        body's Heun pair never wastes a masked-off denoise.
        """
        x = self.init_latents(z)

        def body(x, inp):
            i, eps = inp
            x_next, _ = self.step(x, i, eps, second_order=True)
            return x_next, None

        n = self.num_steps
        idx = jnp.arange(n - 1, dtype=jnp.int32)
        x, _ = jax.lax.scan(body, x, (idx, eps_all[: n - 1]))
        x_final, denoised = self.step(
            x, jnp.asarray(n - 1, jnp.int32), eps_all[n - 1], second_order=False
        )
        return x_final, denoised


def _vp_funcs(beta_d: float, beta_min: float):
    sigma = lambda t: np.sqrt(np.expm1(0.5 * beta_d * t**2 + beta_min * t))
    sigma_deriv = lambda t: 0.5 * (beta_min + beta_d * t) * (sigma(t) + 1.0 / sigma(t))
    sigma_inv = lambda s: (
        np.sqrt(beta_min**2 + 2.0 * beta_d * np.log1p(np.asarray(s, np.float64) ** 2)) - beta_min
    ) / beta_d
    return sigma, sigma_deriv, sigma_inv


@dataclasses.dataclass(frozen=True)
class AblationSampler:
    """Generalized sampler: {vp,ve,iddpm,edm} discretization x {vp,ve,linear}
    schedule x {vp,none} scaling x {euler,heun} solver (reference
    edm/generate.py:66-176).

    All per-step scalar coefficients are closed-form functions of the static
    schedule, so they are tabulated on host in fp64:
      d_cur = c_x[i] * x_hat - c_d[i] * denoised,   x_next = x_hat + h[i]*(...)
    with c_x = sigma'/sigma + s'/s and c_d = sigma' * s / sigma at t_hat, and
    the churn injection x_hat = (s(t_hat)/s(t_cur)) x + inj[i] * eps.
    """

    denoise: DenoiseFn
    num_steps: int = 18
    sigma_min: float | None = None
    sigma_max: float | None = None
    rho: float = 7.0
    solver: str = "heun"
    discretization: str = "edm"
    schedule: str = "linear"
    scaling: str = "none"
    epsilon_s: float = 1e-3
    C_1: float = 0.001
    C_2: float = 0.008
    M: int = 1000
    alpha: float = 1.0
    S_churn: float = 0.0
    S_min: float = 0.0
    S_max: float = float("inf")
    S_noise: float = 1.0
    net_sigma_min: float = 0.0  # clamp range to what the net supports
    net_sigma_max: float = float("inf")

    def __post_init__(self):
        assert self.solver in ("euler", "heun")
        assert self.discretization in ("vp", "ve", "iddpm", "edm")
        assert self.schedule in ("vp", "ve", "linear")
        assert self.scaling in ("vp", "none")

        canon_sigma, _, _ = _vp_funcs(19.9, 0.1)
        defaults_min = {"vp": float(canon_sigma(self.epsilon_s)), "ve": 0.02, "iddpm": 0.002, "edm": 0.002}
        defaults_max = {"vp": float(canon_sigma(1.0)), "ve": 100.0, "iddpm": 81.0, "edm": 80.0}
        sigma_min = self.sigma_min if self.sigma_min is not None else defaults_min[self.discretization]
        sigma_max = self.sigma_max if self.sigma_max is not None else defaults_max[self.discretization]
        sigma_min = max(sigma_min, self.net_sigma_min)
        sigma_max = min(sigma_max, self.net_sigma_max)

        vp_beta_d, vp_beta_min = schedules.vp_betas_for_range(sigma_min, sigma_max, self.epsilon_s)

        # Discretized sigma levels (host fp64).
        if self.discretization == "vp":
            arr = schedules.vp_sigmas(
                self.num_steps, beta_d=vp_beta_d, beta_min=vp_beta_min,
                epsilon_s=self.epsilon_s, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
                append_zero=False,
            )
            sigma_steps = np.asarray(arr, np.float64)
        elif self.discretization == "ve":
            sigma_steps = np.asarray(
                schedules.ve_sigmas(self.num_steps, sigma_min, sigma_max, append_zero=False),
                np.float64,
            )
        elif self.discretization == "iddpm":
            sigma_steps = np.asarray(
                schedules.iddpm_sigmas(
                    self.num_steps, sigma_min, sigma_max, M=self.M, C_1=self.C_1,
                    C_2=self.C_2, append_zero=False,
                ),
                np.float64,
            )
        else:
            sigma_steps = np.asarray(
                schedules.karras_sigmas(self.num_steps, sigma_min, sigma_max, self.rho, append_zero=False),
                np.float64,
            )

        # Schedule / scaling function families (host fp64 closures).
        if self.schedule == "vp":
            sigma, sigma_deriv, sigma_inv = _vp_funcs(vp_beta_d, vp_beta_min)
        elif self.schedule == "ve":
            sigma = lambda t: np.sqrt(np.asarray(t, np.float64))
            sigma_deriv = lambda t: 0.5 / np.sqrt(np.asarray(t, np.float64))
            sigma_inv = lambda s: np.asarray(s, np.float64) ** 2
        else:
            sigma = lambda t: np.asarray(t, np.float64)
            sigma_deriv = lambda t: np.ones_like(np.asarray(t, np.float64))
            sigma_inv = lambda s: np.asarray(s, np.float64)
        if self.scaling == "vp":
            s_fn = lambda t: 1.0 / np.sqrt(1.0 + sigma(t) ** 2)
            s_deriv = lambda t: -sigma(t) * sigma_deriv(t) * s_fn(t) ** 3
        else:
            s_fn = lambda t: np.ones_like(np.asarray(t, np.float64))
            s_deriv = lambda t: np.zeros_like(np.asarray(t, np.float64))

        t_steps = np.concatenate([sigma_inv(sigma_steps), [0.0]])

        # Per-step scalar tables (reference :139-160, evaluated in fp64).
        t_cur = t_steps[:-1]
        t_next = t_steps[1:]
        gamma = np.where(
            (sigma(t_cur) >= self.S_min) & (sigma(t_cur) <= self.S_max),
            min(self.S_churn / self.num_steps, math.sqrt(2.0) - 1.0),
            0.0,
        )
        t_hat = sigma_inv(sigma(t_cur) + gamma * sigma(t_cur))
        x_scale = s_fn(t_hat) / s_fn(t_cur)
        inj = (
            np.sqrt(np.maximum(sigma(t_hat) ** 2 - sigma(t_cur) ** 2, 0.0))
            * s_fn(t_hat)
            * self.S_noise
        )
        h = t_next - t_hat
        t_prime = t_hat + self.alpha * h

        def coeffs(t):
            c_x = sigma_deriv(t) / sigma(t) + s_deriv(t) / s_fn(t)
            c_d = sigma_deriv(t) * s_fn(t) / sigma(t)
            return c_x, c_d

        cx_hat, cd_hat = coeffs(t_hat)
        cxp, cdp = coeffs(np.where(t_prime > 0, t_prime, 1.0))

        tables = dict(
            x_scale=x_scale, inj=inj, h=h,
            sigma_hat=sigma(t_hat), s_hat=s_fn(t_hat),
            cx_hat=cx_hat, cd_hat=cd_hat,
            sigma_prime=sigma(np.where(t_prime > 0, t_prime, 1.0)),
            s_prime=s_fn(np.where(t_prime > 0, t_prime, 1.0)),
            cx_prime=cxp, cd_prime=cdp,
        )
        object.__setattr__(
            self, "_tab", {k: jnp.asarray(v, jnp.float32) for k, v in tables.items()}
        )
        object.__setattr__(
            self, "_x0_scale", float(sigma(t_steps[0]) * s_fn(t_steps[0]))
        )

    def init_latents(self, z: jax.Array) -> jax.Array:
        return z.astype(jnp.float32) * self._x0_scale

    def step(self, x: jax.Array, i: jax.Array, eps: jax.Array) -> tuple[jax.Array, jax.Array]:
        tab = self._tab
        i = jnp.asarray(i, jnp.int32)
        bshape = (x.shape[0],)
        x_hat = tab["x_scale"][i] * x + tab["inj"][i] * eps
        d1 = self.denoise(x_hat / tab["s_hat"][i], jnp.broadcast_to(tab["sigma_hat"][i], bshape))
        d_cur = tab["cx_hat"][i] * x_hat - tab["cd_hat"][i] * d1
        h = tab["h"][i]
        x_prime = x_hat + self.alpha * h * d_cur
        x_eul = x_hat + h * d_cur
        if self.solver == "euler":
            return x_eul, d1
        is_last = i >= self.num_steps - 1
        d2 = self.denoise(
            x_prime / tab["s_prime"][i], jnp.broadcast_to(tab["sigma_prime"][i], bshape)
        )
        d_prime = tab["cx_prime"][i] * x_prime - tab["cd_prime"][i] * d2
        x_heun = x_hat + h * ((1.0 - 1.0 / (2.0 * self.alpha)) * d_cur + d_prime / (2.0 * self.alpha))
        x_next = jnp.where(is_last, x_eul, x_heun)
        return x_next, jnp.where(is_last, d1, d2)

    def sample(self, z: jax.Array, eps_all: jax.Array) -> jax.Array:
        x = self.init_latents(z)

        def body(x, inp):
            i, eps = inp
            x_next, _ = self.step(x, i, eps)
            return x_next, None

        idx = jnp.arange(self.num_steps, dtype=jnp.int32)
        x, _ = jax.lax.scan(body, x, (idx, eps_all))
        return x


__all__ = ["EDMHeunSampler", "AblationSampler"]

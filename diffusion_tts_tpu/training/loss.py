"""Diffusion training losses: VP, VE, EDM (reference training/loss.py:20-80).

Each loss is a pure function ``loss_fn(apply_fn, variables, images, labels,
key, augment_fn) -> per-pixel loss [B,H,W,C]`` — noise levels drawn from the
formulation-specific distribution, weighted denoising MSE. Images are NHWC
in [-1, 1].
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _bshape(b: int) -> tuple[int, int, int, int]:
    return (b, 1, 1, 1)


@dataclasses.dataclass(frozen=True)
class VPLoss:
    """sigma from the VP schedule at t ~ U(eps_t, 1); weight 1/sigma^2."""

    beta_d: float = 19.9
    beta_min: float = 0.1
    epsilon_t: float = 1e-5

    def sigma(self, t):
        t = jnp.asarray(t, jnp.float32)
        return jnp.sqrt(jnp.expm1(0.5 * self.beta_d * t**2 + self.beta_min * t))

    def __call__(self, denoise, images, labels, key, augment_fn=None):
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, _bshape(images.shape[0]))
        sigma = self.sigma(1.0 + u * (self.epsilon_t - 1.0))
        weight = 1.0 / sigma**2
        y, augment_labels = augment_fn(images, k3) if augment_fn else (images, None)
        n = jax.random.normal(k2, y.shape) * sigma
        d_yn = denoise(y + n, sigma.reshape(-1), labels, augment_labels)
        return weight * (d_yn - y) ** 2


@dataclasses.dataclass(frozen=True)
class VELoss:
    """log-uniform sigma in [sigma_min, sigma_max]; weight 1/sigma^2."""

    sigma_min: float = 0.02
    sigma_max: float = 100.0

    def __call__(self, denoise, images, labels, key, augment_fn=None):
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, _bshape(images.shape[0]))
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** u
        weight = 1.0 / sigma**2
        y, augment_labels = augment_fn(images, k3) if augment_fn else (images, None)
        n = jax.random.normal(k2, y.shape) * sigma
        d_yn = denoise(y + n, sigma.reshape(-1), labels, augment_labels)
        return weight * (d_yn - y) ** 2


@dataclasses.dataclass(frozen=True)
class EDMLoss:
    """ln(sigma) ~ N(P_mean, P_std^2); weight (s^2+sd^2)/(s*sd)^2."""

    P_mean: float = -1.2
    P_std: float = 1.2
    sigma_data: float = 0.5

    def __call__(self, denoise, images, labels, key, augment_fn=None):
        k1, k2, k3 = jax.random.split(key, 3)
        rnd = jax.random.normal(k1, _bshape(images.shape[0]))
        sigma = jnp.exp(rnd * self.P_std + self.P_mean)
        weight = (sigma**2 + self.sigma_data**2) / (sigma * self.sigma_data) ** 2
        y, augment_labels = augment_fn(images, k3) if augment_fn else (images, None)
        n = jax.random.normal(k2, y.shape) * sigma
        d_yn = denoise(y + n, sigma.reshape(-1), labels, augment_labels)
        return weight * (d_yn - y) ** 2


__all__ = ["VPLoss", "VELoss", "EDMLoss"]

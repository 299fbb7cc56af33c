"""Preconditioning wrappers: VP, VE, iDDPM, EDM.

Behavioral counterparts of the reference's preconditioners
(edm/training/networks.py:469-671). Each wraps an inner UNet and exposes
``D(x; sigma) = c_skip*x + c_out*F(c_in*x, c_noise)`` with formulation-
specific scalings. Precond math runs in fp32; the inner model runs at the
module's compute dtype (bf16 on TPU by default in production configs).

x is NHWC [B, H, W, C]; sigma is scalar or [B].
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_tts_tpu.models.edm_nets import DhariwalUNet, SongUNet
from diffusion_tts_tpu.ops.schedules import iddpm_sigma_table

Dtype = Any

_MODEL_TYPES = {"SongUNet": SongUNet, "DhariwalUNet": DhariwalUNet}


def _make_model(model_type: str, img_resolution: int, img_channels: int,
                out_channels: int, label_dim: int, model_kwargs: dict, dtype):
    cls = _MODEL_TYPES[model_type]
    return cls(
        img_resolution=img_resolution,
        in_channels=img_channels,
        out_channels=out_channels,
        label_dim=label_dim,
        dtype=dtype,
        **model_kwargs,
    )


def _prep(x, sigma, class_labels, label_dim):
    x = x.astype(jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
    if label_dim == 0:
        class_labels = None
    elif class_labels is None:
        class_labels = jnp.zeros((1, label_dim), jnp.float32)
    else:
        class_labels = class_labels.astype(jnp.float32).reshape(-1, label_dim)
    return x, sigma, class_labels


class VPPrecond(nn.Module):
    """VP preconditioning (reference networks.py:469-520)."""

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    beta_d: float = 19.9
    beta_min: float = 0.1
    M: int = 1000
    epsilon_t: float = 1e-5
    model_type: str = "SongUNet"
    model_kwargs: dict = None  # type: ignore[assignment]
    dtype: Dtype = jnp.float32

    def setup(self):
        self.model = _make_model(
            self.model_type, self.img_resolution, self.img_channels,
            self.img_channels, self.label_dim, self.model_kwargs or {}, self.dtype,
        )

    @property
    def sigma_min(self) -> float:
        return float(self.sigma(self.epsilon_t))

    @property
    def sigma_max(self) -> float:
        return float(self.sigma(1.0))

    def sigma(self, t):
        t = jnp.asarray(t, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def sigma_inv(self, sigma):
        sigma = jnp.asarray(sigma, jnp.float32)
        return (
            jnp.sqrt(self.beta_min**2 + 2.0 * self.beta_d * jnp.log1p(sigma**2))
            - self.beta_min
        ) / self.beta_d

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, jnp.float32)

    def __call__(self, x, sigma, class_labels=None, augment_labels=None, *, train=False):
        x, sigma, class_labels = _prep(x, sigma, class_labels, self.label_dim)
        c_skip = 1.0
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = (self.M - 1) * self.sigma_inv(sigma)
        f = self.model(
            (c_in * x).astype(self.dtype), c_noise.reshape(-1),
            class_labels=class_labels, augment_labels=augment_labels, train=train,
        )
        return c_skip * x + c_out * f.astype(jnp.float32)


class VEPrecond(nn.Module):
    """VE preconditioning (reference networks.py:528-565)."""

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    sigma_min: float = 0.02
    sigma_max: float = 100.0
    model_type: str = "SongUNet"
    model_kwargs: dict = None  # type: ignore[assignment]
    dtype: Dtype = jnp.float32

    def setup(self):
        self.model = _make_model(
            self.model_type, self.img_resolution, self.img_channels,
            self.img_channels, self.label_dim, self.model_kwargs or {}, self.dtype,
        )

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, jnp.float32)

    def __call__(self, x, sigma, class_labels=None, augment_labels=None, *, train=False):
        x, sigma, class_labels = _prep(x, sigma, class_labels, self.label_dim)
        c_out = sigma
        c_noise = jnp.log(0.5 * sigma)
        f = self.model(
            x.astype(self.dtype), c_noise.reshape(-1),
            class_labels=class_labels, augment_labels=augment_labels, train=train,
        )
        return x + c_out * f.astype(jnp.float32)


class iDDPMPrecond(nn.Module):
    """iDDPM preconditioning (reference networks.py:572-625). The inner model
    emits 2x channels (mean + learned variance); only the mean half feeds
    D_x. c_noise is the nearest u-table index, M-1-j."""

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    C_1: float = 0.001
    C_2: float = 0.008
    M: int = 1000
    model_type: str = "DhariwalUNet"
    model_kwargs: dict = None  # type: ignore[assignment]
    dtype: Dtype = jnp.float32

    def setup(self):
        self.model = _make_model(
            self.model_type, self.img_resolution, self.img_channels,
            self.img_channels * 2, self.label_dim, self.model_kwargs or {}, self.dtype,
        )
        self.u = jnp.asarray(
            iddpm_sigma_table(M=self.M, C_1=self.C_1, C_2=self.C_2), jnp.float32
        )

    @property
    def sigma_min(self) -> float:
        return float(self.u[self.M - 1])

    @property
    def sigma_max(self) -> float:
        return float(self.u[0])

    def round_sigma(self, sigma, return_index: bool = False):
        sigma = jnp.asarray(sigma, jnp.float32)
        idx = jnp.argmin(
            jnp.abs(sigma.reshape(-1, 1) - self.u.reshape(1, -1)), axis=1
        )
        result = idx if return_index else self.u[idx]
        return result.reshape(jnp.shape(sigma))

    def __call__(self, x, sigma, class_labels=None, augment_labels=None, *, train=False):
        x, sigma, class_labels = _prep(x, sigma, class_labels, self.label_dim)
        c_out = -sigma
        c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        c_noise = (self.M - 1 - self.round_sigma(sigma, return_index=True)).astype(jnp.float32)
        f = self.model(
            (c_in * x).astype(self.dtype), c_noise.reshape(-1),
            class_labels=class_labels, augment_labels=augment_labels, train=train,
        )
        return x + c_out * f[..., : self.img_channels].astype(jnp.float32)


class EDMPrecond(nn.Module):
    """EDM preconditioning (reference networks.py:632-671):
    c_skip=sd^2/(s^2+sd^2), c_out=s*sd/sqrt(s^2+sd^2), c_in=1/sqrt(sd^2+s^2),
    c_noise=ln(s)/4."""

    img_resolution: int
    img_channels: int
    label_dim: int = 0
    sigma_min: float = 0.0
    sigma_max: float = float("inf")
    sigma_data: float = 0.5
    model_type: str = "DhariwalUNet"
    model_kwargs: dict = None  # type: ignore[assignment]
    dtype: Dtype = jnp.float32

    def setup(self):
        self.model = _make_model(
            self.model_type, self.img_resolution, self.img_channels,
            self.img_channels, self.label_dim, self.model_kwargs or {}, self.dtype,
        )

    def round_sigma(self, sigma):
        return jnp.asarray(sigma, jnp.float32)

    def __call__(self, x, sigma, class_labels=None, augment_labels=None, *, train=False):
        x, sigma, class_labels = _prep(x, sigma, class_labels, self.label_dim)
        sd = self.sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
        c_in = 1.0 / jnp.sqrt(sd**2 + sigma**2)
        c_noise = jnp.log(sigma) / 4.0
        f = self.model(
            (c_in * x).astype(self.dtype), c_noise.reshape(-1),
            class_labels=class_labels, augment_labels=augment_labels, train=train,
        )
        return c_skip * x + c_out * f.astype(jnp.float32)


__all__ = ["VPPrecond", "VEPrecond", "iDDPMPrecond", "EDMPrecond"]

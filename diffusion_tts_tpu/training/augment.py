"""Non-leaky augmentation pipeline with conditioning labels.

Behavioral counterpart of the reference AugmentPipe
(edm/training/augment.py:115-330): per-sample probabilistic pixel blits
(x/y-flip, integer rotate/translate), geometric transforms composed as a
3x3 inverse matrix (isotropic/anisotropic scale, fractional rotation/
translation), and color transforms as a 4x4 matrix (brightness, contrast,
lumaflip, hue, saturation). Returns (augmented images, label vector) whose
layout matches the reference exactly — the labels condition the network
(augment_dim=9 for the EDM config: xflip, yflip, scale, rotate_frac x2,
aniso x2, translate_frac x2; edm/train.py:144-146).

Divergence (documented): the reference anti-aliases the geometric warp with
sym6 wavelet up/down-sampling around grid_sample (augment.py:230-273); here
the warp is a direct bilinear resampling (jnp gather math). Augmentation is
stochastic regularization — the label semantics, probabilities, and
transform algebra are what training parity requires, not the interpolation
kernel.

Everything is batched jnp under jit; NHWC.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


def _translate2d(tx, ty):
    o = jnp.ones_like(tx)
    z = jnp.zeros_like(tx)
    return jnp.stack([
        jnp.stack([o, z, tx], -1),
        jnp.stack([z, o, ty], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([
        jnp.stack([sx, z, z], -1),
        jnp.stack([z, sy, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _rotate2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([
        jnp.stack([c, -s, z], -1),
        jnp.stack([s, c, z], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def _translate3d(bx, by, bz):
    o = jnp.ones_like(bx)
    z = jnp.zeros_like(bx)
    rows = [
        jnp.stack([o, z, z, bx], -1),
        jnp.stack([z, o, z, by], -1),
        jnp.stack([z, z, o, bz], -1),
        jnp.stack([z, z, z, o], -1),
    ]
    return jnp.stack(rows, -2)


def _scale3d(sx, sy, sz):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    rows = [
        jnp.stack([sx, z, z, z], -1),
        jnp.stack([z, sy, z, z], -1),
        jnp.stack([z, z, sz, z], -1),
        jnp.stack([z, z, z, o], -1),
    ]
    return jnp.stack(rows, -2)


def _rotate3d_about(axis, theta):
    """Rotation about a unit 3-vector embedded in homogeneous 4x4."""
    vx, vy, vz = axis[0], axis[1], axis[2]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    cc = 1.0 - c
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    rows = [
        jnp.stack([vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, z], -1),
        jnp.stack([vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, z], -1),
        jnp.stack([vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, z], -1),
        jnp.stack([z, z, z, o], -1),
    ]
    return jnp.stack(rows, -2)


def _bilinear_warp(images: jax.Array, g_inv: jax.Array) -> jax.Array:
    """Apply per-sample inverse affine (pixel-centered coords) with bilinear
    sampling and zero padding. images NHWC, g_inv [B, 3, 3]."""
    b, h, w, c = images.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) - cy,
        jnp.arange(w, dtype=jnp.float32) - cx,
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs, ys, ones], 0).reshape(3, -1)  # [3, H*W]
    src = jnp.einsum("bij,jk->bik", g_inv, coords)  # [B, 3, H*W]
    sx = src[:, 0] + cx
    sy = src[:, 1] + cy

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = images.reshape(b, h * w, c)
        idx = yy * w + xx
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy + v11 * fx * fy
    )
    return out.reshape(b, h, w, c)


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    p: float = 1.0
    xflip: float = 0.0
    yflip: float = 0.0
    rotate_int: float = 0.0
    translate_int: float = 0.0
    translate_int_max: float = 0.125
    scale: float = 0.0
    rotate_frac: float = 0.0
    aniso: float = 0.0
    translate_frac: float = 0.0
    scale_std: float = 0.2
    rotate_frac_max: float = 1.0
    aniso_std: float = 0.2
    aniso_rotate_prob: float = 0.5
    translate_frac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0

    def __call__(self, images: jax.Array, key: jax.Array):
        n, h, w, c = images.shape
        keys = iter(jax.random.split(key, 24))
        labels = []

        def maybe(kp, prob_mult, val, zero):
            keep = jax.random.uniform(kp, val.shape[:1] + (1,) * (val.ndim - 1)) < prob_mult * self.p
            return jnp.where(keep, val, zero)

        # Pixel blits (augment.py:160-196).
        if self.xflip > 0:
            wv = jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32)
            wv = maybe(next(keys), self.xflip, wv, jnp.zeros_like(wv))
            images = jnp.where(wv.reshape(-1, 1, 1, 1) == 1, images[:, :, ::-1, :], images)
            labels.append(wv[:, None])
        if self.yflip > 0:
            wv = jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32)
            wv = maybe(next(keys), self.yflip, wv, jnp.zeros_like(wv))
            images = jnp.where(wv.reshape(-1, 1, 1, 1) == 1, images[:, ::-1, :, :], images)
            labels.append(wv[:, None])
        if self.rotate_int > 0:
            wv = jax.random.randint(next(keys), (n,), 0, 4).astype(jnp.float32)
            wv = maybe(next(keys), self.rotate_int, wv, jnp.zeros_like(wv))
            m = wv.reshape(-1, 1, 1, 1)
            images = jnp.where((m == 1) | (m == 2), images[:, :, ::-1, :], images)
            images = jnp.where((m == 2) | (m == 3), images[:, ::-1, :, :], images)
            images = jnp.where(
                (m == 1) | (m == 3), jnp.swapaxes(images, 1, 2), images
            )
            labels += [((wv == 1) | (wv == 2)).astype(jnp.float32)[:, None],
                       ((wv == 2) | (wv == 3)).astype(jnp.float32)[:, None]]
        if self.translate_int > 0:
            wv = jax.random.uniform(next(keys), (2, n)) * 2 - 1
            wv = jnp.where(
                jax.random.uniform(next(keys), (1, n)) < self.translate_int * self.p,
                wv, jnp.zeros_like(wv),
            )
            tx = jnp.round(wv[0] * (w * self.translate_int_max)).astype(jnp.int32)
            ty = jnp.round(wv[1] * (h * self.translate_int_max)).astype(jnp.int32)
            ys = jnp.arange(h)[None, :, None]
            xs = jnp.arange(w)[None, None, :]
            # mirror-wrap indexing (augment.py:189-192)
            xi = (w - 1) - jnp.abs((w - 1) - (xs - tx[:, None, None]) % (w * 2 - 2))
            yi = (h - 1) - jnp.abs((h - 1) - (ys + ty[:, None, None]) % (h * 2 - 2))
            flat = images.reshape(n, h * w, c)
            idx = (yi * w + xi).reshape(n, h * w)
            images = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(n, h, w, c)
            labels += [(tx / (w * self.translate_int_max))[:, None],
                       (ty / (h * self.translate_int_max))[:, None]]

        # Geometric transform parameters (augment.py:200-227).
        g_inv = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        use_geom = False
        if self.scale > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = maybe(next(keys), self.scale, wv, jnp.zeros_like(wv))
            s = jnp.exp2(wv * self.scale_std)
            g_inv = g_inv @ _scale2d(1 / s, 1 / s)
            labels.append(wv[:, None])
            use_geom = True
        if self.rotate_frac > 0:
            wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (math.pi * self.rotate_frac_max)
            wv = maybe(next(keys), self.rotate_frac, wv, jnp.zeros_like(wv))
            g_inv = g_inv @ _rotate2d(wv)  # rotate2d_inv(-w) == rotate2d(w)
            labels += [(jnp.cos(wv) - 1)[:, None], jnp.sin(wv)[:, None]]
            use_geom = True
        if self.aniso > 0:
            wv = jax.random.normal(next(keys), (n,))
            r = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * math.pi
            wv = maybe(next(keys), self.aniso, wv, jnp.zeros_like(wv))
            r = jnp.where(
                jax.random.uniform(next(keys), (n,)) < self.aniso_rotate_prob,
                r, jnp.zeros_like(r),
            )
            s = jnp.exp2(wv * self.aniso_std)
            g_inv = g_inv @ _rotate2d(-r) @ _scale2d(1 / s, s) @ _rotate2d(r)
            labels += [(wv * jnp.cos(r))[:, None], (wv * jnp.sin(r))[:, None]]
            use_geom = True
        if self.translate_frac > 0:
            wv = jax.random.normal(next(keys), (2, n))
            wv = jnp.where(
                jax.random.uniform(next(keys), (1, n)) < self.translate_frac * self.p,
                wv, jnp.zeros_like(wv),
            )
            g_inv = g_inv @ _translate2d(
                -wv[0] * (w * self.translate_frac_std), -wv[1] * (h * self.translate_frac_std)
            )
            labels += [wv[0][:, None], wv[1][:, None]]
            use_geom = True

        if use_geom:
            images = _bilinear_warp(images, g_inv)

        # Color transforms (augment.py:277-318).
        m = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        use_color = False
        luma = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3.0)
        if self.brightness > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = maybe(next(keys), self.brightness, wv, jnp.zeros_like(wv))
            bshift = wv * self.brightness_std
            m = _translate3d(bshift, bshift, bshift) @ m
            labels.append(wv[:, None])
            use_color = True
        if self.contrast > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = maybe(next(keys), self.contrast, wv, jnp.zeros_like(wv))
            cs = jnp.exp2(wv * self.contrast_std)
            m = _scale3d(cs, cs, cs) @ m
            labels.append(wv[:, None])
            use_color = True
        if self.lumaflip > 0:
            wv = jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32)
            wv = maybe(next(keys), self.lumaflip, wv, jnp.zeros_like(wv))
            outer = jnp.outer(luma, luma)
            m = (jnp.eye(4) - 2.0 * outer * wv[:, None, None]) @ m
            labels.append(wv[:, None])
            use_color = True
        if self.hue > 0:
            wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (math.pi * self.hue_max)
            wv = maybe(next(keys), self.hue, wv, jnp.zeros_like(wv))
            m = _rotate3d_about(luma[:3] / jnp.linalg.norm(luma[:3]), wv) @ m
            labels += [(jnp.cos(wv) - 1)[:, None], jnp.sin(wv)[:, None]]
            use_color = True
        if self.saturation > 0:
            wv = jax.random.normal(next(keys), (n,))
            wv = maybe(next(keys), self.saturation, wv, jnp.zeros_like(wv))
            outer = jnp.outer(luma, luma)
            m = (outer + (jnp.eye(4) - outer) * jnp.exp2(wv * self.saturation_std)[:, None, None]) @ m
            labels.append(wv[:, None])
            use_color = True

        if use_color:
            flat = images.reshape(n, h * w, c)
            if c == 3:
                flat = jnp.einsum("nij,npj->npi", m[:, :3, :3], flat) + m[:, None, :3, 3]
            elif c == 1:
                mm = m[:, :3, :].mean(axis=1, keepdims=True)  # [n,1,4]
                flat = flat * mm[:, :, :3].sum(-1, keepdims=True) + mm[:, :, 3:]
            else:
                raise ValueError("images must have 1 or 3 channels")
            images = flat.reshape(n, h, w, c)

        label_vec = (
            jnp.concatenate(labels, axis=1).astype(jnp.float32)
            if labels else jnp.zeros((n, 0), jnp.float32)
        )
        return images, label_vec

    @property
    def label_dim(self) -> int:
        dim = 0
        for attr, width in (
            ("xflip", 1), ("yflip", 1), ("rotate_int", 2), ("translate_int", 2),
            ("scale", 1), ("rotate_frac", 2), ("aniso", 2), ("translate_frac", 2),
            ("brightness", 1), ("contrast", 1), ("lumaflip", 1), ("hue", 2),
            ("saturation", 1),
        ):
            if getattr(self, attr) > 0:
                dim += width
        return dim


def edm_augment_pipe(p: float = 0.12) -> AugmentPipe:
    """The EDM training configuration (train.py:144-146): 9 label dims."""
    return AugmentPipe(
        p=p, xflip=1e8, yflip=1, scale=1, rotate_frac=1, aniso=1, translate_frac=1
    )


__all__ = ["AugmentPipe", "edm_augment_pipe"]

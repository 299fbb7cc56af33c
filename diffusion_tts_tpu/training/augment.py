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

The geometric warp is the reference's sym6-wavelet anti-aliased resampling
(augment.py:230-273): reflect-pad, wavelet-filtered 2x upsample, bilinear
grid sample in normalized coordinates, wavelet-filtered 2x downsample.
TPU re-architecture: the reference's data-dependent pad margins (clamped to
[0, W-1], augment.py:239-244) become the static clamp ceiling — any sample
position not covered by the tight margin is never read, so padding at the
ceiling is value-identical and keeps every shape static for XLA; the
zero-interleaved upsample becomes an lhs_dilation=2 depthwise conv.
``filtered=False`` selects the cheaper direct bilinear warp (a documented
divergence — useful when augmentation bandwidth matters more than exact
kernel parity).

Everything is batched jnp under jit; NHWC.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

# sym6 wavelet low-pass decomposition filter (public constant table; same
# coefficients as the reference's wavelets['sym6'], augment.py:35)
_SYM6 = np.asarray([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
], dtype=np.float32)


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


def _dw_conv1d(x: jax.Array, taps: jax.Array, *, axis: str, stride: int = 1,
               lhs_dil: int = 1, pad: int = 0) -> jax.Array:
    """Depthwise 1-D correlation along H or W of an NHWC batch (the separable
    wavelet passes; lhs_dil=2 realizes the reference's zero-interleave
    upsample, augment.py:253-256, as one dilated conv)."""
    c = x.shape[-1]
    k = taps.shape[0]
    if axis == "w":
        kern = jnp.tile(taps.reshape(1, k, 1, 1), (1, 1, 1, c))
        strides, dil, padding = (1, stride), (1, lhs_dil), [(0, 0), (pad, pad)]
    else:
        kern = jnp.tile(taps.reshape(k, 1, 1, 1), (1, 1, 1, c))
        strides, dil, padding = (stride, 1), (lhs_dil, 1), [(pad, pad), (0, 0)]
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), window_strides=strides, padding=padding,
        lhs_dilation=dil, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _grid_sample_zeros(images: jax.Array, theta: jax.Array,
                       out_h: int, out_w: int) -> jax.Array:
    """Bilinear sampling with zero padding in align_corners=False normalized
    coordinates (torch affine_grid + grid_sample semantics,
    augment.py:263-264). images NHWC, theta [B, 3, 3] output-normalized ->
    input-normalized."""
    b, h, w, c = images.shape
    ys = (2.0 * jnp.arange(out_h, dtype=jnp.float32) + 1.0) / out_h - 1.0
    xs = (2.0 * jnp.arange(out_w, dtype=jnp.float32) + 1.0) / out_w - 1.0
    vo, uo = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([uo, vo, jnp.ones_like(uo)], 0).reshape(3, -1)  # [3, P]
    src = jnp.einsum("bij,jk->bik", theta, coords)  # [B, 3, P]
    sx = ((src[:, 0] + 1.0) * w - 1.0) / 2.0
    sy = ((src[:, 1] + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    flat = images.reshape(b, h * w, c)

    def gather(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(flat, (yi * w + xi)[..., None], axis=1)
        return vals * valid[..., None]

    out = (
        gather(y0, x0) * (1 - fx) * (1 - fy)
        + gather(y0, x0 + 1) * fx * (1 - fy)
        + gather(y0 + 1, x0) * (1 - fx) * fy
        + gather(y0 + 1, x0 + 1) * fx * fy
    )
    return out.reshape(b, out_h, out_w, c)


def _filtered_warp(images: jax.Array, g_inv: jax.Array) -> jax.Array:
    """The reference's anti-aliased geometric warp (augment.py:232-270):
    reflect-pad -> sym6 2x upsample -> grid sample -> sym6 2x downsample ->
    crop. Margins are the static worst case (the reference's per-batch tight
    margins are clamped to [0, W-1]; every position the tight margin covers
    is covered here, and positions outside it are never sampled), so all
    shapes are XLA-static."""
    n, h, w, c = images.shape
    hz = _SYM6
    hz_pad = len(hz) // 4  # 3
    mx, my = w - 1, h - 1  # static margin ceiling (augment.py:243)
    images = jnp.pad(images, ((0, 0), (my, my), (mx, mx), (0, 0)), mode="reflect")
    # symmetric margins: the reference's (mx0-mx1)/2 origin shift is zero
    ph, pw = images.shape[1], images.shape[2]

    # Upsample 2x (augment.py:251-256): zero-interleave + correlate Hz[::-1],
    # width then height.
    k_up = jnp.asarray(hz[::-1].copy())
    pad_up = (len(hz) + 1) // 2
    images = _dw_conv1d(images, k_up, axis="w", lhs_dil=2, pad=pad_up)
    images = _dw_conv1d(images, k_up, axis="h", lhs_dil=2, pad=pad_up)
    up_h, up_w = images.shape[1], images.shape[2]

    # Coordinate bookkeeping (augment.py:257-262), folded into constant 3x3s:
    # theta = scale2d(2/up_w, 2/up_h) @ t(-.5,-.5) @ scale2d(2,2) @ G_inv
    #         @ scale2d(.5,.5) @ t(.5,.5) @ scale2d(out_w/2, out_h/2)
    out_h, out_w = (h + hz_pad * 2) * 2, (w + hz_pad * 2) * 2

    def t2(tx, ty):
        return np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], np.float32)

    def s2(sx, sy):
        return np.diag([sx, sy, 1.0]).astype(np.float32)

    a_const = s2(2.0 / up_w, 2.0 / up_h) @ t2(-0.5, -0.5) @ s2(2.0, 2.0)
    b_const = s2(0.5, 0.5) @ t2(0.5, 0.5) @ s2(out_w / 2.0, out_h / 2.0)
    theta = jnp.einsum("ij,bjk,kl->bil", jnp.asarray(a_const),
                       g_inv.astype(jnp.float32), jnp.asarray(b_const))
    images = _grid_sample_zeros(images, theta, out_h, out_w)

    # Downsample 2x + crop (augment.py:267-270): correlate Hz stride 2,
    # width then height.
    k_down = jnp.asarray(hz)
    pad_down = (len(hz) - 1) // 2
    images = _dw_conv1d(images, k_down, axis="w", stride=2, pad=pad_down)
    images = images[:, :, hz_pad:-hz_pad, :]
    images = _dw_conv1d(images, k_down, axis="h", stride=2, pad=pad_down)
    images = images[:, hz_pad:-hz_pad, :, :]
    return images


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
    # True = the reference's sym6-filtered anti-aliased warp; False = plain
    # bilinear (cheaper, documented divergence)
    filtered: bool = True

    def __call__(self, images: jax.Array, key: jax.Array, *,
                 draws: dict | None = None):
        """draws: optional {name: post-gate parameter values} overriding the
        keyed draws (names: xflip, yflip, rotate_int, translate_int, scale,
        rotate_frac, aniso_w, aniso_r, translate_frac, brightness, contrast,
        lumaflip, hue, saturation). Injecting a field skips its key draws, so
        partial injection shifts the key stream of later fields — inject all
        active fields for cross-implementation parity runs."""
        n, h, w, c = images.shape
        keys = iter(jax.random.split(key, 24))
        labels = []
        draws = draws or {}

        def maybe(kp, prob_mult, val, zero):
            keep = jax.random.uniform(kp, val.shape[:1] + (1,) * (val.ndim - 1)) < prob_mult * self.p
            return jnp.where(keep, val, zero)

        def inj(name, draw_fn):
            # injected values are post-gate parameters; fall back to the
            # keyed draw + probability gate
            if name in draws:
                return jnp.asarray(draws[name], jnp.float32)
            return draw_fn()

        # Pixel blits (augment.py:160-196).
        if self.xflip > 0:
            def _xflip():
                wv = jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32)
                return maybe(next(keys), self.xflip, wv, jnp.zeros_like(wv))
            wv = inj("xflip", _xflip)
            images = jnp.where(wv.reshape(-1, 1, 1, 1) == 1, images[:, :, ::-1, :], images)
            labels.append(wv[:, None])
        if self.yflip > 0:
            def _yflip():
                wv = jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32)
                return maybe(next(keys), self.yflip, wv, jnp.zeros_like(wv))
            wv = inj("yflip", _yflip)
            images = jnp.where(wv.reshape(-1, 1, 1, 1) == 1, images[:, ::-1, :, :], images)
            labels.append(wv[:, None])
        if self.rotate_int > 0:
            def _rotate_int():
                wv = jax.random.randint(next(keys), (n,), 0, 4).astype(jnp.float32)
                return maybe(next(keys), self.rotate_int, wv, jnp.zeros_like(wv))
            wv = inj("rotate_int", _rotate_int)
            m = wv.reshape(-1, 1, 1, 1)
            images = jnp.where((m == 1) | (m == 2), images[:, :, ::-1, :], images)
            images = jnp.where((m == 2) | (m == 3), images[:, ::-1, :, :], images)
            images = jnp.where(
                (m == 1) | (m == 3), jnp.swapaxes(images, 1, 2), images
            )
            labels += [((wv == 1) | (wv == 2)).astype(jnp.float32)[:, None],
                       ((wv == 2) | (wv == 3)).astype(jnp.float32)[:, None]]
        if self.translate_int > 0:
            def _translate_int():
                wv = jax.random.uniform(next(keys), (2, n)) * 2 - 1
                return jnp.where(
                    jax.random.uniform(next(keys), (1, n)) < self.translate_int * self.p,
                    wv, jnp.zeros_like(wv),
                )
            wv = inj("translate_int", _translate_int)
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
            def _scale():
                wv = jax.random.normal(next(keys), (n,))
                return maybe(next(keys), self.scale, wv, jnp.zeros_like(wv))
            wv = inj("scale", _scale)
            s = jnp.exp2(wv * self.scale_std)
            g_inv = g_inv @ _scale2d(1 / s, 1 / s)
            labels.append(wv[:, None])
            use_geom = True
        if self.rotate_frac > 0:
            def _rotate_frac():
                wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (math.pi * self.rotate_frac_max)
                return maybe(next(keys), self.rotate_frac, wv, jnp.zeros_like(wv))
            wv = inj("rotate_frac", _rotate_frac)
            g_inv = g_inv @ _rotate2d(wv)  # rotate2d_inv(-w) == rotate2d(w)
            labels += [(jnp.cos(wv) - 1)[:, None], jnp.sin(wv)[:, None]]
            use_geom = True
        if self.aniso > 0:
            def _aniso():
                wv = jax.random.normal(next(keys), (n,))
                r = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * math.pi
                wv = maybe(next(keys), self.aniso, wv, jnp.zeros_like(wv))
                r = jnp.where(
                    jax.random.uniform(next(keys), (n,)) < self.aniso_rotate_prob,
                    r, jnp.zeros_like(r),
                )
                return wv, r
            if "aniso_w" in draws:
                wv = jnp.asarray(draws["aniso_w"], jnp.float32)
                r = jnp.asarray(draws["aniso_r"], jnp.float32)
            else:
                wv, r = _aniso()
            s = jnp.exp2(wv * self.aniso_std)
            g_inv = g_inv @ _rotate2d(-r) @ _scale2d(1 / s, s) @ _rotate2d(r)
            labels += [(wv * jnp.cos(r))[:, None], (wv * jnp.sin(r))[:, None]]
            use_geom = True
        if self.translate_frac > 0:
            def _translate_frac():
                wv = jax.random.normal(next(keys), (2, n))
                return jnp.where(
                    jax.random.uniform(next(keys), (1, n)) < self.translate_frac * self.p,
                    wv, jnp.zeros_like(wv),
                )
            wv = inj("translate_frac", _translate_frac)
            g_inv = g_inv @ _translate2d(
                -wv[0] * (w * self.translate_frac_std), -wv[1] * (h * self.translate_frac_std)
            )
            labels += [wv[0][:, None], wv[1][:, None]]
            use_geom = True

        if use_geom:
            images = (_filtered_warp if self.filtered else _bilinear_warp)(
                images, g_inv)

        # Color transforms (augment.py:277-318).
        m = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        use_color = False
        luma = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3.0)
        if self.brightness > 0:
            def _brightness():
                wv = jax.random.normal(next(keys), (n,))
                return maybe(next(keys), self.brightness, wv, jnp.zeros_like(wv))
            wv = inj("brightness", _brightness)
            bshift = wv * self.brightness_std
            m = _translate3d(bshift, bshift, bshift) @ m
            labels.append(wv[:, None])
            use_color = True
        if self.contrast > 0:
            def _contrast():
                wv = jax.random.normal(next(keys), (n,))
                return maybe(next(keys), self.contrast, wv, jnp.zeros_like(wv))
            wv = inj("contrast", _contrast)
            cs = jnp.exp2(wv * self.contrast_std)
            m = _scale3d(cs, cs, cs) @ m
            labels.append(wv[:, None])
            use_color = True
        if self.lumaflip > 0:
            def _lumaflip():
                wv = jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32)
                return maybe(next(keys), self.lumaflip, wv, jnp.zeros_like(wv))
            wv = inj("lumaflip", _lumaflip)
            outer = jnp.outer(luma, luma)
            m = (jnp.eye(4) - 2.0 * outer * wv[:, None, None]) @ m
            labels.append(wv[:, None])
            use_color = True
        if self.hue > 0:
            def _hue():
                wv = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * (math.pi * self.hue_max)
                return maybe(next(keys), self.hue, wv, jnp.zeros_like(wv))
            wv = inj("hue", _hue)
            m = _rotate3d_about(luma[:3] / jnp.linalg.norm(luma[:3]), wv) @ m
            labels += [(jnp.cos(wv) - 1)[:, None], jnp.sin(wv)[:, None]]
            use_color = True
        if self.saturation > 0:
            def _saturation():
                wv = jax.random.normal(next(keys), (n,))
                return maybe(next(keys), self.saturation, wv, jnp.zeros_like(wv))
            wv = inj("saturation", _saturation)
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

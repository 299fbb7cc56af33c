"""JPEG-compressibility reward.

Reference semantics (edm/scorers.py:176-244, sd/scorers.py:78-147): encode
to JPEG at quality=80, score = 1 - clip((size - min)/(max - min)); max_size
is 3000 bytes for EDM 64x64 and 150000 for SD 512x512.

Two execution modes:
  * mode="jpeg": exact parity — a host callback (jax.pure_callback) runs a
    real JPEG encoder (PIL) per batch. This is the one host-bound reward in
    the system (SURVEY.md §7 design delta 3).
  * mode="dct": fully on-device differentiable-friendly proxy — 8x8 block
    DCT (two small matmuls, MXU-friendly) + standard JPEG quantization
    tables + an entropy surrogate (sum log2(1+|q|)) calibrated to bytes.
    Use inside compiled search loops; cross-check against mode="jpeg".
"""
from __future__ import annotations

import functools
import io
import warnings

import jax
import jax.numpy as jnp
import numpy as np

# Standard Annex-K JPEG quantization tables.
_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)
_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], np.float32)


def _scaled_q(table: np.ndarray, quality: int) -> np.ndarray:
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    q = np.floor((table * scale + 50.0) / 100.0)
    return np.clip(q, 1.0, 255.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dct_matrix() -> np.ndarray:
    n = 8
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


def _rgb_to_ycbcr(x: jax.Array) -> jax.Array:
    """JPEG YCbCr from [0,255] RGB."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return jnp.stack([y, cb, cr], axis=-1)


def _block_dct(channel: jax.Array) -> jax.Array:
    """[B, H, W] -> [B, H/8*W/8, 8, 8] DCT-II coefficients."""
    b, h, w = channel.shape
    x = channel.reshape(b, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    x = x.reshape(b, -1, 8, 8)
    m = jnp.asarray(_dct_matrix())
    return jnp.einsum("ij,bnjk,lk->bnil", m, x, m, preferred_element_type=jnp.float32)


def jpeg_proxy_bits(images01: jax.Array, quality: int = 80) -> jax.Array:
    """Entropy surrogate for JPEG size, in 'bit units': sum over quantized
    coefficients of log2(1+|q|). Monotone in real JPEG size for natural
    images; calibrated to bytes by the caller's max_size normalization."""
    x = images01.astype(jnp.float32) * 255.0
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    ycc = _rgb_to_ycbcr(x) - 128.0
    lq = jnp.asarray(_scaled_q(_LUMA_Q, quality))
    cq = jnp.asarray(_scaled_q(_CHROMA_Q, quality))
    bits = jnp.zeros(x.shape[0], jnp.float32)
    for c, q in ((0, lq), (1, cq), (2, cq)):
        coef = _block_dct(ycc[..., c])
        qc = jnp.round(coef / q)
        bits = bits + jnp.sum(jnp.log2(1.0 + jnp.abs(qc)), axis=(1, 2, 3))
    return bits


@functools.lru_cache(maxsize=None)
def _callbacks_supported() -> bool:
    """Some PJRT backends (the axon TPU tunnel) reject host send/recv
    callbacks entirely; probe once with a trivial pure_callback. Must run
    OUTSIDE any trace (a probe attempted mid-trace fails spuriously and
    would poison the cache), so the scorer probes at construction time."""
    try:
        probe = jax.jit(
            lambda x: jax.pure_callback(
                lambda a: a, jax.ShapeDtypeStruct((), jnp.float32), x
            )
        )
        probe(jnp.float32(0)).block_until_ready()
        return True
    except Exception:
        return False


def _host_jpeg_sizes(images_uint8: np.ndarray, quality: int) -> np.ndarray:
    """Exact JPEG sizes. Preferred path: the native libjpeg batch encoder
    (native/jpeg_scorer.cpp — bit-identical to PIL, threaded); PIL fallback."""
    try:
        from diffusion_tts_tpu.scorers.native import jpeg_sizes, native_available

        if native_available():
            return jpeg_sizes(images_uint8, quality).astype(np.float32)
    except Exception:
        pass
    from PIL import Image

    sizes = np.zeros(images_uint8.shape[0], np.float32)
    for i, img in enumerate(images_uint8):
        if img.shape[-1] == 1:
            img = img[..., 0]
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=quality)
        sizes[i] = len(buf.getvalue())
    return sizes


class CompressibilityScorer:
    """score = 1 - clip((size - min)/(max - min), 0, 1); higher = more
    compressible (reference edm/scorers.py:240-244)."""

    def __init__(self, quality: int = 80, min_size: float = 0.0,
                 max_size: float = 3000.0, mode: str = "jpeg",
                 proxy_bytes_per_bit: float = 0.1849, proxy_header_bytes: float = 942.0):
        assert mode in ("jpeg", "dct")
        self.quality = quality
        self.min_size = min_size
        self.max_size = max_size
        self.mode = mode
        # decide the in-jit scoring strategy now, outside any trace
        self._use_callback = mode == "jpeg" and _callbacks_supported()
        self._warned_proxy = False
        # affine bits->bytes calibration (least-squares on 64x64 images of
        # varying smoothness at quality 80, R^2=0.91; the intercept is the
        # JPEG header + huffman-table overhead)
        self.proxy_bytes_per_bit = proxy_bytes_per_bit
        self.proxy_header_bytes = proxy_header_bytes

    @property
    def final_score_is_exact(self) -> bool:
        """False when mode="jpeg" must degrade to the DCT proxy inside jit
        (callback-less backend). run_search checks this and re-scores the
        FINAL images on the exact host path so the returned score is always
        real JPEG bytes (reference semantics, edm/scorers.py:207-244)."""
        return self.mode != "jpeg" or self._use_callback

    def __call__(self, images01: jax.Array, cond=None, timesteps=None) -> jax.Array:
        concrete = not isinstance(images01, jax.core.Tracer)
        use_exact = self.mode == "jpeg" and (concrete or self._use_callback)
        if not use_exact:
            if self.mode == "jpeg" and not self._warned_proxy:
                self._warned_proxy = True
                warnings.warn(
                    "CompressibilityScorer(mode='jpeg') is being traced on a "
                    "backend without host callbacks: in-search scoring uses "
                    "the on-device DCT proxy. run_search re-scores the FINAL "
                    "images with the exact JPEG encoder on the host.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            # in-loop proxy: either mode="dct", or we are inside jit on a
            # backend without host callbacks (the axon tunnel) where exact
            # JPEG cannot run — the proxy scores the search and callers can
            # re-score final images exactly outside jit.
            sizes = (
                jpeg_proxy_bits(images01, self.quality) * self.proxy_bytes_per_bit
                + self.proxy_header_bytes
            )
        elif concrete:
            arr = np.asarray(np.round(np.asarray(images01) * 255.0), np.uint8)
            sizes = jnp.asarray(_host_jpeg_sizes(arr, self.quality))
        else:
            def cb(imgs):
                arr = np.asarray(np.round(np.asarray(imgs) * 255.0), np.uint8)
                return _host_jpeg_sizes(arr, self.quality)

            sizes = jax.pure_callback(
                cb,
                jax.ShapeDtypeStruct((images01.shape[0],), jnp.float32),
                images01,
                vmap_method="sequential",
            )
        norm = (sizes - self.min_size) / (self.max_size - self.min_size)
        return 1.0 - jnp.clip(norm, 0.0, 1.0)


__all__ = ["CompressibilityScorer", "jpeg_proxy_bits"]

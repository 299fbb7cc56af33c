"""Native runtime (libjpeg batch scorer) tests: exact PIL parity."""
import io

import numpy as np
import pytest


def _batch():
    rng = np.random.default_rng(0)
    imgs = []
    for s in (1, 2, 4, 8):
        x = rng.uniform(0, 255, (64 // s, 64 // s, 3))
        imgs.append(np.kron(x, np.ones((s, s, 1)))[:64, :64].astype(np.uint8))
    imgs.append(np.full((64, 64, 3), 128, np.uint8))
    return np.stack(imgs)


def test_native_jpeg_sizes_match_pil_exactly():
    from diffusion_tts_tpu.scorers.native import jpeg_sizes, native_available

    if not native_available():
        pytest.skip("native lib not built and toolchain unavailable")
    from PIL import Image

    batch = _batch()
    for quality in (50, 80, 95):
        native = jpeg_sizes(batch, quality).tolist()
        pil = []
        for im in batch:
            b = io.BytesIO()
            Image.fromarray(im).save(b, format="JPEG", quality=quality)
            pil.append(len(b.getvalue()))
        assert native == pil, f"quality={quality}: {native} != {pil}"


def test_native_grayscale_and_threads():
    from diffusion_tts_tpu.scorers.native import jpeg_sizes, native_available

    if not native_available():
        pytest.skip("native lib not built")
    gray = _batch()[:, :, :, :1]
    s1 = jpeg_sizes(gray, 80, n_threads=1)
    s4 = jpeg_sizes(gray, 80, n_threads=4)
    np.testing.assert_array_equal(s1, s4)
    assert (s1 > 0).all()


def test_scorer_uses_native_path():
    import jax.numpy as jnp

    from diffusion_tts_tpu.scorers import CompressibilityScorer
    from diffusion_tts_tpu.scorers.native import native_available

    if not native_available():
        pytest.skip("native lib not built")
    batch01 = _batch().astype(np.float32) / 255.0
    s = CompressibilityScorer(mode="jpeg")
    scores = np.asarray(s(jnp.asarray(batch01)))
    # smooth gray image must score as most compressible
    assert scores[-1] == scores.max()

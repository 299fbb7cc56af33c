"""Golden-slice regression pins (the vendored suite's expected_slice
pattern, test_stable_diffusion.py:219-224): fixed-seed end-to-end outputs
through the tiny EDM backend must stay bit-stable across refactors. These
values were captured on CPU float32 FROM THIS REPO'S OWN OUTPUTS — they are
self-regression pins, NOT reference parity (reference parity lives in the
torch-golden tests, tests/test_*_parity.py). Any change to sampler math,
RNG addressing, or the quantization grid will move them.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.backends.edm_entry import load_network
from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
from diffusion_tts_tpu.scorers import BrightnessScorer
from diffusion_tts_tpu.search.api import run_search
from diffusion_tts_tpu.search.backend import EDMSearchBackend
from diffusion_tts_tpu.utils.config import SearchParams

EXPECTED_SLICE = np.array(
    [0.0, 0.0, 0.596078, 0.52549, 0.447059, 0.623529, 0.996078, 0.219608],
    np.float32,
)
EXPECTED_SCORES = np.array([0.513843, 0.487078], np.float32)


def test_naive_fixed_seed_slice():
    net, variables = load_network("tiny", None)
    labels = jnp.eye(10)[jnp.asarray([0, 1]) % 10]

    def make_backend(v):
        denoise = lambda x, s: net.apply(v, x, s, jnp.tile(labels, (x.shape[0] // 2, 1)))
        sampler = EDMHeunSampler(denoise=denoise, num_steps=6, S_churn=40.0,
                                 S_min=0.05, S_max=50.0, S_noise=1.003)
        return EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer())

    z = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    r = run_search("naive", make_backend, z, jax.random.key(42), SearchParams(),
                   backend_args=variables)
    np.testing.assert_allclose(
        np.asarray(r.images[0, 8, 4:12, 0]), EXPECTED_SLICE, atol=1e-2
    )
    np.testing.assert_allclose(np.asarray(r.score), EXPECTED_SCORES, atol=1e-3)

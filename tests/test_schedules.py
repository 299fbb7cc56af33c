"""Golden tests for noise schedules.

Golden values computed with the reference's formulas in torch float64
(edm/main.py:78-80; edm/generate.py:85-115) — see tools/make_goldens.py.
"""
import numpy as np
import pytest

from diffusion_tts_tpu.ops import schedules


def test_karras_18_imagenet64():
    t = np.asarray(schedules.karras_sigmas(18, 0.002, 80.0, 7.0), dtype=np.float64)
    assert t.shape == (19,)
    golden = {
        0: 80.0,
        1: 57.58598472124816,
        8: 3.256821519765537,
        16: 0.0075280199627840785,
        17: 0.002000000000000003,
        18: 0.0,
    }
    for i, v in golden.items():
        np.testing.assert_allclose(t[i], v, rtol=1e-6)
    assert np.all(np.diff(t) < 0)


def test_vp_ablation_defaults():
    t = np.asarray(schedules.vp_ablation_sigmas(18, append_zero=False), dtype=np.float64)
    golden = {0: 152.16697028394634, 1: 86.0101642851572, 16: 0.20588813378928178, 17: 0.010485992786706403}
    for i, v in golden.items():
        np.testing.assert_allclose(t[i], v, rtol=1e-5)


def test_ve_defaults():
    t = np.asarray(schedules.ve_sigmas(18, 0.02, 100.0, append_zero=False), dtype=np.float64)
    golden = {0: 100.0, 1: 60.59175464093021, 16: 0.033007791437169975, 17: 0.02}
    for i, v in golden.items():
        np.testing.assert_allclose(t[i], v, rtol=1e-6)


def test_iddpm_defaults():
    t = np.asarray(schedules.iddpm_sigmas(18, 0.002, 81.0, append_zero=False), dtype=np.float64)
    golden = {0: 80.20367617799776, 1: 9.687848103884503, 16: 0.10403644724603973, 17: 0.0064224695811984575}
    for i, v in golden.items():
        np.testing.assert_allclose(t[i], v, rtol=1e-5)


def test_ddim_schedule_tables():
    sched = schedules.ddim_schedule(50)
    assert sched.timesteps.shape == (50,)
    ts = np.asarray(sched.timesteps)
    # leading spacing with steps_offset=1: 981, 961, ..., 1
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    assert 0 < ac[-1] < ac[0] < 1
    np.testing.assert_allclose(float(sched.final_alpha_cumprod), ac[0], rtol=1e-6)


@pytest.mark.reference
def test_ddim_tables_match_vendored_diffusers():
    import sys

    sys.path.insert(0, "/root/reference/sd/diffusers/src")
    try:
        from diffusers.schedulers.scheduling_ddim import DDIMScheduler
    except Exception as e:  # pragma: no cover
        pytest.skip(f"vendored diffusers unavailable: {e}")
    finally:
        sys.path.pop(0)
    ref = DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="scaled_linear", set_alpha_to_one=False, steps_offset=1,
        clip_sample=False,
    )
    ref.set_timesteps(50)
    ours = schedules.ddim_schedule(50)
    np.testing.assert_allclose(
        np.asarray(ours.alphas_cumprod, dtype=np.float64),
        ref.alphas_cumprod.numpy().astype(np.float64),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(ours.timesteps), ref.timesteps.numpy())
    np.testing.assert_allclose(
        float(ours.final_alpha_cumprod), float(ref.final_alpha_cumprod), rtol=1e-6
    )

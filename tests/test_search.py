"""Search engine tests: the six methods on an analytic toy system where
reward ordering is predictable (the tiny-model + deterministic-scorer
pattern, SURVEY.md §4)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
from diffusion_tts_tpu.scorers import BrightnessScorer
from diffusion_tts_tpu.search import EDMSearchBackend, run_search
from diffusion_tts_tpu.search.api import METHODS
from diffusion_tts_tpu.utils.config import SearchParams


def analytic_denoise(x, sigma):
    # contraction toward zero; pred-x0 = x/(1+s^2)
    s = jnp.reshape(sigma, (-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
    return x / (1.0 + s**2)


@functools.lru_cache(maxsize=None)
def make_backend(num_steps=6):
    sampler = EDMHeunSampler(
        denoise=analytic_denoise, num_steps=num_steps, sigma_min=0.002, sigma_max=10.0,
        S_churn=20.0, S_min=0.01, S_max=50.0,
    )
    return EDMSearchBackend(sampler=sampler, scorer=BrightnessScorer(), scorer_cond=None)


Z = jax.random.normal(jax.random.key(100), (2, 8, 8, 3))
PARAMS = SearchParams(N=3, K=4, B=2, S=3)


@pytest.mark.parametrize("method", METHODS)
def test_methods_run_and_are_finite(method):
    backend = make_backend()
    res = run_search(method, backend, Z, jax.random.key(0), PARAMS)
    assert res.x.shape == Z.shape
    assert res.images.shape == Z.shape
    assert res.score.shape == (2,)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert np.all((np.asarray(res.images) >= 0) & (np.asarray(res.images) <= 1))


def test_search_beats_naive():
    """Every search method should improve brightness over naive sampling
    (the point of the whole framework)."""
    backend = make_backend()
    naive = run_search("naive", backend, Z, jax.random.key(0), PARAMS)
    base = float(naive.score.mean())
    for method in ("rejection", "beam", "zero_order", "eps_greedy", "mcts"):
        res = run_search(method, backend, Z, jax.random.key(0), PARAMS)
        assert float(res.score.mean()) > base, (
            f"{method} did not beat naive: {float(res.score.mean()):.4f} <= {base:.4f}"
        )


def test_eps_greedy_explores_more_than_zero_order():
    """With identical keys, the two methods share perturbation draws; they
    must differ because eps-greedy swaps in fresh noise with prob eps."""
    backend = make_backend()
    zo = run_search("zero_order", backend, Z, jax.random.key(1), PARAMS)
    eg = run_search("eps_greedy", backend, Z, jax.random.key(1), PARAMS)
    assert not np.allclose(np.asarray(zo.x), np.asarray(eg.x))


def test_determinism_same_key():
    backend = make_backend()
    a = run_search("eps_greedy", backend, Z, jax.random.key(2), PARAMS)
    b = run_search("eps_greedy", backend, Z, jax.random.key(2), PARAMS)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    c = run_search("eps_greedy", backend, Z, jax.random.key(3), PARAMS)
    assert not np.array_equal(np.asarray(a.x), np.asarray(c.x))


def test_zero_order_pivot_is_argmax():
    """On a single step with K=1, the committed noise must be the argmax-
    scoring candidate (selection correctness, edm/main.py:842-857)."""
    from diffusion_tts_tpu.search.zero_order import zero_order_search

    backend = make_backend(num_steps=1)
    params = SearchParams(N=4, K=1)
    key = jax.random.key(7)
    res = zero_order_search(backend, Z, key, params, record_noises=True)
    # reconstruct: x_final must equal advance(x0, 0, recorded_pivot)
    x0 = backend.init_latents(Z)
    pivot = res.best_noises[0, 0]  # [B, ...]
    expected = backend.advance(x0, jnp.asarray(0), None, pivot)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_rejection_score_consistency():
    backend = make_backend()
    res = run_search("rejection", backend, Z, jax.random.key(4), PARAMS)
    recomputed = backend.score(backend.final_images(res.x))
    np.testing.assert_allclose(np.asarray(res.score), np.asarray(recomputed), rtol=1e-6)


def test_auto_dispatch_resolution(monkeypatch):
    """dispatch='auto' picks chunked only for iterated methods with a
    >100M-parameter backend_args pytree."""
    import diffusion_tts_tpu.search.api as api

    calls = []

    def fake_chunked(method, *a, **k):
        calls.append((method, k.get("chunk")))
        return api.SearchResult(x=Z, images=Z, score=jnp.zeros(Z.shape[0]))

    monkeypatch.setattr(api, "_run_zero_order_chunked", fake_chunked)

    class BigLeaf:
        size = 200_000_000

    backend = make_backend()
    factory = lambda bargs: backend
    # big params + iterated method -> chunked (auto chunk size)
    api.run_search("eps_greedy", factory, Z, jax.random.key(0), PARAMS,
                   backend_args=BigLeaf(), dispatch="auto")
    assert calls == [("eps_greedy", None)]
    # small params -> whole (the real engine runs; chunked stub not called)
    r = api.run_search("eps_greedy", factory, Z, jax.random.key(0), PARAMS,
                       backend_args=None, dispatch="auto")
    assert calls == [("eps_greedy", None)] and np.all(np.isfinite(np.asarray(r.score)))


def test_default_chunk_steps():
    from diffusion_tts_tpu.search.api import default_chunk_steps

    assert default_chunk_steps(18) == 6
    assert default_chunk_steps(50) == 5
    assert default_chunk_steps(17) == 1  # prime -> per_step degenerate
    assert default_chunk_steps(4) == 4  # whole fits in one chunk


@pytest.mark.parametrize("method", ["zero_order", "eps_greedy"])
@pytest.mark.parametrize("chunk", [None, 4])  # divisor default (3 for 6 steps) and remainder (4+2)
def test_chunked_dispatch_equals_whole(method, chunk):
    """dispatch='chunked' (one lax.scan program per chunk of timesteps) must
    reproduce the single-program search exactly, including recorded noises,
    for both the single-compile divisor default and a remainder chunking."""
    backend = make_backend()
    whole = run_search(method, backend, Z, jax.random.key(9), PARAMS,
                       record_noises=True)
    chunked = run_search(method, backend, Z, jax.random.key(9), PARAMS,
                         record_noises=True, dispatch="chunked", chunk_steps=chunk)
    np.testing.assert_array_equal(np.asarray(whole.x), np.asarray(chunked.x))
    np.testing.assert_array_equal(np.asarray(whole.score), np.asarray(chunked.score))
    np.testing.assert_array_equal(
        np.asarray(whole.best_noises), np.asarray(chunked.best_noises))


def test_mcts_chunked_dispatch_equals_whole():
    backend = make_backend()
    whole = run_search("mcts", backend, Z, jax.random.key(9), PARAMS)
    chunked = run_search("mcts", backend, Z, jax.random.key(9), PARAMS,
                         dispatch="chunked", chunk_steps=3)
    np.testing.assert_array_equal(np.asarray(whole.x), np.asarray(chunked.x))
    np.testing.assert_array_equal(np.asarray(whole.score), np.asarray(chunked.score))


def test_mcts_per_step_dispatch_equals_whole():
    backend = make_backend()
    whole = run_search("mcts", backend, Z, jax.random.key(9), PARAMS)
    chunked = run_search("mcts", backend, Z, jax.random.key(9), PARAMS,
                         dispatch="per_step")
    np.testing.assert_array_equal(np.asarray(whole.x), np.asarray(chunked.x))
    np.testing.assert_array_equal(np.asarray(whole.score), np.asarray(chunked.score))


@pytest.mark.parametrize("method", ["zero_order", "eps_greedy"])
def test_per_step_dispatch_equals_whole(method):
    """dispatch='per_step' (one device program per timestep) must reproduce
    the single-program search exactly, including recorded noises."""
    backend = make_backend()
    whole = run_search(method, backend, Z, jax.random.key(9), PARAMS,
                       record_noises=True)
    chunked = run_search(method, backend, Z, jax.random.key(9), PARAMS,
                         record_noises=True, dispatch="per_step")
    np.testing.assert_array_equal(np.asarray(whole.x), np.asarray(chunked.x))
    np.testing.assert_array_equal(np.asarray(whole.score), np.asarray(chunked.score))
    np.testing.assert_array_equal(
        np.asarray(whole.best_noises), np.asarray(chunked.best_noises))


def test_mcts_textbook_mode_runs():
    backend = make_backend()
    res = run_search("mcts", backend, Z, jax.random.key(5), PARAMS, mcts_rollout_batch=1)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_mcts_fresh_expansion_mode():
    """fresh_expansion draws new child noise per expansion event instead of
    the reference's fixed per-depth table: the run must differ from the
    table mode, stay finite, and still beat naive."""
    backend = make_backend()
    tab = run_search("mcts", backend, Z, jax.random.key(5), PARAMS)
    fresh = run_search("mcts", backend, Z, jax.random.key(5), PARAMS,
                       mcts_fresh_expansion=True)
    assert np.all(np.isfinite(np.asarray(fresh.x)))
    assert not np.allclose(np.asarray(tab.x), np.asarray(fresh.x))
    assert 0.0 <= float(fresh.score.mean()) <= 1.0


def test_sampler_shared_trace_matches_inlined():
    """EDMHeunSampler.trace_denoise_once (2-iteration scan sharing one
    denoiser trace) must match the inlined Heun pair to fp32 fusion noise."""
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler

    kw = dict(denoise=analytic_denoise, num_steps=6, sigma_min=0.002,
              sigma_max=10.0, S_churn=20.0, S_min=0.01, S_max=50.0)
    a = EDMHeunSampler(**kw)
    b = EDMHeunSampler(**kw, trace_denoise_once=True)
    x = jax.random.normal(jax.random.key(0), (3, 8, 8, 3)) * 5
    eps = jax.random.normal(jax.random.key(1), x.shape)
    for i in (0, jnp.asarray([0, 3, 5], jnp.int32)):
        xa, da = a.step(x, jnp.asarray(i, jnp.int32), eps)
        xb, db = b.step(x, jnp.asarray(i, jnp.int32), eps)
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db), rtol=1e-5, atol=1e-5)


def test_noise_trajectory_recording():
    backend = make_backend()
    res = run_search(
        "eps_greedy", backend, Z, jax.random.key(6), PARAMS, record_noises=True
    )
    assert res.best_noises.shape == (backend.num_steps, PARAMS.K) + Z.shape


def test_nfe_accounting():
    from diffusion_tts_tpu.search.nfe import nfe_per_sample
    from diffusion_tts_tpu.utils.config import SearchParams

    p = SearchParams(N=4, K=20, B=2, S=8)
    # SURVEY.md §6 cost model rows
    assert nfe_per_sample("naive", 18, p) == 36
    assert nfe_per_sample("rejection", 18, p) == 4 * 36
    # commit reuses the winning expand result: no +1 advance when K >= 1
    assert nfe_per_sample("eps_greedy", 18, p) == 18 * (20 * 4) * 2
    assert nfe_per_sample("eps_greedy", 18, p.replace(K=0)) == 18 * 2
    assert nfe_per_sample("beam", 18, p) == 18 * 2 * 4 * 2
    assert nfe_per_sample("naive", 50, p, backend="sd") == 50
    assert nfe_per_sample("eps_greedy", 50, p, backend="sd") == 50 * (1 + 80)
    with __import__("pytest").raises(ValueError):
        nfe_per_sample("bogus", 18, p)


def test_replay_reproduces_search_trajectory():
    """Replaying the recorded per-step pivots must reproduce the searched
    sample exactly (the precomputed_noise contract, edm/main.py:113-121)."""
    from diffusion_tts_tpu.search import replay_trajectory

    backend = make_backend()
    res = run_search("eps_greedy", backend, Z, jax.random.key(9), PARAMS,
                     record_noises=True)
    final_pivots = res.best_noises[:, -1]  # [steps, B, ...] last-K pivot
    x = replay_trajectory(backend, Z, jnp.asarray(final_pivots))
    np.testing.assert_allclose(np.asarray(x), np.asarray(res.x), rtol=1e-6, atol=1e-6)


class TestNoiseInjection:
    """precomputed_noise injection (edm/main.py:54,723-796): every stochastic
    draw of a live search can be driven from external arrays. Round-trip
    proof: search(key2, noise=record_draws(key1)) == search(key1) — any
    mis-wired field would change the output because key2's internal draws
    differ."""

    KEY_A = jax.random.key(7)
    KEY_B = jax.random.key(1234)  # different: internal fallback draws differ

    def test_zero_order_full_injection_roundtrip(self):
        from diffusion_tts_tpu.search import record_zero_order_draws

        backend = make_backend()
        ref = run_search("eps_greedy", backend, Z, self.KEY_A, PARAMS)
        draws = record_zero_order_draws(self.KEY_A, backend.num_steps, PARAMS, Z.shape)
        inj = run_search("eps_greedy", backend, Z, self.KEY_B, PARAMS, noise=draws)
        np.testing.assert_allclose(np.asarray(inj.x), np.asarray(ref.x), rtol=1e-6, atol=1e-6)
        # sanity: without injection, KEY_B gives a different trajectory
        other = run_search("eps_greedy", backend, Z, self.KEY_B, PARAMS)
        assert not np.allclose(np.asarray(other.x), np.asarray(ref.x))

    def test_zero_order_partial_injection_pivots_only(self):
        """Per-field fallback (reference: missing dict keys fall back to
        randn, edm/main.py:734-744): injecting only pivots changes the run
        but stays deterministic."""
        from diffusion_tts_tpu.search import InjectedNoise, record_zero_order_draws

        backend = make_backend()
        draws = record_zero_order_draws(self.KEY_A, backend.num_steps, PARAMS, Z.shape)
        only_pivots = InjectedNoise(pivots=draws.pivots)
        r1 = run_search("zero_order", backend, Z, self.KEY_B, PARAMS, noise=only_pivots)
        r2 = run_search("zero_order", backend, Z, self.KEY_B, PARAMS, noise=only_pivots)
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
        r3 = run_search("zero_order", backend, Z, self.KEY_B, PARAMS)
        assert not np.allclose(np.asarray(r1.x), np.asarray(r3.x))

    def test_naive_injection_roundtrip(self):
        from diffusion_tts_tpu.search import record_step_draws

        backend = make_backend()
        ref = run_search("naive", backend, Z, self.KEY_A)
        draws = record_step_draws(self.KEY_A, backend.num_steps, Z.shape)
        inj = run_search("naive", backend, Z, self.KEY_B, noise=draws)
        np.testing.assert_allclose(np.asarray(inj.x), np.asarray(ref.x), rtol=1e-6, atol=1e-6)

    def test_rejection_injection_roundtrip(self):
        from diffusion_tts_tpu.search import record_step_draws

        backend = make_backend()
        ref = run_search("rejection", backend, Z, self.KEY_A, PARAMS)
        draws = record_step_draws(
            self.KEY_A, backend.num_steps, (PARAMS.N * Z.shape[0],) + Z.shape[1:])
        inj = run_search("rejection", backend, Z, self.KEY_B, PARAMS, noise=draws)
        np.testing.assert_allclose(np.asarray(inj.x), np.asarray(ref.x), rtol=1e-6, atol=1e-6)

    def test_mcts_table_injection_roundtrip(self):
        """With branching factor 1 the child pick is forced, so the noise
        table is MCTS's only stochastic input: injecting key A's table under
        key B must reproduce key A's run."""
        from diffusion_tts_tpu.search import record_mcts_table

        backend = make_backend()
        p = SearchParams(N=1, K=2, B=2, S=2)
        ref = run_search("mcts", backend, Z, self.KEY_A, p)
        tab = record_mcts_table(self.KEY_A, backend.num_steps, Z.shape[0], p.N, Z.shape[1:])
        inj = run_search("mcts", backend, Z, self.KEY_B, p, noise=tab)
        np.testing.assert_allclose(np.asarray(inj.x), np.asarray(ref.x), rtol=1e-6, atol=1e-6)


class TestProgramCache:
    """run_search must reuse its jitted programs across calls with the same
    backend factory and equal settings — rebuilding jax.jit wrappers per
    call retraces the whole search program every time (on the flagship,
    ~30 s of host work per call; PARITY round-3 note 6b). The backend
    factory only runs at trace time, so its call count measures retraces."""

    def _counting_factory(self):
        calls = []
        be = make_backend()

        def factory(bargs):
            calls.append(1)
            return be

        return factory, calls

    @pytest.mark.parametrize("dispatch", ["whole", "chunked", "per_step"])
    def test_no_retrace_on_repeat(self, dispatch):
        # each run_search calls the factory once EAGERLY (scorer lookup)
        # plus once per traced program; steady state = eager-only delta.
        factory, calls = self._counting_factory()
        p = SearchParams(N=3, K=4, B=2, S=3)
        r1 = run_search("eps_greedy", factory, Z, jax.random.key(0), p,
                        backend_args=None, dispatch=dispatch)
        d1 = len(calls)
        assert d1 > 1  # first call traced at least one program
        # fresh-but-equal params must also hit the cache
        r2 = run_search("eps_greedy", factory, Z, jax.random.key(0),
                        SearchParams(N=3, K=4, B=2, S=3),
                        backend_args=None, dispatch=dispatch)
        d2 = len(calls) - d1
        r3 = run_search("eps_greedy", factory, Z, jax.random.key(0), p,
                        backend_args=None, dispatch=dispatch)
        d3 = len(calls) - d1 - d2
        assert d2 == d3 == 1, f"repeat call retraced the search program ({d1},{d2},{d3})"
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
        np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r3.x))

    def test_mcts_no_retrace_on_repeat(self):
        factory, calls = self._counting_factory()
        p = SearchParams(N=2, K=2, B=2, S=2)
        run_search("mcts", factory, Z, jax.random.key(0), p,
                   backend_args=None, dispatch="per_step")
        d1 = len(calls)
        run_search("mcts", factory, Z, jax.random.key(0), p,
                   backend_args=None, dispatch="per_step")
        assert len(calls) - d1 == 1

    def test_different_params_rebuild(self):
        factory, calls = self._counting_factory()
        run_search("eps_greedy", factory, Z, jax.random.key(0),
                   SearchParams(N=3, K=4), backend_args=None)
        n_first = len(calls)
        run_search("eps_greedy", factory, Z, jax.random.key(0),
                   SearchParams(N=2, K=4), backend_args=None)
        assert len(calls) > n_first, "changed params must not reuse the old closure"

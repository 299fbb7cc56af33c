from diffusion_tts_tpu.search.backend import EDMSearchBackend, SearchBackend  # noqa: F401
from diffusion_tts_tpu.search.api import SearchResult, run_search  # noqa: F401
from diffusion_tts_tpu.search.naive import replay_trajectory  # noqa: F401
from diffusion_tts_tpu.search.noise import (  # noqa: F401
    InjectedNoise,
    record_mcts_table,
    record_step_draws,
    record_zero_order_draws,
)

"""Analytic NFE accounting for the search methods (SURVEY.md §6 cost model).

The observability counterpart of the reference's tqdm bars: exact denoiser
forward counts per sample for any (method, steps, params) so throughput and
reward-at-budget comparisons are well-defined. The EDM Heun pair costs 2
NFE per step (and the uniform-step design pays the masked second call on
the final step too); the SD backend costs base + lookahead UNet calls.
"""
from __future__ import annotations

from diffusion_tts_tpu.utils.config import SearchParams


def nfe_per_sample(method: str, steps: int, p: SearchParams,
                   backend: str = "edm") -> int:
    per_step = 2 if backend == "edm" else 1  # Heun pair vs one eps-model call
    if method == "naive":
        return steps * per_step
    if method == "rejection":
        return p.N * steps * per_step
    if method in ("zero_order", "eps_greedy"):
        if backend == "edm":
            # the commit reuses the winning candidate's expand result
            # (zero_order.py k_body), so K>=1 pays only the expansions;
            # the reference re-steps the chosen noise (+1 per_step more,
            # edm/main.py:860-866)
            return steps * (p.K * p.N + (1 if p.K == 0 else 0)) * per_step
        # SD: 1 base UNet + per (K,N) one lookahead UNet; commit reuses base
        return steps * (1 + p.K * p.N)
    if method == "beam":
        if backend == "edm":
            return steps * p.B * p.N * per_step
        return steps * p.B * (1 + p.N)
    if method == "mcts":
        # per timestep: root expansion (<=N children) + S rollouts x
        # (leaf expansion <=N + zero-noise simulation over all steps; the
        # masked scan pays the full trajectory length)
        sim = steps * per_step if backend == "edm" else steps
        exp = p.N * per_step if backend == "edm" else p.N
        return steps * (exp + p.S * (exp + sim))
    raise ValueError(f"unknown method {method!r}")


__all__ = ["nfe_per_sample"]

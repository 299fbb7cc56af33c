"""Multi-host process-group initialization.

Counterpart of the reference's ``dist.init()``
(edm/torch_utils/distributed.py:14-31), which reads env-var defaults and
calls ``torch.distributed.init_process_group``. The JAX equivalent is
``jax.distributed.initialize()``: after it, ``jax.devices()`` spans every
host, collectives ride ICI/DCN inside compiled programs, and rank-0 gating
becomes ``jax.process_index() == 0``. No barriers are needed — XLA program
order plus ``block_until_ready`` replace them (SURVEY.md §5).

``distributed_init()`` is safe to call unconditionally from every entry
point: it only initializes when a multi-process launch is detectable
(coordinator env vars, or a managed TPU-pod/SLURM environment flagged via
DTTS_MULTIHOST=1), so single-host runs — including the CPU test suite —
pass through untouched.
"""
from __future__ import annotations

import os

_initialized = False


def distributed_init() -> bool:
    """Initialize jax.distributed for multi-host runs. Returns True when a
    multi-process group is (already or newly) initialized.

    Triggers (checked before any JAX backend init, mirroring the env-var
    protocol of the reference's distributed.py:15-24):
      * JAX_COORDINATOR_ADDRESS (+ optional JAX_NUM_PROCESSES / JAX_PROCESS_ID)
        — explicit coordinator, like the reference's MASTER_ADDR/MASTER_PORT;
      * DTTS_MULTIHOST=1 — managed environments (TPU pods, SLURM, GKE) where
        jax.distributed.initialize() auto-detects everything.
    """
    global _initialized
    if _initialized:
        return True
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("DTTS_MULTIHOST") == "1"
    if not coord and not auto:
        return False
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def is_main_process() -> bool:
    """Rank-0 gating (reference get_rank()==0, distributed.py:35-38)."""
    import jax

    return jax.process_index() == 0


__all__ = ["distributed_init", "is_main_process"]

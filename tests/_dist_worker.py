"""Worker for the 2-process jax.distributed CPU test (test_multiprocess.py).

Launched as a subprocess with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set — exactly the env protocol distributed_init() triggers on
(the counterpart of the reference's MASTER_ADDR handshake,
edm/torch_utils/distributed.py:14-31). Exercises, for real, the code paths
that single-process test runs can only no-op through:

  * distributed_init() -> jax.distributed.initialize over localhost,
  * process-sharded InfiniteSampler epochs,
  * Collector.report0 rank gating + Collector.sync() cross-process
    allgather of the [num, sum, sum^2] moments.

Prints one JSON result line prefixed with RESULT: for the parent to parse.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from diffusion_tts_tpu.parallel.distributed import (
        distributed_init, is_main_process,
    )
    from diffusion_tts_tpu.training.dataset import InfiniteSampler
    from diffusion_tts_tpu.utils.stats import Collector

    assert distributed_init(), "coordinator env set but init returned False"
    rank = jax.process_index()
    world = jax.process_count()
    assert world == 2, f"expected 2 processes, got {world}"
    assert is_main_process() == (rank == 0)

    # Process-sharded sampling: rank-strided indices (misc.py:110-142).
    sampler = InfiniteSampler(
        10, shard=rank, num_shards=world, shuffle=False)
    it = iter(sampler)
    idxs = [next(it) for _ in range(8)]

    # Cross-process stats sync: rank 0 reports loss=[1, 2], rank 1 reports
    # loss=[5]; report0 contributes only on rank 0.
    col = Collector()
    if rank == 0:
        col.report("loss", [1.0, 2.0])
    else:
        col.report("loss", [5.0])
    col.report0("lr", 0.125)
    col.sync()

    print("RESULT:" + json.dumps({
        "rank": rank,
        "world": world,
        "sampler_idxs": idxs,
        "loss_num": int(col.as_dict()["loss"]["num"]),
        "loss_mean": col.mean("loss"),
        "loss_std": col.std("loss"),
        "lr_num": int(col.as_dict()["lr"]["num"]),
        "lr_mean": col.mean("lr"),
    }), flush=True)


if __name__ == "__main__":
    main()

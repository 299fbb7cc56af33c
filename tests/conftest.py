"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

The reference has no multi-device test facility at all (SURVEY.md §4); here every
test runs against JAX's CPU backend with 8 virtual devices so sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip path).
"""
import os

# The environment pins JAX_PLATFORMS=axon (TPU tunnel) for every python
# process via sitecustomize; tests must override it hard, not setdefault,
# or the whole suite silently runs over the remote TPU tunnel.
# DTTS_TEST_TPU=1 opts back into the ambient TPU backend for the
# hardware-gated tests (tests/test_tpu_hardware.py) — run those alone.
_USE_TPU = os.environ.get("DTTS_TEST_TPU", "").lower() not in ("", "0", "false")
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# Keep CPU tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# sitecustomize may already have imported jax with jax_platforms=axon baked
# in; config.update takes effect as long as no backend has initialized yet.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by recompiles of tiny
# models; reruns drop from ~17 min to a few minutes.
from diffusion_tts_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))

import pathlib

import pytest


REFERENCE_ROOT = pathlib.Path("/root/reference")


def pytest_collection_modifyitems(config, items):
    if REFERENCE_ROOT.exists():
        return
    skip_ref = pytest.mark.skip(reason="/root/reference not mounted")
    for item in items:
        if "reference" in item.keywords:
            item.add_marker(skip_ref)

"""Misc developer utilities.

Counterparts of edm/torch_utils/misc.py and the used parts of dnnlib/util:
  assert_shape      (misc.py:81-96)  — shape checks with None wildcards
  profiled_function (misc.py:99-106) — named profiler ranges, here
                                       jax.profiler.TraceAnnotation
  print_module_summary (misc.py:196-264) — parameter/shape table for a
                                       flax variable tree
  copy_params_and_buffers (misc.py:155-166) — tree transfer with
                                       require_all (transfer learning)
  open_file_or_url  (dnnlib/util.py:395-491) — md5-cached retrieval;
                                       zero-egress builds only accept
                                       local paths and say so explicitly
"""
from __future__ import annotations

import functools
import hashlib
import os
import shutil
from typing import Any

import jax
import numpy as np


def assert_shape(array, ref_shape) -> None:
    """Raise unless array.shape matches ref_shape; None entries match any."""
    shape = tuple(array.shape)
    if len(shape) != len(ref_shape):
        raise AssertionError(f"wrong rank: got {len(shape)}, expected {len(ref_shape)}")
    for i, (got, want) in enumerate(zip(shape, ref_shape)):
        if want is not None and got != want:
            raise AssertionError(f"wrong size for dim {i}: got {got}, expected {want}")


def profiled_function(fn):
    """Wrap a function in a named profiler range (appears in jax.profiler
    traces the way record_function ranges appear in torch profiles)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__qualname__):
            return fn(*args, **kwargs)

    return wrapper


def start_trace(log_dir: str) -> None:
    """Begin a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


def print_module_summary(variables: Any, max_rows: int = 200) -> int:
    """Parameter table for a flax variable tree; returns total param count."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        rows.append((jax.tree_util.keystr(path), tuple(leaf.shape), str(leaf.dtype), n))
    width = max((len(r[0]) for r in rows[:max_rows]), default=10)
    print(f"{'Parameter':<{width}}  {'Shape':<20} {'Dtype':<10} {'Count':>12}")
    for name, shape, dtype, n in rows[:max_rows]:
        print(f"{name:<{width}}  {str(shape):<20} {dtype:<10} {n:>12,}")
    if len(rows) > max_rows:
        print(f"... {len(rows) - max_rows} more")
    print(f"{'Total':<{width}}  {'':<20} {'':<10} {total:>12,}")
    return total


def copy_params_and_buffers(src: Any, dst: Any, *, require_all: bool = False) -> Any:
    """Fill dst-tree leaves from same-path src leaves (transfer learning,
    misc.py:155-166). Leaves missing from src keep dst values unless
    require_all."""
    src_flat = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(src)}

    def pick(path, leaf):
        key = jax.tree_util.keystr(path)
        if key in src_flat:
            assert src_flat[key].shape == leaf.shape, f"shape mismatch at {key}"
            return src_flat[key]
        if require_all:
            raise KeyError(f"missing parameter {key} in source")
        return leaf

    return jax.tree_util.tree_map_with_path(pick, dst)


def open_file_or_url(path_or_url: str, cache_dir: str | None = None):
    """Open a local file; for URLs, serve from the md5-keyed cache if the
    download already exists there (dnnlib.util.open_url semantics). This
    build is zero-egress: a cache miss on a URL raises with instructions
    instead of downloading."""
    if not (path_or_url.startswith("http://") or path_or_url.startswith("https://")):
        return open(path_or_url, "rb")
    cache_dir = cache_dir or os.path.expanduser("~/.cache/diffusion_tts_tpu")
    key = hashlib.md5(path_or_url.encode()).hexdigest()
    os.makedirs(cache_dir, exist_ok=True)
    for name in os.listdir(cache_dir):
        if name.startswith(key):
            return open(os.path.join(cache_dir, name), "rb")
    raise FileNotFoundError(
        f"zero-egress build: cannot download {path_or_url}; place the file at "
        f"{cache_dir}/{key}-<name> or pass a local path"
    )


def cache_local_file_for_url(url: str, local_path: str, cache_dir: str | None = None) -> str:
    """Pre-seed the URL cache from a local file (the offline half of
    open_url's md5 cache)."""
    cache_dir = cache_dir or os.path.expanduser("~/.cache/diffusion_tts_tpu")
    key = hashlib.md5(url.encode()).hexdigest()
    os.makedirs(cache_dir, exist_ok=True)
    dst = os.path.join(cache_dir, f"{key}-{os.path.basename(local_path)}")
    shutil.copyfile(local_path, dst)
    return dst


__all__ = [
    "assert_shape", "profiled_function", "print_module_summary",
    "copy_params_and_buffers", "open_file_or_url", "cache_local_file_for_url",
    "start_trace", "stop_trace",
]

"""Multi-device seed-sharded image generation.

Counterpart of the reference's torchrun generator (edm/generate.py:238-305):
rank-strided seed batches, per-seed deterministic noise independent of
batching (StackedRandomGenerator, :182-196), PNG per seed. TPU-native: the
seed axis is sharded over the mesh's 'data' axis with pjit; per-seed
determinism comes from jax.random.fold_in on the seed value, so an image
depends only on its seed, never on which batch or device produced it.

Usage:
  python tools/generate.py --seeds 0-63 --outdir out [--arch tiny] \
      [--weights ckpt.npz] [--steps 18] [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def parse_seeds(spec: str) -> list[int]:
    """'0-63' / '1,2,5-7' (reference generate.py:216-231)."""
    out: list[int] = []
    for part in spec.split(","):
        m = re.fullmatch(r"(\d+)-(\d+)", part)
        if m:
            out.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.append(int(part))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", default="0-7")
    p.add_argument("--outdir", required=True)
    p.add_argument("--arch", default="imagenet64")
    p.add_argument("--weights", default=None)
    p.add_argument("--steps", type=int, default=18)
    p.add_argument("--batch", type=int, default=None, help="max seeds per device batch")
    p.add_argument("--class-idx", type=int, default=None)
    p.add_argument("--churn", type=float, default=0.0, help="S_churn (generate.py default 0)")
    args = p.parse_args(argv)

    from diffusion_tts_tpu.parallel.distributed import distributed_init

    distributed_init()  # multi-host launch support (reference generate.py:254)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffusion_tts_tpu.backends.edm_entry import NET_CONFIGS, load_network
    from diffusion_tts_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from diffusion_tts_tpu.parallel.mesh import make_mesh
    from diffusion_tts_tpu.samplers.edm import EDMHeunSampler
    from diffusion_tts_tpu.utils.rng import per_seed_keys

    seeds = parse_seeds(args.seeds)
    cfg = NET_CONFIGS[args.arch]
    res, ch, label_dim = cfg["img_resolution"], cfg["img_channels"], cfg["label_dim"]
    net, variables = load_network(args.arch, args.weights)

    mesh = make_mesh()
    ndev = mesh.devices.size
    batch = args.batch or max(ndev, (len(seeds) + ndev - 1) // ndev * ndev)
    batch = (batch // ndev) * ndev or ndev

    # Weights ride through jit as an argument: a closure would bake them
    # into the HLO as constants and wedge the (remote) compile for large
    # models.
    @jax.jit
    def run(v, z, eps, labels):
        denoise = lambda x, s: net.apply(v, x, s, labels)
        sampler = EDMHeunSampler(
            denoise=denoise, num_steps=args.steps, S_churn=args.churn,
        )
        x, _ = sampler.sample(z, eps)
        return jnp.clip(x * 127.5 + 128, 0, 255).astype(jnp.uint8)

    def sample_batch(seed_vals: np.ndarray) -> np.ndarray:
        keys = per_seed_keys(seed_vals)
        z = jax.vmap(lambda k: jax.random.normal(jax.random.fold_in(k, 0), (res, res, ch)))(keys)
        if label_dim:
            if args.class_idx is None:
                cls = jax.vmap(
                    lambda k: jax.random.randint(jax.random.fold_in(k, 1), (), 0, label_dim)
                )(keys)
            else:
                cls = jnp.full((len(seed_vals),), args.class_idx, jnp.int32)
            labels = jnp.eye(label_dim, dtype=jnp.float32)[cls]
        else:
            labels = jnp.zeros((len(seed_vals), 0), jnp.float32)
        eps = jax.vmap(
            lambda k: jax.random.normal(jax.random.fold_in(k, 2), (args.steps, res, res, ch))
        )(keys).transpose(1, 0, 2, 3, 4)
        sharding = NamedSharding(mesh, P("data"))
        z = jax.device_put(z, sharding)
        img = run(variables, z, eps, labels)
        return np.asarray(img)

    os.makedirs(args.outdir, exist_ok=True)
    from PIL import Image

    for start in range(0, len(seeds), batch):
        chunk = seeds[start:start + batch]
        pad = (-len(chunk)) % ndev
        padded = np.asarray(chunk + [chunk[-1]] * pad)
        imgs = sample_batch(padded)
        for seed, img in zip(chunk, imgs[: len(chunk)]):
            Image.fromarray(img.squeeze()).save(
                os.path.join(args.outdir, f"{seed:06d}.png")
            )
    print(f"wrote {len(seeds)} images to {args.outdir}")


if __name__ == "__main__":
    main()

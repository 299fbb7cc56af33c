"""Analysis of selected-noise trajectories (the dmap toolbox).

Counterpart of the reference's offline visualization script
(edm/dmap.py:16-567), consuming the best-noise stacks the search engine
records (run_search(record_noises=True) -> [steps, K, B, ...]; the
reference collects the same data at edm/main.py:741,854 into
all_timestep_noises.pkl):

  * per-timestep norm statistics (the reference's Mahalanobis-norm violin
    plots, dmap.py:49-92 — for i.i.d. standard-normal noise the covariance
    is identity, so Mahalanobis == L2),
  * diffusion-map spectral embedding (dmap.py:94-180) implemented directly
    in numpy (Gaussian kernel, row-normalized Markov transition,
    eigendecomposition),
  * t-SNE embedding via sklearn when available (dmap.py:182-553), and
  * matplotlib figures gated on availability.
"""
from __future__ import annotations

import os

import numpy as np


def save_noise_trajectories(path: str, best_noises, t_steps=None) -> None:
    """Persist the search's noise-selection record (the reference's
    all_timestep_noises.pkl + t_steps.pkl counterpart)."""
    arrays = {"noises": np.asarray(best_noises)}
    if t_steps is not None:
        arrays["t_steps"] = np.asarray(t_steps)
    np.savez_compressed(path, **arrays)


def load_noise_trajectories(path: str):
    with np.load(path) as f:
        return f["noises"], (f["t_steps"] if "t_steps" in f.files else None)


def noise_norms(noises: np.ndarray) -> np.ndarray:
    """[steps, K, B, ...] -> L2 (== Mahalanobis for N(0,I)) norms
    [steps, K*B]."""
    steps = noises.shape[0]
    flat = noises.reshape(steps, -1, int(np.prod(noises.shape[3:])))
    b = noises.shape[1] * noises.shape[2]
    flat = noises.reshape(steps, b, -1)
    return np.linalg.norm(flat, axis=-1)


def diffusion_map(
    points: np.ndarray, n_components: int = 2, epsilon: float | None = None
) -> np.ndarray:
    """Diffusion-map embedding of [N, D] points (dmap.py:94-180): Gaussian
    kernel K = exp(-|xi-xj|^2/eps), Markov-normalize, take the top
    non-trivial eigenvectors."""
    d2 = np.square(points[:, None, :] - points[None, :, :]).sum(-1)
    if epsilon is None:
        epsilon = np.median(d2[d2 > 0]) + 1e-12
    k = np.exp(-d2 / epsilon)
    d = k.sum(1)
    p = k / d[:, None]
    vals, vecs = np.linalg.eig(p)
    order = np.argsort(-vals.real)
    # skip the trivial constant eigenvector (eigenvalue 1)
    sel = order[1 : n_components + 1]
    return (vecs[:, sel].real * vals[sel].real[None, :]).astype(np.float64)


def tsne_embedding(points: np.ndarray, n_components: int = 2, seed: int = 0):
    """t-SNE via sklearn when present (dmap.py:182-553); None otherwise."""
    try:
        from sklearn.manifold import TSNE
    except ImportError:
        return None
    perplexity = max(2, min(30, len(points) - 1))
    return TSNE(n_components=n_components, random_state=seed,
                perplexity=perplexity, init="pca").fit_transform(points)


def create_visualizations(noises_path: str, out_dir: str) -> list[str]:
    """Produce the reference's figure set from a recorded trajectory file.
    Returns written file paths; skips plots whose deps are unavailable."""
    os.makedirs(out_dir, exist_ok=True)
    noises, t_steps = load_noise_trajectories(noises_path)
    written = []

    norms = noise_norms(noises)
    np.save(os.path.join(out_dir, "noise_norms.npy"), norms)
    written.append(os.path.join(out_dir, "noise_norms.npy"))

    steps = noises.shape[0]
    flat = noises.reshape(steps * noises.shape[1] * noises.shape[2], -1)
    if len(flat) >= 4:
        emb = diffusion_map(flat[: min(len(flat), 512)])
        np.save(os.path.join(out_dir, "diffusion_map.npy"), emb)
        written.append(os.path.join(out_dir, "diffusion_map.npy"))
        ts = tsne_embedding(flat[: min(len(flat), 512)])
        if ts is not None:
            np.save(os.path.join(out_dir, "tsne.npy"), ts)
            written.append(os.path.join(out_dir, "tsne.npy"))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 4))
        ax.violinplot([norms[i] for i in range(steps)], showmeans=True)
        ax.set_xlabel("timestep")
        ax.set_ylabel("noise L2 norm (Mahalanobis)")
        fig.savefig(os.path.join(out_dir, "norm_violins.png"), dpi=120)
        plt.close(fig)
        written.append(os.path.join(out_dir, "norm_violins.png"))
    except ImportError:
        pass
    return written


__all__ = [
    "save_noise_trajectories", "load_noise_trajectories", "noise_norms",
    "diffusion_map", "tsne_embedding", "create_visualizations",
]

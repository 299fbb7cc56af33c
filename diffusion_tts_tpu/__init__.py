"""diffusion_tts_tpu — TPU-native test-time scaling of diffusion models.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference ``rvignav/diffusion-tts`` (arXiv:2506.03164): EDM and
Stable Diffusion backends, four reward scorers, and six noise-trajectory
search methods, re-architected as pure functions over batched on-device
state (``lax.scan`` over timesteps, ``vmap`` over candidates, ``pjit`` over
device meshes).
"""

__version__ = "0.1.0"

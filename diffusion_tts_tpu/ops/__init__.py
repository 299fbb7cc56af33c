from diffusion_tts_tpu.ops import schedules  # noqa: F401

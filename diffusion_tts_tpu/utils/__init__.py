from diffusion_tts_tpu.utils.config import EasyDict, construct_class_by_name  # noqa: F401
from diffusion_tts_tpu.utils import rng  # noqa: F401

from diffusion_tts_tpu.scorers.base import Scorer, quantize_to_uint8_grid  # noqa: F401
from diffusion_tts_tpu.scorers.brightness import BrightnessScorer  # noqa: F401
from diffusion_tts_tpu.scorers.compressibility import CompressibilityScorer  # noqa: F401
from diffusion_tts_tpu.scorers.imagenet import ImageNetScorer  # noqa: F401
from diffusion_tts_tpu.scorers.clip import CLIPScorer  # noqa: F401

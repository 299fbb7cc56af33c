from diffusion_tts_tpu.samplers.edm import EDMHeunSampler, AblationSampler  # noqa: F401
from diffusion_tts_tpu.samplers.ddim import StochasticDDIMSampler  # noqa: F401

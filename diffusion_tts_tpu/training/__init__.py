from diffusion_tts_tpu.training.loss import EDMLoss, VELoss, VPLoss  # noqa: F401
from diffusion_tts_tpu.training.train_step import TrainState, make_train_step  # noqa: F401

from diffusion_tts_tpu.pipelines.sd_pipeline import StableDiffusionSearchPipeline  # noqa: F401

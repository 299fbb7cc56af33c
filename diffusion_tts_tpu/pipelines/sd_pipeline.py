"""Stable Diffusion text-to-image pipeline with noise-trajectory search.

Counterpart of the modified HF pipeline (reference sd/diffusers/.../
pipeline_stable_diffusion.py __call__, :812-814 extended signature with
score_function/method/params; :1484 returns (output, max_score)) rebuilt
around the backend-agnostic search engine: the pipeline owns the flax
UNet/VAE/CLIP-text modules and the stochastic DDIM tables, builds an
SDSearchBackend bound to the prompt, and dispatches to search.api.

Reference defaults preserved: 100 inference steps, eta=1.0 stochastic DDIM
(:790,796 — the fork's deltas vs upstream), guidance 7.5, uncond-first CFG
concat, method='eps_greedy'.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_tts_tpu.models.sd_unet import UNet2DConditionModel
from diffusion_tts_tpu.models.sd_vae import AutoencoderKL
from diffusion_tts_tpu.samplers.ddim import StochasticDDIMSampler
from diffusion_tts_tpu.search.api import SearchResult, run_search
from diffusion_tts_tpu.search.sd_backend import SDSearchBackend
from diffusion_tts_tpu.utils.config import SearchParams


def _zero_scorer(images, cond, t=None):
    """Module-level no-op scorer: score_function=None calls must share ONE
    program-cache entry (a per-call lambda in cache_salt would both miss the
    cache every call and pin each 860M-scale executable alive)."""
    return jnp.zeros(images.shape[0])


@dataclasses.dataclass(eq=False)  # identity hash: the program-cache anchor
class StableDiffusionSearchPipeline:
    unet: UNet2DConditionModel
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: Any = None  # transformers FlaxCLIPTextModel
    text_params: Any = None
    tokenizer: Any = None
    guidance_scale: float = 7.5
    vae_scale_factor: int | None = None  # derived from the VAE when None

    def __post_init__(self):
        if self.vae_scale_factor is None:
            self.vae_scale_factor = 2 ** (len(self.vae.block_out_channels) - 1)

    # ------------------------------------------------------------------ load
    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "StableDiffusionSearchPipeline":
        """Load a local diffusers-layout SD checkpoint (unet/, vae/, and —
        when present — text_encoder/ + tokenizer/). Zero-egress: no hub
        download. Without a text encoder the pipeline still runs with
        caller-supplied ``prompt_embeds`` (the weights-present fast path,
        tests/test_real_weights.py, exercises both shapes)."""
        import json
        import os

        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        from diffusion_tts_tpu.models.sd_import import (
            convert_diffusers_state_dict,
            load_safetensors,
        )

        def load_cfg(sub):
            with open(os.path.join(path, sub, "config.json")) as f:
                return json.load(f)

        ucfg = load_cfg("unet")
        unet = UNet2DConditionModel(
            sample_size=ucfg["sample_size"], in_channels=ucfg["in_channels"],
            out_channels=ucfg["out_channels"],
            down_block_types=tuple(ucfg["down_block_types"]),
            up_block_types=tuple(ucfg["up_block_types"]),
            block_out_channels=tuple(ucfg["block_out_channels"]),
            layers_per_block=ucfg["layers_per_block"],
            attention_head_dim=ucfg["attention_head_dim"]
            if not isinstance(ucfg["attention_head_dim"], list)
            else tuple(ucfg["attention_head_dim"]),
            cross_attention_dim=ucfg["cross_attention_dim"],
        )
        unet_params = convert_diffusers_state_dict(
            load_safetensors(_find_weights(os.path.join(path, "unet")))
        )
        vcfg = load_cfg("vae")
        vae = AutoencoderKL(
            block_out_channels=tuple(vcfg["block_out_channels"]),
            layers_per_block=vcfg["layers_per_block"],
            latent_channels=vcfg["latent_channels"],
            scaling_factor=vcfg.get("scaling_factor", 0.18215),
        )
        vae_params = convert_diffusers_state_dict(
            load_safetensors(_find_weights(os.path.join(path, "vae")))
        )
        text_encoder = tokenizer = text_params = None
        if os.path.isdir(os.path.join(path, "text_encoder")):
            text_encoder = FlaxCLIPTextModel.from_pretrained(
                os.path.join(path, "text_encoder"), from_pt=True
            )
            text_params = text_encoder.params
        if os.path.isdir(os.path.join(path, "tokenizer")):
            tokenizer = CLIPTokenizer.from_pretrained(os.path.join(path, "tokenizer"))
        return cls(
            unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
            text_encoder=text_encoder, text_params=text_params,
            tokenizer=tokenizer, **kwargs,
        )

    @classmethod
    def tiny_random(cls, seed: int = 0, cross_dim: int = 32) -> "StableDiffusionSearchPipeline":
        """Random tiny pipeline (the vendored suite's fast-test scale,
        test_stable_diffusion.py:133-191) for CPU tests."""
        unet = UNet2DConditionModel(
            sample_size=16, in_channels=4, out_channels=4,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            block_out_channels=(32, 64), layers_per_block=1,
            attention_head_dim=4, cross_attention_dim=cross_dim,
        )
        k1, k2 = jax.random.split(jax.random.key(seed))
        x = jnp.zeros((1, 16, 16, 4))
        ctx = jnp.zeros((1, 7, cross_dim))
        unet_params = unet.init({"params": k1}, x, jnp.zeros((1,), jnp.int32), ctx)
        vae = AutoencoderKL(block_out_channels=(32, 64), layers_per_block=1)
        vae_params = vae.init(
            {"params": k2}, jnp.zeros((1, 32, 32, 3)), jax.random.key(0)
        )
        return cls(unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params)

    # ------------------------------------------------------------- components
    def encode_prompt(self, prompt, negative_prompt=None):
        """CLIP-encode prompt + uncond (reference pipeline encode_prompt,
        :942-992). Returns (uncond_embeds, cond_embeds) [B, 77, D]."""
        if self.tokenizer is None or self.text_encoder is None:
            raise ValueError(
                "pipeline has no tokenizer/text encoder; pass prompt_embeds "
                "(zero-egress environments cannot download the CLIP checkpoint)"
            )
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        neg = negative_prompt or [""] * len(prompts)
        neg = [neg] * len(prompts) if isinstance(neg, str) else list(neg)

        def enc(texts):
            tok = self.tokenizer(
                texts, padding="max_length", truncation=True,
                max_length=self.tokenizer.model_max_length, return_tensors="np",
            )
            return self.text_encoder(
                input_ids=tok["input_ids"], params=self.text_params
            ).last_hidden_state

        return jnp.asarray(enc(neg)), jnp.asarray(enc(prompts))

    def make_backend(
        self, bargs, scorer, scorer_cond=None,
        num_inference_steps: int = 100, eta: float = 1.0,
        guidance_scale: float | None = None, batch: int = 1,
        candidate_sharding=None,
    ) -> SDSearchBackend:
        """bargs: {"unet", "vae", "uncond", "cond"[, "scorer"]} — the traced
        pytree so jit never bakes the model weights in as constants."""
        g = self.guidance_scale if guidance_scale is None else guidance_scale
        b = batch
        do_cfg = g > 1.0

        def eps_model(x, t):
            reps = x.shape[0] // b
            if not do_cfg:
                ctx = jnp.tile(bargs["cond"], (reps, 1, 1))
                return self.unet.apply(bargs["unet"], x, t, ctx)
            ctx = jnp.concatenate(
                [jnp.tile(bargs["uncond"], (reps, 1, 1)),
                 jnp.tile(bargs["cond"], (reps, 1, 1))]
            )
            xin = jnp.concatenate([x, x])
            tin = jnp.concatenate([t, t])
            out = self.unet.apply(bargs["unet"], xin, tin, ctx)
            un, tx = jnp.split(out, 2, axis=0)
            return un + g * (tx - un)

        sampler = StochasticDDIMSampler(
            eps_model=eps_model, num_steps=num_inference_steps, eta=eta
        )

        def vae_decode(lat):
            return self.vae.apply(
                bargs["vae"], lat / self.vae.scaling_factor,
                method=AutoencoderKL.decode,
            )

        if "scorer" in bargs and hasattr(scorer, "params"):
            sc = lambda img, cond, t=None: scorer(img, cond, t, params=bargs["scorer"])
        elif "scorer" in bargs and hasattr(scorer, "variables"):
            sc = lambda img, cond, t=None: scorer(img, cond, t, variables=bargs["scorer"])
        else:
            sc = scorer
        return SDSearchBackend(
            sampler=sampler, vae_decode=vae_decode, scorer=sc,
            scorer_cond=scorer_cond, candidate_sharding=candidate_sharding,
        )

    # ------------------------------------------------------------------ call
    def __call__(
        self,
        prompt=None,
        *,
        prompt_embeds=None,
        negative_prompt_embeds=None,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        eta: float = 1.0,
        height: int | None = None,
        width: int | None = None,
        score_function=None,
        scorer_cond=None,
        method: str = "eps_greedy",
        params: SearchParams | dict | None = None,
        key: jax.Array | None = None,
        record_noises: bool = False,
        dispatch: str = "auto",
        chunk_steps: int | None = None,
        candidate_sharding=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (images01 [B,H,W,3] in [0,1], scores [B]) — the search
        result counterpart of the reference's (output, max_score) tuple
        (pipeline:1484)."""
        if prompt_embeds is None:
            uncond, cond = self.encode_prompt(prompt)
        else:
            cond = jnp.asarray(prompt_embeds)
            uncond = (
                jnp.asarray(negative_prompt_embeds)
                if negative_prompt_embeds is not None
                else jnp.zeros_like(cond)
            )
        if isinstance(params, dict):
            remap = {"lambda": "lambda_"}
            params = SearchParams(**{remap.get(k, k): v for k, v in params.items()})
        params = params or SearchParams()
        key = key if key is not None else jax.random.key(0)
        if score_function is None:
            score_function = _zero_scorer

        b = cond.shape[0]
        bargs = {"unet": self.unet_params, "vae": self.vae_params,
                 "uncond": uncond, "cond": cond}
        if hasattr(score_function, "params"):
            bargs["scorer"] = score_function.params
        elif hasattr(score_function, "variables"):
            bargs["scorer"] = score_function.variables

        def factory(ba):
            return self.make_backend(
                ba, score_function, scorer_cond=scorer_cond,
                num_inference_steps=num_inference_steps, eta=eta,
                guidance_scale=guidance_scale, batch=b,
                candidate_sharding=candidate_sharding,
            )

        sample = self.unet.sample_size
        h = (height or sample * self.vae_scale_factor) // self.vae_scale_factor
        w = (width or sample * self.vae_scale_factor) // self.vae_scale_factor
        z = jax.random.normal(
            jax.random.fold_in(key, 0xD1F), (b, h, w, self.unet.in_channels)
        )
        # dispatch="auto" resolves inside run_search: full-size SD iterated
        # searches (the 860M UNet) get chunked per-timestep-scan dispatches.
        # The program cache anchors on the PIPELINE (this `factory` closure
        # is rebuilt per call and would miss every time); the salt carries
        # every config value the closure bakes into the trace. A scorer_cond
        # (unhashable array baked as constants) disables cross-call sharing.
        anchor = self if scorer_cond is None else None
        salt = (num_inference_steps, eta, guidance_scale, b, h, w,
                height, width, score_function, candidate_sharding)
        result: SearchResult = run_search(
            method, factory, z, key, params, backend_args=bargs,
            record_noises=record_noises, dispatch=dispatch,
            chunk_steps=chunk_steps, cache_anchor=anchor, cache_salt=salt,
        )
        return np.asarray(result.images), np.asarray(result.score)


def _find_weights(subdir: str) -> str:
    import glob
    import os

    for pattern in ("*.safetensors",):
        hits = sorted(glob.glob(os.path.join(subdir, pattern)))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no safetensors weights under {subdir}")


__all__ = ["StableDiffusionSearchPipeline"]

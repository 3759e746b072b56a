"""Text-to-image generation (SD-2.1-class) reusing the diffusion stack.

Fills the role of the reference's StableDiffusion text2img service
(reference: webapp/webapps/stablediff_text2img_webapp.py:32-60 and the
abstract base webapp/webapps/text2img_webapp.py): a plain CFG DDIM sampler
over the (depth-free) U-Net — one jitted `lax.scan`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.config import (GuidedDiffuserConfig,
                                         ModelPathsConfig)
from diffusionhandles_tpu.diffuser import GuidedStableDiffuser, SDModels
from diffusionhandles_tpu.scheduler import ddim_step
from diffusionhandles_tpu.utils.rng import seeded_randn


class Text2Img:
    """Service-level interface (reference: text2img_webapp.py)."""

    def generate(self, prompt: str, seed: int = 0) -> np.ndarray:
        raise NotImplementedError


class StableText2Img(Text2Img):
    """CFG DDIM text2img on the diffusion stack (use_depth=False for the
    SD-2.1 base config; the depth-conditioned model also works with a flat
    depth channel)."""

    def __init__(self, conf: Optional[GuidedDiffuserConfig] = None,
                 models: Optional[SDModels] = None,
                 model_paths: Optional[ModelPathsConfig] = None,
                 variant: str = "sd2"):
        conf = conf or GuidedDiffuserConfig(use_depth=False)
        self.diffuser = GuidedStableDiffuser(conf, models=models,
                                             model_paths=model_paths,
                                             variant=variant)
        self._run = None

    def _build(self):
        d = self.diffuser
        unet = d.unet_fast
        schedule = d.schedule
        gs = d.conf.guidance_scale
        timesteps = jnp.asarray(schedule.timesteps, jnp.int32)

        @jax.jit
        def run(unet_params, latents, uncond, cond):
            ctx = jnp.concatenate([uncond, cond], axis=0)

            def step(lat, i):
                lat2 = jnp.concatenate([lat, lat], axis=0)
                model_in = d._unet_in(lat2, None)
                eps, _, _ = unet.apply(unet_params, model_in, timesteps[i],
                                       ctx)
                noise_pred = eps[0] + gs * (eps[1] - eps[0])
                return ddim_step(schedule, noise_pred[None], i, lat), None

            lat, _ = jax.lax.scan(step, latents,
                                  jnp.arange(schedule.num_inference_steps))
            return lat

        return run

    def generate(self, prompt: str, seed: int = 0) -> np.ndarray:
        """prompt -> image [1, 3, H, W] float32 in [0, 1]."""
        d = self.diffuser
        lat_ch = (d.models.unet_config.in_channels
                  - (1 if d.conf.use_depth else 0))
        noise = seeded_randn((1, lat_ch, d.latent_res, d.latent_res), seed,
                             d.conf.noise_rng).transpose(0, 2, 3, 1)
        uncond = d.encode_prompt("")
        cond = d.encode_prompt(prompt)
        if self._run is None:
            self._run = self._build()
        latents = self._run(d.models.unet_params, jnp.asarray(noise),
                            uncond, cond)
        img = d.decode_latent_image(latents)
        return np.moveaxis(np.asarray(img), -1, -3)

"""Guided depth-to-image diffuser (TPU-native core).

Re-designs the reference's GuidedStableDiffuser
(reference: diffhandles/guided_stable_diffuser.py) around XLA's compilation
model:

* `initial_inference` (reference :155-275) is ONE `lax.scan` over 50 steps.
  The reference runs the conditional U-Net twice per step (a batch-1
  recording pass + a batch-2 CFG pass whose cond row repeats the same
  computation); here a single batched [uncond_t, cond] pass records the
  activations from its cond row — identical math, 1/3 fewer U-Net FLOPs.
* `guided_inference` (reference :291-488) is two scans: a guided segment
  (t < guidance_max_step) whose step runs `num_optsteps` gradient-descent
  iterations on the latents via `jax.grad` of the guidance energy
  (replacing torch.autograd.grad, reference :433), then the plain CFG
  segment. All weight schedules are precomputed host-side into dense arrays
  (reference :335-373).
* Correspondence processing (reference :490-584) happens once on the host
  into fixed-shape arrays (see guidance.process_correspondences).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.config import (GuidedDiffuserConfig,
                                         ModelPathsConfig)
from diffusionhandles_tpu.guidance import (ProcessedCorrespondences,
                                           background_loss_apply,
                                           background_orig_precompute,
                                           build_guidance_weight_schedule,
                                           foreground_loss_apply,
                                           foreground_orig_precompute,
                                           process_correspondences)
from diffusionhandles_tpu.models.clip_text import (CLIPTextConfig,
                                                   CLIPTextEncoder,
                                                   init_clip_params,
                                                   tiny_clip_config)
from diffusionhandles_tpu.models.tokenizer import load_tokenizer
from diffusionhandles_tpu.models.unet import (UNet2DCondition, UNetConfig,
                                              init_unet_params,
                                              maybe_prepare_unet_params,
                                              tiny_unet_config)
from diffusionhandles_tpu.models.vae import (AutoencoderKL, VAEConfig,
                                             init_vae_params,
                                             tiny_vae_config)
from diffusionhandles_tpu.ops.resize import resize_nhwc
from diffusionhandles_tpu.scheduler import (add_noise,
                                            ddim_step, make_ddim_schedule)
from diffusionhandles_tpu.utils.aot import AotStore
from diffusionhandles_tpu.utils.rng import seeded_randn


# activation-stack storage dtypes (config.activation_store_dtype)
ACT_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


class GuidedDiffuser:
    """Abstract diffuser interface (reference: diffhandles/guided_diffuser.py)."""

    def __init__(self, conf: GuidedDiffuserConfig):
        self.conf = conf

    def get_depth_intrinsics(self):
        raise NotImplementedError

    def encode_latent_image(self, image):
        raise NotImplementedError

    def decode_latent_image(self, latent_image):
        raise NotImplementedError

    def initial_inference(self, init_latents, depth, uncond_embeddings,
                          prompt):
        raise NotImplementedError

    def guided_inference(self, latents, depth, uncond_embeddings, prompt,
                         activations_orig, correspondences, **kwargs):
        raise NotImplementedError


@dataclasses.dataclass
class SDModels:
    """Bundle of the SD-2-depth component models and parameters."""

    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text_encoder: CLIPTextEncoder
    text_params: Any
    tokenizer: Any
    unet_config: UNetConfig
    vae_config: VAEConfig
    clip_config: CLIPTextConfig


def create_sd_models(model_paths: Optional[ModelPathsConfig] = None,
                     conf: Optional[GuidedDiffuserConfig] = None,
                     variant: str = "sd2",
                     seed: int = 0) -> SDModels:
    """Create the SD stack.

    variant='sd2': real SD-2-depth architecture; weights converted from
      `model_paths.checkpoint_dir` if given, else seeded-random at real
      shapes (bench/CI mode).
    variant='tiny': miniature architecture for tests.
    """
    conf = conf or GuidedDiffuserConfig()
    if isinstance(conf.dtype, str):
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "float16": jnp.float16}[conf.dtype]
    else:
        dtype = conf.dtype

    if isinstance(conf.param_dtype, str):
        param_dtype = {"bfloat16": jnp.bfloat16,
                       "float32": jnp.float32}[conf.param_dtype]
    else:
        param_dtype = conf.param_dtype

    if variant == "tiny":
        ucfg = tiny_unet_config(
            in_channels=5 if conf.use_depth else 4,
            remat=conf.remat_guidance)
        vcfg = tiny_vae_config()
        ccfg = tiny_clip_config()
    else:
        in_ch = 5 if conf.use_depth else 4
        # Conv strategy (hardware-measured, PERFORMANCE.md): "taps" on ALL
        # U-Net paths — 3x3 convs as nine shifted row-major matmuls and
        # 1x1 shortcuts as matmuls, so fwd and fwd+bwd graphs stay in
        # [B, S, C] matmul layouts with no conv ops anywhere (autodiff of
        # einsums is more einsums). Kills the measured layout-copy churn
        # and off-roofline conv dgrads (24.4 -> 21.1 ms/step fwd+bwd vs
        # XLA convs) and beats the Pallas flattened-shift kernel on the
        # no-grad passes too (batch-2 CFG fwd 15.06 vs 17.36 ms/step,
        # round-4 A/B). conf.pallas_conv=False disables the custom path,
        # restoring plain XLA-conv graphs for A/B parity debugging.
        grad_conv = ("taps" if (getattr(conf, "pallas_conv", True)
                                and jax.default_backend() == "tpu")
                     else False)
        ucfg = UNetConfig(in_channels=in_ch, dtype=dtype,
                          param_dtype=param_dtype,
                          remat=conf.remat_guidance,
                          flash_attention=conf.flash_attention,
                          pallas_conv=grad_conv)
        # conv_impl stays "xla" here: unlike the U-Net (where taps wins),
        # the isolated 512^2 VAE decode measures 21 ms with XLA convs vs
        # 67 ms taps — no-grad, layout-stable, so XLA's conv layouts are
        # already fine. The taps mode exists for parity testing.
        vcfg = VAEConfig(dtype=dtype, param_dtype=param_dtype)
        ccfg = CLIPTextConfig()

    ckpt_dir = model_paths.checkpoint_dir if model_paths else None
    unet, unet_params = init_unet_params(ucfg, seed=seed)
    vae, vae_params = init_vae_params(vcfg, seed=seed + 1)
    clip, clip_params = init_clip_params(ccfg, seed=seed + 2)
    if ckpt_dir is not None:
        from diffusionhandles_tpu.models.weights import load_sd_checkpoint
        unet_params, vae_params, clip_params = load_sd_checkpoint(
            ckpt_dir, expected_unet=unet_params, expected_vae=vae_params,
            expected_text=clip_params)
        cast = lambda tree: jax.tree.map(
            lambda a: jnp.asarray(a, param_dtype)
            if np.asarray(a).dtype == np.float32 else jnp.asarray(a), tree)
        unet_params = cast(unet_params)
        vae_params = cast(vae_params)
        # the text encoder runs once per prompt; keep fp32 for fidelity
        clip_params = jax.tree.map(jnp.asarray, clip_params)
    tokenizer = load_tokenizer(ckpt_dir, max_length=77,
                               vocab_size=ccfg.vocab_size)
    return SDModels(unet, unet_params, vae, vae_params, clip, clip_params,
                    tokenizer, ucfg, vcfg, ccfg)


class GuidedStableDiffuser(GuidedDiffuser):
    """The depth-conditioned SD-2 diffuser with activation-guided inference."""

    def __init__(self, conf: GuidedDiffuserConfig,
                 models: Optional[SDModels] = None,
                 model_paths: Optional[ModelPathsConfig] = None,
                 variant: str = "sd2"):
        super().__init__(conf)
        self.models = models or create_sd_models(model_paths, conf, variant)
        # The flash-attention Pallas kernels (fwd + FlashAttention-2 bwd)
        # are faster than dense attention in both no-grad and grad paths at
        # SD2's 4096-token self-attention, so the base model uses them when
        # conf.flash_attention is set. Since round 4 `unet_fast` uses the
        # SAME "taps" conv strategy as the grad model (so it normally IS
        # the grad model): the round-4 batch-2 A/B retired the Pallas
        # flattened-shift kernel from the hot path — scan fwd/unet-call
        # taps 15.06 ms vs pallas 17.36 ms at batch 2 (the CFG shape) and
        # 8.52 vs ~8.9 ms at batch 1 (scripts/microbench_scan.py --b2).
        # A/B recipe for the retired flattened-shift kernel: set
        # conf.pallas_conv=False (disables this coercion) and build the
        # U-Net directly with UNetConfig(pallas_conv='flat') — with
        # conf.pallas_conv truthy, any fast_cfg mode is coerced to "taps"
        # here, so the no-grad Pallas path is NOT reachable through the
        # diffuser config alone.
        fast_cfg = self.models.unet_config
        if conf.flash_attention and not fast_cfg.flash_attention:
            fast_cfg = dataclasses.replace(fast_cfg, flash_attention=True)
        if (getattr(conf, "pallas_conv", True)  # same default as
                # create_sd_models' gate — a config object lacking the
                # field must enable/disable BOTH custom conv paths together
                and jax.default_backend() == "tpu"
                and fast_cfg.pallas_conv != "taps"):
            fast_cfg = dataclasses.replace(fast_cfg, pallas_conv="taps")
        if fast_cfg is not self.models.unet_config:
            self.unet_fast = UNet2DCondition(fast_cfg)
        else:
            self.unet_fast = self.models.unet
        self.schedule = make_ddim_schedule(conf.num_timesteps)
        self.latent_res = self.models.unet_config.sample_size
        self.image_res = (self.latent_res
                          * self.models.vae_config.downscale_factor)
        # AOT-key token for the conv strategies baked into the compiled
        # graphs (grad model / unet_fast / VAE): a persistent executable
        # store must never serve a program compiled under another mode
        self.conv_mode_tag = (
            f"{self.models.unet_config.pallas_conv}:"
            f"{self.unet_fast.config.pallas_conv}:"
            f"{getattr(self.models.vae_config, 'conv_impl', 'xla')}")
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # Small utilities (reference parity helpers)
    # ------------------------------------------------------------------

    def get_image_shape(self):
        return (self.image_res, self.image_res, 3)

    def get_feature_shape(self):
        return (self.latent_res, self.latent_res,
                self.models.unet_config.out_channels)

    @staticmethod
    def get_depth_intrinsics():
        """Pinhole intrinsics, fov 55 deg, [-1,1]^2 image plane
        (reference: guided_stable_diffuser.py:129-153)."""
        fov = 55.0
        f = 1.0 / np.tan(0.5 * fov * (np.pi / 180.0))
        return np.array([[f, 0.0, 0.0], [0.0, f, 0.0], [0.0, 0.0, 1.0]],
                        dtype=np.float32)

    def init_depth(self, depth):
        """Resize disparity to the latent grid and normalize to [-1, 1]
        (reference: guided_stable_diffuser.py:110-127, bicubic).

        Accepts [H,W], [1,H,W] or [1,1,H,W] (torch layout) or [1,H,W,1];
        returns [1, latent, latent, 1] float32.
        """
        depth = jnp.asarray(depth, jnp.float32)
        if depth.ndim == 4 and depth.shape[-1] == 1 and depth.shape[0] == 1:
            hw = depth.shape[1:3]        # [1, H, W, 1] (NHWC)
        else:
            hw = depth.shape[-2:]        # [H, W] / [1, H, W] / [1, 1, H, W]
        depth = depth.reshape(*hw)[None, ..., None]
        depth = resize_nhwc(depth, (self.latent_res, self.latent_res),
                            "bicubic")
        dmin = jnp.min(depth, axis=(1, 2, 3), keepdims=True)
        dmax = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
        return 2.0 * (depth - dmin) / (dmax - dmin) - 1.0

    # ------------------------------------------------------------------
    # AOT program names. The builders below register their compiled
    # programs in the AOT store under these exact strings; the pipeline
    # facade uses the same helpers to compose its prefetch order and the
    # cold-start routing checks (utils/aot.py name_stored/name_loaded),
    # so the two can never drift apart.
    # ------------------------------------------------------------------

    def vae_encode_program_name(self) -> str:
        return (f"vae_encode:{self.models.vae_config.scaling_factor}:"
                f"{self.conf.dtype}:{self.conv_mode_tag}")

    def vae_decode_program_name(self) -> str:
        return (f"vae_decode:{self.models.vae_config.scaling_factor}:"
                f"{self.conf.dtype}:{self.conv_mode_tag}")

    def initial_program_name(self) -> str:
        return (f"initial:{self.conf.guidance_scale}:{self.conf.dtype}:"
                f"{self.conf.activation_store_dtype}:{self.conv_mode_tag}")

    def guided_program_name(self, emit_steps: bool) -> str:
        conf = self.conf
        return (f"guided:{conf.guidance_scale}:{conf.guidance_lr}:"
                f"{conf.bg_loss_type}:{conf.fg_patch_size}:"
                f"{conf.bg_patch_size}:{emit_steps}:{conf.dtype}:"
                f"{self.conv_mode_tag}")

    def encode_prompt(self, prompt: str) -> jnp.ndarray:
        """CLIP-encode a prompt -> [1, 77, D] (jitted + memoized)."""
        if "text_apply" not in self._jit_cache:
            self._jit_cache["text_apply"] = AotStore.default().wrap(
                "text_apply", self.models.text_encoder.apply)
            self._jit_cache["prompt_embeds"] = {}
        cache = self._jit_cache["prompt_embeds"]
        if prompt not in cache:
            ids = jnp.asarray(self.models.tokenizer([prompt]), jnp.int32)
            cache[prompt] = self._jit_cache["text_apply"](
                self.models.text_params, ids)
        return cache[prompt]

    def init_prompt(self, prompt: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(uncond, cond) embeddings (reference: init_prompt :93-108)."""
        return self.encode_prompt(""), self.encode_prompt(prompt)

    def encode_latent_image(self, image) -> jnp.ndarray:
        """[1,H,W,3] in [0,1] -> scaled latents [1,h,w,4]
        (reference: stable_null_inverter.py:89-110)."""
        if "vae_encode" not in self._jit_cache:
            scaling = self.models.vae_config.scaling_factor
            self._jit_cache["vae_encode"] = AotStore.default().wrap(
                self.vae_encode_program_name(),
                lambda p, img: self.models.vae.apply(
                    p, img * 2.0 - 1.0,
                    method=AutoencoderKL.encode) * scaling)
        return self._jit_cache["vae_encode"](
            self.models.vae_params, jnp.asarray(image, jnp.float32))

    def decode_latent_image(self, latents) -> jnp.ndarray:
        """Scaled latents -> image [1,H,W,3] clipped to [0,1]
        (reference: guided_stable_diffuser.py:285-288,481-483)."""
        if "vae_decode" not in self._jit_cache:
            scaling = self.models.vae_config.scaling_factor
            self._jit_cache["vae_decode"] = AotStore.default().wrap(
                self.vae_decode_program_name(),
                lambda p, z: jnp.clip(
                    self.models.vae.apply(
                        p, z / scaling,
                        method=AutoencoderKL.decode) / 2.0 + 0.5,
                    0.0, 1.0))
        return self._jit_cache["vae_decode"](
            self.models.vae_params, jnp.asarray(latents, jnp.float32))

    def seeded_init_latents(self) -> jnp.ndarray:
        """Initial latents from the seeded RNG: zeros noised to timesteps[0]
        (reference: guided_stable_diffuser.py:191-200)."""
        c = self.models.unet_config
        lat_ch = c.in_channels - 1 if self.conf.use_depth else c.in_channels
        # Reference shape order is NCHW; sample there and convert so the
        # torch-CPU RNG stream matches bitwise.
        noise = seeded_randn(
            (1, lat_ch, self.latent_res, self.latent_res),
            self.conf.seed, self.conf.noise_rng).transpose(0, 2, 3, 1)
        zeros = jnp.zeros_like(jnp.asarray(noise))
        return add_noise(self.schedule, zeros, jnp.asarray(noise),
                         int(self.schedule.timesteps[0]))

    def _unet_in(self, latents, depth64):
        if self.conf.use_depth:
            b = latents.shape[0]
            return jnp.concatenate(
                [latents, jnp.broadcast_to(depth64,
                                           (b,) + depth64.shape[1:])], -1)
        return latents

    # ------------------------------------------------------------------
    # Recording reconstruction pass
    # ------------------------------------------------------------------

    def _build_initial_inference(self):
        unet = self.unet_fast
        schedule = self.schedule
        gs = self.conf.guidance_scale
        act_dtype = ACT_DTYPES[
            self.conf.activation_store_dtype]
        timesteps = jnp.asarray(schedule.timesteps, jnp.int32)

        def run(unet_params, init_latents, depth64, uncond_seq, cond_emb):
            unet_params = maybe_prepare_unet_params(unet_params)
            # uncond_seq: [T, 77, D]; cond_emb: [1, 77, D].
            def step(latents, xs):
                step_idx, uncond_t = xs
                lat2 = jnp.concatenate([latents, latents], axis=0)
                model_in = self._unet_in(lat2, depth64)
                ctx = jnp.stack([uncond_t, cond_emb[0]], axis=0)
                t = timesteps[step_idx]
                eps, acts, _ = unet.apply(unet_params, model_in, t, ctx)
                # Activation capture from the cond row (batch index 1):
                # equivalent to the reference's separate batch-1 cond pass
                # (guided_stable_diffuser.py:222-240).
                recorded = tuple(a[1].astype(act_dtype) for a in acts)
                noise_pred = eps[0] + gs * (eps[1] - eps[0])
                new_latents = ddim_step(schedule, noise_pred[None], step_idx,
                                        latents)
                return new_latents, recorded

            xs = (jnp.arange(schedule.num_inference_steps), uncond_seq)
            final_latents, acts = jax.lax.scan(step, init_latents, xs)
            return acts, final_latents

        return AotStore.default().wrap(self.initial_program_name(), run)

    def initial_inference(self, init_latents, depth, uncond_embeddings,
                          prompt: str):
        """Depth-conditioned reconstruction that records decoder activations.

        Returns (activations, latents, uncond_embeddings, init_latents) with
        activations a list of 3 arrays [T, H, W, C] (NHWC; the reference's
        [T, C, H, W] stacks, guided_stable_diffuser.py:270-275).
        """
        T = self.schedule.num_inference_steps
        depth64 = self.init_depth(depth) if self.conf.use_depth else None
        cond = self.encode_prompt(prompt)
        if uncond_embeddings is None:
            uncond = self.encode_prompt("")
            uncond_seq = jnp.broadcast_to(uncond,
                                          (T,) + uncond.shape[1:])
        else:
            uncond_seq = jnp.asarray(uncond_embeddings, jnp.float32)
            uncond_seq = uncond_seq.reshape((uncond_seq.shape[0],)
                                            + uncond_seq.shape[-2:])
            if uncond_seq.shape[0] == 1:
                uncond_seq = jnp.broadcast_to(uncond_seq,
                                              (T,) + uncond_seq.shape[1:])
        if init_latents is None:
            init_latents = self.seeded_init_latents()
        init_latents = jnp.asarray(init_latents, jnp.float32)

        # gs is baked into the compiled closure, so it must key the cache
        # (a conf mutated between calls would otherwise reuse the stale
        # constant silently)
        ikey = ("initial", self.conf.guidance_scale)
        if ikey not in self._jit_cache:
            self._jit_cache[ikey] = self._build_initial_inference()
        acts, latents = self._jit_cache[ikey](
            self.models.unet_params, init_latents, depth64, uncond_seq, cond)
        return list(acts), latents, uncond_seq, init_latents

    # ------------------------------------------------------------------
    # Guided inference
    # ------------------------------------------------------------------

    def _build_guided_inference(self, bg_loss_type: str, fg_patch: int,
                                bg_patch: int, num_optsteps: int,
                                guidance_max_step: int, emit_steps: bool):
        unet = self.models.unet          # grad path (taps convs)
        unet_fast = self.unet_fast       # no-grad CFG (taps convs too)
        schedule = self.schedule
        gs = self.conf.guidance_scale
        glr = self.conf.guidance_lr
        timesteps = jnp.asarray(schedule.timesteps, jnp.int32)
        act_size = (self.latent_res, self.latent_res)

        def cfg_step(unet_params, latents, depth64, uncond_t, cond_emb,
                     step_idx):
            lat2 = jnp.concatenate([latents, latents], axis=0)
            model_in = self._unet_in(lat2, depth64)
            ctx = jnp.stack([uncond_t, cond_emb[0]], axis=0)
            eps, _, _ = unet_fast.apply(unet_params, model_in,
                                        timesteps[step_idx], ctx)
            noise_pred = eps[0] + gs * (eps[1] - eps[0])
            return ddim_step(schedule, noise_pred[None], step_idx, latents)

        def energy(latents, unet_params, depth64, cond_emb, step_idx,
                   fg_pre, bg_pre, fgw_it, bgw_it, pc):
            model_in = self._unet_in(latents, depth64)
            _, acts, _ = unet.apply(unet_params, model_in,
                                    timesteps[step_idx], cond_emb)
            loss = 0.0
            for k in range(3):
                loss = loss + fgw_it[k] * foreground_loss_apply(
                    fg_pre[k], acts[k][0], pc, fg_patch, act_size)
                loss = loss + bgw_it[k] * background_loss_apply(
                    bg_pre[k], acts[k][0], pc, bg_patch, act_size,
                    bg_loss_type)
            return loss

        grad_energy = jax.grad(energy)

        def run(unet_params, init_latents, depth64, uncond_seq, cond_emb,
                acts_orig, fgw, bgw, pc):
            unet_params = maybe_prepare_unet_params(unet_params)
            # acts_orig: tuple of 3 [T, H, W, C]; fgw/bgw: [T, opt, 3]
            # (zero past guidance_max_step). ONE scan over all T steps with
            # the guidance under a lax.cond — not a guided scan + a plain
            # scan: two scan bodies each inline a full batch-2 CFG U-Net
            # instance, and executable bytes are the cold-start budget
            # (~30-50 ms of fresh-process tunnel time per MB,
            # PERFORMANCE.md "Cold start"). The cond's identity branch
            # reproduces the reference's empty opt loop past
            # guidance_max_step (guided_stable_diffuser.py:392,443-479).
            def step(latents, xs):
                step_idx, uncond_t, acts_orig_t, fgw_t, bgw_t = xs

                def opt_iters(lat):
                    # Latent-independent halves of the losses, hoisted out
                    # of the opt iterations (and out of jax.grad's tape):
                    # computed once per denoising step, not num_optsteps
                    # times.
                    fg_pre = tuple(foreground_orig_precompute(
                        acts_orig_t[k], pc, fg_patch, act_size)
                        for k in range(3))
                    bg_pre = tuple(background_orig_precompute(
                        acts_orig_t[k], pc, bg_patch, act_size,
                        bg_loss_type) for k in range(3))

                    def one_iter(it, la):
                        g = grad_energy(la, unet_params, depth64, cond_emb,
                                        step_idx, fg_pre, bg_pre, fgw_t[it],
                                        bgw_t[it], pc)
                        return la - glr * g

                    return jax.lax.fori_loop(0, num_optsteps, one_iter, lat)

                latents = jax.lax.cond(step_idx < guidance_max_step,
                                       opt_iters, lambda la: la, latents)
                # past guidance_max_step the "post opt" decode is the
                # previous step's latents, like the reference's empty loop
                post_opt = latents
                latents = cfg_step(unet_params, latents, depth64, uncond_t,
                                   cond_emb, step_idx)
                out = (post_opt, latents) if emit_steps else None
                return latents, out

            T = schedule.num_inference_steps
            idx = jnp.arange(T)
            latents, steps = jax.lax.scan(
                step, init_latents, (idx, uncond_seq, acts_orig, fgw, bgw))
            return latents, steps

        # _build_guided_inference is only ever invoked with this conf's
        # values (guided_inference passes conf.* through), so the
        # conf-derived program name is the one this program registers under
        assert (bg_loss_type, fg_patch, bg_patch) == (
            self.conf.bg_loss_type, self.conf.fg_patch_size,
            self.conf.bg_patch_size)
        return AotStore.default().wrap(
            self.guided_program_name(emit_steps), run)

    def guided_inference(self, latents, depth, uncond_embeddings,
                         prompt: str, activations_orig: Sequence,
                         correspondences, fg_weight: Optional[float] = None,
                         bg_weight: Optional[float] = None,
                         save_denoising_steps: bool = False,
                         processed_correspondences: Optional[
                             ProcessedCorrespondences] = None):
        """Guided denoising toward 3D-warped activations.

        Returns the edited image [1, H, W, 3] in [0, 1] (and per-step decoded
        images when save_denoising_steps).
        """
        conf = self.conf
        fg_weight = conf.fg_weight if fg_weight is None else fg_weight
        bg_weight = conf.bg_weight if bg_weight is None else bg_weight
        T = self.schedule.num_inference_steps

        if processed_correspondences is None:
            # correspondences live in the DEPTH map's pixel space, which
            # need not be the model's native resolution (the reference uses
            # depth.shape[-1], diffhandles/guided_stable_diffuser.py) — a
            # hard-coded 512 would silently drop points beyond 512 and bin
            # the rest into wrong latent cells for e.g. 768^2 depth inputs
            depth_res = int(max(np.asarray(depth).shape[-2:]))
            pc = process_correspondences(
                np.asarray(correspondences), img_res=depth_res,
                bg_erosion=conf.bg_erosion,
                max_corr=conf.max_correspondences,
                latent_res=self.latent_res)
        else:
            pc = processed_correspondences

        depth64 = self.init_depth(depth) if conf.use_depth else None
        cond = self.encode_prompt(prompt)
        uncond_seq = jnp.asarray(uncond_embeddings, jnp.float32)
        uncond_seq = uncond_seq.reshape((uncond_seq.shape[0],)
                                        + uncond_seq.shape[-2:])
        if uncond_seq.shape[0] == 1:
            uncond_seq = jnp.broadcast_to(uncond_seq,
                                          (T,) + uncond_seq.shape[1:])

        # full [T, opt, 3], zero past guidance_max_step (the merged scan
        # gates the opt iterations on step_idx < guidance_max_step)
        fgw, bgw = build_guidance_weight_schedule(
            fg_weight, bg_weight, conf.guidance_max_step, T,
            conf.num_optsteps, conf.guidance_schedule_type)

        # every conf scalar baked into the compiled closure keys the cache
        # (guidance_scale/guidance_lr were omitted once: mutating conf
        # between calls silently reused the stale constants)
        key = ("guided", conf.bg_loss_type, conf.fg_patch_size,
               conf.bg_patch_size, conf.num_optsteps,
               conf.guidance_max_step, save_denoising_steps,
               conf.guidance_scale, conf.guidance_lr)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_guided_inference(
                conf.bg_loss_type, conf.fg_patch_size, conf.bg_patch_size,
                conf.num_optsteps, conf.guidance_max_step,
                save_denoising_steps)

        act_dtype = ACT_DTYPES[
            conf.activation_store_dtype]
        acts_orig = tuple(jnp.asarray(a, act_dtype)
                          for a in activations_orig)
        latents = jnp.asarray(latents, jnp.float32)
        final_latents, steps = self._jit_cache[key](
            self.models.unet_params, latents, depth64, uncond_seq, cond,
            acts_orig, fgw, bgw, pc)

        image = self.decode_latent_image(final_latents)
        if save_denoising_steps:
            post_opt, post_step = steps
            denoising_steps = {
                "opt": [(np.asarray(self.decode_latent_image(post_opt[i])),
                         np.asarray(self.decode_latent_image(post_step[i])))
                        for i in range(T)],
            }
            return image, denoising_steps
        return image

    # Host-side correspondence prep, exposed for API parity
    # (reference: guided_stable_diffuser.py:490-584).
    def process_correspondences(self, correspondences, img_res: int,
                                bg_erosion: int = 0):
        return process_correspondences(
            np.asarray(correspondences), img_res=img_res,
            bg_erosion=bg_erosion, max_corr=self.conf.max_correspondences,
            latent_res=self.latent_res)

"""DiffusionHandles pipeline facade.

API parity with the reference's `DiffusionHandles` class
(reference: diffhandles/diffusion_handles.py): the four-step public API
  invert_input_image -> generate_input_image -> set_foreground ->
  transform_foreground
with the same argument/return contracts. Array interchange uses the
reference's torch NCHW layout ([1,1,H,W] depths, [1,3,H,W] images in [0,1],
[T,C,H,W] activation stacks) as numpy; internally everything is NHWC on
device.
"""

from __future__ import annotations

import pathlib
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.checkpoint import to_nchw, to_nhwc
from diffusionhandles_tpu.config import (DiffusionHandlesConfig, load_config)
from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
from diffusionhandles_tpu.geometry.depth import normalize_depth
from diffusionhandles_tpu.geometry.transform import transform_depth
from diffusionhandles_tpu.inverter import StableNullInverter
from diffusionhandles_tpu.ops.poisson import harmonize_depth


class DiffusionHandles:
    """Training-free 3D-aware image editing on TPU."""

    def __init__(self, conf: Optional[Union[DiffusionHandlesConfig, str,
                                            dict]] = None,
                 variant: str = "sd2"):
        if conf is None or isinstance(conf, (str, pathlib.Path)):
            conf = load_config(conf)
        elif isinstance(conf, dict):
            from diffusionhandles_tpu.config import config_from_dict
            conf = config_from_dict(conf)
        self.conf = conf
        self.diffuser = GuidedStableDiffuser(
            conf.guided_diffuser, model_paths=conf.model_paths,
            variant=variant)
        # the inversion must roll forward at the SAME CFG scale the guided
        # diffuser replays with, or the null-text embeddings (and the fused
        # recording captured along the inversion trajectory) describe a
        # different trajectory than the one steps 2-3 denoise on
        self.inverter = StableNullInverter(
            self.diffuser,
            guidance_scale=conf.guided_diffuser.guidance_scale)
        self.img_res = self.diffuser.image_res
        # Fresh-process cold start: deserialize the stored compiled
        # executables in pipeline order while the jitted model init runs,
        # so each phase's first call only pays the device upload
        # (utils/aot.py prefetch_async; measured decision matrix in
        # PERFORMANCE.md "Cold start"). No-op on CPU, with an empty store,
        # or when DIFFHANDLES_AOT_PREFETCH=0; =exec restores the round-3
        # dummy-execution upload prefetch (measured net loss).
        import os
        mode = os.environ.get("DIFFHANDLES_AOT_PREFETCH", "1")
        if mode != "0":
            from diffusionhandles_tpu.utils.aot import AotStore
            AotStore.default().prefetch_async(execute=(mode == "exec"))

    def to(self, device=None):
        """Device placement shim (JAX manages placement; kept for parity
        with reference: diffusion_handles.py:27-34)."""
        return self

    # ------------------------------------------------------------------

    def invert_input_image(self, img, depth, prompt: str):
        """Invert an input image (reference: diffusion_handles.py:36-56).

        Args:
          img: [1, 3, H, W] numpy in [0, 1].
          depth: [1, 1, H, W] numpy depth (NOT disparity).

        Returns (null_text_emb [T, 1, 77, D], init_noise [1, 4, h, w]),
        torch-layout numpy.
        """
        # stays a device array: init_depth consumes it directly; a
        # np.asarray here would round-trip ~1 MB through the device tunnel
        disparity = normalize_depth(1.0 / jnp.asarray(depth, jnp.float32))
        img_nhwc = to_nhwc(np.asarray(img, np.float32))
        fused = getattr(self.conf.guided_diffuser, "fused_recording", True)
        if fused:
            # Capture the recording-reconstruction activations from the
            # inversion's own conditional passes (identical trajectory —
            # see inverter.py); generate_input_image then serves them
            # without re-running the 50-step batch-2 recording scan.
            _, init_noise, null_text_emb, recording = self.inverter.invert(
                img_nhwc, disparity, prompt, num_inner_steps=5,
                record_activations=True, return_recon=False)
        else:
            _, init_noise, null_text_emb = self.inverter.invert(
                img_nhwc, disparity, prompt, num_inner_steps=5,
                return_recon=False)
        # inverter's uncond_seq is already [T, 1, 77, D] (the reference's
        # stacked uncond_embeddings[:1] layout, stable_null_inverter.py:166).
        # Both returns stay DEVICE-resident (numpy-duck-typed): pulling the
        # [50,1,77,1024] null embeddings costs ~0.45 s through the device
        # tunnel (freshly-computed arrays move at ~35 MB/s) and the usual
        # consumer immediately hands them back to the next pipeline step.
        noise_nchw = to_nchw(init_noise)
        if fused:
            acts, final_latents = recording
            self._recording = {
                "prompt": prompt,
                "depth": np.asarray(depth, np.float32),
                "null": null_text_emb, "noise": noise_nchw,
                "acts": acts, "latents": final_latents,
            }
        return null_text_emb, noise_nchw

    def generate_input_image(self, depth, prompt: str, null_text_emb=None,
                             init_noise=None):
        """Reconstruction pass that records guidance activations
        (reference: diffusion_handles.py:58-88).

        Returns (null_text_emb [T,1,77,D], init_noise [1,4,h,w],
        activations list of 3 [T,C,H,W], latent_image [1,4,h,w]).
        """
        rec = getattr(self, "_recording", None)
        # the capture is only served while fused recording is (still)
        # enabled — turning the flag off forces the standalone recording
        # scan, its documented strict-parity-debugging purpose (config.py)
        if (rec is not None
                and getattr(self.conf.guided_diffuser, "fused_recording",
                            True)
                and null_text_emb is not None
                and init_noise is not None and prompt == rec["prompt"]
                and np.array_equal(np.asarray(depth, np.float32),
                                   rec["depth"])):
            # Identity fast path (the common flow hands invert's outputs
            # straight back): no transfers. Otherwise compare ON DEVICE —
            # jnp.array_equal pulls one scalar instead of 16 MB.
            same = (null_text_emb is rec["null"]
                    and init_noise is rec["noise"])
            if not same:
                same = bool(jnp.array_equal(
                    jnp.asarray(null_text_emb, jnp.float32),
                    jnp.asarray(rec["null"], jnp.float32))) and bool(
                    jnp.array_equal(jnp.asarray(init_noise, jnp.float32),
                                    jnp.asarray(rec["noise"], jnp.float32)))
            if same:
                # Same inputs as the fused-recording inversion: the
                # recording was already captured during invert_input_image
                # (identical trajectory — inverter.py); skip the recording
                # scan.
                return (rec["null"], rec["noise"],
                        [to_nchw(a) for a in rec["acts"]],
                        to_nchw(rec["latents"]))
        disparity = normalize_depth(1.0 / jnp.asarray(depth, jnp.float32))
        if init_noise is not None:
            init_noise = to_nhwc(jnp.asarray(init_noise, jnp.float32))
        if null_text_emb is not None:
            null_text_emb = jnp.asarray(null_text_emb, jnp.float32)
        acts, latents, uncond, init_latents = self.diffuser.initial_inference(
            init_latents=init_noise, depth=disparity,
            uncond_embeddings=null_text_emb, prompt=prompt)
        return (uncond[:, None], to_nchw(init_latents),
                [to_nchw(a) for a in acts], to_nchw(latents))

    def set_foreground(self, depth, fg_mask, bg_depth):
        """Harmonize the background depth with the input depth
        (reference: diffusion_handles.py:90-111): infill the foreground
        hole of the input depth from the bg depth's Laplacian, inside the
        15x-dilated foreground mask.
        """
        depth2d = np.asarray(depth, np.float32).reshape(
            np.shape(depth)[-2], np.shape(depth)[-1])
        bg2d = np.asarray(bg_depth, np.float32).reshape(depth2d.shape)
        mask2d = np.asarray(fg_mask).reshape(depth2d.shape) > 0.5
        out = harmonize_depth(depth2d, bg2d, mask2d)
        return np.asarray(out)[None, None]

    def transform_foreground(self, depth, prompt: str, fg_mask, bg_depth,
                             null_text_emb, init_noise, activations,
                             rot_angle: Optional[float] = None,
                             rot_axis=None, translation=None,
                             fg_weight: Optional[float] = None,
                             bg_weight: Optional[float] = None,
                             use_input_depth_normalization: bool = False):
        """3D-transform the foreground and re-generate
        (reference: diffusion_handles.py:113-166).

        Returns (edited_img [1,3,H,W] in [0,1], edited_disparity [1,1,H,W])
        and, when save_denoising_steps, the per-step decoded images.
        """
        gconf = self.conf.guided_diffuser
        if self.conf.depth_transform_mode == "pc":
            # hot path: correspondence binning fused on device — no
            # per-point host round trip (the packed [N,4] interchange
            # format stays available via transform_depth for parity users)
            from diffusionhandles_tpu.geometry.transform import \
                transform_depth_pc_processed
            edited_disparity, pc = transform_depth_pc_processed(
                depth=depth, bg_depth=bg_depth, fg_mask=fg_mask,
                intrinsics=self.diffuser.get_depth_intrinsics(),
                rot_angle=rot_angle, rot_axis=rot_axis,
                translation=translation,
                use_input_depth_normalization=use_input_depth_normalization,
                bg_erosion=gconf.bg_erosion,
                max_corr=gconf.max_correspondences,
                latent_res=self.diffuser.latent_res)
            correspondences = None
        else:
            edited_disparity, correspondences = transform_depth(
                depth=depth, bg_depth=bg_depth, fg_mask=fg_mask,
                intrinsics=self.diffuser.get_depth_intrinsics(),
                rot_angle=rot_angle, rot_axis=rot_axis,
                translation=translation,
                use_input_depth_normalization=use_input_depth_normalization,
                depth_transform_mode=self.conf.depth_transform_mode)
            pc = None

        init_noise = to_nhwc(jnp.asarray(init_noise, jnp.float32))
        # keep activation stacks on device if they already live there
        # (~0.5 GB; transfers through the device tunnel dominate otherwise)
        acts_nhwc = [to_nhwc(a) for a in activations]
        results = self.diffuser.guided_inference(
            latents=init_noise, depth=edited_disparity,
            uncond_embeddings=jnp.asarray(null_text_emb, jnp.float32),
            prompt=prompt, activations_orig=acts_nhwc,
            correspondences=correspondences,
            processed_correspondences=pc,
            fg_weight=fg_weight, bg_weight=bg_weight,
            save_denoising_steps=self.conf.guided_diffuser
            .save_denoising_steps)

        edited_disparity = np.asarray(edited_disparity)
        # unblock the deferred prefetch wave (batched-editing programs):
        # the first edit's programs are all resident now, so deserializing
        # the rest no longer competes with the cold-start critical path
        from diffusionhandles_tpu.utils.aot import AotStore
        AotStore.default().first_edit_done.set()
        if self.conf.guided_diffuser.save_denoising_steps:
            edited_img, denoising_steps = results
            return (to_nchw(edited_img), edited_disparity, denoising_steps)
        return to_nchw(results), edited_disparity

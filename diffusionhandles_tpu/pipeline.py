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

import jax
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
        # Cold-start strategy (measured round 5, PERFORMANCE.md "Cold
        # start"): a program's serialized bytes depend on its conv mode —
        # the warm-fastest "taps" U-Net programs serialize ~1.4-1.7x
        # larger than their XLA-conv twins (ddim_loop 324 vs 191 MB,
        # null_opt ~1159 vs 719, guided 961 vs 632) — so when the store
        # holds the XLA-conv ("cold") set, the FIRST edit can run on it
        # (~1.1 s slower) while the taps ("hot") set deserializes in a
        # deferred wave, cutting first-edit bytes 2.45 -> 1.69 GB.
        # OPT-IN (DIFFHANDLES_COLD_START=1): on the round-5 instance the
        # tunnel's transfer-contention behavior dominated byte count —
        # same-night fresh-process first edits read 201.5 s on the plain
        # hot path vs 307 s cold-routed despite the smaller byte load
        # (PERFORMANCE.md "Round-5 cold start") — so the byte-principled
        # routing stays available but off until a runtime with stable
        # transfer bandwidth shows the cut winning.
        import os
        from diffusionhandles_tpu.utils.aot import AotStore
        store = AotStore.default()
        self._cold: Optional[Tuple] = None  # (diffuser, inverter) twin
        self._cold_ok: Optional[bool] = None
        self._cold_start = (
            os.environ.get("DIFFHANDLES_COLD_START", "0") == "1"
            and getattr(conf.guided_diffuser, "pallas_conv", True)
            and store.dir is not None
            and jax.default_backend() == "tpu")
        # Fresh-process prefetch: deserialize the stored executables in
        # pipeline order while the jitted model init runs (utils/aot.py
        # prefetch_async; decision matrix in PERFORMANCE.md "Cold start").
        # The order lists THIS config's exact program names (cold set
        # first when cold-start routing is active), so foreign store
        # entries — other conv modes, stale structure variants — never
        # ride the tunnel ahead of programs this process will call.
        # No-op on CPU, with an empty store, or when
        # DIFFHANDLES_AOT_PREFETCH=0; =exec restores the round-3
        # dummy-execution upload prefetch (measured net loss).
        mode = os.environ.get("DIFFHANDLES_AOT_PREFETCH", "1")
        if mode != "0":
            hot = self._program_names(self.diffuser, self.inverter)
            if self._cold_start and self._cold_names_stored():
                cold_d, cold_i = self._cold_twin()
                order = (("text_apply",)
                         + self._program_names(cold_d, cold_i)[1:])
                defer = hot[1:] + ("guided_batched",)
            else:
                order = hot
                defer = ("guided_batched",)
            store.prefetch_async(order=order, defer=defer,
                                 execute=(mode == "exec"))

    def to(self, device=None):
        """Device placement shim (JAX manages placement; kept for parity
        with reference: diffusion_handles.py:27-34)."""
        return self

    # ------------------------------------------------------------------
    # Cold-start routing (see __init__)
    # ------------------------------------------------------------------

    def _program_names(self, diffuser, inverter) -> Tuple[str, ...]:
        """This config's AOT program names in pipeline order (the name
        helpers are defined next to the builders that register them)."""
        fused = getattr(self.conf.guided_diffuser, "fused_recording", True)
        names = ["text_apply",
                 diffuser.vae_encode_program_name(),
                 inverter.ddim_loop_program_name(),
                 inverter.null_opt_program_name(
                     num_inner_steps=5, record=fused)]
        if not fused:
            names.append(diffuser.initial_program_name())
        names += [diffuser.vae_decode_program_name(),
                  diffuser.guided_program_name(
                      self.conf.guided_diffuser.save_denoising_steps)]
        return tuple(names)

    def _cold_twin(self):
        """(diffuser, inverter) compiled with XLA convs, sharing this
        pipeline's parameter arrays (a Flax module is stateless: the
        cold U-Net is just a different apply function over the same
        params — no second copy in HBM)."""
        if self._cold is None:
            import dataclasses

            from diffusionhandles_tpu.models.unet import UNet2DCondition
            gconf = dataclasses.replace(self.conf.guided_diffuser,
                                        pallas_conv=False)
            m = self.diffuser.models
            ucfg = dataclasses.replace(m.unet_config, pallas_conv=False)
            models = dataclasses.replace(m, unet=UNet2DCondition(ucfg),
                                         unet_config=ucfg)
            cold_d = GuidedStableDiffuser(gconf, models=models)
            cold_i = StableNullInverter(
                cold_d, guidance_scale=gconf.guidance_scale)
            self._cold = (cold_d, cold_i)
        return self._cold

    def _cold_names_stored(self) -> bool:
        """True iff the full cold program set is in the store (memoized:
        routing must never send a phase to the cold twin only to COMPILE
        an XLA-conv program on demand — that's a minutes-long stall the
        hot path would not have paid)."""
        if self._cold_ok is None:
            from diffusionhandles_tpu.utils.aot import AotStore
            store = AotStore.default()
            cold_names = self._program_names(*self._cold_twin())[1:]
            self._cold_ok = all(store.name_stored(n) for n in cold_names)
        return self._cold_ok

    def _stack(self, *hot_names: str):
        """Pick the (diffuser, inverter) pair to serve a phase whose hot
        programs are `hot_names`: hot once every named program is resident
        in this process (or cold routing is off / nothing cold is stored),
        else the XLA-conv cold twin. Phases may mix modes during the first
        edit — both are implementations of the same math (conv parity
        tests, tests/test_conv.py) and every interchange array is
        mode-independent."""
        if not self._cold_start:
            return self.diffuser, self.inverter
        from diffusionhandles_tpu.utils.aot import AotStore
        store = AotStore.default()
        if all(store.name_loaded(n) for n in hot_names):
            return self.diffuser, self.inverter
        if not self._cold_names_stored():
            # nothing cold to serve from — behave exactly as before
            # (on-demand hot load/compile)
            return self.diffuser, self.inverter
        return self._cold_twin()

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
        # cold-start routing: serve from the XLA-conv twin until this
        # phase's hot programs are resident (see _stack)
        diffuser, inverter = self._stack(
            self.diffuser.vae_encode_program_name(),
            self.inverter.ddim_loop_program_name(),
            self.inverter.null_opt_program_name(num_inner_steps=5,
                                                record=fused))
        if fused:
            # Capture the recording-reconstruction activations from the
            # inversion's own conditional passes (identical trajectory —
            # see inverter.py); generate_input_image then serves them
            # without re-running the 50-step batch-2 recording scan.
            _, init_noise, null_text_emb, recording = inverter.invert(
                img_nhwc, disparity, prompt, num_inner_steps=5,
                record_activations=True, return_recon=False)
        else:
            _, init_noise, null_text_emb = inverter.invert(
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
        diffuser, _ = self._stack(self.diffuser.initial_program_name())
        acts, latents, uncond, init_latents = diffuser.initial_inference(
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
        # cold-start routing (see _stack)
        diffuser, _ = self._stack(
            self.diffuser.guided_program_name(
                self.conf.guided_diffuser.save_denoising_steps),
            self.diffuser.vae_decode_program_name())
        results = diffuser.guided_inference(
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

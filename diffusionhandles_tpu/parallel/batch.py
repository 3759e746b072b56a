"""Batched / data-parallel editing.

No reference counterpart (the reference loops transforms serially,
test/test_diffusion_handles.py:127): on TPU the natural unit of scale is a
*batch of edits* — N rigid transforms of the same inverted image denoise
together in one vmapped scan (shared U-Net weights, shared original
activations, batched latents/depths/correspondences), optionally sharded
over the 'data' axis of a device mesh for multi-chip scale-out.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.diffuser import (ACT_DTYPES,
                                           GuidedStableDiffuser)
from diffusionhandles_tpu.guidance import (ProcessedCorrespondences,
                                           background_loss_apply,
                                           background_orig_precompute,
                                           build_guidance_weight_schedule,
                                           foreground_loss_apply,
                                           foreground_orig_precompute,
                                           process_correspondences)
from diffusionhandles_tpu.models.unet import \
    maybe_prepare_unet_params
from diffusionhandles_tpu.scheduler import ddim_step


def stack_pcs(pcs: Sequence[ProcessedCorrespondences]
              ) -> ProcessedCorrespondences:
    return ProcessedCorrespondences(
        *[jnp.stack([getattr(pc, f) for pc in pcs]) for f in
          ProcessedCorrespondences._fields])


def build_batched_guided_inference(diffuser: GuidedStableDiffuser,
                                   num_optsteps: int,
                                   guidance_max_step: int,
                                   bg_loss_type: str, fg_patch: int,
                                   bg_patch: int,
                                   mesh: Optional[jax.sharding.Mesh] = None,
                                   remat: Optional[str] = None):
    """Compile a batched guided-denoising runner.

    Returns run(unet_params, init_latents [B,..], depth64 [B,..],
    uncond_seq [T,77,D], cond [1,77,D], acts_orig (3x [T,H,W,C]),
    fgw, bgw, pcs (batched)) -> final latents [B, h, w, 4].

    remat: checkpoint policy for the GRAD-path U-Net in this batched
      program only (e.g. 'dots'). At batch 1 remat measures +18% (the
      tape fits HBM comfortably, PERFORMANCE.md round-4 negatives), but
      the BATCHED tape is what OOMs batch 16 — thinning it here can buy
      larger batches without touching the single-edit path. Defaults to
      the environment knob DIFFHANDLES_BATCHED_REMAT, else off.
    """
    import dataclasses
    import os

    from diffusionhandles_tpu.models.unet import UNet2DCondition

    if remat is None:
        remat = os.environ.get("DIFFHANDLES_BATCHED_REMAT") or None
    if remat:
        unet = UNet2DCondition(dataclasses.replace(
            diffuser.models.unet.config, remat=remat))
    else:
        unet = diffuser.models.unet      # grad path
    unet_fast = diffuser.unet_fast       # no-grad CFG path
    schedule = diffuser.schedule
    gs = diffuser.conf.guidance_scale
    glr = diffuser.conf.guidance_lr
    timesteps = jnp.asarray(schedule.timesteps, jnp.int32)
    act_size = (diffuser.latent_res, diffuser.latent_res)
    use_depth = diffuser.conf.use_depth

    def model_in(lat, depth_b):
        if use_depth:
            return jnp.concatenate([lat, depth_b], axis=-1)
        return lat

    def batch_energy(latents, unet_params, depth64, cond_emb, step_idx,
                     fg_pre, bg_pre, fgw_it, bgw_it, pcs):
        """Sum of per-sample guidance energies over ONE batched U-Net call.

        Per-sample losses are independent, so grad of the sum w.r.t. the
        batched latents IS the stack of per-sample grads — one batch-B
        fwd+bwd instead of a vmap of B batch-1 passes.
        """
        b = latents.shape[0]
        ctx = jnp.broadcast_to(cond_emb[0][None],
                               (b,) + cond_emb[0].shape)
        _, acts, _ = unet.apply(unet_params, model_in(latents, depth64),
                                timesteps[step_idx], ctx)

        def sample_loss(acts_b, pc_b, fg_pre_b, bg_pre_b):
            loss = 0.0
            for k in range(3):
                loss = loss + fgw_it[k] * foreground_loss_apply(
                    fg_pre_b[k], acts_b[k], pc_b, fg_patch, act_size)
                loss = loss + bgw_it[k] * background_loss_apply(
                    bg_pre_b[k], acts_b[k], pc_b, bg_patch, act_size,
                    bg_loss_type)
            return loss

        losses = jax.vmap(sample_loss)(tuple(acts), pcs, fg_pre, bg_pre)
        return jnp.sum(losses)

    grad_energy = jax.grad(batch_energy)

    def orig_precompute(acts_t, pcs):
        """Latent-independent loss halves per sample (see guidance.py):
        hoisted out of the opt iterations and jax.grad's tape."""
        def per_sample(pc_b):
            fg = tuple(foreground_orig_precompute(
                acts_t[k], pc_b, fg_patch, act_size) for k in range(3))
            bg = tuple(background_orig_precompute(
                acts_t[k], pc_b, bg_patch, act_size, bg_loss_type)
                for k in range(3))
            return fg, bg
        return jax.vmap(per_sample)(pcs)

    def cfg_batch(unet_params, latents, depth64, uncond_t, cond_emb,
                  step_idx):
        b = latents.shape[0]
        lat2 = jnp.concatenate([latents, latents], axis=0)
        d2 = jnp.concatenate([depth64, depth64], axis=0) if use_depth \
            else None
        ctx = jnp.concatenate(
            [jnp.broadcast_to(uncond_t[None], (b,) + uncond_t.shape),
             jnp.broadcast_to(cond_emb[0][None], (b,) + cond_emb[0].shape)],
            axis=0)
        eps, _, _ = unet_fast.apply(unet_params, model_in(lat2, d2),
                                    timesteps[step_idx], ctx)
        noise_pred = eps[:b] + gs * (eps[b:] - eps[:b])
        return ddim_step(schedule, noise_pred, step_idx, latents)

    def run_fn(unet_params, init_latents, depth64, uncond_seq, cond_emb,
               acts_orig, fgw, bgw, pcs):
        unet_params = maybe_prepare_unet_params(unet_params)
        T = schedule.num_inference_steps

        # ONE scan with the opt iterations under lax.cond, mirroring
        # diffuser._build_guided_inference: a separate plain-CFG scan
        # would inline a second batched CFG U-Net instance into the
        # executable (cold-start payload, PERFORMANCE.md "Cold start").
        # fgw/bgw are full [T, opt, 3], zero past guidance_max_step.
        def step(latents, xs):
            step_idx, uncond_t, acts_t, fgw_t, bgw_t = xs

            def opt_iters(lat):
                fg_pre, bg_pre = orig_precompute(acts_t, pcs)

                def one_iter(it, la):
                    g = grad_energy(la, unet_params, depth64, cond_emb,
                                    step_idx, fg_pre, bg_pre, fgw_t[it],
                                    bgw_t[it], pcs)
                    return la - glr * g

                return jax.lax.fori_loop(0, num_optsteps, one_iter, lat)

            latents = jax.lax.cond(step_idx < guidance_max_step,
                                   opt_iters, lambda la: la, latents)
            latents = cfg_batch(unet_params, latents, depth64, uncond_t,
                                cond_emb, step_idx)
            return latents, None

        idx = jnp.arange(T)
        latents, _ = jax.lax.scan(
            step, init_latents, (idx, uncond_seq, acts_orig, fgw, bgw))
        return latents

    if mesh is not None:
        from flax.traverse_util import flatten_dict, unflatten_dict
        from jax.sharding import NamedSharding, PartitionSpec as P

        from diffusionhandles_tpu.parallel.sharding import (_divisible,
                                                            param_spec)

        batch_sharding = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        if mesh.shape.get("model", 1) > 1:
            # Tensor-parallel parameter shardings (Megatron-style specs from
            # parallel/sharding.py), replicating non-divisible leaves — the
            # same spec + divisibility-fallback rule as shard_params, minus
            # its eager device_put (jit places via in_shardings here).
            flat = flatten_dict(diffuser.models.unet_params)
            pshard = {
                key: NamedSharding(
                    mesh, spec if _divisible(value.shape, spec, mesh)
                    else P())
                for key, value in flat.items()
                for spec in (param_spec(key, value),)}
            params_sharding = unflatten_dict(pshard)
        else:
            params_sharding = jax.tree.map(
                lambda _: rep, diffuser.models.unet_params)
        pcs_sharding = ProcessedCorrespondences(
            *[batch_sharding] * len(ProcessedCorrespondences._fields))
        return jax.jit(
            run_fn,
            in_shardings=(params_sharding, batch_sharding, batch_sharding,
                          rep, rep, rep, rep, rep, pcs_sharding),
            out_shardings=batch_sharding)
    # single-device path: persist through the AOT store like every other
    # pipeline program (diffuser._build_guided_inference) — without this a
    # fresh process pays the full batched-guided compile per batch size
    from diffusionhandles_tpu.utils.aot import AotStore
    return AotStore.default().wrap(
        f"guided_batched:{gs}:{glr}:{num_optsteps}:{guidance_max_step}:"
        f"{bg_loss_type}:{fg_patch}:{bg_patch}:{diffuser.conf.dtype}:"
        f"{diffuser.conv_mode_tag}:{remat or ''}", run_fn)


def edit_batch(handles, depth, prompt: str, fg_mask, bg_depth,
               null_text_emb, init_noise, activations,
               transforms: List[dict],
               mesh: Optional[jax.sharding.Mesh] = None,
               chunk: int = 0,
               return_disparities: bool = False) -> np.ndarray:
    """Run N transforms of one inverted image as ONE batched guided
    denoising (the TPU-native replacement for the reference's serial
    transform loop).

    transforms: list of dicts with 'rotation_angle', 'rotation_axis',
      'translation' (photogen transforms.json schema).
    chunk: when nonzero, process the transforms in fixed-size chunks of
      this batch size, padding the last chunk by repeating its final
      transform (padded outputs are discarded). Photogen samples carry
      1-20 transforms each; without padding every DISTINCT count compiles
      (and stores, ~400 MB each) its own batched program — the fixed
      chunk size keeps the whole sweep on ONE compiled program.
    return_disparities: also return the edited disparities [N, 1, H, W]
      (what the serial driver path saves per transform).

    Returns edited images [N, 3, H, W] in [0, 1] (and disparities).
    """
    from diffusionhandles_tpu.checkpoint import to_nchw, to_nhwc
    from diffusionhandles_tpu.geometry.transform import transform_depth

    if chunk and len(transforms) != chunk:
        imgs_all, disps_all = [], []
        for i in range(0, len(transforms), chunk):
            sub = transforms[i:i + chunk]
            pad = chunk - len(sub)
            imgs, disps = edit_batch(
                handles, depth, prompt, fg_mask, bg_depth, null_text_emb,
                init_noise, activations, sub + [sub[-1]] * pad, mesh=mesh,
                return_disparities=True)
            imgs_all.append(imgs[:len(sub)])
            disps_all.append(disps[:len(sub)])
        imgs = np.concatenate(imgs_all)
        disps = np.concatenate(disps_all)
        return (imgs, disps) if return_disparities else imgs

    d = handles.diffuser
    conf = d.conf
    K = d.get_depth_intrinsics()

    depth64s = []
    pcs = []
    disparities = []
    for tr in transforms:
        if handles.conf.depth_transform_mode == "pc":
            # device-fused correspondence binning (see pipeline facade)
            from diffusionhandles_tpu.geometry.transform import \
                transform_depth_pc_processed
            edited_disparity, pc = transform_depth_pc_processed(
                depth=depth, bg_depth=bg_depth, fg_mask=fg_mask,
                intrinsics=K, rot_angle=tr.get("rotation_angle"),
                rot_axis=(np.asarray(tr["rotation_axis"], np.float32)
                          if "rotation_axis" in tr else None),
                translation=(np.asarray(tr["translation"], np.float32)
                             if "translation" in tr else None),
                bg_erosion=conf.bg_erosion,
                max_corr=conf.max_correspondences,
                latent_res=d.latent_res)
        else:
            edited_disparity, corr = transform_depth(
                depth=depth, bg_depth=bg_depth, fg_mask=fg_mask,
                intrinsics=K, rot_angle=tr.get("rotation_angle"),
                rot_axis=(np.asarray(tr["rotation_axis"], np.float32)
                          if "rotation_axis" in tr else None),
                translation=(np.asarray(tr["translation"], np.float32)
                             if "translation" in tr else None),
                depth_transform_mode=handles.conf.depth_transform_mode)
            # correspondences live in the depth map's pixel space (see
            # diffuser.guided_inference), not the model's native resolution
            depth_res = int(max(np.asarray(depth).shape[-2:]))
            pc = process_correspondences(
                corr, img_res=depth_res, bg_erosion=conf.bg_erosion,
                max_corr=conf.max_correspondences, latent_res=d.latent_res)
        depth64s.append(d.init_depth(edited_disparity)[0])
        pcs.append(pc)
        disparities.append(edited_disparity)

    B = len(transforms)
    depth64 = jnp.stack(depth64s)  # [B, 64, 64, 1]
    pcs_b = stack_pcs(pcs)

    T = d.schedule.num_inference_steps
    cond = d.encode_prompt(prompt)
    uncond_seq = jnp.asarray(null_text_emb, jnp.float32)
    uncond_seq = uncond_seq.reshape((uncond_seq.shape[0],)
                                    + uncond_seq.shape[-2:])
    init_lat = jnp.asarray(to_nhwc(np.asarray(init_noise)), jnp.float32)
    init_lat = jnp.broadcast_to(init_lat[0][None],
                                (B,) + init_lat.shape[1:])

    # full [T, opt, 3], zero past guidance_max_step (the merged scan gates
    # the opt iterations on step_idx < guidance_max_step)
    fgw, bgw = build_guidance_weight_schedule(
        conf.fg_weight, conf.bg_weight, conf.guidance_max_step, T,
        conf.num_optsteps, conf.guidance_schedule_type)

    act_dtype = ACT_DTYPES[conf.activation_store_dtype]
    # device-resident transpose/cast (the stacks are ~0.5 GB; forcing numpy
    # here costs a device-tunnel round trip)
    acts_orig = tuple(jnp.asarray(to_nhwc(a), act_dtype)
                      for a in activations)

    key = ("batched_guided", B, conf.num_optsteps, conf.guidance_max_step,
           conf.bg_loss_type,
           tuple(mesh.shape.items()) if mesh is not None else None)
    if key not in d._jit_cache:
        d._jit_cache[key] = build_batched_guided_inference(
            d, conf.num_optsteps, conf.guidance_max_step,
            conf.bg_loss_type, conf.fg_patch_size, conf.bg_patch_size,
            mesh=mesh)
    latents = d._jit_cache[key](
        d.models.unet_params, init_lat, depth64, uncond_seq, cond,
        acts_orig, fgw, bgw, pcs_b)

    images = d.decode_latent_image(latents)
    images = np.moveaxis(np.asarray(images), -1, 1)
    if return_disparities:
        disps = np.stack([np.asarray(dd).reshape(1, *dd.shape[-2:])
                          for dd in disparities])
        return images, disps
    return images

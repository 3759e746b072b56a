#!/usr/bin/env python
"""Step-3 (transform_foreground) cost breakdown: the guided scan itself
accounts for ~3.0 s of the measured ~4.3 s; find where the rest goes
(depth transform, host correspondence processing, activation dtype/layout
conversion, VAE decode).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_step3.py
"""
import os
import pathlib
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import bench
    from diffusionhandles_tpu.geometry.transform import transform_depth
    from diffusionhandles_tpu.guidance import (build_guidance_weight_schedule,
                                               process_correspondences)
    from diffusionhandles_tpu.pipeline import DiffusionHandles
    from diffusionhandles_tpu.checkpoint import to_nhwc

    handles = DiffusionHandles(variant="sd2")
    sample = bench.make_sample(handles.img_res)
    prompt = "a toy cube on a table"

    print("warmup edit (compiles)...", flush=True)
    t0 = time.perf_counter()
    res = bench.run_edit(handles, sample, prompt)
    print(f"warmup: {res}", flush=True)

    # Rebuild the step-3 inputs exactly as run_edit does.
    null_text_emb, init_noise = handles.invert_input_image(
        sample["img"], sample["depth"], prompt)
    null_text_emb, init_noise, activations, _ = handles.generate_input_image(
        sample["depth"], prompt, null_text_emb, init_noise)
    bg_depth = handles.set_foreground(sample["depth"], sample["fg_mask"],
                                      sample["bg_depth"])

    d = handles.diffuser
    conf = d.conf

    def t(label, fn, n=3):
        out = fn()
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") \
            else None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
            try:
                jax.block_until_ready(out)
            except Exception:
                pass
        dt = (time.perf_counter() - t0) / n
        print(f"  {label:>28}: {dt*1e3:8.1f} ms", flush=True)
        return out

    print("step-3 sub-phases (mean of 3):", flush=True)
    disp_corr = t("transform_depth", lambda: transform_depth(
        depth=sample["depth"], bg_depth=bg_depth, fg_mask=sample["fg_mask"],
        intrinsics=d.get_depth_intrinsics(), rot_angle=20.0,
        rot_axis=np.array([0.0, 1.0, 0.0]),
        translation=np.array([0.0, 0.0, 0.1]),
        depth_transform_mode=handles.conf.depth_transform_mode))
    edited_disparity, correspondences = disp_corr

    pc = t("process_correspondences", lambda: process_correspondences(
        np.asarray(correspondences), img_res=d.image_res,
        bg_erosion=conf.bg_erosion, max_corr=conf.max_correspondences,
        latent_res=d.latent_res))

    acts_nhwc = [to_nhwc(a) for a in activations]
    act_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        conf.activation_store_dtype]
    t("acts to_nhwc+dtype", lambda: [
        jnp.asarray(to_nhwc(a), act_dtype) for a in activations])

    depth64 = d.init_depth(edited_disparity) if conf.use_depth else None
    cond = d.encode_prompt(prompt)
    uncond_seq = jnp.asarray(null_text_emb, jnp.float32)
    uncond_seq = uncond_seq.reshape((uncond_seq.shape[0],)
                                    + uncond_seq.shape[-2:])
    T_ = d.schedule.num_inference_steps
    fgw, bgw = build_guidance_weight_schedule(
        conf.fg_weight, conf.bg_weight, conf.guidance_max_step, T_,
        conf.num_optsteps, conf.guidance_schedule_type)
    fgw = fgw[:conf.guidance_max_step]
    bgw = bgw[:conf.guidance_max_step]
    key = ("guided", conf.bg_loss_type, conf.fg_patch_size,
           conf.bg_patch_size, conf.num_optsteps, conf.guidance_max_step,
           False)
    if key not in d._jit_cache:
        d._jit_cache[key] = d._build_guided_inference(
            conf.bg_loss_type, conf.fg_patch_size, conf.bg_patch_size,
            conf.num_optsteps, conf.guidance_max_step, False)
    acts_orig = tuple(jnp.asarray(a, act_dtype) for a in acts_nhwc)
    lat0 = jnp.asarray(to_nhwc(np.asarray(init_noise, np.float32)),
                       jnp.float32)

    def guided():
        out, _ = d._jit_cache[key](d.models.unet_params, lat0, depth64,
                                   uncond_seq, cond, acts_orig, fgw, bgw, pc)
        return out
    final_latents = t("guided scan (jit call)", guided, n=2)

    t("vae decode", lambda: np.asarray(d.decode_latent_image(final_latents)))

    # The full step-3 as the bench sees it, for reconciliation.
    def full():
        out = handles.transform_foreground(
            depth=sample["depth"], prompt=prompt, fg_mask=sample["fg_mask"],
            bg_depth=bg_depth, null_text_emb=null_text_emb,
            init_noise=init_noise, activations=activations,
            rot_angle=20.0, rot_axis=np.array([0.0, 1.0, 0.0]),
            translation=np.array([0.0, 0.0, 0.1]))
        np.asarray(out[0])
        return out
    t("FULL transform_foreground", full, n=2)


if __name__ == "__main__":
    main()

"""Ablation-config end-to-end coverage: no_depth and mesh transform modes
(the reference's test/config sweep axes) through the public pipeline."""

import numpy as np
import pytest

from diffusionhandles_tpu.config import (DiffusionHandlesConfig,
                                         GuidedDiffuserConfig)
from diffusionhandles_tpu.pipeline import DiffusionHandles


def _sample(res):
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.002 * yy).astype(np.float32)
    fg = ((yy >= res // 3) & (yy < 2 * res // 3)
          & (xx >= res // 3) & (xx < 2 * res // 3))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    return (depth_fg[None, None], depth[None, None],
            fg.astype(np.float32)[None, None])


def test_no_depth_mode():
    """use_depth=False (reference: test/config/no_depth.yaml): 4-channel
    U-Net, no depth concat anywhere."""
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            use_depth=False, num_timesteps=3, num_optsteps=1,
            guidance_max_step=2, dtype="float32", remat_guidance=False))
    h = DiffusionHandles(conf, variant="tiny")
    assert h.diffuser.models.unet_config.in_channels == 4
    depth, bg_depth, fg_mask = _sample(h.img_res)
    nte, noise, acts, _ = h.generate_input_image(depth, "a cube", None,
                                                 None)
    img, disp = h.transform_foreground(
        depth=depth, prompt="a cube", fg_mask=fg_mask, bg_depth=bg_depth,
        null_text_emb=nte, init_noise=noise, activations=acts,
        rot_angle=5.0, rot_axis=np.array([0, 1, 0.0]),
        translation=np.zeros(3))
    assert np.isfinite(img).all()


def test_mesh_transform_mode():
    """depth_transform_mode='mesh' (reference:
    test/config/mesh_depth_transform.yaml) through the pipeline."""
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=3, num_optsteps=1, guidance_max_step=2,
            dtype="float32", remat_guidance=False),
        depth_transform_mode="mesh")
    h = DiffusionHandles(conf, variant="tiny")
    depth, bg_depth, fg_mask = _sample(h.img_res)
    nte, noise, acts, _ = h.generate_input_image(depth, "a cube", None,
                                                 None)
    img, disp = h.transform_foreground(
        depth=depth, prompt="a cube", fg_mask=fg_mask, bg_depth=bg_depth,
        null_text_emb=nte, init_noise=noise, activations=acts,
        rot_angle=8.0, rot_axis=np.array([0, 1, 0.0]),
        translation=np.array([0.05, 0.0, 0.0]))
    assert np.isfinite(img).all()
    assert np.isfinite(disp).all()


def test_use_input_depth_normalization():
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=3, num_optsteps=1, guidance_max_step=2,
            dtype="float32", remat_guidance=False))
    h = DiffusionHandles(conf, variant="tiny")
    depth, bg_depth, fg_mask = _sample(h.img_res)
    nte, noise, acts, _ = h.generate_input_image(depth, "a cube", None,
                                                 None)
    img, disp = h.transform_foreground(
        depth=depth, prompt="a cube", fg_mask=fg_mask, bg_depth=bg_depth,
        null_text_emb=nte, init_noise=noise, activations=acts,
        rot_angle=0.0, rot_axis=np.array([0, 1, 0.0]),
        translation=np.zeros(3), use_input_depth_normalization=True)
    assert np.isfinite(img).all()

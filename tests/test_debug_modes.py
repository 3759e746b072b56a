"""Debug/observability subsystem tests: save_denoising_steps decodes,
phase timers, denoising-step galleries."""

import numpy as np
import pytest

from diffusionhandles_tpu.config import (DiffusionHandlesConfig,
                                         GuidedDiffuserConfig)
from diffusionhandles_tpu.pipeline import DiffusionHandles
from diffusionhandles_tpu.utils import profiling


def test_save_denoising_steps():
    """full_debug parity: per-step decoded images
    (reference: guided_stable_diffuser.py:329-333,444-479)."""
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=3, num_optsteps=1, guidance_max_step=2,
            dtype="float32", remat_guidance=False,
            save_denoising_steps=True))
    h = DiffusionHandles(conf, variant="tiny")
    res = h.img_res
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.002 * yy).astype(np.float32)
    fg = ((yy >= 10) & (yy < 20) & (xx >= 10) & (xx < 20))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.3

    nte, noise, acts, _ = h.generate_input_image(
        depth_fg[None, None], "a cube", None, None)
    out = h.transform_foreground(
        depth=depth_fg[None, None], prompt="a cube",
        fg_mask=fg.astype(np.float32)[None, None],
        bg_depth=depth[None, None], null_text_emb=nte, init_noise=noise,
        activations=acts, rot_angle=5.0,
        rot_axis=np.array([0, 1, 0.0]), translation=np.zeros(3))
    assert len(out) == 3
    edited_img, edited_disparity, steps = out
    assert set(steps.keys()) == {"opt"}
    assert len(steps["opt"]) == conf.guided_diffuser.num_timesteps
    img_opt, img_step = steps["opt"][0]
    assert img_opt.shape == (1, res, res, 3)
    assert np.isfinite(img_opt).all() and np.isfinite(img_step).all()


def test_phase_timers():
    profiling.reset()
    with profiling.phase_timer("phase_a"):
        pass
    with profiling.phase_timer("phase_a"):
        pass
    with profiling.phase_timer("phase_b"):
        pass
    t = profiling.timings()
    assert set(t) == {"phase_a", "phase_b"}
    rep = profiling.report(reset=True)
    assert "phase_a" in rep and "2" in rep
    assert profiling.timings() == {}


def test_denoising_steps_webpage(tmp_path):
    from diffusionhandles_tpu.testset.report import \
        generate_denoising_steps_webpage
    steps = tmp_path / "edit_000_steps"
    steps.mkdir()
    import imageio.v3 as iio
    for i in range(3):
        iio.imwrite(steps / f"step_{i:03d}_opt.png",
                    np.zeros((4, 4, 3), np.uint8))
        iio.imwrite(steps / f"step_{i:03d}_denoise.png",
                    np.zeros((4, 4, 3), np.uint8))
    out = tmp_path / "steps.html"
    generate_denoising_steps_webpage(steps, out)
    html = out.read_text()
    assert "step_002_opt.png" in html and "step_001_denoise.png" in html

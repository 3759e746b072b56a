"""Fast local preview tests (depth + colored-mesh rgb modes) on the
in-process pipeline orchestrator state (no services needed)."""

import numpy as np
import pytest

from diffusionhandles_tpu.service.pipeline_app import DiffhandlesPipeline


@pytest.fixture()
def pipeline_state():
    p = DiffhandlesPipeline.__new__(DiffhandlesPipeline)  # no clients
    from diffusionhandles_tpu.service.pipeline_app import PipelineState
    p.state = PipelineState()
    p.sample_overrides = {}
    res = 64
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.004 * yy).astype(np.float32)
    fg = ((yy >= 24) & (yy < 40) & (xx >= 24) & (xx < 40))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.5
    rng = np.random.RandomState(0)
    p.state.img = rng.rand(1, 3, res, res).astype(np.float32)
    p.state.bg_img = rng.rand(1, 3, res, res).astype(np.float32)
    p.state.depth = depth_fg[None, None]
    p.state.bg_depth = depth[None, None]
    p.state.fg_mask = fg.astype(np.float32)[None, None]
    return p


def test_preview_depth_mode(pipeline_state):
    out = pipeline_state.preview_edit(rot_angle=10.0, mode="depth")
    assert out.shape == (1, 1, 64, 64)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_preview_rgb_mode(pipeline_state):
    out = pipeline_state.preview_edit(
        translation=(0.2, 0.0, 0.0), mode="rgb")
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(out).all()
    # moving the object exposes disocclusion (darkened) pixels
    identity = pipeline_state.preview_edit(mode="rgb")
    assert np.abs(out - identity).max() > 0.05


def test_preview_requires_foreground(pipeline_state):
    pipeline_state.state.bg_depth = None
    with pytest.raises(RuntimeError):
        pipeline_state.preview_edit(mode="depth")

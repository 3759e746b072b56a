"""Device-fused correspondence processing == host path, bitwise.

The pipeline hot path (pipeline.transform_foreground, pc mode) bins
correspondences on device (guidance.process_correspondences_device via
transform_depth_pc_processed) instead of pulling the splat's per-point
fields to the host and re-binning there (transform_depth_pc +
guidance.process_correspondences — the reference-interchange path,
reference: depth_transform.py:299-336 +
guided_stable_diffuser.py:490-584). These tests pin the two paths equal,
including the scipy binary-erosion semantics of bg_erosion.
"""

import numpy as np
import pytest

from diffusionhandles_tpu.geometry.transform import (
    transform_depth_pc, transform_depth_pc_processed)
from diffusionhandles_tpu.guidance import (_erode_cross,
                                           process_correspondences)

RES = 128


def _scene():
    yy, xx = np.meshgrid(np.arange(RES), np.arange(RES), indexing="ij")
    depth = (2.0 + 0.5 * yy / RES).astype(np.float32)
    fg = ((yy >= RES // 3) & (yy < 2 * RES // 3)
          & (xx >= RES // 3) & (xx < 2 * RES // 3))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    K = np.array([[1.2, 0, 0], [0, 1.2, 0], [0, 0, 1]], np.float32)
    return (depth_fg[None, None], depth[None, None],
            fg.astype(np.float32)[None, None], K)


def _assert_pc_equal(pc_host, pc_dev):
    for name in pc_host._fields:
        a = np.asarray(getattr(pc_host, name))
        b = np.asarray(getattr(pc_dev, name))
        assert np.array_equal(a, b), (
            f"{name} differs: host {a[:8]}... dev {b[:8]}...")


@pytest.mark.parametrize("bg_erosion", [0, 3])
def test_device_processing_matches_host(bg_erosion):
    depth, bg_depth, fg_mask, K = _scene()
    kwargs = dict(rot_angle=12.0, rot_axis=np.array([0.0, 1.0, 0.0]),
                  translation=np.array([0.05, 0.0, 0.08]))
    disp_h, corr = transform_depth_pc(depth, bg_depth, fg_mask, K, **kwargs)
    assert len(corr) > 0
    pc_host = process_correspondences(corr, img_res=RES,
                                      bg_erosion=bg_erosion, max_corr=4096,
                                      latent_res=64)
    disp_d, pc_dev = transform_depth_pc_processed(
        depth, bg_depth, fg_mask, K, bg_erosion=bg_erosion, max_corr=4096,
        latent_res=64, **kwargs)
    assert np.array_equal(np.asarray(disp_h), np.asarray(disp_d))
    _assert_pc_equal(pc_host, pc_dev)


def test_device_processing_empty_foreground():
    depth, bg_depth, _, K = _scene()
    fg_mask = np.zeros_like(depth)
    disp, pc = transform_depth_pc_processed(depth, bg_depth, fg_mask, K,
                                            rot_angle=5.0, max_corr=256)
    assert np.asarray(pc.corr_w).sum() == 0
    assert np.asarray(pc.bg_mask_orig).min() == 1.0
    assert np.asarray(disp).shape == (1, 1, RES, RES)


def test_erode_cross_matches_scipy():
    import scipy.ndimage
    rng = np.random.RandomState(3)
    m = (rng.rand(64, 64) > 0.3).astype(np.float32)
    ours = np.asarray(_erode_cross(m))
    ref = scipy.ndimage.binary_erosion(m.astype(bool)).astype(np.float32)
    assert np.array_equal(ours, ref)
    # iterated (the bg_erosion > 1 path)
    it = m
    for _ in range(4):
        it = np.asarray(_erode_cross(it))
    ref4 = scipy.ndimage.binary_erosion(m.astype(bool),
                                        iterations=4).astype(np.float32)
    assert np.array_equal(it, ref4)


def test_distinct_pairs_stay_far_under_max_corr():
    """The device path's documented divergence from the host path (lowest
    cell keys kept vs highest multiplicity, guidance.py) is only reachable
    with > max_corr DISTINCT (orig-cell, trans-cell) pairs. Pin the
    unreachability argument with a realistic worst-ish case — full-frame
    foreground, large rotation — where the distinct-pair count must stay
    far below the default max_corr=16384 (= 4x the 64^2 orig-cell count;
    each orig cell warps to ~1 target cell)."""
    yy, xx = np.meshgrid(np.arange(RES), np.arange(RES), indexing="ij")
    depth = (2.0 + 0.5 * yy / RES + 0.3 * np.sin(xx / 7.0)).astype(
        np.float32)[None, None]
    fg = np.ones((1, 1, RES, RES), np.float32)  # everything is foreground
    fg[:, :, :2] = 0  # keep a sliver of bg so the path isn't the empty one
    K = np.array([[1.2, 0, 0], [0, 1.2, 0], [0, 0, 1]], np.float32)
    _, corr = transform_depth_pc(
        depth, depth + 0.4, fg, K, rot_angle=35.0,
        rot_axis=np.array([0.3, 0.9, 0.1]),
        translation=np.array([0.1, -0.05, 0.12]))
    corr = np.asarray(corr)
    assert len(corr) > 0
    scale = RES // 64
    keys = ((corr[:, 1] // scale) * 64 + corr[:, 0] // scale) * 64 * 64 \
        + (corr[:, 3] // scale) * 64 + corr[:, 2] // scale
    distinct = len(np.unique(keys))
    # a full-frame 35-degree warp lands at ~1 distinct target cell per
    # orig cell; max_corr has 4x headroom over the whole orig grid
    assert distinct < 16384 // 2, distinct


def test_int32_key_guard_trips_loudly():
    """latent_res >= 216 would alias int32 packed keys (L**4 >= 2**31);
    the device path must refuse instead of corrupting correspondences."""
    from diffusionhandles_tpu.guidance import process_correspondences_device

    with pytest.raises(ValueError, match="int64"):
        process_correspondences_device(
            np.zeros(16, np.int32), np.zeros(16, np.int32),
            np.ones(16, bool), np.ones((4, 4), bool),
            np.ones((4, 4), np.float32), img_res=4, latent_res=216)

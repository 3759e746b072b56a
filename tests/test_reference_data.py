"""End-to-end geometry pipeline on REAL reference photogen data.

Loads an actual sample from the reference's test set (PIZ-compressed
depth.exr via the native C++ codec, mask.png, transforms.json) and runs
bg-depth harmonization + the 3D depth transform in both pc and mesh modes —
the full steps 2-3 geometry path on the inputs the reference ships
(reference: test/test_diffusion_handles.py:19-165)."""

import json
import pathlib

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/test/data/photogen")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference data not mounted")


def _load_sample(name="banana_fruits"):
    from diffusionhandles_tpu.utils.image_io import load_depth, load_image

    d = REF / name
    depth = np.asarray(load_depth(str(d / "depth.exr")))
    bg_depth = np.asarray(load_depth(str(d / "bg_depth.exr")))
    mask = np.asarray(load_image(str(d / "mask.png")))
    if mask.ndim == 3:
        mask = mask.mean(axis=0)
    mask = (mask > 0.5).astype(np.float32)
    transforms = json.loads((d / "transforms.json").read_text())
    return depth, bg_depth, mask, transforms


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["pc", "mesh"])
def test_depth_transform_on_reference_sample(mode):
    from diffusionhandles_tpu.geometry.transform import transform_depth
    from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
    from diffusionhandles_tpu.ops.morphology import binary_dilation_iter
    from diffusionhandles_tpu.ops.poisson import solve_laplacian_depth

    depth, bg_depth, mask, transforms = _load_sample()
    h, w = depth.shape[-2], depth.shape[-1]
    assert (h, w) == (512, 512)

    intr = GuidedStableDiffuser.get_depth_intrinsics()
    # set_foreground semantics (pipeline.py): infill the fg hole from the
    # bg depth inside the 15x-dilated mask
    dilated = binary_dilation_iter(mask > 0.5, 15)
    bg = np.asarray(solve_laplacian_depth(
        depth.reshape(h, w), bg_depth.reshape(h, w), dilated))
    assert np.isfinite(bg).all()
    depth = depth.reshape(1, 1, h, w)
    bg = bg.reshape(1, 1, h, w)
    mask = mask.reshape(1, 1, h, w)

    t = transforms["edit_001"]
    disparity, corr = transform_depth(
        depth, bg, mask, intr,
        rot_angle=float(t["rotation_angle"]),
        rot_axis=np.asarray(t["rotation_axis"], np.float32),
        translation=np.asarray(t["translation"], np.float32),
        depth_transform_mode=mode)
    disparity = np.asarray(disparity)
    assert disparity.shape == (1, 1, h, w)
    assert np.isfinite(disparity).all()
    assert disparity.min() >= 0.0
    corr = np.asarray(corr)
    # a real foreground object moved: correspondences exist and live
    # inside the image
    assert corr.shape[0] > 100
    assert corr.min() >= 0 and corr.max() < max(h, w)


@pytest.mark.slow
def test_second_reference_sample_translation_edit():
    """A second real sample (car) with a translation-dominant edit."""
    from diffusionhandles_tpu.geometry.transform import transform_depth
    from diffusionhandles_tpu.diffuser import GuidedStableDiffuser

    depth, bg_depth, mask, transforms = _load_sample("car")
    h, w = depth.shape[-2], depth.shape[-1]
    intr = GuidedStableDiffuser.get_depth_intrinsics()
    key = sorted(transforms)[-1]
    t = transforms[key]
    disparity, corr = transform_depth(
        depth.reshape(1, 1, h, w), bg_depth.reshape(1, 1, h, w),
        mask.reshape(1, 1, h, w), intr,
        rot_angle=float(t["rotation_angle"]),
        rot_axis=np.asarray(t["rotation_axis"], np.float32),
        translation=np.asarray(t["translation"], np.float32),
        depth_transform_mode="pc")
    disparity = np.asarray(disparity)
    assert disparity.shape == (1, 1, h, w)
    assert np.isfinite(disparity).all() and disparity.min() >= 0.0
    assert np.asarray(corr).shape[0] > 100

"""Texture shader tests (uv + global volume texture parity surface)."""

import numpy as np
import pytest

from diffusionhandles_tpu.geometry.mesh import depth_to_mesh
from diffusionhandles_tpu.geometry.renderer import (Camera, RasterRenderer,
                                                    RasterRendererArgs)


def _intrinsics():
    fov = 55.0
    f = 1.0 / np.tan(0.5 * fov * np.pi / 180.0)
    return np.array([[f, 0, 0], [0, f, 0], [0, 0, 1]], np.float32)


def test_uv_texture_shader():
    res = 16
    depth = np.full((res, res), 2.0, np.float32)
    mesh = depth_to_mesh(depth, _intrinsics())
    # the 'color' attribute already carries (u, v, flag) image coords
    mesh.add_vert_attribute("uv", mesh.vert_attributes["color"][:, :2])
    # horizontal red->green ramp texture
    tex = np.zeros((8, 8, 3), np.float32)
    tex[..., 0] = np.linspace(1, 0, 8)[None, :]
    tex[..., 1] = np.linspace(0, 1, 8)[None, :]
    renderer = RasterRenderer(["uv_texture", "mask"],
                              RasterRendererArgs(output_res=(res, res)))
    renderer.update_scene({"meshes": [mesh],
                           "cameras": [Camera(intrinsics=_intrinsics())],
                           "uv_textures": [tex]})
    out = renderer.render()
    img = out["uv_texture"]
    m = out["mask"]
    # left side red-ish, right side green-ish (u increases along x)
    ys, xs = np.nonzero(m)
    left = img[m & (np.arange(res)[None, :] < 4)]
    right = img[m & (np.arange(res)[None, :] > res - 5)]
    assert left[:, 0].mean() > left[:, 1].mean()
    assert right[:, 1].mean() > right[:, 0].mean()


def test_volume_texture_shader():
    res = 16
    depth = np.full((res, res), 2.0, np.float32)
    mesh = depth_to_mesh(depth, _intrinsics())
    # volume with channel value = z index
    vol = np.zeros((4, 4, 4, 1), np.float32)
    vol[..., 0] = np.arange(4)[:, None, None]
    lo, hi = mesh.bounds()
    renderer = RasterRenderer(["global_volume_texture", "mask"],
                              RasterRendererArgs(output_res=(res, res)))
    renderer.update_scene({
        "meshes": [mesh],
        "cameras": [Camera(intrinsics=_intrinsics())],
        "global_volume_texture": vol,
        "global_volume_texture_bounds": (lo - 1e-3, hi + 1e-3)})
    out = renderer.render()
    v = out["global_volume_texture"][out["mask"]]
    # flat plane at constant z: all samples land in one z slab
    assert np.isfinite(v).all()
    assert v.std() < 2.0

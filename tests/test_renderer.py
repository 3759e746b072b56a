"""Deferred-shading renderer tests (shader-zoo parity surface)."""

import numpy as np
import pytest

from diffusionhandles_tpu.geometry.mesh import depth_to_mesh
from diffusionhandles_tpu.geometry.renderer import (Camera, RasterRenderer,
                                                    RasterRendererArgs)


def _intrinsics():
    fov = 55.0
    f = 1.0 / np.tan(0.5 * fov * np.pi / 180.0)
    return np.array([[f, 0, 0], [0, f, 0], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def scene():
    res = 24
    depth = np.full((res, res), 2.0, np.float32)
    mesh = depth_to_mesh(depth, _intrinsics())
    camera = Camera(intrinsics=_intrinsics())
    return mesh, camera, res, depth


def test_all_output_layers(scene):
    mesh, camera, res, depth = scene
    renderer = RasterRenderer(
        output_names=["depth", "mask", "world_position", "camera_position",
                      "world_normal", "vertex_normal", "flat_vertex_color",
                      "face_id"],
        args=RasterRendererArgs(output_res=(res, res)))
    renderer.update_scene({"meshes": [mesh], "cameras": [camera]})
    out = renderer.render()
    inner = np.s_[1:-1, 1:-1]
    assert out["mask"][inner].all()
    np.testing.assert_allclose(out["depth"][inner], 2.0, rtol=1e-3)
    np.testing.assert_allclose(out["world_position"][inner][..., 2], 2.0,
                               rtol=1e-3)
    # flat plane at constant z: normals along +-z
    n = out["world_normal"][inner]
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-3)
    vn = out["vertex_normal"][inner]
    np.testing.assert_allclose(np.abs(vn[..., 2]), 1.0, atol=1e-3)
    # color carries (u, v, fg-flag=0) for unmasked meshes
    c = out["flat_vertex_color"][inner]
    assert c[..., 2].max() == 0.0
    assert out["face_id"][inner].min() >= 0


def test_set_output_layers_and_unknown(scene):
    mesh, camera, res, _ = scene
    renderer = RasterRenderer(["depth"],
                              RasterRendererArgs(output_res=(res, res)))
    renderer.update_scene({"meshes": [mesh], "cameras": [camera]})
    renderer.set_output_layers(["mask"])
    out = renderer.render()
    assert set(out) == {"mask"}
    renderer.set_output_layers(["bogus"])
    with pytest.raises(ValueError):
        renderer.render()


def test_extrinsics_shift(scene):
    mesh, _, res, _ = scene
    # camera moved back by 1 along +z: apparent depth increases by 1
    camera = Camera(intrinsics=_intrinsics(),
                    extrinsics_R=np.eye(3, dtype=np.float32),
                    extrinsics_t=np.array([0, 0, 1.0], np.float32))
    renderer = RasterRenderer(["depth"],
                              RasterRendererArgs(output_res=(res, res)))
    renderer.update_scene({"meshes": [mesh], "cameras": [camera]})
    out = renderer.render()
    inner = np.s_[4:-4, 4:-4]
    np.testing.assert_allclose(out["depth"][inner], 3.0, rtol=1e-2)

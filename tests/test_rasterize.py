"""Rasterizer tests: single-triangle coverage, depth-mesh identity render,
mesh-mode transform, and mesh I/O roundtrips."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusionhandles_tpu.geometry.mesh import Mesh, depth_to_mesh
from diffusionhandles_tpu.geometry.mesh_io import (load_mesh_obj,
                                                   load_mesh_ply,
                                                   save_mesh_glb,
                                                   save_mesh_obj,
                                                   save_mesh_ply)
from diffusionhandles_tpu.geometry.mesh_transform import (
    render_depth_meshes, transform_depth_mesh)
from diffusionhandles_tpu.ops.rasterize import (interpolate_attribute,
                                                project_verts, rasterize)


def _intrinsics():
    fov = 55.0
    f = 1.0 / np.tan(0.5 * fov * np.pi / 180.0)
    return np.array([[f, 0, 0], [0, f, 0], [0, 0, 1]], np.float32)


def test_single_triangle_coverage_and_depth():
    # triangle in pixel space, wound to survive culling (negative area)
    verts_px = jnp.asarray([[2.0, 2.0, 1.0],
                            [2.0, 12.0, 2.0],
                            [12.0, 2.0, 3.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize(verts_px, faces, 16, 16, foot=12)
    fid = np.asarray(out.face_id)
    assert fid[3, 3] == 0
    assert fid[0, 0] == -1
    assert fid[12, 12] == -1  # beyond hypotenuse
    z = np.asarray(out.zbuf)
    np.testing.assert_allclose(z[2, 2], 1.0, atol=1e-4)
    # barycentric z interpolation along edges
    np.testing.assert_allclose(z[12, 2], 2.0, atol=1e-3)
    np.testing.assert_allclose(z[2, 12], 3.0, atol=1e-3)


def test_backface_culling():
    verts_px = jnp.asarray([[2.0, 2.0, 1.0],
                            [12.0, 2.0, 1.0],
                            [2.0, 12.0, 1.0]], jnp.float32)  # positive area
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    out = rasterize(verts_px, faces, 16, 16, foot=12, cull_backfaces=True)
    assert (np.asarray(out.face_id) == -1).all()
    out2 = rasterize(verts_px, faces, 16, 16, foot=12, cull_backfaces=False)
    assert (np.asarray(out2.face_id) == 0).any()


def test_depth_mesh_identity_render():
    """Rendering the depth mesh of a smooth depth map must reproduce the
    depth map (interior pixels)."""
    res = 32
    rng = np.random.RandomState(0)
    yy = np.arange(res)[:, None]
    depth = (2.0 + 0.01 * yy + 0.001 * rng.rand(res, res)).astype(
        np.float32)
    K = _intrinsics()
    mesh = depth_to_mesh(depth, K)
    zbuf, color, mask = render_depth_meshes(mesh, K, res, res)
    z = np.asarray(zbuf)
    inner = np.s_[1:-1, 1:-1]
    assert np.asarray(mask)[inner].all()
    np.testing.assert_allclose(z[inner], depth[inner], rtol=2e-2)
    # interpolated source uv at pixel centers == pixel coords
    c = np.asarray(color)
    u = c[inner][..., 0] * (res - 1)
    v = c[inner][..., 1] * (res - 1)
    xx_e, yy_e = np.meshgrid(np.arange(res), np.arange(res), indexing="xy")
    np.testing.assert_allclose(u, xx_e[inner], atol=0.3)
    np.testing.assert_allclose(v, yy_e[inner], atol=0.3)


def test_transform_depth_mesh_identity():
    res = 32
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.002 * yy).astype(np.float32)
    fg = ((yy >= 10) & (yy < 20) & (xx >= 10) & (xx < 20))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.3
    disp, corr = transform_depth_mesh(
        depth_fg[None, None], depth[None, None],
        fg.astype(np.float32)[None, None], _intrinsics(),
        rot_angle=0.0, rot_axis=np.array([0, 1, 0.0]),
        translation=np.zeros(3))
    disp = np.asarray(disp)[0, 0]
    assert disp.shape == (res, res)
    assert np.isfinite(disp).all()
    assert len(corr) > 0
    # identity: source and target pixels agree (within rounding)
    assert np.abs(corr[:, 0] - corr[:, 2]).max() <= 1
    assert np.abs(corr[:, 1] - corr[:, 3]).max() <= 1


def test_mesh_io_roundtrips(tmp_path):
    res = 8
    depth = np.full((res, res), 2.0, np.float32)
    mesh = depth_to_mesh(depth, _intrinsics())
    # OBJ
    p = tmp_path / "m.obj"
    save_mesh_obj(p, mesh)
    back, _, _ = load_mesh_obj(p)
    np.testing.assert_allclose(back.verts, mesh.verts, rtol=1e-5)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    np.testing.assert_allclose(back.vert_attributes["color"],
                               mesh.vert_attributes["color"], atol=1e-6)
    # PLY
    p2 = tmp_path / "m.ply"
    save_mesh_ply(p2, mesh)
    back2 = load_mesh_ply(p2)
    np.testing.assert_allclose(back2.verts, mesh.verts, rtol=1e-5)
    np.testing.assert_array_equal(back2.faces, mesh.faces)
    # GLB writes a valid container
    p3 = tmp_path / "m.glb"
    save_mesh_glb(p3, mesh)
    raw = p3.read_bytes()
    assert raw[:4] == b"glTF"
    import struct
    assert struct.unpack("<I", raw[8:12])[0] == len(raw)


def test_obj_per_face_uv_indices(tmp_path):
    """The reference's custom OBJ writer exists for per-face UV indices
    (mesh_io_obj.py:404); verify write/read of v/vt faces."""
    mesh = Mesh(verts=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                               np.float32),
                faces=np.array([[0, 1, 2]], np.int32))
    uvs = np.array([[0, 0], [1, 0], [0, 1], [0.5, 0.5]], np.float32)
    fuv = np.array([[3, 1, 2]], np.int32)
    p = tmp_path / "uv.obj"
    save_mesh_obj(p, mesh, uvs=uvs, face_uv_indices=fuv)
    back, uvs2, fuv2 = load_mesh_obj(p)
    np.testing.assert_allclose(uvs2, uvs, atol=1e-6)
    np.testing.assert_array_equal(fuv2, fuv)

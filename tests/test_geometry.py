"""Geometry engine tests: lift/project roundtrip, z-buffer vs a sequential
oracle, morphology vs cv2/scipy, Poisson CG vs scipy sparse direct solve."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusionhandles_tpu.geometry.depth import (depth_to_world_coords,
                                                 normalize_depth,
                                                 points_to_depth)
from diffusionhandles_tpu.geometry.transform import (transform_depth_pc,
                                                     transform_points,
                                                     transform_point_cloud)


def _intrinsics():
    fov = 55.0
    f = 1.0 / np.tan(0.5 * fov * np.pi / 180.0)
    return np.array([[f, 0, 0], [0, f, 0], [0, 0, 1]], np.float32)


def test_lift_project_roundtrip():
    """depth -> world -> splat must reproduce the depth map on the grid."""
    res = 64
    rng = np.random.RandomState(0)
    depth = (2.0 + rng.rand(res, res)).astype(np.float32)
    K = _intrinsics()
    pts = depth_to_world_coords(depth[None, None], K)
    assert pts.shape == (res, res, 3)
    # z-coordinate equals depth (camera looks along +z after the M flip).
    np.testing.assert_allclose(np.asarray(pts[..., 2]), depth, rtol=1e-5)
    splat = points_to_depth(np.asarray(pts).reshape(-1, 3), K, (res, res))
    got = np.asarray(splat.depth_map)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, depth, rtol=1e-4, atol=1e-4)


def _sequential_zbuffer_oracle(points, u, v, point_mask, out_size):
    """Independent numpy port of the reference's sequential loop semantics
    (reference: depth_transform.py:689-714)."""
    depth_map = np.full(out_size, np.inf)
    depth_mask = np.full(out_size, False)
    modified = np.full(out_size, False)
    visible = np.zeros(len(points), bool)
    set_by = np.full(out_size, -1, np.int64)
    for i in range(len(points)):
        if points[i, 2] < depth_map[v[i], u[i]]:
            depth_map[v[i], u[i]] = points[i, 2]
            if point_mask[i]:
                visible[i] = True
                if set_by[v[i], u[i]] >= 0:
                    visible[set_by[v[i], u[i]]] = False
                depth_mask[v[i], u[i]] = True
                modified[v[i], u[i]] = True
                set_by[v[i], u[i]] = i
            elif modified[v[i], u[i]]:
                depth_mask[v[i], u[i]] = False
                if set_by[v[i], u[i]] >= 0:
                    visible[set_by[v[i], u[i]]] = False
                set_by[v[i], u[i]] = i
    return depth_map, depth_mask, visible


def test_zbuffer_matches_sequential_oracle():
    """Random clustered points incl. exact z-ties and fg/bg occlusions."""
    rng = np.random.RandomState(42)
    res = 16
    n = 4000
    K = _intrinsics()
    # Sample points by un-projecting random pixels at random depths; quantize
    # depths so exact ties occur.
    depth = np.round(rng.uniform(1.0, 4.0, n) * 8) / 8
    px = rng.randint(0, res, n)
    py = rng.randint(0, res, n)
    m = res - 1
    x = (px / m) * 2 - 1
    y = (py / m) * 2 - 1
    pts_cam = np.stack([x * depth / K[0, 0], y * depth / K[1, 1], depth], -1)
    pts = pts_cam * np.array([-1.0, -1.0, 1.0])  # to reference frame
    point_mask = rng.rand(n) > 0.5

    res_splat = points_to_depth(pts, K, (res, res),
                                point_mask=point_mask)
    u = np.asarray(res_splat.u)
    v = np.asarray(res_splat.v)
    np.testing.assert_array_equal(u, px)
    np.testing.assert_array_equal(v, py)

    want_depth, want_mask, want_visible = _sequential_zbuffer_oracle(
        pts_cam, u, v, point_mask, (res, res))
    np.testing.assert_allclose(np.asarray(res_splat.depth_map), want_depth,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_splat.depth_mask),
                                  want_mask)
    np.testing.assert_array_equal(np.asarray(res_splat.visible),
                                  want_visible)


def test_transform_points_identity_and_translation():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32)
    out = np.asarray(transform_points(pts, 0.0, np.array([0, 1, 0.0]),
                                      np.array([1.0, 2.0, 3.0])))
    np.testing.assert_allclose(out, pts + np.array([1, 2, 3.0]), rtol=1e-5,
                               atol=1e-5)


def test_transform_points_rotation_matches_rodrigues():
    rng = np.random.RandomState(1)
    pts = rng.randn(50, 3).astype(np.float32)
    axis = np.array([0.3, 0.9, -0.1], np.float32)
    angle = 33.0
    out = np.asarray(transform_points(pts, angle, axis, np.zeros(3)))
    # independent oracle
    a = axis / np.linalg.norm(axis)
    th = np.radians(angle)
    c, s = np.cos(th), np.sin(th)
    ctr = pts.mean(0, keepdims=True)
    p = pts - ctr
    want = (p * c + np.cross(a, p) * s
            + a * (p @ a)[:, None] * (1 - c)) + ctr
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_transform_point_cloud_masked_centroid():
    """Rotation must be about the centroid of MASKED points only."""
    res = 8
    pts = np.zeros((res, res, 3), np.float32)
    pts[..., 0] = np.arange(res)[None, :]
    pts[..., 1] = np.arange(res)[:, None]
    pts[..., 2] = 2.0
    mask = np.zeros((res, res), bool)
    mask[0:2, 0:2] = True
    out, fg_flat = transform_point_cloud(pts, np.array([0, 0, 1.0]), 180.0,
                                         np.zeros(3), mask)
    out = np.asarray(out)
    ctr = pts[mask].mean(0)
    # 180 deg about z through masked centroid: (x,y) -> 2*ctr_xy - (x,y)
    want_xy = 2 * ctr[:2] - pts[..., :2]
    np.testing.assert_allclose(out[..., :2], want_xy, atol=1e-4)
    np.testing.assert_allclose(out[..., 2], pts[..., 2], atol=1e-4)
    assert np.asarray(fg_flat).sum() == 4


def test_normalize_depth():
    d = np.linspace(2.0, 4.0, 16, dtype=np.float32).reshape(1, 1, 4, 4)
    out = np.asarray(normalize_depth(jnp.asarray(d)))
    assert out.min() == 0.0 and out.max() == 255.0
    out2, bounds = normalize_depth(jnp.asarray(d), return_bounds=True)
    out3 = np.asarray(normalize_depth(jnp.asarray(d) + 1.0, bounds=bounds))
    assert out3.max() > 255.0  # fixed bounds extrapolate


def test_transform_depth_pc_identity_transform():
    """With a zero transform, the edited disparity should closely match the
    input disparity and correspondences should map fg pixels near
    themselves."""
    res = 64
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.001 * yy).astype(np.float32)
    # an elevated square as foreground
    fg = ((yy >= 24) & (yy < 40) & (xx >= 24) & (xx < 40))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.5
    K = _intrinsics()
    disp, corr = transform_depth_pc(
        depth_fg[None, None], depth[None, None],
        fg.astype(np.float32)[None, None], K,
        rot_angle=0.0, rot_axis=np.array([0, 1, 0.0]),
        translation=np.zeros(3))
    disp = np.asarray(disp)[0, 0]
    assert disp.shape == (res, res)
    assert np.isfinite(disp).all()
    assert corr.shape[1] == 4
    assert len(corr) > 0
    # identity transform: transformed positions == original positions
    np.testing.assert_array_equal(corr[:, 0], corr[:, 2])
    np.testing.assert_array_equal(corr[:, 1], corr[:, 3])


def test_transform_depth_pc_translation_moves_object():
    res = 64
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = np.full((res, res), 2.0, np.float32)
    fg = ((yy >= 28) & (yy < 36) & (xx >= 28) & (xx < 36))
    depth_fg = depth.copy()
    depth_fg[fg] = 1.5
    K = _intrinsics()
    disp, corr = transform_depth_pc(
        depth_fg[None, None], depth[None, None],
        fg.astype(np.float32)[None, None], K,
        rot_angle=0.0, rot_axis=np.array([0, 1, 0.0]),
        translation=np.array([0.3, 0.0, 0.0], np.float32))
    assert len(corr) > 0
    # Reference frame flips x (M = diag(-1,-1,1)), so +x world translation
    # moves the object toward smaller pixel x.
    dx = corr[:, 2] - corr[:, 0]
    assert np.median(dx) < -5


def test_empty_foreground_passthrough():
    res = 32
    depth = np.full((1, 1, res, res), 2.0, np.float32)
    disp, corr = transform_depth_pc(
        depth, depth, np.zeros((1, 1, res, res), np.float32),
        _intrinsics())
    assert corr.shape == (0, 4)
    np.testing.assert_allclose(np.asarray(disp),
                               np.asarray(normalize_depth(1.0 / depth)))


def test_glb_roundtrip_with_colors():
    """save_mesh_glb -> load_mesh_glb round-trips verts/faces/COLOR_0
    (the reference reads arbitrary formats via trimesh.load_mesh,
    reference: diffhandles/mesh_io.py:17-28)."""
    import tempfile

    from diffusionhandles_tpu.geometry.mesh import Mesh
    from diffusionhandles_tpu.geometry.mesh_io import load_mesh, save_mesh

    rng = np.random.RandomState(0)
    verts = rng.rand(9, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    mesh = Mesh(verts=verts, faces=faces)
    mesh.vert_attributes["color"] = rng.rand(9, 3).astype(np.float32)

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/m.glb"
        save_mesh(path, mesh)
        loaded = load_mesh(path)
    np.testing.assert_allclose(loaded.verts, verts, rtol=1e-6)
    np.testing.assert_array_equal(loaded.faces, faces)
    np.testing.assert_allclose(loaded.vert_attributes["color"],
                               mesh.vert_attributes["color"], rtol=1e-6)


def test_lift_project_roundtrip_with_extrinsics():
    """Regression: points_to_depth must apply the INVERSE of
    depth_to_world_coords' extrinsics (cam = R @ world + t). Applying the
    lift transform both ways (as the reference's depth_transform.py:667
    does, contradicting its own :638 comment) makes any non-identity
    extrinsics corrupt the round trip by 2|t| / double rotation."""
    from scipy.spatial.transform import Rotation

    res = 32
    rng = np.random.RandomState(1)
    depth = (2.0 + rng.rand(res, res)).astype(np.float32)
    K = _intrinsics()
    R = Rotation.from_rotvec([0.0, np.deg2rad(10.0), 0.0]).as_matrix()
    t = np.array([0.05, -0.02, 0.3], np.float32)
    pts = depth_to_world_coords(depth[None, None], K,
                                extrinsics_R=R, extrinsics_t=t)
    splat = points_to_depth(np.asarray(pts).reshape(-1, 3), K, (res, res),
                            extrinsics_R=R, extrinsics_t=t)
    got = np.asarray(splat.depth_map)
    # the same camera re-projects its own lifted points onto the grid
    finite = np.isfinite(got)
    assert finite.mean() > 0.95
    np.testing.assert_allclose(got[finite], depth[finite], atol=2e-3)


def test_lift_project_roundtrip_nonsquare():
    """Regression: the splat's NDC->pixel mapping must invert
    image_plane_coords PER AXIS — (u*0.5+0.5)*(max-1) shifted the shorter
    axis of non-square maps by (max-min)/2 pixels and clipped it."""
    h, w = 16, 8
    rng = np.random.RandomState(2)
    depth = (2.0 + rng.rand(h, w)).astype(np.float32)
    K = _intrinsics()
    pts = depth_to_world_coords(depth[None, None], K)
    splat = points_to_depth(np.asarray(pts).reshape(-1, 3), K, (h, w))
    got = np.asarray(splat.depth_map)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, depth, rtol=1e-4, atol=1e-4)
    # every pixel wins exactly its own lifted point
    np.testing.assert_array_equal(
        np.asarray(splat.u).reshape(h, w),
        np.broadcast_to(np.arange(w), (h, w)))
    np.testing.assert_array_equal(
        np.asarray(splat.v).reshape(h, w),
        np.broadcast_to(np.arange(h)[:, None], (h, w)))


def test_mesh_projection_honors_full_intrinsics():
    """Regression: the mesh path projected with only K[0,0], so fx != fy
    or principal points silently diverged from the pc path. project_verts
    must land mesh vertices on the same pixels the splat produces."""
    from diffusionhandles_tpu.ops.rasterize import project_verts

    res = 16
    rng = np.random.RandomState(3)
    depth = (2.0 + rng.rand(res, res)).astype(np.float32)
    K = np.array([[1.2, 0.0, 0.05],
                  [0.0, 0.9, -0.03],
                  [0.0, 0.0, 1.0]], np.float32)
    pts = depth_to_world_coords(depth[None, None], K)
    verts = np.asarray(pts).reshape(-1, 3)
    splat = points_to_depth(verts, K, (res, res))
    proj = np.asarray(project_verts(verts, K, res, res))
    np.testing.assert_array_equal(
        np.round(proj[:, 0]).astype(np.int32), np.asarray(splat.u))
    np.testing.assert_array_equal(
        np.round(proj[:, 1]).astype(np.int32), np.asarray(splat.v))

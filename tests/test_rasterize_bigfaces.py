"""Big-face rasterization pass (ops/rasterize.py _rasterize_big) tests.

Round-1 regression: the exact big-face pass crashed with a NameError and no
test exercised it because every rasterizer test used foot=12 with <=12 px
triangles. These tests drive sliver/frame-spanning triangles through the
default foot=8 footprint split, check exact coverage against a brute-force
numpy oracle, and verify mesh-mode transforms agree with the pc path on a
rotated object (reference: depth_transform.py:91-195 vs :198-363).
"""

import numpy as np
import jax.numpy as jnp

from diffusionhandles_tpu.geometry.transform import (transform_depth,
                                                     transform_depth_pc)
from diffusionhandles_tpu.geometry.mesh_transform import transform_depth_mesh
from diffusionhandles_tpu.ops.rasterize import rasterize


def _oracle_raster(verts_px, faces, h, w, cull_backfaces=True, z_near=0.1,
                   eps=1e-8):
    """Brute-force top-1 z-buffer with first-wins ties, lowest face index."""
    verts_px = np.asarray(verts_px, np.float64)
    faces = np.asarray(faces)
    zbuf = np.full((h, w), np.inf)
    fid = np.full((h, w), -1, np.int64)
    py, px = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    for i, f in enumerate(faces):
        (u0, v0, z0), (u1, v1, z1), (u2, v2, z2) = verts_px[f]
        area = (u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0)
        if abs(area) <= eps:
            continue
        if cull_backfaces and area >= 0:
            continue
        if min(z0, z1, z2) <= z_near:
            continue
        w0 = ((u1 - px) * (v2 - py) - (u2 - px) * (v1 - py)) / area
        w1 = ((u2 - px) * (v0 - py) - (u0 - px) * (v2 - py)) / area
        w2 = 1.0 - w0 - w1
        covered = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        z = w0 * z0 + w1 * z1 + w2 * z2
        better = covered & (z < zbuf)  # strict <: first (lowest idx) wins ties
        zbuf[better] = z[better]
        fid[better] = i
    return zbuf, fid


def test_frame_spanning_sliver_triangle():
    """A disocclusion-style sliver spanning the whole frame must rasterize
    (this exact shape crashed in round 1 with foot=8)."""
    h = w = 64
    verts_px = jnp.asarray([[1.0, 1.0, 2.0],
                            [1.0, 62.0, 2.5],
                            [62.0, 30.0, 3.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)  # wound for negative area
    out = rasterize(verts_px, faces, h, w, foot=8)
    ozbuf, ofid = _oracle_raster(verts_px, faces, h, w)
    np.testing.assert_array_equal(np.asarray(out.face_id), ofid)
    cov = ofid >= 0
    assert cov.sum() > 500  # it really spans the frame
    np.testing.assert_allclose(np.asarray(out.zbuf)[cov], ozbuf[cov],
                               rtol=1e-4)


def test_mixed_small_and_big_faces_merge():
    """Small-pass and big-pass results must merge with global z order."""
    h = w = 48
    rng = np.random.RandomState(7)
    verts = []
    faces = []
    # 30 small random triangles (<= 5 px) at z ~ [4, 6]
    for _ in range(30):
        cu, cv = rng.uniform(3, 44, 2)
        base = len(verts)
        tri = np.array([[cu, cv], [cu, cv + rng.uniform(1, 5)],
                        [cu + rng.uniform(1, 5), cv]])
        z = rng.uniform(4, 6, 3)
        for k in range(3):
            verts.append([tri[k, 0], tri[k, 1], z[k]])
        faces.append([base, base + 1, base + 2])
    # 3 big frame-spanning triangles, one in FRONT of everything (z ~ 1)
    big = [([1, 1, 1.0], [1, 46, 1.2], [46, 24, 1.4]),
           ([2, 2, 8.0], [2, 45, 8.0], [45, 23, 8.0]),
           ([5, 0, 3.0], [0, 47, 3.5], [47, 47, 3.2])]
    for tri in big:
        base = len(verts)
        verts.extend(tri)
        faces.append([base, base + 1, base + 2])  # negative-area winding
    verts_px = jnp.asarray(np.array(verts, np.float32))
    faces_a = jnp.asarray(np.array(faces, np.int32))
    out = rasterize(verts_px, faces_a, h, w, foot=8)
    ozbuf, ofid = _oracle_raster(verts_px, faces_a, h, w)
    np.testing.assert_array_equal(np.asarray(out.face_id), ofid)
    cov = ofid >= 0
    np.testing.assert_allclose(np.asarray(out.zbuf)[cov], ozbuf[cov],
                               rtol=1e-4)
    # the front big face must actually win somewhere
    assert (ofid == 30).any()


def _scene(res=64):
    """Depth map with a sharp interior discontinuity (raised fg box)."""
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    bg_depth = (2.5 + 0.004 * yy).astype(np.float32)
    fg = ((yy >= 20) & (yy < 44) & (xx >= 20) & (xx < 44))
    depth = bg_depth.copy()
    depth[fg] -= 0.8  # strong step -> stretched sliver triangles at edges
    fov = 55.0
    f = 1.0 / np.tan(0.5 * fov * np.pi / 180.0)
    K = np.array([[f, 0, 0], [0, f, 0], [0, 0, 1]], np.float32)
    return depth, bg_depth, fg.astype(np.float32), K


def test_mesh_transform_rotated_runs_and_matches_pc():
    """25-degree rotation: mesh-mode must run on discontinuous depth (big
    faces at the depth edge) and agree with the pc path on correspondence
    targets and foreground placement."""
    depth, bg_depth, fg, K = _scene(64)
    kwargs = dict(rot_angle=25.0, rot_axis=np.array([0.0, 1.0, 0.0]),
                  translation=np.array([0.02, 0.0, 0.0], np.float32))
    disp_m, corr_m = transform_depth_mesh(
        depth[None, None], bg_depth[None, None], fg[None, None], K, **kwargs)
    disp_p, corr_p = transform_depth_pc(
        depth[None, None], bg_depth[None, None], fg[None, None], K, **kwargs)
    disp_m = np.asarray(disp_m)[0, 0]
    disp_p = np.asarray(disp_p)[0, 0]
    assert np.isfinite(disp_m).all() and np.isfinite(disp_p).all()
    assert len(corr_m) > 50 and len(corr_p) > 50

    # Correspondence parity: for source pixels both paths kept, the target
    # pixels must agree within a couple of px (rounding + splat vs raster).
    def to_map(corr):
        return {(int(x), int(y)): (int(u), int(v))
                for x, y, u, v in np.asarray(corr)}
    m_map, p_map = to_map(corr_m), to_map(corr_p)
    common = set(m_map) & set(p_map)
    assert len(common) > 0.5 * min(len(m_map), len(p_map))
    d = np.array([np.hypot(m_map[k][0] - p_map[k][0],
                           m_map[k][1] - p_map[k][1]) for k in common])
    assert np.median(d) <= 1.5
    assert (d <= 3.0).mean() > 0.9

    # Foreground moved consistently: mean target position agrees.
    tm = np.asarray(corr_m)[:, 2:].mean(0)
    tp = np.asarray(corr_p)[:, 2:].mean(0)
    assert np.abs(tm - tp).max() < 2.0


def test_mesh_ablation_dispatch_rotated():
    """transform_depth(mode='mesh') with rotation on realistic discontinuous
    geometry (the configs/mesh_depth_transform.yaml path) must not raise."""
    depth, bg_depth, fg, K = _scene(96)
    disp, corr = transform_depth(
        depth[None, None], bg_depth[None, None], fg[None, None], K,
        rot_angle=25.0, rot_axis=np.array([0.0, 1.0, 0.0]),
        translation=np.zeros(3), depth_transform_mode="mesh")
    disp = np.asarray(disp)[0, 0]
    assert disp.shape == (96, 96)
    assert np.isfinite(disp).all()
    assert len(corr) > 0

"""Top-K rasterization + sigmoid soft blending.

Covers the reference's faces_per_pixel>1 / blend_type='sigmoid' renderer
capabilities (reference: pytorch3d_renderer.py:31-53 RasterizationSettings
and :341-358 sigmoid_alpha_blend) against a brute-force per-pixel oracle.
"""

import numpy as np
import pytest

from diffusionhandles_tpu.geometry.mesh import Mesh
from diffusionhandles_tpu.geometry.renderer import (Camera, RasterRenderer,
                                                    RasterRendererArgs)
from diffusionhandles_tpu.ops.rasterize import (project_verts, rasterize,
                                                rasterize_k,
                                                sigmoid_alpha_blend)


def _random_scene(n_faces=24, seed=0, big=False):
    """Random camera-facing triangles at distinct depths; `big` adds two
    frame-spanning slivers to exercise the big-face pass."""
    rng = np.random.RandomState(seed)
    H = W = 32
    verts = []
    faces = []
    for i in range(n_faces):
        cx, cy = rng.uniform(4, W - 4), rng.uniform(4, H - 4)
        r = rng.uniform(2.0, 5.0)
        z = 2.0 + 0.05 * i
        ang = rng.uniform(0, 2 * np.pi, 3)
        # wind CCW in screen space (y-down): sort angles descending
        ang = np.sort(ang)[::-1]
        for a in ang:
            verts.append([cx + r * np.cos(a), cy + r * np.sin(a), z])
        faces.append([3 * i, 3 * i + 1, 3 * i + 2])
    if big:
        z = 1.5
        verts += [[-2.0, 10.0, z], [W + 2.0, 12.5, z], [-2.0, 11.5, z]]
        verts += [[5.0, -2.0, z + 4.0], [6.5, H + 2.0, z + 4.0],
                  [4.0, H + 2.0, z + 4.0]]
        faces.append([len(verts) - 6, len(verts) - 5, len(verts) - 4])
        faces.append([len(verts) - 3, len(verts) - 2, len(verts) - 1])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32),
            H, W)


def _oracle_topk(verts_px, faces, H, W, K, blur_px2=0.0):
    """Brute-force: all faces x all pixels, sort by (z, fid)."""
    m = max(H, W) - 1
    ndc2 = (2.0 / m) ** 2
    zbuf = np.full((K, H, W), np.inf, np.float32)
    fid = np.full((K, H, W), -1, np.int32)
    for py in range(H):
        for px in range(W):
            frags = []
            for f, (a, b, c) in enumerate(faces):
                t = verts_px[[a, b, c]]
                area = ((t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
                        - (t[2, 0] - t[0, 0]) * (t[1, 1] - t[0, 1]))
                if abs(area) <= 1e-8 or area >= 0:  # cull backfaces
                    continue
                if t[:, 2].min() <= 0.1:
                    continue
                w0 = ((t[1, 0] - px) * (t[2, 1] - py)
                      - (t[2, 0] - px) * (t[1, 1] - py)) / area
                w1 = ((t[2, 0] - px) * (t[0, 1] - py)
                      - (t[0, 0] - px) * (t[2, 1] - py)) / area
                w2 = 1.0 - w0 - w1
                covered = w0 >= -1e-6 and w1 >= -1e-6 and w2 >= -1e-6
                d2 = _edge_d2(t, px, py) * ndc2
                if not covered and not (blur_px2 > 0
                                        and d2 < blur_px2 * ndc2):
                    continue
                cw = np.maximum([w0, w1, w2], 0)
                cw = cw / max(cw.sum(), 1e-12)
                z = float(cw @ t[:, 2])
                frags.append((z, f))
            frags.sort()
            for k, (z, f) in enumerate(frags[:K]):
                zbuf[k, py, px] = z
                fid[k, py, px] = f
    return zbuf, fid


def _edge_d2(t, px, py):
    best = np.inf
    for i in range(3):
        a, b = t[i, :2], t[(i + 1) % 3, :2]
        e = b - a
        tt = np.clip(((px - a[0]) * e[0] + (py - a[1]) * e[1])
                     / max(e @ e, 1e-12), 0, 1)
        q = a + tt * e
        best = min(best, (px - q[0]) ** 2 + (py - q[1]) ** 2)
    return best


@pytest.mark.parametrize("big", [False, True])
def test_topk_matches_bruteforce(big):
    verts, faces, H, W = _random_scene(seed=3, big=big)
    verts_px = np.asarray(verts, np.float32)  # already screen-space
    K = 3
    out = rasterize_k(verts_px, faces, H, W, faces_per_pixel=K, foot=12)
    zb, fb = _oracle_topk(verts_px, faces, H, W, K)
    np.testing.assert_array_equal(np.asarray(out.face_id), fb)
    got_z = np.where(np.asarray(out.face_id) >= 0, np.asarray(out.zbuf),
                     np.inf)
    np.testing.assert_allclose(got_z, zb, atol=1e-4)


def test_k1_matches_hard_rasterize():
    verts, faces, H, W = _random_scene(seed=5, big=True)
    hard = rasterize(verts, faces, H, W, foot=12)
    k1 = rasterize_k(verts, faces, H, W, faces_per_pixel=1, foot=12)
    np.testing.assert_array_equal(np.asarray(k1.face_id[0]),
                                  np.asarray(hard.face_id))
    cov = np.asarray(hard.face_id) >= 0
    np.testing.assert_allclose(np.asarray(k1.zbuf[0])[cov],
                               np.asarray(hard.zbuf)[cov], atol=1e-5)


def test_dists_sign_and_soft_alpha():
    # one triangle: interior pixels negative dist / alpha ~ 1; pixels in the
    # blur band outside get fragments with positive dist and 0 < alpha < 1
    verts = np.array([[4.0, 4.0, 2.0], [4.0, 26.0, 2.0], [26.0, 15.0, 2.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)  # negative screen area
    H = W = 32
    m = max(H, W) - 1
    ndc2 = (2.0 / m) ** 2
    blur = 9.0 * ndc2  # 3 px band
    # foot=8 forces this 22 px triangle through the exact big-face pass,
    # which also covers blur there
    out = rasterize_k(verts, faces, H, W, faces_per_pixel=1,
                      blur_radius=blur, foot=8)
    fid = np.asarray(out.face_id[0])
    d = np.asarray(out.dists[0])
    assert fid[15, 10] == 0 and d[15, 10] < 0          # interior
    assert fid[15, 1] == -1                            # far outside
    band = (fid == 0) & (d > 0)
    assert band.any()                                  # blur band exists

    sigma = 2.0 * ndc2
    alpha = np.asarray(sigmoid_alpha_blend(out, sigma=sigma))
    assert alpha[15, 10] > 0.95
    assert np.all((alpha[band] > 0.0) & (alpha[band] < 0.5))
    assert alpha[15, 1] == 0.0


def test_renderer_sigmoid_blend_layers():
    # depth surface quad split into two triangles; soft alpha at the edges
    verts = np.array([[-0.3, -0.3, 2.0], [0.3, -0.3, 2.0],
                      [-0.3, 0.3, 2.0], [0.3, 0.3, 2.0]], np.float32)
    faces = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
    mesh = Mesh(verts=verts, faces=faces,
                vert_attributes={"color": np.eye(4, 3, dtype=np.float32)})
    cam = Camera(intrinsics=np.array([[1.5, 0, 0], [0, 1.5, 0], [0, 0, 1]],
                                     np.float32))
    H = W = 64
    m = max(H, W) - 1
    args = RasterRendererArgs(output_res=(H, W), cull_backfaces=False,
                              blend_type="sigmoid", faces_per_pixel=2,
                              blur_radius=4.0 * (2.0 / m) ** 2,
                              blend_sigma=1.0 * (2.0 / m) ** 2,
                              background_color=(0.2, 0.3, 0.4))
    r = RasterRenderer(["depth", "mask", "alpha", "flat_vertex_color",
                        "face_id"], args)
    r.update_scene({"meshes": [mesh], "cameras": [cam]})
    out = r.render()
    alpha = out["alpha"]
    mask = out["mask"]
    assert alpha.shape == (H, W)
    # interior: alpha saturates; outside the blur band: exactly 0
    assert alpha[mask].max() > 0.95
    soft = (alpha > 0.02) & (alpha < 0.6)
    assert soft.any()                     # soft edge band exists
    assert (alpha == 0.0).any()
    # hard-blend channel values come from the closest fragment: the color
    # layer matches a hard render inside the coverage
    hard = RasterRenderer(
        ["flat_vertex_color", "mask", "face_id"],
        RasterRendererArgs(output_res=(H, W), cull_backfaces=False,
                           background_color=(0.2, 0.3, 0.4)))
    hard.update_scene({"meshes": [mesh], "cameras": [cam]})
    hout = hard.render()
    hmask = hout["mask"]
    # wherever the closest soft fragment is the hard winner, the channel
    # values are identical (along the blur band of an adjacent face the
    # blurred fragment can legitimately win — PyTorch3D semantics)
    same = hmask & (out["face_id"] == hout["face_id"])
    assert same.sum() > 0.8 * hmask.sum()
    np.testing.assert_allclose(out["flat_vertex_color"][same],
                               hout["flat_vertex_color"][same], atol=1e-5)
    # background color composited outside coverage
    np.testing.assert_allclose(hout["flat_vertex_color"][~hmask][0],
                               [0.2, 0.3, 0.4], atol=1e-6)

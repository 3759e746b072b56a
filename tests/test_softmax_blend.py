"""Softmax (gamma) blending — the PyTorch3D softmax_rgb_blend semantics.

The reference's renderer enum names softmax blending but never wires it
(reference: pytorch3d_renderer.py:43-44 supports only hard/sigmoid); this
completes the shader zoo. Checks: (1) the weight math against an
independent numpy re-derivation of the published formula, (2) the
hard-blend limit at tiny sigma/gamma, (3) genuine cross-fragment mixing at
large gamma, (4) background compositing.
"""

import numpy as np

from diffusionhandles_tpu.geometry.mesh import Mesh
from diffusionhandles_tpu.geometry.renderer import (Camera, RasterRenderer,
                                                    RasterRendererArgs)
from diffusionhandles_tpu.ops.rasterize import (rasterize_k,
                                                softmax_blend_weights)


def _overlap_scene():
    """Two big camera-facing triangles overlapping in the image center at
    different depths (NDC-style vertices for a focal-1.5 camera)."""
    verts = np.array([
        [-0.4, -0.4, 2.0], [0.5, -0.3, 2.0], [-0.3, 0.5, 2.0],   # near
        [-0.1, -0.5, 2.4], [0.6, 0.4, 2.4], [-0.4, 0.4, 2.4],    # far
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    color = np.zeros((6, 3), np.float32)
    color[:3] = [1.0, 0.0, 0.0]   # near face: red
    color[3:] = [0.0, 1.0, 0.0]   # far face: green
    mesh = Mesh(verts=verts, faces=faces, vert_attributes={"color": color})
    cam = Camera(intrinsics=np.array(
        [[1.5, 0, 0], [0, 1.5, 0], [0, 0, 1]], np.float32))
    return mesh, cam


def _numpy_softmax_oracle(fid, zbuf, dists, sigma, gamma, znear, zfar,
                          eps=1e-10):
    """Independent per-pixel reimplementation of the published
    softmax_rgb_blend weight formula."""
    K, H, W = fid.shape
    w = np.zeros((K, H, W))
    wbg = np.zeros((H, W))
    alpha = np.zeros((H, W))
    for y in range(H):
        for x in range(W):
            prob = np.zeros(K)
            zi = np.zeros(K)
            for k in range(K):
                if fid[k, y, x] < 0:
                    continue
                prob[k] = 1.0 / (1.0 + np.exp(dists[k, y, x] / sigma))
                zi[k] = (zfar - zbuf[k, y, x]) / (zfar - znear)
            alpha[y, x] = 1.0 - np.prod(1.0 - prob)
            zmax = max(zi.max(), eps)
            num = prob * np.exp((zi - zmax) / gamma)
            delta = np.exp((eps - zmax) / gamma)
            denom = num.sum() + delta
            w[:, y, x] = num / denom
            wbg[y, x] = delta / denom
    return w, wbg, alpha


def test_weights_match_numpy_oracle():
    mesh, cam = _overlap_scene()
    H = W = 24
    m = max(H, W) - 1
    ndc2 = (2.0 / m) ** 2
    from diffusionhandles_tpu.ops.rasterize import project_verts
    verts_px = project_verts(np.asarray(mesh.verts), 1.5, H, W)
    kr = rasterize_k(verts_px, mesh.faces, H, W, faces_per_pixel=2,
                     blur_radius=2.0 * ndc2, cull_backfaces=False, foot=6)
    sigma, gamma = 1.0 * ndc2, 0.05
    w, wbg, alpha = softmax_blend_weights(kr, sigma=sigma, gamma=gamma,
                                          znear=1.0, zfar=100.0)
    ow, owbg, oalpha = _numpy_softmax_oracle(
        np.asarray(kr.face_id), np.asarray(kr.zbuf), np.asarray(kr.dists),
        sigma, gamma, 1.0, 100.0)
    np.testing.assert_allclose(np.asarray(w), ow, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wbg), owbg, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), oalpha, atol=1e-5)
    # weights + background weight partition unity
    total = np.asarray(w).sum(0) + np.asarray(wbg)
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


def _render(blend_type, H=48, W=48, **kw):
    mesh, cam = _overlap_scene()
    args = RasterRendererArgs(output_res=(H, W), cull_backfaces=False,
                              blend_type=blend_type,
                              background_color=(0.1, 0.2, 0.3), **kw)
    r = RasterRenderer(["flat_vertex_color", "alpha", "mask", "face_id",
                        "world_position"], args)
    r.update_scene({"meshes": [mesh], "cameras": [cam]})
    return r.render()


def test_softmax_hard_limit():
    # tiny sigma+gamma and no blur: softmax -> closest-fragment winner
    H = W = 48
    m = max(H, W) - 1
    ndc2 = (2.0 / m) ** 2
    soft = _render("softmax", faces_per_pixel=2,
                   blend_sigma=0.02 * ndc2, blend_gamma=1e-5)
    hard = _render("hard")
    mask = hard["mask"]
    inner = mask & (soft["alpha"] > 0.99)
    assert inner.sum() > 0.5 * mask.sum()
    np.testing.assert_allclose(soft["flat_vertex_color"][inner],
                               hard["flat_vertex_color"][inner], atol=1e-3)
    np.testing.assert_allclose(soft["world_position"][inner],
                               hard["world_position"][inner], atol=1e-3)


def test_softmax_mixes_fragments_and_background():
    # large gamma: overlap pixels mix red (near) and green (far)
    H = W = 48
    m = max(H, W) - 1
    ndc2 = (2.0 / m) ** 2
    out = _render("softmax", faces_per_pixel=2,
                  blend_sigma=1.0 * ndc2, blend_gamma=10.0)
    img = out["flat_vertex_color"]
    fid0 = out["face_id"]
    # overlap region: closest fragment is face 0 and a second fragment
    # exists -> both channels materially present
    overlap = (fid0 == 0) & (out["alpha"] > 0.99)
    # restrict to pixels away from edges (full coverage of both faces)
    mixed = overlap & (img[..., 0] > 0.2) & (img[..., 1] > 0.2)
    assert mixed.any(), "expected gamma-blended overlap pixels"
    # far outside everything: pure background, alpha 0
    outside = ~out["mask"] & (out["alpha"] < 1e-3)
    assert outside.any()
    bg_px = img[outside]
    np.testing.assert_allclose(bg_px, np.broadcast_to(
        (0.1, 0.2, 0.3), bg_px.shape), atol=1e-3)


def test_sigmoid_path_unchanged_by_softmax_support():
    out = _render("sigmoid", faces_per_pixel=2, blend_sigma=1e-4)
    assert out["alpha"].max() > 0.9
    hard = _render("hard")
    same = hard["mask"] & (out["face_id"] == hard["face_id"])
    np.testing.assert_allclose(out["flat_vertex_color"][same],
                               hard["flat_vertex_color"][same], atol=1e-5)

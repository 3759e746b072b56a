"""Triangle rasterization in pure JAX (TPU-native z-buffer).

Replaces the reference's PyTorch3D C++/CUDA mesh rasterizer
(reference: diffhandles/pytorch3d_renderer.py, used by
depth_transform.py:149-166 for mesh-mode depth transforms and by the demo's
rgb preview, diffhandles_pipeline_webapp.py:472-519). Only the features the
reference actually exercises are implemented: hard (top-1) z-buffer
rasterization with barycentric attribute interpolation, backface culling, a
z-near clip, and multi-channel outputs.

Design: depth-surface meshes have pixel-scale triangles, so each face gets a
fixed FOOT x FOOT pixel footprint anchored at its screen bbox; coverage +
candidate (z, id) pairs are resolved per pixel with the same exact two-pass
scatter-min "winner" trick as the point splat (ops with static shapes, no
data-dependent control flow). The few faces whose bbox exceeds the footprint
(depth-edge slivers can span the frame) are rasterized exactly in a second
pass that scans them one at a time over the full image (cheap: big faces are
rare and full-image coverage is pure VPU work). Ties (equal z) resolve to
the lowest face index, deterministically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


class RasterOut(NamedTuple):
    """face_id [H,W] int32 (-1 = background); bary [H,W,3] float32;
    zbuf [H,W] float32 (inf where empty)."""

    face_id: jnp.ndarray
    bary: jnp.ndarray
    zbuf: jnp.ndarray


def project_verts(verts, intrinsics, height: int, width: int):
    """PyTorch3D-frame verts [V,3] -> continuous pixel coords + view z.

    Matches the pc path's projection (geometry/depth.py _splat) exactly:
    the PyTorch3D frame flips x/y relative to the projection frame
    (M_inv = diag(-1,-1,1)), the full 3x3 intrinsics apply (fx != fy and
    principal points honored, like depth_to_world_coords' K_inv on the
    lift side), and NDC inverts image_plane_coords per axis
    (c = x*0.5*(max(H,W)-1) + (dim-1)/2).

    intrinsics: 3x3 camera matrix, or a scalar focal length f
      (== diag(f, f, 1)).
    """
    verts = jnp.asarray(verts, jnp.float32)
    K = jnp.asarray(intrinsics, jnp.float32)
    if K.ndim == 0:
        K = jnp.diag(jnp.stack([K, K, jnp.ones((), jnp.float32)]))
    z = verts[:, 2]
    pts = verts * jnp.array([-1.0, -1.0, 1.0])
    proj = pts @ K.T
    m = max(height, width) - 1
    u = proj[:, 0] / proj[:, 2] * 0.5 * m + (width - 1) / 2.0
    v = proj[:, 1] / proj[:, 2] * 0.5 * m + (height - 1) / 2.0
    return jnp.stack([u, v, z], axis=-1)


def _winner_scatter(lin_idx, z, cand_valid, num_pixels, num_cand):
    """Exact first-wins min-z winner per pixel (two-pass scatter-min)."""
    z = jnp.where(cand_valid, z, _INF)
    zmin = jnp.full((num_pixels,), _INF, jnp.float32).at[lin_idx].min(z)
    idx = jnp.arange(num_cand, dtype=jnp.int32)
    cand = jnp.where(jnp.logical_and(cand_valid, z == zmin[lin_idx]), idx,
                     num_cand)
    winner = jnp.full((num_pixels,), num_cand, jnp.int32).at[lin_idx].min(
        cand)
    return zmin, winner


@functools.partial(jax.jit, static_argnames=("height", "width", "foot",
                                             "cull_backfaces"))
def _rasterize_small(verts_px, faces, face_enabled, height: int, width: int,
                     foot: int = 8, cull_backfaces: bool = True,
                     z_near: float = 0.1, eps: float = 1e-8):
    """Fast pass: every enabled face sampled on a foot x foot window
    anchored at its bbox min. Returns (zbuf, face_id) flat buffers."""
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    tri = verts_px[faces]  # [F, 3, 3]
    u0, v0, z0 = tri[:, 0, 0], tri[:, 0, 1], tri[:, 0, 2]
    u1, v1, z1 = tri[:, 1, 0], tri[:, 1, 1], tri[:, 1, 2]
    u2, v2, z2 = tri[:, 2, 0], tri[:, 2, 1], tri[:, 2, 2]

    # signed area (screen space); backface cull and near-plane clip
    area = (u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0)
    valid = jnp.abs(area) > eps
    if cull_backfaces:
        # depth_to_mesh builds faces CCW as seen by the camera
        # (reference: depth_transform.py:50-59); with the y-down pixel frame
        # those project to negative signed area.
        valid = jnp.logical_and(valid, area < 0)
    zmin_face = jnp.minimum(jnp.minimum(z0, z1), z2)
    valid = jnp.logical_and(valid, zmin_face > z_near)
    valid = jnp.logical_and(valid, face_enabled)

    bb_min_u = jnp.floor(jnp.minimum(jnp.minimum(u0, u1), u2)).astype(
        jnp.int32)
    bb_min_v = jnp.floor(jnp.minimum(jnp.minimum(v0, v1), v2)).astype(
        jnp.int32)
    bb_max_u = jnp.ceil(jnp.maximum(jnp.maximum(u0, u1), u2)).astype(
        jnp.int32)
    bb_max_v = jnp.ceil(jnp.maximum(jnp.maximum(v0, v1), v2)).astype(
        jnp.int32)

    def face_samples(off_u, off_v):
        """Candidate (pixel, z) for every face at one footprint offset."""
        pu = bb_min_u + off_u
        pv = bb_min_v + off_v
        inside_img = (pu >= 0) & (pu < width) & (pv >= 0) & (pv < height)
        in_bbox = (pu <= bb_max_u) & (pv <= bb_max_v)
        puf = pu.astype(jnp.float32)
        pvf = pv.astype(jnp.float32)
        w0 = ((u1 - puf) * (v2 - pvf) - (u2 - puf) * (v1 - pvf)) / area
        w1 = ((u2 - puf) * (v0 - pvf) - (u0 - puf) * (v2 - pvf)) / area
        w2 = 1.0 - w0 - w1
        covered = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
        z = w0 * z0 + w1 * z1 + w2 * z2
        ok = valid & inside_img & in_bbox & covered
        lin = jnp.clip(pv, 0, height - 1) * width + jnp.clip(pu, 0,
                                                             width - 1)
        return lin, z, ok

    # foot x foot window per face
    offs = [(i, j) for i in range(foot) for j in range(foot)]
    lin_all = []
    z_all = []
    ok_all = []
    for (oi, oj) in offs:
        lin, z, ok = face_samples(oj, oi)
        lin_all.append(lin)
        z_all.append(z)
        ok_all.append(ok)
    lin_c = jnp.concatenate(lin_all)
    z_c = jnp.concatenate(z_all)
    ok_c = jnp.concatenate(ok_all)
    num_px = height * width
    zmin, winner = _winner_scatter(lin_c, z_c, ok_c, num_px, F * foot * foot)
    face_of_winner = jnp.where(winner < F * foot * foot, winner % F, -1)
    return zmin, face_of_winner


@functools.partial(jax.jit, static_argnames=("height", "width",
                                             "cull_backfaces"))
def _rasterize_big(verts_px, faces, big_idx, height: int, width: int,
                   cull_backfaces: bool = True, z_near: float = 0.1,
                   eps: float = 1e-8):
    """Exact full-image pass over a (small) set of big faces: a lax.scan
    whose sequential strict-< update reproduces first-wins tie order.
    big_idx entries may be -1 (padding)."""
    faces = jnp.asarray(faces, jnp.int32)
    py, px = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")

    def body(carry, fidx):
        zbuf, fid_buf = carry
        enabled = fidx >= 0
        f = faces[jnp.maximum(fidx, 0)]
        t = verts_px[f]  # [3, 3]
        u0, v0, z0 = t[0, 0], t[0, 1], t[0, 2]
        u1, v1, z1 = t[1, 0], t[1, 1], t[1, 2]
        u2, v2, z2 = t[2, 0], t[2, 1], t[2, 2]
        area = (u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0)
        ok = jnp.abs(area) > eps
        if cull_backfaces:
            ok = jnp.logical_and(ok, area < 0)
        ok = jnp.logical_and(ok, jnp.minimum(jnp.minimum(z0, z1), z2)
                             > z_near)
        ok = jnp.logical_and(ok, enabled)
        safe_area = jnp.where(jnp.abs(area) > eps, area, 1.0)
        w0 = ((u1 - px) * (v2 - py) - (u2 - px) * (v1 - py)) / safe_area
        w1 = ((u2 - px) * (v0 - py) - (u0 - px) * (v2 - py)) / safe_area
        w2 = 1.0 - w0 - w1
        covered = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6) & ok
        z = w0 * z0 + w1 * z1 + w2 * z2
        better = jnp.logical_and(covered, z < zbuf)
        zbuf = jnp.where(better, z, zbuf)
        fid_buf = jnp.where(better, fidx, fid_buf)
        return (zbuf, fid_buf), None

    zbuf0 = jnp.full((height, width), _INF, jnp.float32)
    fid0 = jnp.full((height, width), -1, jnp.int32)
    (zbuf, fid), _ = jax.lax.scan(body, (zbuf0, fid0), big_idx)
    return zbuf.reshape(-1), fid.reshape(-1)


def rasterize(verts_px, faces, height: int, width: int, foot: int = 8,
              cull_backfaces: bool = True, z_near: float = 0.1) -> RasterOut:
    """Rasterize triangles to a top-1 z-buffer.

    Args:
      verts_px: [V, 3] (u, v, z) from project_verts.
      faces: [F, 3] int32.
      foot: footprint of the fast pass; faces with larger bboxes go through
        the exact big-face pass.
    """
    faces = jnp.asarray(faces, jnp.int32)
    verts_px = jnp.asarray(verts_px, jnp.float32)

    # host-side footprint split (face sizes are static per scene)
    tri = np.asarray(verts_px)[np.asarray(faces)]
    du = tri[..., 0].max(1) - tri[..., 0].min(1)
    dv = tri[..., 1].max(1) - tri[..., 1].min(1)
    is_big = np.maximum(du, dv) > foot - 1
    big_indices = np.nonzero(is_big)[0]

    small_enabled = jnp.asarray(~is_big)
    z_small, fid_small = _rasterize_small(
        verts_px, faces, small_enabled, height, width, foot=foot,
        cull_backfaces=cull_backfaces, z_near=z_near)

    if len(big_indices):
        # pad to the next power of two for compile-cache friendliness
        n = 1 << int(np.ceil(np.log2(len(big_indices))))
        big_idx = np.full((n,), -1, np.int32)
        big_idx[:len(big_indices)] = big_indices
        z_big, fid_big = _rasterize_big(
            verts_px, faces, jnp.asarray(big_idx), height, width,
            cull_backfaces=cull_backfaces, z_near=z_near)
        # merge: strictly smaller z wins; equal z -> lower face index
        # (global first-wins order)
        take_big = jnp.logical_or(
            z_big < z_small,
            jnp.logical_and(z_big == z_small, fid_big < fid_small))
        take_big = jnp.logical_and(take_big, fid_big >= 0)
        zmin = jnp.where(take_big, z_big, z_small)
        face_id = jnp.where(take_big, fid_big, fid_small)
    else:
        zmin, face_id = z_small, fid_small

    zbuf = zmin.reshape(height, width)
    face_id = face_id.reshape(height, width)

    # recompute barycentrics of the winning face at each pixel
    py, px = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    tri_j = verts_px[faces]
    fid = jnp.maximum(face_id, 0)
    fu0, fv0 = tri_j[fid, 0, 0], tri_j[fid, 0, 1]
    fu1, fv1 = tri_j[fid, 1, 0], tri_j[fid, 1, 1]
    fu2, fv2 = tri_j[fid, 2, 0], tri_j[fid, 2, 1]
    farea = ((fu1 - fu0) * (fv2 - fv0) - (fu2 - fu0) * (fv1 - fv0))
    farea = jnp.where(jnp.abs(farea) > 1e-12, farea, 1.0)
    w0 = ((fu1 - px) * (fv2 - py) - (fu2 - px) * (fv1 - py)) / farea
    w1 = ((fu2 - px) * (fv0 - py) - (fu0 - px) * (fv2 - py)) / farea
    w2 = 1.0 - w0 - w1
    bary = jnp.stack([w0, w1, w2], axis=-1)
    bary = jnp.where(face_id[..., None] >= 0, bary, 0.0)
    return RasterOut(face_id=face_id, bary=bary, zbuf=zbuf)


class KRasterOut(NamedTuple):
    """Top-K fragments per pixel, sorted by ascending z (ties: lowest face
    index). face_id [K,H,W] (-1 = empty); bary [K,H,W,3]; zbuf [K,H,W]
    (inf where empty); dists [K,H,W] signed squared distance (NDC^2 units,
    PyTorch3D convention: negative inside the face)."""

    face_id: jnp.ndarray
    bary: jnp.ndarray
    zbuf: jnp.ndarray
    dists: jnp.ndarray


def _point_edge_dist2(pu, pv, au, av, bu, bv):
    """Squared distance from point (pu, pv) to segment (a, b); all
    broadcastable arrays."""
    eu, ev = bu - au, bv - av
    t = ((pu - au) * eu + (pv - av) * ev) / jnp.maximum(
        eu * eu + ev * ev, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    du = pu - (au + t * eu)
    dv = pv - (av + t * ev)
    return du * du + dv * dv


def _face_fragment(tri, pu, pv, ndc_scale2: float):
    """Per-pixel fragment quantities for one or more faces.

    tri: [..., 3, 3] (u, v, z) triangle(s); pu/pv broadcastable pixel
    coords. Returns (z_clip, covered, dist2_signed_ndc, bary_clipped):
    z from CLIPPED barycentrics (PyTorch3D clip_barycentric_coords), the
    inside test, and the signed squared edge distance in NDC^2.
    """
    u0, v0, z0 = tri[..., 0, 0], tri[..., 0, 1], tri[..., 0, 2]
    u1, v1, z1 = tri[..., 1, 0], tri[..., 1, 1], tri[..., 1, 2]
    u2, v2, z2 = tri[..., 2, 0], tri[..., 2, 1], tri[..., 2, 2]
    area = (u1 - u0) * (v2 - v0) - (u2 - u0) * (v1 - v0)
    safe_area = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    w0 = ((u1 - pu) * (v2 - pv) - (u2 - pu) * (v1 - pv)) / safe_area
    w1 = ((u2 - pu) * (v0 - pv) - (u0 - pu) * (v2 - pv)) / safe_area
    w2 = 1.0 - w0 - w1
    covered = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6)
    # clipped barycentrics (for z and attributes of blurred fragments)
    c0, c1, c2 = jnp.maximum(w0, 0), jnp.maximum(w1, 0), jnp.maximum(w2, 0)
    s = jnp.maximum(c0 + c1 + c2, 1e-12)
    c0, c1, c2 = c0 / s, c1 / s, c2 / s
    z = c0 * z0 + c1 * z1 + c2 * z2
    d2 = jnp.minimum(
        jnp.minimum(_point_edge_dist2(pu, pv, u0, v0, u1, v1),
                    _point_edge_dist2(pu, pv, u1, v1, u2, v2)),
        _point_edge_dist2(pu, pv, u2, v2, u0, v0)) * ndc_scale2
    d2 = jnp.where(covered, -d2, d2)
    bary = jnp.stack([c0, c1, c2], axis=-1)
    return z, covered, d2, bary


_BIG_FID = jnp.int32(2 ** 30)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "foot", "k", "cull_backfaces", "blur_px2"))
def _rasterize_small_k(verts_px, faces, face_enabled, height: int,
                       width: int, foot: int, k: int,
                       blur_px2: float = 0.0, cull_backfaces: bool = True,
                       z_near: float = 0.1, eps: float = 1e-8):
    """K-fragment variant of the fast footprint pass: returns per-level
    (z [k, H*W], fid [k, H*W]) sorted ascending by (z, face index)."""
    faces = jnp.asarray(faces, jnp.int32)
    F = faces.shape[0]
    tri = verts_px[faces]
    u = tri[..., 0]
    v = tri[..., 1]
    z3 = tri[..., 2]
    area = ((u[:, 1] - u[:, 0]) * (v[:, 2] - v[:, 0])
            - (u[:, 2] - u[:, 0]) * (v[:, 1] - v[:, 0]))
    valid = jnp.abs(area) > eps
    if cull_backfaces:
        valid = jnp.logical_and(valid, area < 0)
    valid = jnp.logical_and(valid, jnp.min(z3, axis=1) > z_near)
    valid = jnp.logical_and(valid, face_enabled)

    pad = int(np.ceil(np.sqrt(blur_px2))) if blur_px2 > 0 else 0
    m = max(height, width) - 1
    ndc_scale2 = (2.0 / m) ** 2
    blur_ndc2 = blur_px2 * ndc_scale2

    bb_min_u = jnp.floor(jnp.min(u, axis=1)).astype(jnp.int32) - pad
    bb_min_v = jnp.floor(jnp.min(v, axis=1)).astype(jnp.int32) - pad
    bb_max_u = jnp.ceil(jnp.max(u, axis=1)).astype(jnp.int32) + pad
    bb_max_v = jnp.ceil(jnp.max(v, axis=1)).astype(jnp.int32) + pad

    def face_samples(off_u, off_v):
        pu = bb_min_u + off_u
        pv = bb_min_v + off_v
        inside_img = (pu >= 0) & (pu < width) & (pv >= 0) & (pv < height)
        in_bbox = (pu <= bb_max_u) & (pv <= bb_max_v)
        z, covered, d2, _ = _face_fragment(
            tri, pu.astype(jnp.float32), pv.astype(jnp.float32), ndc_scale2)
        hit = jnp.logical_or(covered, d2 < blur_ndc2)
        ok = valid & inside_img & in_bbox & hit
        lin = jnp.clip(pv, 0, height - 1) * width + jnp.clip(
            pu, 0, width - 1)
        return lin, z, ok

    offs = [(i, j) for i in range(foot) for j in range(foot)]
    lin_c = []
    z_c = []
    ok_c = []
    for (oi, oj) in offs:
        lin, z, ok = face_samples(oj, oi)
        lin_c.append(lin)
        z_c.append(z)
        ok_c.append(ok)
    lin_c = jnp.concatenate(lin_c)
    z_c = jnp.where(jnp.concatenate(ok_c), jnp.concatenate(z_c), _INF)
    num_px = height * width
    N = F * foot * foot
    cand_idx = jnp.arange(N, dtype=jnp.int32)

    levels_z = []
    levels_fid = []
    zprev = jnp.full((num_px,), -_INF, jnp.float32)
    wprev = jnp.full((num_px,), -1, jnp.int32)
    for _ in range(k):
        zp = zprev[lin_c]
        wp = wprev[lin_c]
        eligible = jnp.logical_or(
            z_c > zp, jnp.logical_and(z_c == zp, cand_idx > wp))
        zk = jnp.where(eligible, z_c, _INF)
        zmin = jnp.full((num_px,), _INF, jnp.float32).at[lin_c].min(zk)
        cand = jnp.where(jnp.logical_and(zk < _INF, zk == zmin[lin_c]),
                         cand_idx, N)
        winner = jnp.full((num_px,), N, jnp.int32).at[lin_c].min(cand)
        fid = jnp.where(winner < N, winner % F, _BIG_FID)
        levels_z.append(zmin)
        levels_fid.append(fid)
        zprev = zmin
        wprev = winner
    return jnp.stack(levels_z), jnp.stack(levels_fid)


@functools.partial(jax.jit, static_argnames=("height", "width", "k",
                                             "cull_backfaces", "blur_px2"))
def _rasterize_big_k(verts_px, faces, big_idx, height: int, width: int,
                     k: int, blur_px2: float = 0.0,
                     cull_backfaces: bool = True, z_near: float = 0.1,
                     eps: float = 1e-8):
    """K-fragment variant of the exact big-face pass: a scan that keeps the
    per-pixel K-buffer sorted by (z, face index) via lax.sort inserts."""
    faces = jnp.asarray(faces, jnp.int32)
    py, px = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    py = py.reshape(-1)
    px = px.reshape(-1)
    m = max(height, width) - 1
    ndc_scale2 = (2.0 / m) ** 2
    blur_ndc2 = blur_px2 * ndc_scale2

    def body(carry, fidx):
        zbuf, fid_buf = carry  # [k, H*W] sorted ascending by (z, fid)
        enabled = fidx >= 0
        t = verts_px[faces[jnp.maximum(fidx, 0)]]  # [3, 3]
        area = ((t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
                - (t[2, 0] - t[0, 0]) * (t[1, 1] - t[0, 1]))
        ok = jnp.abs(area) > eps
        if cull_backfaces:
            ok = jnp.logical_and(ok, area < 0)
        ok = jnp.logical_and(ok, jnp.min(t[:, 2]) > z_near)
        ok = jnp.logical_and(ok, enabled)
        z, covered, d2, _ = _face_fragment(t[None], px, py, ndc_scale2)
        hit = jnp.logical_and(ok, jnp.logical_or(covered,
                                                 d2 < blur_ndc2))
        z_new = jnp.where(hit, z, _INF)[None]
        fid_new = jnp.where(hit, fidx, _BIG_FID)[None]
        zcat = jnp.concatenate([zbuf, z_new], axis=0)
        fcat = jnp.concatenate([fid_buf, fid_new], axis=0)
        zs, fs = jax.lax.sort((zcat, fcat), dimension=0, num_keys=2)
        return (zs[:k], fs[:k]), None

    z0 = jnp.full((k, height * width), _INF, jnp.float32)
    f0 = jnp.full((k, height * width), _BIG_FID, jnp.int32)
    (zbuf, fid), _ = jax.lax.scan(body, (z0, f0), big_idx)
    return zbuf, fid


def rasterize_k(verts_px, faces, height: int, width: int,
                faces_per_pixel: int = 1, foot: int = 8,
                blur_radius: float = 0.0, cull_backfaces: bool = True,
                z_near: float = 0.1) -> KRasterOut:
    """Rasterize to the top-K fragments per pixel (PyTorch3D
    faces_per_pixel semantics, reference: pytorch3d_renderer.py:31-53).

    blur_radius is in NDC^2 units (PyTorch3D convention): faces whose
    signed squared edge distance is below it also produce fragments, with
    clipped barycentrics. Fragments are sorted by ascending camera z.
    """
    faces = jnp.asarray(faces, jnp.int32)
    verts_px = jnp.asarray(verts_px, jnp.float32)
    K = int(faces_per_pixel)
    m = max(height, width) - 1
    ndc_scale2 = (2.0 / m) ** 2
    blur_px2 = float(blur_radius) / ndc_scale2 if blur_radius > 0 else 0.0
    pad = int(np.ceil(np.sqrt(blur_px2))) if blur_px2 > 0 else 0

    tri = np.asarray(verts_px)[np.asarray(faces)]
    du = tri[..., 0].max(1) - tri[..., 0].min(1) + 2 * pad
    dv = tri[..., 1].max(1) - tri[..., 1].min(1) + 2 * pad
    is_big = np.maximum(du, dv) > foot - 1
    big_indices = np.nonzero(is_big)[0]

    z_small, fid_small = _rasterize_small_k(
        verts_px, faces, jnp.asarray(~is_big), height, width, foot=foot,
        k=K, blur_px2=blur_px2, cull_backfaces=cull_backfaces,
        z_near=z_near)

    if len(big_indices):
        n = 1 << int(np.ceil(np.log2(len(big_indices))))
        big_idx = np.full((n,), -1, np.int32)
        big_idx[:len(big_indices)] = big_indices
        z_big, fid_big = _rasterize_big_k(
            verts_px, faces, jnp.asarray(big_idx), height, width, k=K,
            blur_px2=blur_px2, cull_backfaces=cull_backfaces, z_near=z_near)
        zcat = jnp.concatenate([z_small, z_big], axis=0)
        fcat = jnp.concatenate([fid_small, fid_big], axis=0)
        zs, fs = jax.lax.sort((zcat, fcat), dimension=0, num_keys=2)
        z_lv, fid_lv = zs[:K], fs[:K]
    else:
        z_lv, fid_lv = z_small, fid_small

    face_id = jnp.where(z_lv < _INF, fid_lv, -1).reshape(K, height, width)
    zbuf = z_lv.reshape(K, height, width)

    # per-level fragment quantities recomputed from the winning faces
    py, px = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    tri_j = verts_px[faces]
    tri_lv = tri_j[jnp.maximum(face_id, 0)]       # [K, H, W, 3, 3]
    _, _, d2, bary = _face_fragment(tri_lv, px[None], py[None], ndc_scale2)
    empty = face_id < 0
    bary = jnp.where(empty[..., None], 0.0, bary)
    d2 = jnp.where(empty, _INF, d2)
    return KRasterOut(face_id=face_id, bary=bary, zbuf=zbuf, dists=d2)


def sigmoid_alpha_blend(kraster: KRasterOut, sigma: float = 1e-4):
    """Soft coverage alpha [H, W] (PyTorch3D sigmoid_alpha_blend: the color
    channels stay those of the closest fragment; only alpha is soft)."""
    prob = jax.nn.sigmoid(-kraster.dists / sigma)
    prob = jnp.where(kraster.face_id >= 0, prob, 0.0)
    return 1.0 - jnp.prod(1.0 - prob, axis=0)


def softmax_blend_weights(kraster: KRasterOut, sigma: float = 1e-4,
                          gamma: float = 1e-4, znear: float = 1.0,
                          zfar: float = 100.0, eps: float = 1e-10):
    """PyTorch3D softmax (gamma) blending weights.

    Implements the weight math of softmax_rgb_blend (the shader the
    reference's ``blend_type`` enum names but never selects — completing the
    shader zoo beyond pytorch3d_renderer.py:43-44): per-fragment coverage
    probability sigmoid(-dist/sigma), depth weighting
    exp(z_inv/gamma) via a numerically-stable running max, and a background
    weight exp((eps - z_inv_max)/gamma).

    Returns (weights [K, H, W], bg_weight [H, W], alpha [H, W]) with
    weights.sum(0) + bg_weight == 1; blend channels as
    (weights[..., None] * attr_k).sum(0) + bg_weight[..., None] * background.
    """
    mask = kraster.face_id >= 0
    prob = jnp.where(mask, jax.nn.sigmoid(-kraster.dists / sigma), 0.0)
    alpha = 1.0 - jnp.prod(1.0 - prob, axis=0)
    z_inv = jnp.where(mask, (zfar - kraster.zbuf) / (zfar - znear), 0.0)
    z_inv_max = jnp.maximum(jnp.max(z_inv, axis=0), eps)
    weights_num = prob * jnp.exp((z_inv - z_inv_max) / gamma)
    delta = jnp.exp((eps - z_inv_max) / gamma)
    denom = jnp.sum(weights_num, axis=0) + delta
    return weights_num / denom, delta / denom, alpha


def interpolate_attribute_k(kraster: KRasterOut, faces, vert_attr):
    """Barycentric interpolation of a per-vertex attribute [V, C] at every
    fragment level: [K, H, W, C] (0 where the level is empty)."""
    faces = jnp.asarray(faces, jnp.int32)
    vert_attr = jnp.asarray(vert_attr, jnp.float32)
    fid = jnp.maximum(kraster.face_id, 0)
    tri_attr = vert_attr[faces[fid]]            # [K, H, W, 3, C]
    img = jnp.sum(kraster.bary[..., None] * tri_attr, axis=-2)
    return jnp.where((kraster.face_id >= 0)[..., None], img, 0.0)


def interpolate_attribute(raster: RasterOut, faces, vert_attr):
    """Barycentric interpolation of a per-vertex attribute [V, C] to the
    image [H, W, C] (0 where no face)."""
    faces = jnp.asarray(faces, jnp.int32)
    vert_attr = jnp.asarray(vert_attr, jnp.float32)
    fid = jnp.maximum(raster.face_id, 0)
    tri_attr = vert_attr[faces[fid]]           # [H, W, 3, C]
    out = jnp.einsum("hwk,hwkc->hwc", raster.bary, tri_attr)
    return jnp.where(raster.face_id[..., None] >= 0, out, 0.0)

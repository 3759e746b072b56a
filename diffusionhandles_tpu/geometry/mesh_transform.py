"""Mesh-mode depth transform (reference: depth_transform.py:91-195).

Builds a full-grid background depth mesh and a masked foreground depth mesh,
rigidly transforms the foreground vertices, rasterizes both together (the
mesh connectivity stretches triangles across disocclusions, which is why
this path needs no Poisson inpainting), and reads correspondences out of the
interpolated per-vertex color attribute (u, v source coordinates + fg flag).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.geometry.depth import normalize_depth
from diffusionhandles_tpu.geometry.mesh import Mesh, depth_to_mesh
from diffusionhandles_tpu.geometry.transform import transform_points
from diffusionhandles_tpu.ops.rasterize import (interpolate_attribute,
                                                project_verts, rasterize)
from diffusionhandles_tpu.utils.correspondences import pack_correspondences


def merge_meshes(*meshes: Mesh) -> Mesh:
    verts = np.concatenate([np.asarray(m.verts) for m in meshes], axis=0)
    offsets = np.cumsum([0] + [len(m.verts) for m in meshes[:-1]])
    faces = np.concatenate(
        [np.asarray(m.faces) + off for m, off in zip(meshes, offsets)],
        axis=0)
    merged = Mesh(verts=verts.astype(np.float32),
                  faces=faces.astype(np.int32))
    keys = set.intersection(*[set(m.vert_attributes) for m in meshes]) \
        if meshes else set()
    for k in keys:
        merged.add_vert_attribute(
            k, np.concatenate([np.asarray(m.vert_attributes[k])
                               for m in meshes], axis=0))
    return merged


def render_depth_meshes(mesh: Mesh, intrinsics, height: int, width: int,
                        cull_backfaces: bool = True):
    """Rasterize a merged depth mesh; returns (zbuf, color, mask).

    Projects with the FULL intrinsics matrix so fx != fy / principal
    points land at the same pixels the pc path's splat produces (the mesh
    was also unprojected with full K_inv in depth_to_mesh)."""
    verts_px = project_verts(jnp.asarray(mesh.verts),
                             np.asarray(intrinsics, np.float32),
                             height, width)
    raster = rasterize(verts_px, jnp.asarray(mesh.faces), height, width,
                       cull_backfaces=cull_backfaces)
    color = interpolate_attribute(raster, mesh.faces,
                                  mesh.vert_attributes["color"])
    return raster.zbuf, color, raster.face_id >= 0


def transform_depth_mesh(depth, bg_depth, fg_mask, intrinsics,
                         rot_angle: Optional[float] = None, rot_axis=None,
                         translation=None,
                         use_input_depth_normalization=False):
    """Mesh-mode transform (reference: depth_transform.py:91-195).

    Returns (edited disparity [1,1,H,W], correspondences [N,4] int64).
    """
    depth = np.asarray(depth, np.float32).reshape(
        1, 1, np.shape(depth)[-2], np.shape(depth)[-1])
    bg_depth = np.asarray(bg_depth, np.float32).reshape(depth.shape)
    h, w = depth.shape[-2:]
    fg = np.asarray(fg_mask, np.float32).reshape(h, w)
    if not (fg > 0.5).any():
        from diffusionhandles_tpu.geometry.transform import _empty_result
        return _empty_result(depth, use_input_depth_normalization)

    rot_axis = (np.array([0.0, 1.0, 0.0], np.float32) if rot_axis is None
                else np.asarray(rot_axis, np.float32))
    translation = (np.zeros(3, np.float32) if translation is None
                   else np.asarray(translation, np.float32))
    rot_angle = 0.0 if rot_angle is None else float(rot_angle)

    bg_mesh = depth_to_mesh(bg_depth, intrinsics)
    fg_mesh = depth_to_mesh(depth, intrinsics, mask=fg > 0.5)
    fg_mesh.verts = np.asarray(transform_points(
        fg_mesh.verts, rot_angle, rot_axis, translation), np.float32)

    merged = merge_meshes(bg_mesh, fg_mesh)
    zbuf, color, mask = render_depth_meshes(merged, intrinsics, h, w)

    # zbuf stays device-resident (normalize_depth consumes it below; a
    # host pull of the freshly-computed array costs ~30 ms through the
    # tunnel); only color is needed on host, for np.nonzero packing
    color = np.asarray(color)
    src_uv = color[..., :2]
    fg_rendered = color[..., 2] > 0.5

    # correspondences: rendered pixel -> source pixel from the interpolated
    # (u, v) vertex colors (reference: depth_transform.py:164-187)
    yy, xx = np.nonzero(fg_rendered)
    src_x = np.round(src_uv[yy, xx, 0] * (w - 1)).astype(np.int64)
    src_y = np.round(src_uv[yy, xx, 1] * (h - 1)).astype(np.int64)
    corr = pack_correspondences(src_x, src_y, xx.astype(np.int64),
                                yy.astype(np.int64))

    if use_input_depth_normalization:
        _, bounds = normalize_depth(1.0 / jnp.asarray(depth),
                                    return_bounds=True)
    else:
        bounds = None
    # empty pixels (no mesh coverage): depth inf -> disparity 0
    edited_disparity = normalize_depth(1.0 / zbuf[None, None], bounds=bounds)
    return edited_disparity, corr

"""Triangle mesh container + depth-map meshing.

Functional re-design of reference: diffhandles/mesh.py (a torch.nn.Module
holding verts as Parameters) — here a plain dataclass of arrays, since JAX
transforms want pytrees, not mutable modules.

`depth_to_mesh` re-implements reference: diffhandles/depth_transform.py:30-71:
pixel-grid vertices lifted to world space, two CCW triangles per pixel quad
(upper-left, lower-right), masked vertex indexing, and a per-vertex "color"
attribute (u, v image coordinates + foreground indicator) used by the
renderer to carry correspondences.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.geometry.depth import depth_to_world_coords


@dataclasses.dataclass
class Mesh:
    """verts [V, 3] float32; faces [F, 3] int32; named attributes."""

    verts: np.ndarray
    faces: np.ndarray
    vert_attributes: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict)
    face_attributes: Dict[str, np.ndarray] = dataclasses.field(
        default_factory=dict)

    def add_vert_attribute(self, name: str, values) -> None:
        values = np.asarray(values)
        if values.shape[0] != self.verts.shape[0]:
            raise ValueError(
                f"attribute '{name}' has {values.shape[0]} entries for "
                f"{self.verts.shape[0]} vertices")
        self.vert_attributes[name] = values

    def add_face_attribute(self, name: str, values) -> None:
        values = np.asarray(values)
        if values.shape[0] != self.faces.shape[0]:
            raise ValueError(
                f"attribute '{name}' has {values.shape[0]} entries for "
                f"{self.faces.shape[0]} faces")
        self.face_attributes[name] = values

    def bounds(self):
        return self.verts.min(axis=0), self.verts.max(axis=0)

    def normalized(self) -> "Mesh":
        """Scale/translate into the unit cube centered at the origin
        (parity with reference mesh.py normalize helpers)."""
        lo, hi = self.bounds()
        center = (lo + hi) / 2
        scale = float(max(hi - lo)) or 1.0
        return dataclasses.replace(
            self, verts=(self.verts - center) / scale)


def depth_to_mesh(depth, intrinsics, extrinsics_R=None, extrinsics_t=None,
                  mask=None) -> Mesh:
    """Lift a depth map to a pixel-grid triangle mesh
    (reference: depth_transform.py:30-71).

    Vertices are the (masked) pixels' world positions; faces are two CCW
    triangles per quad of adjacent in-mask pixels; the 'color' attribute is
    (u, v in [0,1], fg indicator: 1 if a mask was given else 0).
    """
    depth = np.asarray(depth, np.float32)
    depth2d = depth.reshape(depth.shape[-2], depth.shape[-1])
    h, w = depth2d.shape

    verts_grid = np.asarray(depth_to_world_coords(
        depth2d, intrinsics, extrinsics_R, extrinsics_t))

    if mask is not None:
        mask2d = np.asarray(mask).reshape(h, w) > 0.5
    else:
        mask2d = np.ones((h, w), bool)

    verts = verts_grid[mask2d].reshape(-1, 3)

    uu, vv = np.meshgrid(np.linspace(0, 1, w, dtype=np.float32),
                         np.linspace(0, 1, h, dtype=np.float32))
    img_coords = np.stack([uu, vv], axis=-1)[mask2d].reshape(-1, 2)

    vertex_idx = np.cumsum(mask2d.reshape(-1)).reshape(h, w) - 1
    vertex_idx = np.where(mask2d, vertex_idx, -1)

    tris_ul = np.stack([vertex_idx[1:, :-1].reshape(-1),
                        vertex_idx[:-1, 1:].reshape(-1),
                        vertex_idx[:-1, :-1].reshape(-1)], axis=-1)
    tris_lr = np.stack([vertex_idx[1:, :-1].reshape(-1),
                        vertex_idx[1:, 1:].reshape(-1),
                        vertex_idx[:-1, 1:].reshape(-1)], axis=-1)
    faces = np.stack([tris_ul, tris_lr], axis=1).reshape(-1, 3)
    faces = faces[faces.min(axis=-1) >= 0].astype(np.int32)

    mesh = Mesh(verts=verts.astype(np.float32), faces=faces)
    fg_flag = 0.0 if mask is None else 1.0
    mesh.add_vert_attribute(
        "color",
        np.concatenate([img_coords,
                        np.full_like(img_coords[:, :1], fg_flag)], axis=-1))
    return mesh

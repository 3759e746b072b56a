"""Depth <-> 3D lifting and z-buffer splatting (TPU-native, fixed shapes).

Re-designs reference: diffhandles/depth_transform.py:
* `normalize_depth` (:15-28) — identical formula.
* `depth_to_world_coords` (:589-641) — pure JAX (the [-1,1]^2 image plane
  convention and the PyTorch3D-style axis flip M = diag(-1,-1,1) are kept
  as the framework's camera convention).
* `points_to_depth` (:643-747) — the reference's sequential Python z-buffer
  loop (:697-712) becomes a two-pass vectorized scatter-min ("winner"
  resolution). The sequential loop's final state is provably:
    winner(p)   = first point (lowest index) attaining min z at pixel p
    depth(p)    = min z (inf if no point)
    fg visible  = {i : winner(p_i) == i and point_mask[i]}
    depth_mask  = point_mask[winner(p)]
  which the scatter formulation reproduces exactly, including first-wins tie
  handling (ties take the lowest point index; the reference's strict '<'
  keeps the earliest arrival).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.inf


def normalize_depth(depth, bounds=None, return_bounds: bool = False):
    """Normalize to [0, 255] (reference: depth_transform.py:15-28).

    depth: [B, 1, H, W] (torch layout) or [B, H, W, 1]; works on any 4D.
    """
    depth = jnp.asarray(depth, jnp.float32)
    if depth.ndim != 4:
        raise RuntimeError(
            f"Expected depth to have 4 dimensions, got {depth.ndim}")
    if bounds is None:
        flat = depth.reshape(depth.shape[0], -1)
        max_d = flat.max(axis=-1)[:, None, None, None]
        min_d = flat.min(axis=-1)[:, None, None, None]
    else:
        min_d, max_d = bounds
    out = 255.0 * (depth - min_d) / (max_d - min_d)
    if return_bounds:
        return out, (min_d, max_d)
    return out


def image_plane_coords(height: int, width: int):
    """Normalized [-1,1]^2 pixel-center grid, z=1 homogeneous
    (reference: depth_transform.py:618-632)."""
    nw = (width - 1) / (max(width, height) - 1)
    nh = (height - 1) / (max(width, height) - 1)
    x = jnp.linspace(-nw, nw, width, dtype=jnp.float32)
    y = jnp.linspace(-nh, nh, height, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    return jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # [H, W, 3]


def depth_to_world_coords(depth, intrinsics, extrinsics_R=None,
                          extrinsics_t=None):
    """[1,1,H,W] or [H,W] depth -> [H, W, 3] world points
    (reference: depth_transform.py:589-641)."""
    depth = jnp.asarray(depth, jnp.float32)
    depth = depth.reshape(depth.shape[-2], depth.shape[-1])
    h, w = depth.shape
    if h < 2 or w < 2:
        raise RuntimeError(
            f"Expected depth to have at least 2 pixels per dim, got {h}x{w}")
    K_inv = jnp.linalg.inv(jnp.asarray(intrinsics, jnp.float32))
    coord = image_plane_coords(h, w)  # [H, W, 3]
    pts = depth[..., None] * jnp.einsum("ij,hwj->hwi", K_inv, coord)
    # Convert to the PyTorch3D-style frame (M = diag(-1,-1,1)).
    pts = pts * jnp.array([-1.0, -1.0, 1.0])
    if extrinsics_R is not None or extrinsics_t is not None:
        R = (jnp.asarray(extrinsics_R, jnp.float32)
             if extrinsics_R is not None else jnp.eye(3))
        t = (jnp.asarray(extrinsics_t, jnp.float32)
             if extrinsics_t is not None else jnp.zeros(3))
        pts = jnp.einsum("ji,hwj->hwi", R, pts - t)
    return pts


class SplatResult(NamedTuple):
    """Fixed-shape z-buffer splat outputs.

    depth_map: [H, W] float32, min-z per pixel (inf where empty).
    depth_mask: [H, W] bool — pixel's winning point is a (valid) fg point.
    winner: [H, W] int32 — index of the winning point (-1 where empty).
    u, v: [N] int32 — pixel coords every point projected to.
    visible: [N] bool — point is fg AND wins its pixel.
    """

    depth_map: jnp.ndarray
    depth_mask: jnp.ndarray
    winner: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    visible: jnp.ndarray


@jax.jit
def _splat(points, point_mask, valid, intrinsics, out_hw_arr):
    h, w = out_hw_arr.shape
    n = points.shape[0]
    pts = points * jnp.array([-1.0, -1.0, 1.0])  # M_inv flip (ref :670-674)
    proj = jnp.einsum("ij,nj->ni", intrinsics, pts)
    u = proj[:, 0] / proj[:, 2]
    v = proj[:, 1] / proj[:, 2]
    # invert image_plane_coords per axis: column c maps to
    # x = (2c - (w-1)) / (max(h,w)-1), so c = x*0.5*m + (w-1)/2 — using
    # (x*0.5+0.5)*m on both axes only inverts the LONGER one and shifts +
    # clips the shorter axis of non-square images
    m = max(h, w) - 1
    u = u * 0.5 * m + (w - 1) / 2.0
    v = v * 0.5 * m + (h - 1) / 2.0
    u = jnp.round(jnp.clip(u, 0, w - 1)).astype(jnp.int32)
    v = jnp.round(jnp.clip(v, 0, h - 1)).astype(jnp.int32)
    z = jnp.where(valid, pts[:, 2], _BIG)

    lin = v * w + u
    # Pass 1: min z per pixel.
    zmin = jnp.full((h * w,), _BIG, jnp.float32).at[lin].min(z)
    # Pass 2: min index among points attaining zmin at their pixel
    # (first-wins tie semantics of the sequential reference loop).
    idx = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(jnp.logical_and(valid, z == zmin[lin]), idx, n)
    winner = jnp.full((h * w,), n, jnp.int32).at[lin].min(cand)
    has_winner = winner < n
    winner_safe = jnp.where(has_winner, winner, 0)

    depth_map = zmin.reshape(h, w)
    pm = point_mask.astype(bool)
    depth_mask = jnp.logical_and(has_winner,
                                 pm[winner_safe]).reshape(h, w)
    winner_out = jnp.where(has_winner, winner, -1).reshape(h, w)
    visible = jnp.logical_and(winner[lin] == idx, pm)
    return depth_map, depth_mask, winner_out, u, v, visible


def points_to_depth(points, intrinsics, output_size: Tuple[int, int],
                    extrinsics_R=None, extrinsics_t=None, point_mask=None,
                    valid=None) -> SplatResult:
    """Project + z-buffer splat points to a depth map
    (reference: depth_transform.py:643-747, vectorized).

    Args:
      points: [N, 3] world/camera points (reference frame conventions).
      point_mask: [N] bool/int — True for foreground ("modified") points.
      valid: [N] bool — False entries are ignored (fixed-shape padding).

    Deliberate divergence: the reference applies the camera-to-world
    transform in BOTH directions (depth_transform.py:639 lifts with
    R^T(p - t), :667 "projects" with inv(R)(p - t), contradicting its own
    :638 comment "world to cam is (R @ p) + t"), so any non-identity
    extrinsics break its lift-project round trip; no reference code path
    passes extrinsics, making the bug latent there. Here the projection
    applies the true inverse R @ p + t.
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if point_mask is None:
        point_mask = jnp.zeros((n,), bool)
    point_mask = jnp.asarray(point_mask).astype(bool)
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid = jnp.asarray(valid).astype(bool)
    if extrinsics_R is not None or extrinsics_t is not None:
        R = (jnp.asarray(extrinsics_R, jnp.float32)
             if extrinsics_R is not None else jnp.eye(3))
        t = (jnp.asarray(extrinsics_t, jnp.float32)
             if extrinsics_t is not None else jnp.zeros(3))
        # world -> camera is the INVERSE of depth_to_world_coords' lift
        # (world = R^T (cam - t)): cam = R @ world + t — applying the lift
        # transform here too made any non-identity extrinsics corrupt the
        # lift-then-splat round trip (translation error 2|t|)
        points = jnp.einsum("ij,nj->ni", R, points) + t
    out = _splat(points, point_mask, valid,
                 jnp.asarray(intrinsics, jnp.float32),
                 jnp.zeros(output_size, jnp.uint8))
    return SplatResult(*out)

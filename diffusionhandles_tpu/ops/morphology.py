"""Binary morphology as convolutions (TPU-native).

Replaces the reference's OpenCV morphology (reference: diffhandles/
depth_transform.py:311-321,356 — elliptical close/open of the target mask)
and scipy binary erosion/dilation (reference: diffusion_handles.py:108,
guided_stable_diffuser.py:538-539). Binary dilation/erosion with an arbitrary
structuring element is exactly a counting convolution + threshold; convs are
MXU work and fuse with neighbors under jit.

Border semantics match the sources they replace:
* cv2 dilate: outside = 0 (never adds); cv2 erode: outside = 1 (border does
  not erode) — cv2's default +inf border value.
* scipy binary_dilation/erosion (used with the default 3x3 cross): outside
  = 0 for dilation; erosion uses border_value=0, so borders DO erode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def ellipse_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize)) clone.

    Built via cv2 when available (bit-exact), else via OpenCV's documented
    ellipse-fill rule.
    """
    try:
        import cv2
        return cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (ksize, ksize)).astype(np.float32)
    except Exception:  # pragma: no cover
        r = ksize // 2
        c = (ksize - 1) * 0.5
        inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
        se = np.zeros((ksize, ksize), np.float32)
        for i in range(ksize):
            dy = i - c
            dx_max = r * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))
            j0 = int(np.ceil(c - dx_max))
            j1 = int(np.floor(c + dx_max))
            se[i, j0:j1 + 1] = 1.0
        return se


def cross_kernel() -> np.ndarray:
    """scipy's default 3x3 connectivity-1 structure."""
    return np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.float32)


def _count_conv(mask, se: np.ndarray, pad_value: float, anchor=None):
    """Correlate a binary [H, W] mask with SE, anchored like cv2/scipy."""
    kh, kw = se.shape
    if anchor is None:
        anchor = (kh // 2, kw // 2)
    ay, ax = anchor
    # pad so output[y] covers window [y-ay, y-ay+kh)
    padded = jnp.pad(mask.astype(jnp.float32),
                     ((ay, kh - 1 - ay), (ax, kw - 1 - ax)),
                     constant_values=pad_value)
    out = jax.lax.conv_general_dilated(
        padded[None, ..., None], jnp.asarray(se, jnp.float32)[..., None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0, ..., 0]


def dilate(mask, se: np.ndarray, iterations: int = 1):
    """Binary dilation.

    cv2's dilate is dst(p) = max_{s in SE} src(p + s - anchor) with the
    default anchor (k//2, k//2) — a plain correlation, no SE reflection
    (verified against cv2 for odd and even kernels).
    """
    se = np.asarray(se, np.float32)
    m = jnp.asarray(mask)
    for _ in range(iterations):
        m = _count_conv(m, se, 0.0) > 0.5
    return m


def erode(mask, se: np.ndarray, iterations: int = 1,
          border_value: float = 1.0):
    """Binary erosion. border_value=1 -> cv2 (borders don't erode);
    border_value=0 -> scipy binary_erosion default."""
    se = np.asarray(se, np.float32)
    total = float(se.sum())
    m = jnp.asarray(mask)
    for _ in range(iterations):
        m = _count_conv(m, se, border_value) > total - 0.5
    return m


def close(mask, se: np.ndarray):
    """cv2.morphologyEx(..., cv2.MORPH_CLOSE): dilate then erode."""
    return erode(dilate(mask, se), se)


def open_(mask, se: np.ndarray):
    """cv2.morphologyEx(..., cv2.MORPH_OPEN): erode then dilate."""
    return dilate(erode(mask, se), se)


def binary_dilation_iter(mask, iterations: int):
    """scipy.ndimage.binary_dilation(mask, iterations=n) with the default
    cross structure (reference: diffusion_handles.py:108)."""
    if iterations <= 0:
        return jnp.asarray(mask) > 0.5
    return dilate(mask, cross_kernel(), iterations=iterations)


def binary_erosion_iter(mask, iterations: int):
    """scipy.ndimage.binary_erosion(mask, iterations=n), default structure,
    border_value=0 (reference: guided_stable_diffuser.py:538-539)."""
    if iterations <= 0:
        return jnp.asarray(mask) > 0.5
    return erode(mask, cross_kernel(), iterations=iterations,
                 border_value=0.0)

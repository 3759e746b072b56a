"""Image resizing with exact PyTorch `F.interpolate` semantics.

The reference resizes depth maps bicubically to the 64x64 latent grid
(reference: diffhandles/guided_stable_diffuser.py:110-127) and activation maps
bilinearly inside the guidance losses (reference: diffhandles/losses.py:8-9,
23-24), both with align_corners=False and antialias=False.

TPU-first design: separable resampling with clamped borders is a *linear* map
per axis, so we precompute dense [out, in] resampling matrices on the host and
apply them as two matmuls (MXU work, exact, fusable) instead of gather chains.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Resampling weights are exact linear maps; always accumulate in fp32 even on
# hardware whose default matmul precision is bf16.
_PRECISION = jax.lax.Precision.HIGHEST


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 as used by PyTorch."""
    x = np.abs(x)
    w = np.zeros_like(x)
    m1 = x <= 1.0
    m2 = (x > 1.0) & (x < 2.0)
    w[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    w[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, method: str) -> np.ndarray:
    """Dense [out_size, in_size] resampling matrix, torch semantics.

    Source coordinate of output pixel i: (i + 0.5) * scale - 0.5 (the
    align_corners=False / half-pixel-centers convention). Out-of-range taps
    clamp to the border (accumulating weight on edge pixels).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    if method == "bilinear_ac":
        # torch align_corners=True: src = i * (in-1)/(out-1)
        # (the MiDaS/ZoeDepth fusion convention)
        src = dst * ((in_size - 1) / max(out_size - 1, 1))
    else:
        src = (dst + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0

    if method in ("bilinear", "bilinear_ac"):
        offsets = np.array([0, 1])
        weights = np.stack([1.0 - t, t], axis=-1)  # [out, 2]
    elif method == "bicubic":
        offsets = np.array([-1, 0, 1, 2])
        weights = np.stack(
            [_cubic_weight(t + 1.0), _cubic_weight(t),
             _cubic_weight(1.0 - t), _cubic_weight(2.0 - t)], axis=-1)
    elif method == "nearest":
        # torch 'nearest': src = floor(i * scale), no half-pixel shift.
        idx = np.clip(np.floor(dst * scale).astype(np.int64), 0, in_size - 1)
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        mat[np.arange(out_size), idx] = 1.0
        return mat
    else:
        raise ValueError(f"Unknown resize method '{method}'")

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for k, off in enumerate(offsets):
        idx = np.clip(i0 + off, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), idx), weights[:, k])
    return mat.astype(np.float32)


def resize_hw(x, size, method: str = "bilinear", h_axis: int = -2,
              w_axis: int = -1):
    """Resize the (h_axis, w_axis) dims of `x` to `size=(H_out, W_out)`.

    Equivalent to torch.nn.functional.interpolate(x, size, mode=method,
    align_corners=False) for 'bilinear'/'bicubic', antialias=False.
    """
    h_out, w_out = size
    ndim = x.ndim
    h_axis %= ndim
    w_axis %= ndim
    h_in = x.shape[h_axis]
    w_in = x.shape[w_axis]
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if h_in != h_out:
        mh = jnp.asarray(resize_matrix(h_in, h_out, method))
        xf = jnp.tensordot(mh, xf, axes=[[1], [h_axis]],
                           precision=_PRECISION)
        xf = jnp.moveaxis(xf, 0, h_axis)
    if w_in != w_out:
        mw = jnp.asarray(resize_matrix(w_in, w_out, method))
        xf = jnp.tensordot(xf, mw, axes=[[w_axis], [1]],
                           precision=_PRECISION)
        # tensordot removed w_axis and appended the new W at the end.
        xf = jnp.moveaxis(xf, -1, w_axis)
    return xf.astype(dtype)


def resize_nhwc(x, size, method: str = "bilinear"):
    """Resize [N, H, W, C] (TPU-native layout) images."""
    return resize_hw(x, size, method=method, h_axis=1, w_axis=2)


def resize_nchw(x, size, method: str = "bilinear"):
    """Resize [N, C, H, W] (torch-layout) images, for API-parity surfaces."""
    return resize_hw(x, size, method=method, h_axis=2, w_axis=3)

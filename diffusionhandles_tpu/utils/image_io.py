"""Image and depth I/O + preprocessing.

Replaces reference: test/utils.py (load/save image + EXR depth via imageio's
downloaded freeimage plugin, center-crop-and-resize to 512^2). EXR files are
handled by this repo's native C++ reader/writer (exr_lite; supports the
reference test data's PIZ-compressed half-float depth maps) with no download
or external dependency.
"""

from __future__ import annotations

import pathlib
from typing import Tuple

import numpy as np


def load_image(path) -> np.ndarray:
    """Image file -> [C, H, W] float32 in [0, 1] (reference contract,
    test/utils.py:8-19)."""
    import imageio.v3 as iio
    img = np.asarray(iio.imread(path))
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 4:
        img = img[..., :3]
    return img.astype(np.float32).transpose(2, 0, 1) / 255.0


def save_image(img: np.ndarray, path) -> None:
    """[C, H, W] float in [0,1] -> image file (test/utils.py:21-31)."""
    import imageio.v3 as iio
    img = np.asarray(img)
    out = (np.clip(img, 0.0, 1.0) * 255.0).transpose(1, 2, 0).astype(
        np.uint8)
    if out.shape[-1] == 1:
        out = out[..., 0]
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    iio.imwrite(path, out)


def load_depth(path) -> np.ndarray:
    """Depth file (.exr or image) -> [1, H, W] float32
    (test/utils.py:33-42)."""
    path = pathlib.Path(path)
    if path.suffix.lower() == ".exr":
        from diffusionhandles_tpu.utils.exr import read_exr
        depth = read_exr(str(path))
    else:
        import imageio.v3 as iio
        depth = np.asarray(iio.imread(path)).astype(np.float32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    return depth.astype(np.float32)[None]


def save_depth(depth: np.ndarray, path) -> None:
    """[1, H, W] or [H, W] float32 -> .exr (test/utils.py:44-52)."""
    from diffusionhandles_tpu.utils.exr import write_exr
    depth = np.asarray(depth, np.float32)
    if depth.ndim == 3:
        depth = depth[0]
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    write_exr(str(path), depth)


def crop_and_resize(img: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to square then resize with antialias
    (reference: test/utils.py:54-58, torchvision semantics).

    img: [C, H, W] float32.
    """
    c, h, w = img.shape
    if h != w:
        s = min(h, w)
        top = (h - s) // 2
        left = (w - s) // 2
        img = img[:, top:top + s, left:left + s]
        h = w = s
    if h == size:
        return img
    # torchvision antialias resize == PIL bilinear; cv2.INTER_AREA for
    # downsampling is the closest separable equivalent available here.
    import cv2
    out = cv2.resize(img.transpose(1, 2, 0), (size, size),
                     interpolation=cv2.INTER_AREA if size < h
                     else cv2.INTER_LINEAR)
    if out.ndim == 2:
        out = out[..., None]
    return out.transpose(2, 0, 1).astype(np.float32)

"""Image quality metrics for reconstruction/edit evaluation.

The reference computes no numeric metrics (human-reviewed galleries only,
SURVEY.md section 4); here PSNR and SSIM are first-class so recon parity is
checkable in CI. (LPIPS requires pretrained perceptual weights — supported
via the same interface when a converted checkpoint is provided.)
"""

from __future__ import annotations

import numpy as np


def psnr(a, b, data_range: float = 1.0) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(a, b, data_range: float = 1.0, k1: float = 0.01,
         k2: float = 0.03) -> float:
    """Mean SSIM (Wang et al. 2004; 11x11 Gaussian window, per channel)."""
    from scipy.signal import convolve2d

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a = a[None]
        b = b[None]
    if a.shape[-1] in (1, 3) and a.ndim == 3:  # HWC -> CHW
        a = np.moveaxis(a, -1, 0)
        b = np.moveaxis(b, -1, 0)
    w = _gaussian_kernel()
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    vals = []
    for ca, cb in zip(a, b):
        mu_a = convolve2d(ca, w, mode="valid")
        mu_b = convolve2d(cb, w, mode="valid")
        mu_aa = convolve2d(ca * ca, w, mode="valid")
        mu_bb = convolve2d(cb * cb, w, mode="valid")
        mu_ab = convolve2d(ca * cb, w, mode="valid")
        va = mu_aa - mu_a ** 2
        vb = mu_bb - mu_b ** 2
        cov = mu_ab - mu_a * mu_b
        s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
            (mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))
        vals.append(s.mean())
    return float(np.mean(vals))

"""Morphology vs cv2/scipy oracles; Poisson CG vs scipy direct solve;
flash attention vs dense attention."""

import numpy as np
import pytest
import jax.numpy as jnp

from diffusionhandles_tpu.ops.morphology import (binary_dilation_iter,
                                                 binary_erosion_iter, close,
                                                 dilate, ellipse_kernel,
                                                 erode, open_)
from diffusionhandles_tpu.ops.poisson import (laplacian_zero_pad,
                                              poisson_solve,
                                              solve_laplacian_depth)


def _rand_mask(res=64, seed=0, p=0.3):
    rng = np.random.RandomState(seed)
    return (rng.rand(res, res) < p).astype(np.uint8)


@pytest.mark.parametrize("ksize", [2, 3, 5, 10])
def test_dilate_erode_match_cv2(ksize):
    import cv2
    se = ellipse_kernel(ksize)
    m = _rand_mask()
    want_d = cv2.dilate(m * 255, se.astype(np.uint8)) > 0
    got_d = np.asarray(dilate(m, se))
    np.testing.assert_array_equal(got_d, want_d)
    want_e = cv2.erode(m * 255, se.astype(np.uint8)) > 0
    got_e = np.asarray(erode(m, se))
    np.testing.assert_array_equal(got_e, want_e)


@pytest.mark.parametrize("ksize", [2, 10])
def test_close_open_match_cv2(ksize):
    import cv2
    se = ellipse_kernel(ksize)
    m = _rand_mask(seed=3, p=0.45)
    want_c = cv2.morphologyEx(m * 255, cv2.MORPH_CLOSE,
                              se.astype(np.uint8)) > 0
    got_c = np.asarray(close(m, se))
    np.testing.assert_array_equal(got_c, want_c)
    want_o = cv2.morphologyEx(m * 255, cv2.MORPH_OPEN,
                              se.astype(np.uint8)) > 0
    got_o = np.asarray(open_(m, se))
    np.testing.assert_array_equal(got_o, want_o)


def test_scipy_iterated_morphology():
    import scipy.ndimage
    m = _rand_mask(seed=5, p=0.6).astype(bool)
    for it in [1, 3, 15]:
        want = scipy.ndimage.binary_dilation(m, iterations=it)
        got = np.asarray(binary_dilation_iter(m, it))
        np.testing.assert_array_equal(got, want)
        want = scipy.ndimage.binary_erosion(m, iterations=it)
        got = np.asarray(binary_erosion_iter(m, it))
        np.testing.assert_array_equal(got, want)


def test_laplacian_matches_scipy():
    import scipy.ndimage
    rng = np.random.RandomState(0)
    img = rng.randn(32, 32).astype(np.float32)
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    want = scipy.ndimage.convolve(img, k, mode="constant")
    got = np.asarray(laplacian_zero_pad(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _scipy_poisson_oracle(image, mask):
    """Independent direct solve of the reference's system
    (reference: depth_transform.py:535-587)."""
    import scipy.sparse
    import scipy.sparse.linalg
    unknown = np.where(mask)
    num = len(unknown[0])
    index_map = -np.ones_like(image, int)
    index_map[unknown] = np.arange(num)
    A = scipy.sparse.lil_matrix((num, num))
    b = np.zeros(num)
    H, W = image.shape
    for idx, (y, x) in enumerate(zip(*unknown)):
        A[idx, idx] = 4
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            yy, xx = y + dy, x + dx
            if 0 <= yy < H and 0 <= xx < W:
                if mask[yy, xx]:
                    A[idx, index_map[yy, xx]] = -1
                else:
                    b[idx] += image[yy, xx]
    sol = scipy.sparse.linalg.spsolve(A.tocsr(), b)
    out = image.copy()
    out[unknown] = sol
    return out


def test_poisson_solve_matches_direct():
    rng = np.random.RandomState(0)
    res = 48
    img = np.cumsum(rng.randn(res, res).astype(np.float32), axis=1) * 0.1
    mask = np.zeros((res, res), bool)
    mask[10:25, 12:30] = True
    want = _scipy_poisson_oracle(img.astype(np.float64), mask)
    got = np.asarray(poisson_solve(img, mask, maxiter=3000))
    assert np.abs(got - want).max() < 1e-2
    # unmasked pixels untouched
    np.testing.assert_array_equal(got[~mask], img[~mask])


def _scipy_laplacian_depth_oracle(fg_depth, bg_depth, mask):
    """Oracle for reference: diffhandles/utils.py:49-102."""
    import scipy.ndimage
    import scipy.sparse
    import scipy.sparse.linalg
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]])
    lap_bg = scipy.ndimage.convolve(bg_depth, k, mode="constant")
    unknown = np.where(mask)
    num = len(unknown[0])
    index_map = -np.ones_like(fg_depth, int)
    index_map[unknown] = np.arange(num)
    A = scipy.sparse.lil_matrix((num, num))
    b = np.zeros(num)
    H, W = fg_depth.shape
    for idx, (y, x) in enumerate(zip(*unknown)):
        A[idx, idx] = 4
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            yy, xx = y + dy, x + dx
            if 0 <= yy < H and 0 <= xx < W:
                if mask[yy, xx]:
                    A[idx, index_map[yy, xx]] = -1
                else:
                    b[idx] += fg_depth[yy, xx]
        b[idx] -= lap_bg[y, x]
    sol = scipy.sparse.linalg.spsolve(A.tocsr(), b)
    out = fg_depth.copy()
    out[unknown] = sol
    return out


def test_solve_laplacian_depth_matches_direct():
    rng = np.random.RandomState(1)
    res = 48
    bg = 2.0 + 0.01 * np.cumsum(rng.randn(res, res), axis=0)
    fg = bg.copy()
    mask = np.zeros((res, res), bool)
    mask[15:35, 15:35] = True
    fg[mask] = 1.0  # hole content to be replaced
    want = _scipy_laplacian_depth_oracle(fg, bg, mask)
    got = np.asarray(solve_laplacian_depth(fg.astype(np.float32),
                                           bg.astype(np.float32), mask,
                                           maxiter=3000))
    assert np.abs(got - want).max() < 1e-2
    np.testing.assert_allclose(got[~mask], fg[~mask], rtol=1e-6)


def test_harmonize_depth_matches_composition():
    """harmonize_depth (set_foreground's single-jit path) must equal the
    unfused dilate -> solve_laplacian_depth composition."""
    from diffusionhandles_tpu.ops.morphology import binary_dilation_iter
    from diffusionhandles_tpu.ops.poisson import harmonize_depth
    rng = np.random.RandomState(5)
    n = 48
    fg = rng.rand(n, n).astype(np.float32)
    bg = rng.rand(n, n).astype(np.float32)
    mask = np.zeros((n, n), bool)
    mask[14:30, 16:34] = True
    dilated = binary_dilation_iter(mask, 4)
    want = np.asarray(solve_laplacian_depth(fg, bg, dilated))
    got = np.asarray(harmonize_depth(fg, bg, mask, dilate_iters=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

"""Masked 5-point-stencil Poisson/Laplace solvers as jitted conjugate
gradients (TPU-native).

Replaces the reference's host-side scipy sparse LU solves:
* poisson_solve (reference: diffhandles/depth_transform.py:535-587) —
  Laplace-inpaint masked pixels with Dirichlet data from the unmasked image.
* solve_laplacian_depth (reference: diffhandles/utils.py:49-102) — infill the
  foreground hole of the input depth, matching the *Laplacian of the
  background depth* inside the hole (Poisson with RHS = lap(bg)).

Both build the same SPD system: for each masked pixel p,
  4 u_p - sum_{q in N(p) & mask} u_q = sum_{q in N(p) & in-bounds & !mask}
  img_q + g_p,
with the reference's exact border convention (diagonal 4 everywhere; missing
out-of-bounds neighbors act as Dirichlet 0). The matrix is symmetric positive
definite, so CG converges; everything is elementwise + 4 shifts per matvec —
pure VPU work under one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _neighbor_sum(x):
    """Sum of 4-neighbors with zero padding (in-bounds shifts only)."""
    up = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return up + down + left + right


def laplacian_zero_pad(x):
    """scipy.ndimage.convolve(x, [[0,1,0],[1,-4,1],[0,1,0]], mode='constant')
    (reference: diffhandles/utils.py:45-47)."""
    return _neighbor_sum(x) - 4.0 * x


@functools.partial(jax.jit, static_argnames=("maxiter",))
def masked_poisson_cg(image, mask, rhs_extra=None, maxiter: int = 2000,
                      tol: float = 1e-6):
    """Solve the masked Laplace/Poisson system by CG.

    Args:
      image: [H, W] float — known values outside `mask` (Dirichlet data).
      mask: [H, W] bool/float — True where the value is unknown.
      rhs_extra: optional [H, W] — extra RHS g (e.g. lap of a guide image).
      maxiter: CG iteration cap (static).
      tol: relative residual-norm^2 stopping threshold.

    Returns image with masked pixels replaced by the solution.
    """
    image = jnp.asarray(image, jnp.float32)
    m = jnp.asarray(mask, jnp.float32)
    known = image * (1.0 - m)

    def matvec(x):
        # A x restricted to the mask: 4 x_p - sum of masked neighbors.
        return m * (4.0 * x - _neighbor_sum(m * x))

    b = m * _neighbor_sum(known)
    if rhs_extra is not None:
        b = b + m * jnp.asarray(rhs_extra, jnp.float32)

    x0 = jnp.zeros_like(image)
    r0 = b - matvec(x0)
    p0 = r0
    rs0 = jnp.vdot(r0, r0)
    thresh = tol * rs0

    def cond(state):
        i, _, r, _, rs = state
        return jnp.logical_and(i < maxiter, rs > thresh)

    def body(state):
        i, x, r, p, rs = state
        ap = matvec(p)
        alpha = rs / (jnp.vdot(p, ap) + 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        beta = rs_new / (rs + 1e-30)
        p = r + beta * p
        return i + 1, x, r, p, rs_new

    _, x, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x0, r0, p0, rs0))
    return known + m * x


def poisson_solve(image, mask, maxiter: int = 2000):
    """Laplace-inpaint `mask` pixels of `image`
    (reference: depth_transform.py:535-587)."""
    return masked_poisson_cg(image, mask, None, maxiter=maxiter)


def solve_laplacian_depth(fg_depth, bg_depth, mask, maxiter: int = 2000):
    """Infill the (dilated) foreground hole of `fg_depth` using the
    background depth's Laplacian as guidance
    (reference: diffhandles/utils.py:49-102; the reference's
    b -= lap_bg means RHS g = -lap(bg)).
    """
    g = -laplacian_zero_pad(jnp.asarray(bg_depth, jnp.float32))
    return masked_poisson_cg(fg_depth, mask, g, maxiter=maxiter)


@functools.partial(jax.jit, static_argnames=("dilate_iters", "maxiter"))
def harmonize_depth(fg_depth, bg_depth, fg_mask, dilate_iters: int = 15,
                    maxiter: int = 2000):
    """set_foreground's whole device path under ONE jit: dilate the fg mask
    `dilate_iters` times (scipy cross SE) and Laplacian-infill the hole
    (reference: diffusion_handles.py:90-111). Eagerly dispatching the 15
    dilation convs + CG through the device tunnel measured ~330 ms
    (scripts/probe_geometry.py); fused under jit the same math is ~ms."""
    from diffusionhandles_tpu.ops.morphology import binary_dilation_iter
    dilated = binary_dilation_iter(fg_mask, dilate_iters)
    g = -laplacian_zero_pad(jnp.asarray(bg_depth, jnp.float32))
    return masked_poisson_cg(fg_depth, dilated, g, maxiter=maxiter)

"""Pallas 3x3 SAME convolution (TPU, NHWC, stride 1).

Why: at batch 1 XLA lowers the U-Net's 3x3 convs into a GroupNorm+im2col
staging fusion (materializing a 9x [rows, tiles, taps, C] patch buffer),
a matmul fusion, and layout copies between them — device traces
(scripts/profile_unet.py) show the staging fusions and the ~1.6 ms/forward
of copies cost more than the matmuls themselves. This kernel reads the
padded activation ONCE from VMEM and accumulates nine shifted MXU matmuls
(the flattened-shift formulation), so no patch buffer or layout copy ever
exists.

Formulation: pad x to [H+2, W+2, Ci] and flatten rows; a kernel tap
(di, dj) is then a contiguous slice of length H*(W+2) starting at
di*(W+2)+dj. The two wrap-around columns per row compute garbage that the
caller slices away (overcompute (W+2)/W ~ 3%).

y = conv3x3(x, w) carries a custom VJP:
  dx  = conv3x3(pad-flip) = this kernel with w flipped and transposed
  dw  = nine [Ci, S] x [S, Co] matmuls over the shifted activations (XLA;
        dead-code-eliminated when only input grads are needed, which is
        the inference-time guidance/null-text case)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3_kernel(x_ref, w_ref, o_ref, *, h: int, wpad: int):
    """x_ref [1, (h+2)*wpad, ci]; w_ref [9, ci, co_t]; o_ref [1, h*wpad,
    co_t]. wpad = W + 2."""
    s_out = h * wpad
    acc = jnp.zeros((s_out, o_ref.shape[-1]), jnp.float32)
    for tap in range(9):
        di, dj = tap // 3, tap % 3
        off = di * wpad + dj
        xs = x_ref[0, pl.ds(off, s_out), :]
        acc = acc + jnp.dot(xs, w_ref[tap],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _co_tile(co: int) -> int:
    # Mosaic wants the block's minor dim to be a multiple of 128 (lanes)
    # or the full array dim.
    if co % 256 == 0:
        return 256
    if co % 128 == 0:
        return 128
    return co


def _conv3x3_pallas(x, w):
    """x [B, H, W, Ci] (any float dtype), w [3, 3, Ci, Co] ->
    y [B, H, W, Co] (x.dtype)."""
    b, h, wdt, ci = x.shape
    co = w.shape[-1]
    wpad = wdt + 2
    # Alignment: flat output index i = r*wpad + (c-1) for output col c; the
    # tap (di, dj) then reads padded flat index i + di*wpad + dj. One extra
    # bottom pad row keeps the last garbage column's reads in bounds.
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
    xf = xp.reshape(b, (h + 3) * wpad, ci)
    wf = w.reshape(9, ci, co).astype(x.dtype)
    co_tile = _co_tile(co)

    yf = pl.pallas_call(
        functools.partial(_conv3_kernel, h=h, wpad=wpad),
        grid=(b, co // co_tile),
        in_specs=[
            pl.BlockSpec((1, (h + 3) * wpad, ci), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci, co_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * wpad, co_tile),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * wpad, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xf, wf)
    # drop the wrap-around columns: row-relative index j = c-1, so the
    # valid output cols are the first W of each wpad-row
    return yf.reshape(b, h, wpad, co)[:, :, :wdt, :]


def _vmem_bytes(h, wdt, ci, co_tile, dtype_bytes=2):
    s_in = (h + 2) * (wdt + 2) * ci * dtype_bytes
    s_w = 9 * ci * co_tile * dtype_bytes
    s_acc = h * (wdt + 2) * co_tile * 4
    s_out = h * (wdt + 2) * co_tile * dtype_bytes
    return s_in + s_w + s_acc + s_out


def conv3x3_ok(x_shape, w_shape, dtype_bytes: int = 2) -> bool:
    """Eligibility: 3x3 kernel, activation + weights fit VMEM comfortably,
    output rows tile-aligned. Checks BOTH kernel orientations — the custom
    VJP runs the same Pallas kernel with ci/co swapped (dx of a co>>ci
    conv needs a dy input buffer scaling with co), so gating on the
    forward alone could admit a shape whose backward exceeds VMEM.

    dtype_bytes: element size of the activation dtype (2 for bf16, 4 for
    f32) — the f32 buffers are twice the bf16 estimate."""
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    b, h, wdt, ci = x_shape
    co = w_shape[-1]
    if ci < 64 or co < 64:          # tiny channel counts: stay with XLA
        return False
    if (h * (wdt + 2)) % 8:
        return False
    budget = 64 * 1024 * 1024
    return (_vmem_bytes(h, wdt, ci, _co_tile(co), dtype_bytes) < budget
            and _vmem_bytes(h, wdt, co, _co_tile(ci), dtype_bytes)
            < budget)


@jax.custom_vjp
def conv3x3(x, w):
    """3x3 SAME stride-1 NHWC convolution (no bias; add it outside)."""
    return _conv3x3_pallas(x, w)


def _conv3x3_fwd(x, w):
    return _conv3x3_pallas(x, w), (x, w)


def _dw_taps(x, dy, w_dtype):
    """dw[di, dj] = x_shifted(di, dj)^T @ dy — nine MXU matmuls (XLA;
    dead-code-eliminated when only input grads are needed). Shared by
    every conv VJP here (Pallas, hybrid, taps)."""
    b, h, wdt, ci = x.shape
    co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(b * h * wdt, co)
    taps = []
    for di in range(3):
        for dj in range(3):
            xs = xp[:, di:di + h, dj:dj + wdt, :].reshape(b * h * wdt, ci)
            taps.append(jnp.dot(xs.T, dyf,
                                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(3, 3, ci, co).astype(w_dtype)


def _conv3x3_bwd(res, dy):
    x, w = res
    # dx: full correlation with the spatially flipped, in/out-transposed
    # kernel — the same kernel formulation.
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_pallas(dy.astype(x.dtype), w_t).astype(x.dtype)
    return dx, _dw_taps(x, dy, w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def _lax_conv3(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


@jax.custom_vjp
def conv3x3_hybrid(x, w):
    """XLA forward (its conv-matmul fusions are fast inside grad graphs)
    with the Pallas kernel as the input-gradient path (XLA's dgrad
    convolutions are several times off roofline in device traces)."""
    return _lax_conv3(x, w)


def _hybrid_fwd(x, w):
    return _lax_conv3(x, w), (x, w)


conv3x3_hybrid.defvjp(_hybrid_fwd, _conv3x3_bwd)


def conv3x3_taps(x, w, stride: int = 1, taps=None):
    """3x3 SAME conv as nine shifted [S, Ci] @ [Ci, Co] matmuls in plain
    jnp (no Pallas): keeps activations in row-major [B, S, C] layouts so
    XLA's layout assignment never switches to conv layouts. Used for the
    small-channel layout anchors (conv_in / conv_out / downsample) when
    the Pallas conv mode is on.

    `taps` (optional): nine pre-sliced [Ci, Co] tap matrices in the
    compute dtype, row-major tap order. XLA does not hoist loop-invariant
    slices out of lax.scan bodies, so slicing `w[di, dj]` here costs an
    HBM->HBM copy EVERY denoising step (~0.8 ms/step in the fwd+bwd
    device trace); callers hoist it with models.unet.prepare_unet_params
    and pass the slices in."""
    b, h, wdt, ci = x.shape
    co = (w.shape[-1] if w is not None else taps[0].shape[-1])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho = (h + stride - 1) // stride
    wo = (wdt + stride - 1) // stride
    # fp32 accumulation across the nine taps (the MXU accumulates each
    # matmul in fp32 anyway; summing in the compute dtype would round 9x
    # per conv instead of once, a systematic numerics gap vs XLA's convs)
    acc = None
    for di in range(3):
        for dj in range(3):
            xs = xp[:, di:di + h:stride, dj:dj + wdt:stride, :]
            xs = xs[:, :ho, :wo, :].reshape(b, ho * wo, ci)
            wk = taps[di * 3 + dj] if taps is not None else w[di, dj]
            t = jnp.einsum("bsc,cf->bsf", xs, wk,
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.reshape(b, ho, wo, co).astype(x.dtype)


def _im2col(x, stride: int = 1):
    """Row-major im2col: [B, H, W, Ci] -> [B, Ho*Wo, 9*Ci] with tap-major
    channel order (index = tap*Ci + ci, matching w.reshape(9*Ci, Co))."""
    b, h, wdt, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho = (h + stride - 1) // stride
    wo = (wdt + stride - 1) // stride
    cols = []
    for di in range(3):
        for dj in range(3):
            xs = xp[:, di:di + h:stride, dj:dj + wdt:stride, :]
            cols.append(xs[:, :ho, :wo, :].reshape(b, ho * wo, ci))
    return jnp.concatenate(cols, axis=-1), (ho, wo)


def _conv3x3_im2col(x, w, stride: int = 1):
    """3x3 SAME conv as ONE row-major matmul on the materialized patch
    matrix: [B, S, 9*Ci] @ [9*Ci, Co]. vs conv3x3_taps (nine matmuls
    accumulated in fp32): trades the 8 accumulator round-trips through HBM
    for one 9x activation materialization, and feeds the MXU a deep
    (9*Ci) contraction instead of nine shallow ones."""
    b = x.shape[0]
    co = w.shape[-1]
    ci = x.shape[-1]
    x9, (ho, wo) = _im2col(x, stride)
    y = jnp.einsum("bsc,cf->bsf", x9, w.reshape(9 * ci, co),
                   preferred_element_type=jnp.float32)
    return y.reshape(b, ho, wo, co).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_im2col(x, w, stride: int = 1):
    """Differentiable im2col conv: both gradient directions are themselves
    single im2col matmuls (dx = im2col(dy) @ rot(w); dw = im2col(x)^T @ dy),
    so the whole grad graph stays row-major with one matmul per direction."""
    return _conv3x3_im2col(x, w, stride)


def _im2col_fwd(x, w, stride):
    return _conv3x3_im2col(x, w, stride), (x, w)


def _im2col_bwd(stride, res, dy):
    x, w = res
    if stride != 1:
        # stride-2 convs (downsamplers) keep the taps-form gradients
        dx, dw = jax.vjp(lambda xx, ww: conv3x3_taps(xx, ww, stride),
                         x, w)[1](dy)
        return dx, dw
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = _conv3x3_im2col(dy.astype(x.dtype), w_t).astype(x.dtype)
    # dw: one [9*Ci, S] x [S, Co] matmul on the recomputed patch matrix
    # (dead-code-eliminated when only input grads are needed).
    b, h, wdt, ci = x.shape
    co = dy.shape[-1]
    x9, _ = _im2col(x)
    dw = jax.lax.dot_general(
        x9.reshape(b * h * wdt, 9 * ci), dy.reshape(b * h * wdt, co),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return dx, dw.reshape(3, 3, ci, co).astype(w.dtype)


conv3x3_im2col.defvjp(_im2col_fwd, _im2col_bwd)


def _taps_dx_dw(x, w, dy):
    """Input/weight grads of a 3x3 SAME stride-1 conv in the row-major
    tap-matmul formulation (no conv ops, no Pallas)."""
    # dx: full correlation with the flipped, in/out-transposed kernel
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = conv3x3_taps(dy.astype(x.dtype), w_t).astype(x.dtype)
    return dx, _dw_taps(x, dy, w.dtype)


@jax.custom_vjp
def conv3x3_mixed(x, w):
    """Pallas flattened-shift forward (the measured-best no-grad conv) with
    the taps-matmul backward (the measured-best grad path) — candidate for
    the grad model's stride-1 convs."""
    return _conv3x3_pallas(x, w)


def _mixed_fwd(x, w):
    return _conv3x3_pallas(x, w), (x, w)


def _mixed_bwd(res, dy):
    x, w = res
    return _taps_dx_dw(x, w, dy)


conv3x3_mixed.defvjp(_mixed_fwd, _mixed_bwd)

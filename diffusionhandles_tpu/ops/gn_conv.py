"""Fused GroupNorm + SiLU + 3x3 conv Pallas kernel (TPU, NHWC, stride 1).

Why: the batch-1 U-Net fwd+bwd graph is overhead-bound — the taps-mode
device trace (scripts/profile_unet.py fwdbwd --taps) shows ~8000 ops/step,
with >5 ms/step of sub-100 us fusions and ~2 ms of copy/slice waits; each
resnet-block half (GN -> SiLU -> 3x3 conv) alone expands into ~30 XLA ops
(stats fusions, normalize fusion, pad, 9 tap slices + 9 dots + adds).
This kernel computes the whole half-block in ONE Pallas call:

  y = conv3x3(silu(groupnorm(x; gamma, beta)), w)     (SAME, stride 1)

using the flattened-shift tap formulation of ops/conv.py (pad x to
[(h+3)*(w+2), Ci] flat rows; tap (di, dj) is a contiguous slice), with the
GroupNorm statistics computed in-kernel on the masked interior. A custom
VJP provides a second Pallas kernel for dx (conv-transpose taps + SiLU'
+ the GroupNorm backward, all fused); parameter grads (dgamma/dbeta/dw)
are emitted as plain-XLA recomputations that dead-code-eliminate in the
pipeline's input-gradient-only uses (null-text/guidance optimize inputs,
never weights — reference: diffhandles/stable_null_inverter.py:135-167,
guided_stable_diffuser.py:335-373).

Numerics match the unfused composition: stats + normalize + SiLU in fp32,
matmuls in the input dtype (bf16 in the pipeline) with fp32 accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _interior_mask(s: int, wpad: int, h: int, wdt: int, row_off: int):
    """[s, 1] f32 mask of valid positions in a flat padded layout whose row
    r = idx // wpad is valid for r in [row_off, row_off + h) and whose col
    c = idx % wpad is valid for c in [row_off, row_off + wdt)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    r = idx // wpad
    c = idx - r * wpad
    ok = ((r >= row_off) & (r < row_off + h)
          & (c >= row_off) & (c < row_off + wdt))
    return ok.astype(jnp.float32)


def _group_matrices(ci: int, groups: int):
    """Onehot [ci, groups] map (and its transpose) from channel to group,
    built from iota so no extra kernel inputs are needed."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (ci, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (ci, groups), 1)
    m = (ch // (ci // groups) == gr).astype(jnp.float32)
    return m


def _gn_stats(xm, mask_count, groups, eps):
    """Masked GroupNorm statistics. xm: [s, ci] f32 with invalid rows
    already zeroed. Returns per-channel (mean, rsigma) rows [1, ci]."""
    ci = xm.shape[-1]
    m = _group_matrices(ci, groups)
    s1 = jnp.sum(xm, axis=0, keepdims=True)            # [1, ci]
    s2 = jnp.sum(xm * xm, axis=0, keepdims=True)
    n = mask_count * (ci // groups)
    g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n
    g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n
    var = g2 - g1 * g1
    rsig_g = jax.lax.rsqrt(var + eps)
    mean_c = jnp.dot(g1, m.T, preferred_element_type=jnp.float32)
    rsig_c = jnp.dot(rsig_g, m.T, preferred_element_type=jnp.float32)
    return mean_c, rsig_c


def _silu(y):
    return y * jax.nn.sigmoid(y)


def _silu_grad(y):
    s = jax.nn.sigmoid(y)
    return s * (1.0 + y * (1.0 - s))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _gn_conv_fwd_kernel(x_ref, g_ref, b_ref, w_ref, o_ref, *, h, wpad,
                        groups, eps, out_dtype):
    wdt = wpad - 2
    s_pad = x_ref.shape[1]
    s_out = h * wpad
    x = x_ref[0].astype(jnp.float32)                    # [s_pad, ci]
    mask = _interior_mask(s_pad, wpad, h, wdt, row_off=1)
    xm = x * mask
    mean_c, rsig_c = _gn_stats(xm, float(h * wdt), groups, eps)
    y = (x - mean_c) * rsig_c * g_ref[0] + b_ref[0]
    # SiLU, then re-zero the halo so the conv taps read SAME-padding zeros.
    y = (_silu(y) * mask).astype(x_ref.dtype)
    acc = jnp.zeros((s_out, o_ref.shape[-1]), jnp.float32)
    for tap in range(9):
        di, dj = tap // 3, tap % 3
        off = di * wpad + dj
        ys = y[off:off + s_out, :]
        acc = acc + jnp.dot(ys, w_ref[tap],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(out_dtype)


# ---------------------------------------------------------------------------
# Backward (dx) kernel
# ---------------------------------------------------------------------------


def _gn_conv_bwd_kernel(x_ref, g_ref, b_ref, wt_ref, dy_ref, o_ref, *, h,
                        wpad, groups, eps):
    """dx of y = conv3x3(silu(gn(x))) given dy (padded to the same flat
    layout as x). Output is in the OUT flat layout (h*wpad rows, first
    wdt cols of each row valid); position i corresponds to padded input
    position i + wpad + 1."""
    wdt = wpad - 2
    s_pad = x_ref.shape[1]
    s_out = h * wpad
    x = x_ref[0].astype(jnp.float32)
    mask = _interior_mask(s_pad, wpad, h, wdt, row_off=1)
    xm = x * mask
    mean_c, rsig_c = _gn_stats(xm, float(h * wdt), groups, eps)
    gamma = g_ref[0]

    # dz = correlation of dy with the flipped, transposed kernel — the same
    # tap formulation (wt_ref[tap] = w[2-di, 2-dj].T, prepared outside).
    dy = dy_ref[0]
    dz = jnp.zeros((s_out, x.shape[-1]), jnp.float32)
    for tap in range(9):
        di, dj = tap // 3, tap % 3
        off = di * wpad + dj
        ds = dy[off:off + s_out, :]
        dz = dz + jnp.dot(ds, wt_ref[tap],
                          preferred_element_type=jnp.float32)

    # Slice the padded-layout tensors down to the OUT layout (static shift).
    xh = ((x - mean_c) * rsig_c)[wpad + 1:wpad + 1 + s_out, :]
    ygn = xh * gamma + b_ref[0]
    mask_o = _interior_mask(s_out, wpad, h, wdt, row_off=0)
    dgn = dz * _silu_grad(ygn) * mask_o
    dxh = dgn * gamma
    # GroupNorm backward: dx = rsig*(dxhat - mean_g(dxhat) - xhat *
    # mean_g(dxhat * xhat)), means over the masked group elements.
    ci = x.shape[-1]
    m = _group_matrices(ci, groups)
    n = float(h * wdt) * (ci // groups)
    t1 = jnp.dot(jnp.sum(dxh, axis=0, keepdims=True), m,
                 preferred_element_type=jnp.float32) / n
    t2 = jnp.dot(jnp.sum(dxh * xh, axis=0, keepdims=True), m,
                 preferred_element_type=jnp.float32) / n
    t1c = jnp.dot(t1, m.T, preferred_element_type=jnp.float32)
    t2c = jnp.dot(t2, m.T, preferred_element_type=jnp.float32)
    rsig_o = rsig_c  # per-channel row broadcasts over rows
    dx = rsig_o * (dxh - t1c - xh * t2c) * mask_o
    o_ref[0] = dx.astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _pad_flat(x):
    """[B, H, W, C] -> [B, (H+3)*(W+2), C] in the taps layout of
    ops/conv.py (_conv3x3_pallas): pad rows (1, 2), cols (1, 1)."""
    b, h, wdt, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
    return xp.reshape(b, (h + 3) * (wdt + 2), c)


def _co_tile(co: int) -> int:
    if co % 256 == 0:
        return 256
    if co % 128 == 0:
        return 128
    return co


def _fwd_impl(x, gamma, beta, w, groups, eps):
    b, h, wdt, ci = x.shape
    co = w.shape[-1]
    wpad = wdt + 2
    xf = _pad_flat(x)
    wf = w.reshape(9, ci, co).astype(x.dtype)
    g2 = gamma.astype(jnp.float32).reshape(1, ci)
    b2 = beta.astype(jnp.float32).reshape(1, ci)
    co_t = _co_tile(co)

    yf = pl.pallas_call(
        functools.partial(_gn_conv_fwd_kernel, h=h, wpad=wpad,
                          groups=groups, eps=eps, out_dtype=x.dtype),
        grid=(b, co // co_t),
        in_specs=[
            pl.BlockSpec((1, (h + 3) * wpad, ci), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ci, co_t), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * wpad, co_t), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * wpad, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xf, g2, b2, wf)
    return yf.reshape(b, h, wpad, co)[:, :, :wdt, :]


def _bwd_dx_impl(x, gamma, beta, w, dy, groups, eps):
    b, h, wdt, ci = x.shape
    co = w.shape[-1]
    wpad = wdt + 2
    xf = _pad_flat(x)
    dyf = _pad_flat(dy.astype(x.dtype))
    # flipped + transposed kernel, tap-major: wt[tap(di,dj)] = w[2-di,2-dj].T
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).reshape(9, co, ci)
    wt = wt.astype(x.dtype)
    g2 = gamma.astype(jnp.float32).reshape(1, ci)
    b2 = beta.astype(jnp.float32).reshape(1, ci)

    dxf = pl.pallas_call(
        functools.partial(_gn_conv_bwd_kernel, h=h, wpad=wpad,
                          groups=groups, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, (h + 3) * wpad, ci), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, co, ci), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (h + 3) * wpad, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * wpad, ci), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * wpad, ci), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xf, g2, b2, wt, dyf)
    return dxf.reshape(b, h, wpad, ci)[:, :, :wdt, :]


# ---------------------------------------------------------------------------
# Plain-XLA reference composition (ineligible shapes + parameter grads +
# tests). Matches flax nn.GroupNorm(dtype=f32) -> silu -> conv3x3 numerics.
# ---------------------------------------------------------------------------


def _gn_xla_xhat(x, groups, eps):
    b, h, wdt, ci = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * wdt, groups, ci // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xh = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xh.reshape(b, h, wdt, ci)


def _gn_xla(x, gamma, beta, groups, eps):
    xh = _gn_xla_xhat(x, groups, eps)
    return xh * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def gn_silu_conv3x3_ref(x, gamma, beta, w, groups: int, eps: float):
    """Unfused reference: fp32 GN + SiLU, taps-matmul conv (row-major)."""
    from diffusionhandles_tpu.ops.conv import conv3x3_taps
    y = _silu(_gn_xla(x, gamma, beta, groups, eps)).astype(x.dtype)
    return conv3x3_taps(y, w.astype(x.dtype))


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _vmem_estimate(h, wdt, ci, co) -> int:
    """Rough peak VMEM of the larger (bwd) kernel in bytes: the fp32
    padded activation + two fp32 working copies + the full transposed
    kernel + dz accumulator + in/out bf16 buffers."""
    s_pad = (h + 3) * (wdt + 2)
    s_out = h * (wdt + 2)
    f32 = 4 * s_pad * ci * 3 + 4 * s_out * ci * 2
    wts = 2 * 9 * ci * co * 2
    io = 2 * s_pad * (ci + co) + 2 * s_out * ci
    return f32 + wts + io


def gn_silu_conv3x3_ok(x_shape, w_shape, groups: int) -> bool:
    if len(w_shape) != 4 or w_shape[0] != 3 or w_shape[1] != 3:
        return False
    b, h, wdt, ci = x_shape
    co = w_shape[-1]
    if ci % groups or ci // groups < 1:
        return False
    if ci < 64 or co < 64 or (h * (wdt + 2)) % 8:
        return False
    return _vmem_estimate(h, wdt, ci, co) < 72 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gn_silu_conv3x3(x, gamma, beta, w, groups: int, eps: float):
    """Fused y = conv3x3(silu(groupnorm(x))), SAME stride-1 NHWC, no conv
    bias (add it outside). Caller must gate on gn_silu_conv3x3_ok."""
    return _fwd_impl(x, gamma, beta, w, groups, eps)


def _vjp_fwd(x, gamma, beta, w, groups, eps):
    return _fwd_impl(x, gamma, beta, w, groups, eps), (x, gamma, beta, w)


def _vjp_bwd(groups, eps, res, dy):
    x, gamma, beta, w = res
    dx = _bwd_dx_impl(x, gamma, beta, w, dy, groups, eps)

    # Parameter grads: plain-XLA recomputation. The pipeline only ever
    # differentiates w.r.t. activations/embeddings (frozen weights), so XLA
    # dead-code-eliminates all of this in the hot paths; it exists so the
    # op stays honest under training-style grads.
    from diffusionhandles_tpu.ops.conv import conv3x3_taps
    xh = _gn_xla_xhat(x, groups, eps)
    xgn = xh * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    z = _silu(xgn).astype(x.dtype)
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(x.dtype)
    dz = conv3x3_taps(dy.astype(x.dtype), w_t).astype(jnp.float32)
    dgn = dz * _silu_grad(xgn)
    dgamma = jnp.sum(dgn * xh, axis=(0, 1, 2)).astype(gamma.dtype)
    dbeta = jnp.sum(dgn, axis=(0, 1, 2)).astype(beta.dtype)
    from diffusionhandles_tpu.ops.conv import _dw_taps
    dw = _dw_taps(z, dy.astype(x.dtype), w.dtype)
    return dx, dgamma, dbeta, dw


gn_silu_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)

"""Standalone fused GroupNorm(+SiLU) Pallas TPU kernel with a custom VJP.

Why this exists (round-4 trace evidence, scripts/microbench_scan.py
--trace on the fwd+bwd scan): XLA's GroupNorm stat fusions are the
largest off-roofline bucket left in the U-Net step — ~1 ms/step across
~30 norm sites, with the top fusion (the [4096, 320] resnet GN) costing
93 us against a ~16 us HBM r+w bound (6x off; XLA lays these tensors out
channel-in-sublane and reduces across lanes). The round-3 gn_conv.py
MEGAkernel (GN+SiLU+conv in one grid cell) measured negative because it
serialized the GN reductions against the tap matmuls; this kernel is the
other shape of that idea: GN(+SiLU) ALONE, leaving the taps matmuls to
XLA's scheduler.

Kernel shape (v2 — the v1 single-VMEM-cell-per-batch-element design
measured only ~1.1x XLA because one grid cell cannot overlap its HBM
DMAs with compute): a (B, 2, S/bs) grid making two pipelined passes over
row blocks. Pass 0 accumulates per-channel sum / sum-of-squares into
VMEM scratch via MXU ones-matmuls (no fp32 slab materialization, no
cross-sublane reduce); pass 1 finalizes the per-group statistics once
and streams the normalize(+SiLU) blocks out. The backward runs the same
structure: pass 0 accumulates the two per-channel gradient sums, pass 1
streams dx; dgamma/dbeta fall out of the same sums.

The op replaces flax `nn.GroupNorm(dtype=f32)` -> `nn.silu` -> cast at
the U-Net's norm sites (reference capability: the stock GroupNorm calls
inside the diffusers ResnetBlock2D/Transformer2D used by
/root/reference/diffhandles/model/unet_2d_condition.py). Numerics match
flax's formulation: fp32 statistics with var = E[x^2] - E[x]^2, fp32
normalize/affine/SiLU, cast to the compute dtype at the end. The only
deliberate deviation is that the x^2 / gradient-product reduction inputs
are rounded to the input dtype (bf16 in the pipeline) before the fp32
MXU accumulation — a <=0.1% relative error on rstd, below the bf16
output rounding (fp32 inputs reduce exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusionhandles_tpu.ops.gn_conv import (_group_matrices, _silu,
                                              _silu_grad)


def _block_rows(s: int, c: int, target_bytes: int = 1 << 20) -> int:
    """Largest power-of-two row count dividing s whose [bs, c] bf16 block
    stays near `target_bytes` (big enough to amortize DMA setup, small
    enough to double-buffer)."""
    bs = 8
    while bs < s and s % (bs * 2) == 0 and (bs * 2) * c * 2 <= target_bytes:
        bs *= 2
    return bs if s % bs == 0 else s


# ---------------------------------------------------------------------------
# Forward kernel: grid (B, 2, S/bs); scratch carries channel sums
# ---------------------------------------------------------------------------


def _gn_fwd_kernel(x_ref, g_ref, b_ref, y_ref, m_ref, r_ref,
                   su_ref, sq_ref, a_ref, bb_ref, *, groups, eps, act,
                   n_total):
    p = pl.program_id(1)
    i = pl.program_id(2)
    xb = x_ref[0]                                       # [bs, C] in dtype
    bs, c = xb.shape

    @pl.when(jnp.logical_and(p == 0, i == 0))
    def _init():
        su_ref[...] = jnp.zeros(su_ref.shape, su_ref.dtype)
        sq_ref[...] = jnp.zeros(sq_ref.shape, sq_ref.dtype)

    @pl.when(p == 0)
    def _accumulate():
        ones = jnp.ones((8, bs), xb.dtype)
        su_ref[...] += jnp.dot(ones, xb,
                               preferred_element_type=jnp.float32)
        sq_ref[...] += jnp.dot(ones, xb * xb,
                               preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(p == 1, i == 0))
    def _finalize():
        m = _group_matrices(c, groups)
        # every row of the [8, bs] ones-matmul equals the column sum
        s1 = su_ref[0:1]
        s2 = sq_ref[0:1]
        g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n_total
        g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n_total
        var = jnp.maximum(g2 - g1 * g1, 0.0)
        rsig_g = jax.lax.rsqrt(var + eps)
        mean_c = jnp.dot(g1, m.T, preferred_element_type=jnp.float32)
        rsig_c = jnp.dot(rsig_g, m.T, preferred_element_type=jnp.float32)
        # y = (x - mean) * rstd * gamma + beta == x * A + B
        a = rsig_c * g_ref[0]
        a_ref[...] = jnp.broadcast_to(a, a_ref.shape)
        bb_ref[...] = jnp.broadcast_to(b_ref[0] - mean_c * a, bb_ref.shape)
        m_ref[0] = jnp.broadcast_to(mean_c, m_ref.shape[1:])
        r_ref[0] = jnp.broadcast_to(rsig_c, r_ref.shape[1:])

    @pl.when(p == 1)
    def _apply():
        z = xb.astype(jnp.float32) * a_ref[0:1] + bb_ref[0:1]
        if act:
            z = _silu(z)
        y_ref[0] = z.astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# Backward kernel: same two-pass structure; outputs dx + dgamma/dbeta
# ---------------------------------------------------------------------------


def _gn_bwd_kernel(x_ref, dy_ref, g_ref, b_ref, m_ref, r_ref,
                   dx_ref, dg_ref, db_ref,
                   su_ref, sv_ref, t1_ref, t2_ref, *, groups, eps, act,
                   n_total):
    p = pl.program_id(1)
    i = pl.program_id(2)
    xb = x_ref[0]
    bs, c = xb.shape
    mean_c = m_ref[0, 0:1]
    rsig_c = r_ref[0, 0:1]
    gamma = g_ref[0]

    def _dz_xh():
        xh = (xb.astype(jnp.float32) - mean_c) * rsig_c
        dy = dy_ref[0].astype(jnp.float32)
        if act:
            z = xh * gamma + b_ref[0]
            dz = dy * _silu_grad(z)
        else:
            dz = dy
        return dz, xh

    @pl.when(jnp.logical_and(p == 0, i == 0))
    def _init():
        su_ref[...] = jnp.zeros(su_ref.shape, su_ref.dtype)
        sv_ref[...] = jnp.zeros(sv_ref.shape, sv_ref.dtype)

    @pl.when(p == 0)
    def _accumulate():
        dz, xh = _dz_xh()
        # u = sum_s dz, v = sum_s dz*xh, accumulated on the MXU in the
        # input dtype (exact for fp32; bf16 rounds the product once)
        dzc = dz.astype(xb.dtype)
        ones = jnp.ones((8, bs), xb.dtype)
        su_ref[...] += jnp.dot(ones, dzc,
                               preferred_element_type=jnp.float32)
        sv_ref[...] += jnp.dot(ones, (dz * xh).astype(xb.dtype),
                               preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(p == 1, i == 0))
    def _finalize():
        m = _group_matrices(c, groups)
        u = su_ref[0:1]
        v = sv_ref[0:1]
        dg_ref[0] = jnp.broadcast_to(v, dg_ref.shape[1:])
        db_ref[0] = jnp.broadcast_to(u, db_ref.shape[1:])
        t1 = jnp.dot(u * gamma, m,
                     preferred_element_type=jnp.float32) / n_total
        t2 = jnp.dot(v * gamma, m,
                     preferred_element_type=jnp.float32) / n_total
        t1_ref[...] = jnp.broadcast_to(
            jnp.dot(t1, m.T, preferred_element_type=jnp.float32),
            t1_ref.shape)
        t2_ref[...] = jnp.broadcast_to(
            jnp.dot(t2, m.T, preferred_element_type=jnp.float32),
            t2_ref.shape)

    @pl.when(p == 1)
    def _apply():
        dz, xh = _dz_xh()
        dx = rsig_c * (gamma * dz - t1_ref[0:1] - xh * t2_ref[0:1])
        dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_VMEM_LIMIT = 64 * 1024 * 1024


def _fwd_impl(x3, gamma, beta, groups, eps, act, out_dtype):
    b, s, c = x3.shape
    bs = _block_rows(s, c)
    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)
    kern = functools.partial(_gn_fwd_kernel, groups=groups, eps=eps,
                             act=act, n_total=float(s * (c // groups)))
    blk = pl.BlockSpec((1, bs, c), lambda bi, p, i: (bi, i, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, c), lambda bi, p, i: (0, 0),
                       memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 8, c), lambda bi, p, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((1, bs, c), lambda bi, p, i: (bi, i * p, 0),
                        memory_space=pltpu.VMEM)
    y, mean, rsig = pl.pallas_call(
        kern,
        grid=(b, 2, s // bs),
        in_specs=[blk, row, row],
        out_specs=[oblk, brow, brow],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), out_dtype),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x3, g2, b2)
    return y, mean, rsig


def _bwd_impl(x3, dy3, gamma, beta, mean, rsig, groups, eps, act):
    b, s, c = x3.shape
    bs = _block_rows(s, c)
    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)
    kern = functools.partial(_gn_bwd_kernel, groups=groups, eps=eps,
                             act=act, n_total=float(s * (c // groups)))
    blk = pl.BlockSpec((1, bs, c), lambda bi, p, i: (bi, i, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, c), lambda bi, p, i: (0, 0),
                       memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 8, c), lambda bi, p, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((1, bs, c), lambda bi, p, i: (bi, i * p, 0),
                        memory_space=pltpu.VMEM)
    dx, dg, db = pl.pallas_call(
        kern,
        grid=(b, 2, s // bs),
        in_specs=[blk, blk, row, row, brow, brow],
        out_specs=[oblk, brow, brow],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(x3, dy3.astype(x3.dtype), g2, b2, mean, rsig)
    return dx, jnp.sum(dg[:, 0], axis=0), jnp.sum(db[:, 0], axis=0)


# ---------------------------------------------------------------------------
# Eligibility + reference
# ---------------------------------------------------------------------------


def gn_ok(x_shape, groups: int, dtype_bytes: int = 2) -> bool:
    """Shape gate: channels divide into groups and are at least half a
    lane tile; rows tile-aligned. The v2 kernel streams row blocks, so
    VMEM holds only a few blocks + [8, C] scratch rows — size is no
    longer the binding constraint (the per-shape probe
    scripts/probe_gn.py calibrates this gate)."""
    *lead, c = x_shape
    s = 1
    for d in lead[1:]:
        s *= d
    if c % groups or c < 64:
        return False
    if s % 8:
        return False
    return s * c * dtype_bytes < 512 * 1024 * 1024


def gn_silu_ref(x, gamma, beta, groups: int, eps: float, act: bool,
                out_dtype):
    """fp32 reference matching flax nn.GroupNorm(dtype=f32) numerics
    (var = E[x^2] - E[x]^2 over each (spatial, group-channels) slab),
    followed by optional SiLU and a cast — the exact composition the
    U-Net uses when the Pallas path is off."""
    shape = x.shape
    c = shape[-1]
    xf = x.astype(jnp.float32).reshape(shape[0], -1, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    mu2 = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mu2 - jnp.square(mu), 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(shape) * gamma.astype(jnp.float32) + beta.astype(
        jnp.float32)
    if act:
        y = _silu(y)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def gn_silu(x, gamma, beta, groups: int, eps: float, act: bool,
            out_dtype):
    """Fused y = cast(silu?(groupnorm(x; gamma, beta))) on TPU via Pallas.

    x: [B, ...spatial..., C] (any rank >= 2; stats reduce over everything
    but the batch and group axes). Caller gates with `gn_ok`.
    """
    b, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(b, -1, c)
    y, _, _ = _fwd_impl(x3, gamma, beta, groups, eps, act, out_dtype)
    return y.reshape(x.shape[:-1] + (c,))


def _vjp_fwd(x, gamma, beta, groups, eps, act, out_dtype):
    b, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(b, -1, c)
    y, mean, rsig = _fwd_impl(x3, gamma, beta, groups, eps, act, out_dtype)
    return (y.reshape(x.shape[:-1] + (c,)),
            (x, gamma, beta, mean, rsig))


def _vjp_bwd(groups, eps, act, out_dtype, res, dy):
    x, gamma, beta, mean, rsig = res
    b, c = x.shape[0], x.shape[-1]
    x3 = x.reshape(b, -1, c)
    dy3 = dy.reshape(b, -1, c)
    dx, dg, db = _bwd_impl(x3, dy3, gamma, beta, mean, rsig, groups, eps,
                           act)
    return (dx.reshape(x.shape), dg.astype(gamma.dtype),
            db.astype(beta.dtype))


gn_silu.defvjp(_vjp_fwd, _vjp_bwd)

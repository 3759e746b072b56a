"""Attention primitives for the diffusion stack.

The sequence lengths in this framework are short (<= 64*64 = 4096 self-attn
tokens, 77 cross-attn tokens — reference operates at fixed 512^2 images,
diffhandles/guided_stable_diffuser.py latents are 64^2), so the MXU-friendly
formulation is a dense batched matmul pair with an fp32 softmax; XLA fuses
the scale/softmax chain. A Pallas flash-attention kernel is provided for the
largest self-attention shapes and can be toggled per-call.

Replaces torch.nn.functional.scaled_dot_product_attention as used by the
reference's AttnProcessor2_0 (reference: diffhandles/model/
attention_processor.py:1234-1262), including optional attention-probability
capture (the reference recovers probs by re-running SDPA against an identity
value matrix; functionally probs = softmax(q k^T / sqrt(d))).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane width used for per-row scalar buffers (lse/delta) in flash kernels
_LANES = 8


def _dot_nt(a, b):
    """a @ b.T via dot_general (no materialized transpose; the MXU takes
    either operand orientation natively)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a.T @ b via dot_general (no materialized transpose)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def dot_product_attention(q, k, v, *, return_probs: bool = False,
                          use_flash: bool = False):
    """Multi-head attention.

    Args:
      q: [B, Sq, H, D]
      k, v: [B, Sk, H, D]
      return_probs: also return softmax probabilities [B, H, Sq, Sk]
        (parity with the reference's `save_attentions` capture).
      use_flash: use the Pallas flash kernel (no prob capture).

    Returns:
      out [B, Sq, H, D] (and probs if requested).
    """
    if use_flash and not return_probs:
        if _flash_ok(q.shape[1], k.shape[1], head_dim=q.shape[-1]):
            return flash_attention_diff(q, k, v)
        # short sequences (e.g. 77-token cross-attn): dense is faster
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if return_probs:
        return out, probs
    return out


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, no masking — all sequences here are
# dense fixed-length token grids), with a custom VJP so the guidance
# gradients (jax.grad through the U-Net) can use it too.
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, kv_len,
                  block_k):
    # Matmuls run in the INPUT dtype (bf16 in the pipeline -> MXU-native
    # rate; fp32 MXU passes are ~8x slower) with fp32 accumulation; the
    # softmax state stays fp32. q arrives PRE-SCALED by 1/sqrt(d) (folded
    # in the wrapper: scaling [S, d] once beats scaling every [bq, bk]
    # logit block — an 84M-element VPU multiply per 4096-token layer).
    q = q_ref[0]  # [block_q, d]
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = _dot_nt(q, k)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, kv_len // block_k, body,
                                  (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse is materialized on an 8-lane axis to satisfy TPU tiling
    # (a [*, block_q] block would put 1 in the sublane dim).
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (block_q, _LANES))


def _flash_onepass_fold_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                               head_dim):
    """One-pass forward with the softmax denominator FOLDED into the p@v
    matmul: v arrives augmented with a ones column (v_aug[:, d] = 1), so
    acc_aug = p @ v_aug yields both the weighted values (cols :d) and the
    row sum l (col d) from one MXU pass — removing the [block_q, sk]
    VPU sum-reduce. l is then the sum of the SAME bf16-rounded p the value
    matmul consumes (the unfolded kernel sums f32 p but multiplies bf16 p),
    so the fold is a consistency fix as much as a speed one."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]                            # [sk, d+1(+pad)]
    s = _dot_nt(q, k)                       # [block_q, sk] fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    l = acc[:, head_dim:head_dim + 1]
    o_ref[0] = (acc[:, :head_dim] / l).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), lse_ref[0].shape)


def _flash_onepass_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
    """Plain softmax attention for one query block against the WHOLE KV
    range: no running max/denominator carry, one exp sweep, no alpha
    rescale of the accumulator. Measured ~8% faster than the online
    formulation at the U-Net's 4096-token shape (scripts/
    probe_attention.py) — the sequences here are short enough that the
    full [block_q, sk] logit block fits VMEM, so FlashAttention's online
    softmax buys nothing."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = _dot_nt(q, k)                       # [block_q, sk] fp32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), lse_ref[0].shape)


# VMEM feasibility bounds for the forward kernels (the backward kernels
# tile [1024, 1024] logit blocks and are insensitive to sk). The one-pass
# kernel keeps ~10 live bytes per [block_q, sk] logit element (fp32 s,
# its exp, and the bf16 copy fed to the MXU); the measured shipping config
# (block_q=2048, sk=4096 -> 80 MB) is the proven-feasible ceiling under
# the 100 MB vmem_limit. Both fwd kernels also hold K and V whole in VMEM.
_S_STATE_BYTES = 10
_S_BLOCK_BUDGET = 80 * 1024 * 1024
_KV_RESIDENT_BUDGET = 16 * 1024 * 1024   # per K / V array, bf16


def _fwd_blocks(sq: int, sk: int, block_q: int = 2048,
                block_k: int = 1 << 20):
    """Choose VMEM-feasible forward blocks. Shared by _flash_fwd_impl and
    the eligibility gate so routing and execution can never disagree:
    shrink block_q while the one-pass [block_q, sk] logit state exceeds
    budget; if even block_q=256 doesn't fit, stream KV in 2048 chunks."""
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    if bk == sk:
        while bq > 256 and bq * sk * _S_STATE_BYTES > _S_BLOCK_BUDGET:
            bq //= 2
        if bq * sk * _S_STATE_BYTES > _S_BLOCK_BUDGET:
            bk = min(2048, sk)
    return bq, bk


def _flash_fwd_impl(q, k, v, block_q: int = 2048, block_k: int = 1 << 20,
                    fold: bool = True):
    """Returns (out [B,S,H,D], lse [B*H, S])."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q, block_k = _fwd_blocks(sq, sk, block_q, block_k)
    scale = 1.0 / math.sqrt(d)
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, sq, d)
    qt = (qt.astype(jnp.float32) * scale).astype(q.dtype)
    kt = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, sk, d)
    vt = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, sk, d)

    fold = fold and block_k == sk
    dv = d + 1 if fold else d
    if fold:
        # ones column: the p@v_aug matmul emits the softmax denominator
        # (see _flash_onepass_fold_kernel)
        vt = jnp.concatenate([vt, jnp.ones((b * h, sk, 1), v.dtype)],
                             axis=-1)
        kernel = functools.partial(_flash_onepass_fold_kernel, head_dim=d)
    else:
        kernel = (_flash_onepass_kernel if block_k == sk
                  else functools.partial(_flash_kernel, kv_len=sk,
                                         block_k=block_k))
    out, lse = pl.pallas_call(
        kernel,
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq, _LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qt, kt, vt)
    return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3)), lse


def _flash_fwd_supported(sq: int, sk: int, block_q: int = 2048,
                         block_k: int = 1 << 20,
                         head_dim: int = 64) -> bool:
    """Forward-kernel CORRECTNESS constraint: divisibility against the SAME
    effective block sizes _flash_fwd_impl will run (grid floor-division
    silently drops trailing rows/KV blocks otherwise) plus VMEM residency
    of the whole K/V arrays, which the kernels assume."""
    bq, bk = _fwd_blocks(sq, sk, block_q, block_k)
    kv_resident = sk * head_dim * 2 <= _KV_RESIDENT_BUDGET
    return kv_resident and sk % bk == 0 and sq % bq == 0


def _flash_supported(sq: int, sk: int, block_q: int = 2048,
                     block_k: int = 1 << 20, head_dim: int = 64) -> bool:
    """Correctness constraint for the differentiable path: the forward
    constraint plus divisibility for EVERY kernel the VJP may run — the
    fused backward's block_q=1024 and the two-pass backward's
    block_k=1024."""
    bq_bwd = min(1024, sq)       # _flash_bwd_fused_impl block_q default
    bk_bwd = min(1024, sk)       # _flash_bwd_impl block_k default
    return (_flash_fwd_supported(sq, sk, block_q, block_k, head_dim)
            and sq % bq_bwd == 0 and sk % bk_bwd == 0)


def _flash_ok(sq: int, sk: int, block_q: int = 2048,
              block_k: int = 1 << 20, head_dim: int = 64) -> bool:
    """Routing heuristic: long-enough (dense wins at short cross-attn
    lengths like 77) AND supported by the kernels."""
    return sk >= 512 and _flash_supported(sq, sk, block_q, block_k,
                                          head_dim)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 2048, block_k: int = 1 << 20):
    """Flash attention for [B, S, H, D] inputs (non-causal, unmasked).

    Forward-only entry (no custom VJP), so only the forward kernels'
    constraints gate it — shapes the backward kernels can't tile (e.g.
    1536 or 2560 tokens) still run flash here while
    dot_product_attention(use_flash=True) conservatively demotes them
    (its result may be differentiated through flash_attention_diff)."""
    if not (k.shape[1] >= 512
            and _flash_fwd_supported(q.shape[1], k.shape[1], block_q,
                                     block_k, head_dim=q.shape[-1])):
        return dot_product_attention(q, k, v)
    return _flash_fwd_impl(q, k, v, block_q, block_k)[0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, kv_len, block_k):
    # q arrives pre-scaled; the wrapper applies the final 1/sqrt(d) to dq.
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]      # [block_q, 1] (lane-padded buffer)
    delta = delta_ref[0][:, :1]
    block_q, d = q.shape

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = _dot_nt(q, k)
        p = jnp.exp(s - lse)
        dp = _dot_nt(do, v)
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, kv_len // block_k, body,
                           jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, q_len, block_q):
    # q arrives pre-scaled, so dk = ds~.T @ (q/sqrt(d)) needs no rescale.
    k = k_ref[0]
    v = v_ref[0]
    block_k, d = k.shape

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :1]
        s = _dot_nt(q, k)
        p = jnp.exp(s - lse)  # [block_q, block_k]
        dv = dv + _dot_tn(p.astype(do.dtype), do)
        dp = _dot_nt(do, v)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + _dot_tn(ds, q)
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, q_len // block_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                            dq_ref, dk_ref, dv_ref, *, q_len,
                            block_q):
    """Single-sweep FlashAttention backward: for one KV block, loop over
    all query blocks computing p = exp(s - lse) ONCE and emitting all
    three gradient contributions (the published two-pass formulation
    recomputes s and p in both passes — 7 matmuls + 2 exp per block pair
    vs 5 matmuls + 1 exp here). dq accumulates across KV-grid steps in
    VMEM (TPU grid steps are sequential; j is the minor grid axis)."""
    k = k_ref[0]
    v = v_ref[0]
    block_k, d = k.shape
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :1]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :1]
        s = _dot_nt(q, k)
        p = jnp.exp(s - lse)                       # [block_q, block_k]
        dv = dv + _dot_tn(p.astype(do.dtype), do)
        dp = _dot_nt(do, v)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + _dot_tn(ds, q)
        dq_ref[0, pl.ds(i * block_q, block_q), :] += jnp.dot(
            ds, k, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, q_len // block_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_fused_fold_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                 dq_ref, dk_ref, dv_ref, *, q_len,
                                 block_q, head_dim):
    """Fused backward with the delta subtraction FOLDED into the dp matmul:
    do arrives augmented with two columns [-delta_hi, -delta_lo] (bf16
    hi/lo split of the f32 delta) and v with two ones columns, so
    dp_adj = do_aug @ v_aug.T = do @ v.T - delta in one MXU pass — removing
    the [block_q, block_k] VPU broadcast-subtract. The d=64 contraction
    underfills the 128-deep MXU anyway, so the two extra columns ride the
    same pass."""
    k = k_ref[0]
    v = v_ref[0]                               # [block_k, d+2(+pad)]
    block_k = k.shape[0]
    d = head_dim
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do_aug = do_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_aug[:, :d]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :1]
        s = _dot_nt(q, k)
        p = jnp.exp(s - lse)                       # [block_q, block_k]
        dv = dv + _dot_tn(p.astype(do.dtype), do)
        dp_adj = _dot_nt(do_aug, v)                # = do @ v[:, :d].T - delta
        ds = (p * dp_adj).astype(q.dtype)
        dk = dk + _dot_tn(ds, q)
        dq_ref[0, pl.ds(i * block_q, block_q), :] += jnp.dot(
            ds, k, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, q_len // block_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_fused_fold_impl(q, k, v, o, lse, do, block_q: int = 1024,
                               block_k: int = 1024):
    """Delta-folded fused backward (see _flash_bwd_fused_fold_kernel).
    v_aug carries ones in BOTH extra columns; do_aug carries the bf16
    hi/lo split of -delta, so the matmul accumulates
    -delta_hi - delta_lo = -delta to ~f32 precision in the MXU's f32
    accumulator despite bf16 operands."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    scale = 1.0 / math.sqrt(d)
    tr = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1],
                                                          d)
    qt, kt, vt, dot = tr(q), tr(k), tr(v), tr(do)
    qt = (qt.astype(jnp.float32) * scale).astype(q.dtype)
    delta = jnp.sum(dot.astype(jnp.float32)
                    * tr(o).astype(jnp.float32), axis=-1,
                    keepdims=True)                     # [bh, sq, 1] f32
    d_hi = (-delta).astype(do.dtype)
    d_lo = (-delta - d_hi.astype(jnp.float32)).astype(do.dtype)
    do_aug = jnp.concatenate([dot, d_hi, d_lo], axis=-1)   # [bh, sq, d+2]
    ones = jnp.ones((b * h, sk, 2), v.dtype)
    v_aug = jnp.concatenate([vt, ones], axis=-1)           # [bh, sk, d+2]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_fused_fold_kernel, q_len=sq,
                          block_q=block_q, head_dim=d),
        grid=(b * h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d + 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d + 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
    )(qt, kt, v_aug, do_aug, lse)
    dq = (dq * scale).astype(q.dtype)

    untr = lambda x: jnp.transpose(
        x.reshape(b, h, x.shape[1], d), (0, 2, 1, 3))
    return untr(dq), untr(dk), untr(dv)


def _flash_bwd_fused_impl(q, k, v, o, lse, do, block_q: int = 2048,
                          block_k: int = 2048):
    # 2048/2048 probe-best on v5e (1411 us vs 1426 us at 1024/1024,
    # s=4096; equal at s=1024); blocks clamp to the sequence below.
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    scale = 1.0 / math.sqrt(d)
    tr = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1],
                                                          d)
    qt, kt, vt, dot = tr(q), tr(k), tr(v), tr(do)
    qt = (qt.astype(jnp.float32) * scale).astype(q.dtype)
    delta = jnp.sum(dot.astype(jnp.float32)
                    * tr(o).astype(jnp.float32), axis=-1)  # [bh, sq]
    delta = jnp.broadcast_to(delta[..., None],
                             delta.shape + (_LANES,))  # lane-padded

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, q_len=sq,
                          block_q=block_q),
        grid=(b * h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # dq accumulates across the sk//block_k sequential grid steps
            # INSIDE this buffer — it must be fp32 or each partial sum is
            # rounded to bf16 (the two-pass kernel accumulates in an fp32
            # register carry; this keeps the fused path's dq at the same
            # precision)
            jax.ShapeDtypeStruct((b * h, sq, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
    )(qt, kt, vt, dot, lse, delta)
    dq = (dq * scale).astype(q.dtype)

    untr = lambda x: jnp.transpose(
        x.reshape(b, h, x.shape[1], d), (0, 2, 1, 3))
    return untr(dq), untr(dk), untr(dv)


def _flash_bwd_impl(q, k, v, o, lse, do, block_q: int = 512,
                    block_k: int = 1024):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    scale = 1.0 / math.sqrt(d)
    tr = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1],
                                                          d)
    qt, kt, vt, dot = tr(q), tr(k), tr(v), tr(do)
    qt = (qt.astype(jnp.float32) * scale).astype(q.dtype)
    delta = jnp.sum(dot.astype(jnp.float32)
                    * tr(o).astype(jnp.float32), axis=-1)  # [bh, sq]
    delta = jnp.broadcast_to(delta[..., None],
                             delta.shape + (_LANES,))  # lane-padded

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, kv_len=sk,
                          block_k=block_k),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qt, kt, vt, dot, lse, delta)
    dq = (dq.astype(jnp.float32) * scale).astype(q.dtype)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, q_len=sq,
                          block_q=block_q),
        grid=(b * h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(qt, kt, vt, dot, lse, delta)

    untr = lambda x: jnp.transpose(
        x.reshape(b, h, x.shape[1], d), (0, 2, 1, 3))
    return untr(dq), untr(dk), untr(dv)


# Differentiable flash attention: Pallas forward (saves O and the row
# log-sum-exp) + Pallas FlashAttention-2-style backward (dq pass over query
# blocks, dk/dv pass over key blocks; probabilities recomputed from lse).
@jax.custom_vjp
def flash_attention_diff(q, k, v):
    return flash_attention(q, k, v)


def _fa_fwd(q, k, v):
    if not _flash_supported(q.shape[1], k.shape[1]):
        raise ValueError(
            f"flash_attention_diff: shapes sq={q.shape[1]} sk={k.shape[1]} "
            f"not block-aligned for the Pallas kernels — the caller must "
            f"gate on _flash_ok and fall back to dense attention")
    o, lse = _flash_fwd_impl(q, k, v)
    return o, (q, k, v, o, lse)


def _fa_bwd(res, do):
    q, k, v, o, lse = res
    import os
    # fused single-sweep is the measured-best default (probe_attention on
    # v5e: 1411 us vs 1428 us delta-FOLD vs 1846 us twopass at s=4096;
    # the delta-fold trades the VPU broadcast-subtract for two extra MXU
    # columns but measured NEUTRAL-to-worse — the [bq,bk] subtract was
    # already hidden behind the matmuls). Both alternates stay available
    # for A/B measurement (DIFFHANDLES_FLASH_BWD=fold|twopass).
    mode = os.environ.get("DIFFHANDLES_FLASH_BWD")
    if mode == "twopass":
        return _flash_bwd_impl(q, k, v, o, lse, do)
    if mode == "fold":
        return _flash_bwd_fused_fold_impl(q, k, v, o, lse, do)
    return _flash_bwd_fused_impl(q, k, v, o, lse, do)


flash_attention_diff.defvjp(_fa_fwd, _fa_bwd)

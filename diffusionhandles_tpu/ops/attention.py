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
        sq, sk = q.shape[1], k.shape[1]
        if sq % min(256, sq) == 0 and sk % min(512, sk) == 0 and sk >= 512:
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, d]
    block_q, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, kv_len // block_k, body,
                                  (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512):
    """Flash attention for [B, S, H, D] inputs (non-causal, unmasked)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        # Shapes here are powers of two (64^2, 32^2, ...); fall back otherwise.
        return dot_product_attention(q, k, v)
    scale = 1.0 / math.sqrt(d)
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, sq, d)
    kt = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, sk, d)
    vt = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, sk, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=sk,
                          block_k=block_k),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
    )(qt, kt, vt)
    return jnp.transpose(out.reshape(b, h, sq, d), (0, 2, 1, 3))


# Differentiable wrapper: Pallas forward + dense einsum backward (the
# backward recomputes probabilities; at <=4096 tokens the dense bwd is
# XLA-fusable and memory-light, so a full Pallas bwd kernel is not the
# bottleneck — measured-first policy).
@jax.custom_vjp
def flash_attention_diff(q, k, v):
    return flash_attention(q, k, v)


def _fa_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _fa_bwd(res, do):
    q, k, v = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    do_f = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, do_f,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", do_f, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention_diff.defvjp(_fa_fwd, _fa_bwd)

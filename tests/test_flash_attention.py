"""Flash-attention kernel correctness (fwd + custom-VJP bwd) vs the dense
path, run in Pallas interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffusionhandles_tpu.ops.attention import (dot_product_attention,
                                                flash_attention,
                                                flash_attention_diff)


def _rand_qkv(b=1, s=512, h=2, d=64, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (b, s, h, d), jnp.float32)
    k = jax.random.normal(k2, (b, s, h, d), jnp.float32)
    v = jax.random.normal(k3, (b, s, h, d), jnp.float32)
    return q, k, v


def test_flash_forward_matches_dense():
    q, k, v = _rand_qkv()
    want = np.asarray(dot_product_attention(q, k, v))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_vjp_matches_dense():
    q, k, v = _rand_qkv(s=256)

    def loss_dense(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_diff(q, k, v) ** 2)

    want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3,
                                   atol=2e-3, err_msg=f"d{name}")


def test_fused_bwd_dq_fp32_accumulation():
    """Regression: the fused backward's dq accumulates across KV grid steps
    inside its output buffer — that buffer must be fp32. With bf16 inputs
    and multiple KV blocks the fused dq must match the two-pass kernel's
    fp32-register accumulation exactly (same bf16 products, same order);
    a bf16 buffer rounds every partial sum and diverges."""
    from diffusionhandles_tpu.ops.attention import (_flash_bwd_fused_impl,
                                                    _flash_bwd_impl,
                                                    _flash_fwd_impl)
    q, k, v = _rand_qkv(s=1024, h=1, seed=3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    do = jax.random.normal(jax.random.PRNGKey(9), q.shape,
                           jnp.float32).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        o, lse = _flash_fwd_impl(q, k, v, block_q=256, block_k=256)
        dq_f, dk_f, dv_f = _flash_bwd_fused_impl(q, k, v, o, lse, do,
                                                 block_q=256, block_k=256)
        dq_2, dk_2, dv_2 = _flash_bwd_impl(q, k, v, o, lse, do,
                                           block_q=256, block_k=256)
    np.testing.assert_array_equal(np.asarray(dq_f, np.float32),
                                  np.asarray(dq_2, np.float32))
    np.testing.assert_allclose(np.asarray(dk_f, np.float32),
                               np.asarray(dk_2, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(dv_f, np.float32),
                               np.asarray(dv_2, np.float32), atol=1e-2)


def test_flash_fallback_on_odd_shapes():
    # 77-token cross attention: falls back to dense (no crash, same result)
    q, k, v = _rand_qkv(s=64)
    k = k[:, :60]
    v = v[:, :60]
    want = np.asarray(dot_product_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gate_matches_impl_block_sizes():
    """Regression: the eligibility gate must use the SAME block sizes as
    the kernel impls (512/1024). A 1280-token sequence divides the old
    gate's 256-block but NOT the impl's 512-block — it must be routed to
    dense, not silently truncated by the kernel grid."""
    from diffusionhandles_tpu.ops.attention import (_flash_ok,
                                                    _flash_supported)

    assert not _flash_supported(1280, 1280)   # 1280 % 512 != 0
    assert not _flash_ok(1280, 1280)
    assert _flash_ok(4096, 4096)
    assert _flash_ok(1024, 1024)
    assert not _flash_ok(77, 77)

    q, k, v = _rand_qkv(s=1280, h=1)
    want = np.asarray(dot_product_attention(q, k, v))
    got = np.asarray(dot_product_attention(q, k, v, use_flash=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_flash_diff_raises_on_unsupported_shape():
    q, k, v = _rand_qkv(s=1280, h=1)
    with pytest.raises(ValueError, match="not block-aligned"):
        jax.grad(lambda q: jnp.sum(flash_attention_diff(q, k, v)))(q)


def test_fwd_blocks_vmem_feasibility():
    """Regression: the one-pass forward materializes a [block_q, sk] logit
    state; long sequences must shrink block_q (or stream KV) instead of
    blowing the VMEM limit at compile time, and the gate must agree with
    the impl's choice."""
    from diffusionhandles_tpu.ops.attention import (_KV_RESIDENT_BUDGET,
                                                    _S_BLOCK_BUDGET,
                                                    _S_STATE_BYTES,
                                                    _flash_ok, _fwd_blocks)

    # shipped U-Net config unchanged: one-pass with the measured blocks
    assert _fwd_blocks(4096, 4096) == (2048, 4096)
    assert _fwd_blocks(1024, 1024) == (1024, 1024)
    # 16k tokens: still one-pass but with a shrunken query block
    bq, bk = _fwd_blocks(16384, 16384)
    assert bk == 16384 and bq * 16384 * _S_STATE_BYTES <= _S_BLOCK_BUDGET
    assert _flash_ok(16384, 16384)
    # 64k tokens: one-pass infeasible even at bq=256 -> stream KV
    bq, bk = _fwd_blocks(65536, 65536)
    assert bk == 2048
    assert _flash_ok(65536, 65536)
    # enormous KV no longer fits VMEM whole -> dense fallback
    sk_too_big = 2 * _KV_RESIDENT_BUDGET // (2 * 64)
    assert not _flash_ok(sk_too_big, sk_too_big, head_dim=64)
    # every choice keeps divisibility (grid floor-division safety)
    for sq, sk in [(4096, 4096), (16384, 16384), (65536, 65536),
                   (2048, 4096), (8192, 8192)]:
        bq, bk = _fwd_blocks(sq, sk)
        assert sq % bq == 0 and sk % bk == 0

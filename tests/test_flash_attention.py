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


def test_flash_fallback_on_odd_shapes():
    # 77-token cross attention: falls back to dense (no crash, same result)
    q, k, v = _rand_qkv(s=64)
    k = k[:, :60]
    v = v[:, :60]
    want = np.asarray(dot_product_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

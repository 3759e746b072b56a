"""Fused GroupNorm(+SiLU) Pallas kernel correctness (fwd + custom-VJP
dx/dgamma/dbeta) vs the fp32 flax-GroupNorm composition, interpret mode
on CPU. The op replaces the nn.GroupNorm -> silu -> cast sites of the
U-Net (reference structure: the stock GroupNorm calls inside the
diffusers ResnetBlock2D used by
/root/reference/diffhandles/model/unet_2d_condition.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffusionhandles_tpu.ops.groupnorm import gn_ok, gn_silu, gn_silu_ref


def _inputs(b=1, h=8, w=8, c=64, seed=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (b, h, w, c), jnp.float32).astype(dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(k2, (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(k3, (c,), jnp.float32)
    return x, gamma, beta


def test_ref_matches_flax_groupnorm():
    """gn_silu_ref's no-act path IS flax nn.GroupNorm(dtype=f32)."""
    x, gamma, beta = _inputs(c=320)
    mod = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
    want = mod.apply({"params": {"scale": gamma, "bias": beta}}, x)
    got = gn_silu_ref(x, gamma, beta, 32, 1e-5, act=False,
                      out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("b,c,groups,act,eps", [
    (1, 64, 8, True, 1e-5),
    (1, 320, 32, True, 1e-5),     # real SD-2 resnet shape: group width 10
    (2, 320, 32, False, 1e-6),    # CFG batch + attention-GN config
    (1, 96, 32, True, 1e-5),      # group width 3 (<< lane tile)
])
def test_forward_matches_reference(b, c, groups, act, eps):
    x, gamma, beta = _inputs(b=b, c=c)
    assert gn_ok(x.shape, groups)
    want = np.asarray(gn_silu_ref(x, gamma, beta, groups, eps, act,
                                  jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gn_silu(x, gamma, beta, groups, eps, act,
                                 jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_forward_bf16_cast():
    x, gamma, beta = _inputs(c=128, dtype=jnp.bfloat16)
    want = np.asarray(gn_silu_ref(x, gamma, beta, 32, 1e-5, True,
                                  jnp.bfloat16).astype(jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gn_silu(x, gamma, beta, 32, 1e-5, True,
                                 jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("act", [True, False])
def test_grads_match_reference(act):
    x, gamma, beta = _inputs(b=2, c=64)

    def loss_ref(x, gamma, beta):
        y = gn_silu_ref(x, gamma, beta, 8, 1e-5, act, jnp.float32)
        return jnp.sum(y * y)

    def loss_pl(x, gamma, beta):
        y = gn_silu(x, gamma, beta, 8, 1e-5, act, jnp.float32)
        return jnp.sum(y * y)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pl, argnums=(0, 1, 2))(x, gamma, beta)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-4)


def test_gn_ok_gate():
    assert gn_ok((1, 64, 64, 320), 32)
    assert gn_ok((1, 64, 64, 960), 32)
    assert gn_ok((1, 512, 512, 960), 32)       # v2 streams row blocks
    assert not gn_ok((1, 64, 64, 321), 32)     # not divisible
    assert not gn_ok((1, 64, 64, 32), 32)      # channels too small
    assert not gn_ok((1, 3, 3, 320), 32)       # spatial not tile-aligned

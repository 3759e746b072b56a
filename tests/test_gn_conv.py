"""Fused GroupNorm+SiLU+conv3x3 Pallas kernel correctness (fwd + custom-VJP
dx + parameter grads) vs the unfused fp32 composition, interpret mode on
CPU. The fused op replaces each resnet-block half of the U-Net
(reference structure: diffusers ResnetBlock2D as used by
/root/reference/diffhandles/guided_stable_diffuser.py's SD-2-depth UNet)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffusionhandles_tpu.ops.gn_conv import (gn_silu_conv3x3,
                                              gn_silu_conv3x3_ok,
                                              gn_silu_conv3x3_ref)


def _inputs(h=8, w=8, ci=64, co=64, groups=8, seed=0):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(k1, (1, h, w, ci), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(k2, (ci,), jnp.float32)
    beta = 0.1 * jax.random.normal(k3, (ci,), jnp.float32)
    wk = jax.random.normal(k4, (3, 3, ci, co), jnp.float32) * 0.05
    return x, gamma, beta, wk


@pytest.mark.parametrize("ci,co,groups,h", [
    (64, 64, 8, 8),        # square
    (128, 64, 32, 8),      # channel reduction
    (64, 256, 8, 6),       # co tiling (co_t=256) + non-square-ish h
    (96, 64, 32, 8),       # ci % 128 != 0 (group width 3)
])
def test_fused_forward_matches_reference(ci, co, groups, h):
    x, gamma, beta, wk = _inputs(h=h, w=h, ci=ci, co=co, groups=groups)
    assert gn_silu_conv3x3_ok(x.shape, wk.shape, groups)
    want = np.asarray(gn_silu_conv3x3_ref(x, gamma, beta, wk, groups, 1e-5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gn_silu_conv3x3(x, gamma, beta, wk, groups, 1e-5))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_dx_matches_reference():
    x, gamma, beta, wk = _inputs()

    def loss_ref(x):
        return jnp.sum(gn_silu_conv3x3_ref(x, gamma, beta, wk, 8, 1e-5) ** 2)

    def loss_fused(x):
        return jnp.sum(gn_silu_conv3x3(x, gamma, beta, wk, 8, 1e-5) ** 2)

    want = np.asarray(jax.grad(loss_ref)(x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.grad(loss_fused)(x))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_fused_param_grads_match_reference():
    x, gamma, beta, wk = _inputs()

    def loss_ref(gamma, beta, wk):
        return jnp.sum(gn_silu_conv3x3_ref(x, gamma, beta, wk, 8, 1e-5) ** 2)

    def loss_fused(gamma, beta, wk):
        return jnp.sum(gn_silu_conv3x3(x, gamma, beta, wk, 8, 1e-5) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(gamma, beta, wk)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(gamma, beta, wk)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=5e-4, atol=5e-5)


def test_fused_bf16_matches_bf16_reference():
    """In the pipeline the op runs on bf16 activations; the fused kernel
    must match the unfused composition at the same precision."""
    x, gamma, beta, wk = _inputs(ci=64, co=64)
    xb = x.astype(jnp.bfloat16)
    wb = wk  # params stay in fp32 param_dtype; op casts like Conv3x3 does
    want = np.asarray(
        gn_silu_conv3x3_ref(xb, gamma, beta, wb, 8, 1e-5), np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            gn_silu_conv3x3(xb, gamma, beta, wb, 8, 1e-5), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_eligibility_gate():
    # 3x3 only, channel/row alignment, vmem ceiling
    assert not gn_silu_conv3x3_ok((1, 8, 8, 64), (1, 1, 64, 64), 8)
    assert not gn_silu_conv3x3_ok((1, 8, 8, 30), (3, 3, 30, 64), 8)
    assert not gn_silu_conv3x3_ok((1, 5, 5, 64), (3, 3, 64, 64), 8)
    # the 16^2 concat-skip monster kernel stays on the unfused path
    assert not gn_silu_conv3x3_ok((1, 16, 16, 2560), (3, 3, 2560, 1280), 32)
    # the conservative VMEM ceiling admits (at least) the 320->320 blocks;
    # hardware probing (scripts/probe_gn_conv.py) showed the fused kernel
    # loses to the unfused row-major composition even in isolation, so the
    # ceiling is deliberately left tight rather than calibrated upward
    assert gn_silu_conv3x3_ok((1, 64, 64, 320), (3, 3, 320, 320), 32)

"""Pallas flattened-shift 3x3 conv (ops/conv.py) vs lax.conv — forward and
custom-VJP gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from diffusionhandles_tpu.ops.conv import conv3x3, conv3x3_ok


def _lax_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


def _data(b=1, h=16, w=16, ci=128, co=256, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, ci) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.float32)
    return x, k


def test_forward_matches_lax():
    x, k = _data()
    assert conv3x3_ok(x.shape, k.shape)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(conv3x3)(x, k)
    want = _lax_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_forward_nonsquare_batch2_co320():
    # co=320 exercises the 320 co-tile; non-square catches the
    # flattened-shift row stride; batch 2 exercises the batch grid dim
    x, k = _data(b=2, h=8, w=24, ci=64, co=320, seed=3)
    assert conv3x3_ok(x.shape, k.shape)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(conv3x3)(x, k)
    want = _lax_conv(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_custom_vjp_matches_lax_grads():
    x, k = _data(h=8, w=8, ci=64, co=64, seed=1)
    dy_seed = np.random.RandomState(2).randn(1, 8, 8, 64).astype(np.float32)
    cot = jnp.asarray(dy_seed)

    def loss_p(x, k):
        return jnp.sum(conv3x3(x, k) * cot)

    def loss_l(x, k):
        return jnp.sum(_lax_conv(x, k) * cot)

    with pltpu.force_tpu_interpret_mode():
        dx_p, dk_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, k)
    dx_l, dk_l = jax.grad(loss_l, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_l),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_l),
                               atol=1e-3, rtol=1e-3)


def test_unet_pallas_conv_matches_monolithic():
    """pallas_conv=True is a pure forward-path rewrite of the U-Net's
    eligible 3x3 convs: same parameter tree, same outputs."""
    import dataclasses
    from diffusionhandles_tpu.models.unet import (UNet2DCondition,
                                                  init_unet_params,
                                                  tiny_unet_config)

    # widths >=64 so Conv3x3 actually takes the Pallas path
    cfg = tiny_unet_config(block_out_channels=(64, 64, 128, 128),
                           num_heads=(2, 2, 2, 2))
    model, params = init_unet_params(cfg, seed=0)
    model_p = UNet2DCondition(dataclasses.replace(cfg, pallas_conv=True))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, cfg.sample_size, cfg.sample_size,
                              cfg.in_channels), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 77, cfg.cross_attention_dim),
                      jnp.float32)
    t = jnp.int32(123)
    eps_a, _, _ = jax.jit(model.apply)(params, x, t, ctx)
    with pltpu.force_tpu_interpret_mode():
        eps_b, _, _ = jax.jit(model_p.apply)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                               atol=2e-5, rtol=0)


def test_unet_taps_conv_matches_monolithic_incl_grads():
    """pallas_conv='taps' (the TPU grad-path default: 3x3 convs as nine
    shifted row-major matmuls, 1x1 shortcuts as matmuls) is a pure
    rewrite: same parameter tree, same outputs, same input/context grads
    as the XLA-conv model."""
    import dataclasses
    from diffusionhandles_tpu.models.unet import (UNet2DCondition,
                                                  init_unet_params,
                                                  tiny_unet_config)

    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    model_t = UNet2DCondition(dataclasses.replace(cfg, pallas_conv="taps"))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, cfg.sample_size, cfg.sample_size,
                              cfg.in_channels), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 77, cfg.cross_attention_dim),
                      jnp.float32)
    t = jnp.int32(421)
    eps_a, acts_a, _ = jax.jit(model.apply)(params, x, t, ctx)
    eps_b, acts_b, _ = jax.jit(model_t.apply)(params, x, t, ctx)
    # fp32 matmul-reassociation noise between the two formulations
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                               atol=2e-4, rtol=1e-3)
    for a, b in zip(acts_a, acts_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)

    # Gradient check at down-scaled parameters: at full random init the
    # net amplifies fp32 reassociation noise enough that elementwise grad
    # comparison measures chaos, not correctness (same phenomenon as the
    # pipeline-oracle small-weight rig).
    params_s = jax.tree.map(lambda a: a * 0.25, params)

    def loss(fn):
        def f(xx, cc):
            eps, _, _ = fn(params_s, xx, t, cc)
            return jnp.sum(eps ** 2)
        return f

    gx_a, gc_a = jax.jit(jax.grad(loss(model.apply), (0, 1)))(x, ctx)
    gx_b, gc_b = jax.jit(jax.grad(loss(model_t.apply), (0, 1)))(x, ctx)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               atol=1e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gc_a), np.asarray(gc_b),
                               atol=1e-5, rtol=1e-3)


def test_conv3x3_taps_strided_matches_lax():
    """conv3x3_taps stride-2 (the taps-mode downsampler) == lax.conv."""
    from diffusionhandles_tpu.ops.conv import conv3x3_taps

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 32, 64) * 0.1, jnp.float32)
    got = conv3x3_taps(x, w, stride=2)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

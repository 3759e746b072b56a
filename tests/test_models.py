"""Model smoke tests (tiny configs) + layer-level parity vs torch ops."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from diffusionhandles_tpu.models.unet import (
    UNet2DCondition, init_unet_params, tiny_unet_config, UNetConfig)
from diffusionhandles_tpu.models.vae import (
    AutoencoderKL, init_vae_params, tiny_vae_config)
from diffusionhandles_tpu.models.clip_text import (
    CLIPTextEncoder, init_clip_params, tiny_clip_config)
from diffusionhandles_tpu.models.tokenizer import HashTokenizer


def test_unet_shapes_and_activation_capture():
    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    x = jnp.ones((2, 8, 8, 5), jnp.float32)
    t = jnp.array([10, 10], jnp.int32)
    ctx = jnp.ones((2, 77, cfg.cross_attention_dim), jnp.float32)
    eps, acts, attn = model.apply(params, x, t, ctx)
    assert eps.shape == (2, 8, 8, 4)
    assert attn is None
    # 3 cross-attn up blocks; capture points include upsamplers
    # (reference: unet_2d_condition.py:1146-1161). sample_size 8 -> decoder
    # features at 4, 8, 8 spatial with reversed channels.
    assert len(acts) == 3
    assert acts[0].shape == (2, 4, 4, cfg.block_out_channels[2])
    assert acts[1].shape == (2, 8, 8, cfg.block_out_channels[1])
    assert acts[2].shape == (2, 8, 8, cfg.block_out_channels[0])


def test_unet_attention_capture():
    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    x = jnp.ones((1, 8, 8, 5), jnp.float32)
    t = jnp.array([0], jnp.int32)
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim), jnp.float32)
    _, _, attn = model.apply(params, x, t, ctx, capture_attention=True)
    assert set(attn.keys()) == {"down", "mid", "up"}
    assert len(attn["down"]) == 3 and len(attn["up"]) == 3
    # Each prob map row sums to 1 (softmax over keys).
    p = attn["mid"][0]
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)


def test_unet_grad_wrt_input():
    """The guidance energy differentiates activations w.r.t. latents
    (reference: guided_stable_diffuser.py:433); check grads flow."""
    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    ctx = jnp.ones((1, 77, cfg.cross_attention_dim), jnp.float32)

    def energy(latents):
        x = jnp.concatenate([latents, jnp.ones((1, 8, 8, 1))], axis=-1)
        _, acts, _ = model.apply(params, x, jnp.array([10]), ctx)
        return sum(jnp.sum(a ** 2) for a in acts)

    g = jax.grad(energy)(jnp.ones((1, 8, 8, 4), jnp.float32))
    assert g.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_unet_jit_and_determinism():
    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 5))
    t = jnp.array([500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    f = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c)[0])
    a = np.asarray(f(params, x, t, ctx))
    b = np.asarray(f(params, x, t, ctx))
    np.testing.assert_array_equal(a, b)


def test_vae_roundtrip_shapes():
    cfg = tiny_vae_config()
    model, params = init_vae_params(cfg, seed=0, image_size=32)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    z = model.apply(params, img, method=AutoencoderKL.encode)
    assert z.shape == (1, 8, 8, 4)  # 2 downsamples in tiny config
    out = model.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == (1, 32, 32, 3)


def test_clip_text_encoder_shapes():
    cfg = tiny_clip_config()
    model, params = init_clip_params(cfg, seed=0)
    tok = HashTokenizer(vocab_size=cfg.vocab_size, max_length=77)
    ids = jnp.asarray(tok(["a photo of a cat"]), jnp.int32)
    out = model.apply(params, ids)
    assert out.shape == (1, 77, cfg.hidden_size)


def test_clip_causal_mask():
    """Changing a later token must not affect earlier positions."""
    cfg = tiny_clip_config()
    model, params = init_clip_params(cfg, seed=0)
    ids1 = jnp.zeros((1, 8), jnp.int32)
    ids2 = ids1.at[0, 6].set(5)
    out1 = model.apply(params, ids1)
    out2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(out1[:, :6]),
                               np.asarray(out2[:, :6]), atol=1e-6)
    assert np.abs(np.asarray(out1[:, 6:]) - np.asarray(out2[:, 6:])).max() > 0


def test_groupnorm_matches_torch():
    """Flax GroupNorm (NHWC) vs torch GroupNorm (NCHW) — converter relies on
    identical grouping semantics."""
    import flax.linen as nn
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 32).astype(np.float32)
    gamma = rng.randn(32).astype(np.float32)
    beta = rng.randn(32).astype(np.float32)
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(gamma),
                         "bias": jnp.asarray(beta)}}
    got = np.asarray(gn.apply(params, jnp.asarray(x)))
    tg = torch.nn.GroupNorm(4, 32, eps=1e-5)
    with torch.no_grad():
        tg.weight.copy_(torch.from_numpy(gamma))
        tg.bias.copy_(torch.from_numpy(beta))
        want = tg(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_matches_torch_sdpa():
    from diffusionhandles_tpu.ops.attention import dot_product_attention
    rng = np.random.RandomState(0)
    q = rng.randn(2, 16, 4, 8).astype(np.float32)
    k = rng.randn(2, 10, 4, 8).astype(np.float32)
    v = rng.randn(2, 10, 4, 8).astype(np.float32)
    got = np.asarray(dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    tq = torch.from_numpy(q).permute(0, 2, 1, 3)
    tk = torch.from_numpy(k).permute(0, 2, 1, 3)
    tv = torch.from_numpy(v).permute(0, 2, 1, 3)
    want = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_diffusers_formula():
    from diffusionhandles_tpu.models.unet import timestep_embedding
    t = jnp.array([0.0, 17.0, 980.0])
    emb = np.asarray(timestep_embedding(t, 320, flip_sin_to_cos=True,
                                        freq_shift=0.0))
    # Oracle: diffusers get_timestep_embedding with flip_sin_to_cos.
    half = 160
    exponent = -np.log(10000) * np.arange(half) / half
    freqs = np.exp(exponent)
    arg = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)
    # fp32 sin/cos at large phases (t=980) costs ~5e-5 absolute.
    np.testing.assert_allclose(emb, want, rtol=1e-4, atol=1e-4)


def test_split_skip_conv_matches_monolithic():
    """split_skip_conv=True (two summed half-kernel convs in the decoder)
    is a pure forward-path rewrite: same parameter tree, same outputs."""
    import dataclasses

    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    model_split = UNet2DCondition(dataclasses.replace(
        cfg, split_skip_conv=True))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, cfg.sample_size, cfg.sample_size,
                              cfg.in_channels), jnp.float32)
    t = jnp.int32(321)
    ctx = jnp.asarray(rng.randn(1, 77, cfg.cross_attention_dim),
                      jnp.float32)
    eps_a, acts_a, _ = jax.jit(model.apply)(params, x, t, ctx)
    eps_b, acts_b, _ = jax.jit(model_split.apply)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b),
                               atol=2e-5, rtol=0)
    for a, b in zip(acts_a, acts_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=0)


def test_vae_taps_conv_impl_parity():
    """conv_impl='taps' (row-major shifted-matmul convs) must compute the
    same function as the XLA nn.Conv graph on an IDENTICAL parameter tree
    (the converter contract: one checkpoint serves both modes)."""
    import dataclasses as _dc
    cfg_x = tiny_vae_config()
    cfg_t = _dc.replace(cfg_x, conv_impl="taps")
    model_x, params = init_vae_params(cfg_x, seed=3, image_size=32)
    model_t = AutoencoderKL(cfg_t)
    # identical tree consumed by both modes (names and shapes must match)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z_x = model_x.apply(params, img, method=AutoencoderKL.encode)
    z_t = model_t.apply(params, img, method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(z_x, np.float32),
                               np.asarray(z_t, np.float32),
                               rtol=1e-4, atol=1e-4)
    out_x = model_x.apply(params, z_x, method=AutoencoderKL.decode)
    out_t = model_t.apply(params, z_x, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(out_x, np.float32),
                               np.asarray(out_t, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_prepare_unet_params_parity():
    """prepare_unet_params (pre-sliced conv taps, hoisted out of the
    denoising scans) must be a pure re-plumbing: identical outputs and
    input-grads to the plain variables dict, in both the taps conv mode
    and the gated-kernel modes' taps fallbacks."""
    from diffusionhandles_tpu.models.unet import prepare_unet_params

    for mode in ("taps", False):
        cfg = tiny_unet_config(pallas_conv=mode)
        model, params = init_unet_params(cfg, seed=3)
        prepared = prepare_unet_params(params, dtype=cfg.dtype)
        if mode == "taps":
            assert "taps" in prepared
            k9 = prepared["taps"]["conv_in"]["k9"]
            assert len(k9) == 9 and k9[0].ndim == 2
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, cfg.sample_size,
                                           cfg.sample_size,
                                           cfg.in_channels), jnp.float32)
        t = jnp.int32(7)
        ctx = jnp.asarray(
            np.random.RandomState(1).randn(1, 77, cfg.cross_attention_dim),
            jnp.float32)
        eps0, acts0, _ = model.apply(params, x, t, ctx)
        eps1, acts1, _ = model.apply(prepared, x, t, ctx)
        np.testing.assert_array_equal(np.asarray(eps0), np.asarray(eps1))
        for a0, a1 in zip(acts0, acts1):
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

        def loss(variables, c):
            e, _, _ = model.apply(variables, x, t, c)
            return jnp.mean(e.astype(jnp.float32) ** 2)

        g0 = jax.grad(loss, argnums=1)(params, ctx)
        g1 = jax.grad(loss, argnums=1)(prepared, ctx)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=0, atol=0)

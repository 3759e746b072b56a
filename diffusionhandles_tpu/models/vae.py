"""AutoencoderKL (SD-2 VAE) in Flax, NHWC.

Re-implements the functionality the reference pulls from diffusers'
AutoencoderKL (reference: diffhandles/guided_stable_diffuser.py:36,481-483 and
diffhandles/stable_null_inverter.py:72-110): deterministic encode to the
posterior mean with the 0.18215 latent scaling, and decode back to [-1, 1]
images.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusionhandles_tpu.ops.attention import dot_product_attention

SD_VAE_SCALING = 0.18215  # reference: stable_null_inverter.py:75,108


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SD_VAE_SCALING
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # "xla" (nn.Conv) | "taps" (row-major shifted-matmul 3x3s + matmul
    # 1x1s, parameter-tree identical — the U-Net's flatland layout
    # strategy applied to the VAE; measured on the 512^2 decode where XLA
    # conv layouts run far off roofline). The strided encoder downsample
    # keeps nn.Conv (diffusers' asymmetric (0,1) padding).
    conv_impl: str = "xla"

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def _conv3(impl: str, features: int, name: str, dtype, param_dtype):
    """3x3 SAME stride-1 conv in the configured implementation (identical
    'kernel'/'bias' parameter tree either way)."""
    if impl == "taps":
        from diffusionhandles_tpu.models.unet import Conv3x3
        return Conv3x3(features, dtype=dtype, param_dtype=param_dtype,
                       impl="taps", name=name)
    return nn.Conv(features, (3, 3), padding=1, dtype=dtype,
                   param_dtype=param_dtype, name=name)


def _conv1(impl: str, features: int, name: str, dtype, param_dtype):
    """1x1 conv in the configured implementation (same parameter tree)."""
    if impl == "taps":
        from diffusionhandles_tpu.models.unet import Conv1x1AsMatmul
        return Conv1x1AsMatmul(features, dtype=dtype,
                               param_dtype=param_dtype, name=name)
    return nn.Conv(features, (1, 1), dtype=dtype, param_dtype=param_dtype,
                   name=name)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = _conv3(self.conv_impl, self.out_channels, "conv1",
                   self.dtype, self.param_dtype)(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = _conv3(self.conv_impl, self.out_channels, "conv2",
                   self.dtype, self.param_dtype)(h)
        if residual.shape[-1] != self.out_channels:
            residual = _conv1(self.conv_impl, self.out_channels,
                              "conv_shortcut", self.dtype,
                              self.param_dtype)(residual)
        return h + residual


class VAEAttention(nn.Module):
    """Single-head full self-attention over the spatial grid (VAE mid)."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        hid = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                           dtype=jnp.float32, param_dtype=self.param_dtype,
                           name="group_norm")(x).astype(self.dtype)
        hid = hid.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("to_q")(hid)[:, :, None, :]
        k = dense("to_k")(hid)[:, :, None, :]
        v = dense("to_v")(hid)[:, :, None, :]
        out = dot_product_attention(q, k, v)[:, :, 0, :]
        out = dense("to_out")(out)
        return out.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        res = lambda ch, name: VAEResnet(
            ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, conv_impl=cfg.conv_impl, name=name)
        x = x.astype(cfg.dtype)
        x = _conv3(cfg.conv_impl, cfg.block_out_channels[0], "conv_in",
                   cfg.dtype, cfg.param_dtype)(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = res(ch, f"down_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = nn.Conv(ch, (3, 3), strides=2,
                            padding=((0, 1), (0, 1)),  # diffusers pads (0,1)
                            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = res(ch, "mid_resnets_0")(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="mid_attn")(x)
        x = res(ch, "mid_resnets_1")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=cfg.param_dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        x = _conv3(cfg.conv_impl, 2 * cfg.latent_channels, "conv_out",
                   cfg.dtype, cfg.param_dtype)(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        res = lambda ch, name: VAEResnet(
            ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, conv_impl=cfg.conv_impl, name=name)
        z = z.astype(cfg.dtype)
        ch = cfg.block_out_channels[-1]
        x = _conv3(cfg.conv_impl, ch, "conv_in", cfg.dtype,
                   cfg.param_dtype)(z)
        x = res(ch, "mid_resnets_0")(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="mid_attn")(x)
        x = res(ch, "mid_resnets_1")(x)
        n = len(cfg.block_out_channels)
        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = res(ch, f"up_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = _conv3(cfg.conv_impl, ch, f"up_{i}_upsample",
                           cfg.dtype, cfg.param_dtype)(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=cfg.param_dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        x = _conv3(cfg.conv_impl, cfg.out_channels, "conv_out",
                   jnp.float32, cfg.param_dtype)(x)
        return x.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """VAE with deterministic (posterior-mean) encode, as the reference uses."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        conv = lambda c, name: _conv1(self.config.conv_impl, c, name,
                                      self.config.dtype,
                                      self.config.param_dtype)
        self.quant_conv = conv(2 * self.config.latent_channels, "quant_conv")
        self.post_quant_conv = conv(self.config.latent_channels,
                                    "post_quant_conv")

    def encode_moments(self, image):
        """image [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,h,w,4]."""
        moments = self.quant_conv(self.encoder(image))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean.astype(jnp.float32), logvar.astype(jnp.float32)

    def encode(self, image):
        """Posterior mean (reference: stable_null_inverter.py:105)."""
        return self.encode_moments(image)[0]

    def decode(self, latents):
        """latents [B,h,w,4] (unscaled) -> image [B,H,W,3] in ~[-1,1]."""
        return self.decoder(self.post_quant_conv(latents.astype(
            self.config.dtype)))

    def __call__(self, image):
        return self.decode(self.encode(image))


def init_vae_params(config: VAEConfig, seed: int = 0, image_size: int = 32):
    model = AutoencoderKL(config)
    img = jnp.zeros((1, image_size, image_size, config.in_channels),
                    jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), img)
    return model, params


def tiny_vae_config(**overrides) -> VAEConfig:
    base = dict(block_out_channels=(16, 16, 32), layers_per_block=1,
                norm_num_groups=8, dtype=jnp.float32)
    base.update(overrides)
    return VAEConfig(**base)

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

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="conv_shortcut")(residual)
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
        x = x.astype(cfg.dtype)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name=f"down_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = nn.Conv(ch, (3, 3), strides=2,
                            padding=((0, 1), (0, 1)),  # diffusers pads (0,1)
                            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name=f"down_{i}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="mid_resnets_0")(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="mid_attn")(x)
        x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="mid_resnets_1")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=cfg.param_dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        z = z.astype(cfg.dtype)
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(z)
        x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="mid_resnets_0")(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="mid_attn")(x)
        x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype, name="mid_resnets_1")(x)
        n = len(cfg.block_out_channels)
        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnet(ch, groups=cfg.norm_num_groups, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name=f"up_{i}_resnets_{j}")(x)
            if i < n - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), padding=1, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=jnp.float32, param_dtype=cfg.param_dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x).astype(cfg.dtype)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    param_dtype=cfg.param_dtype, name="conv_out")(x)
        return x.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """VAE with deterministic (posterior-mean) encode, as the reference uses."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        conv = lambda c, name: nn.Conv(c, (1, 1), dtype=self.config.dtype,
                                       param_dtype=self.config.param_dtype,
                                       name=name)
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

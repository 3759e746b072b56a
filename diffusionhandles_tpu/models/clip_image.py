"""CLIP image encoder (ViT) in Flax — shared vision backbone for the
text-prompted segmenter and any CLIP-similarity metrics."""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusionhandles_tpu.ops.attention import dot_product_attention
from diffusionhandles_tpu.ops.resize import resize_nhwc


@dataclasses.dataclass(frozen=True)
class CLIPImageConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    projection_dim: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class CLIPViTBlock(nn.Module):
    config: CLIPImageConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        h = nn.LayerNorm(name="ln1")(x)
        b, s, _ = h.shape
        hd = d // cfg.num_heads
        q = nn.Dense(d, name="q_proj")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(d, name="k_proj")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(d, name="v_proj")(h).reshape(b, s, cfg.num_heads, hd)
        o = dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + nn.Dense(d, name="out_proj")(o)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(d * cfg.mlp_ratio, name="fc1")(h)
        h = h * nn.sigmoid(1.702 * h)  # quick_gelu (CLIP)
        h = nn.Dense(d, name="fc2")(h)
        return x + h


class CLIPImageEncoder(nn.Module):
    """[B, H, W, 3] in [0,1] -> (pooled [B, proj], patch tokens
    [B, n, n, proj])."""

    config: CLIPImageConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.config
        b = img.shape[0]
        x = resize_nhwc(img.astype(jnp.float32),
                        (cfg.image_size, cfg.image_size), "bilinear")
        mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
        std = jnp.array([0.26862954, 0.26130258, 0.27577711])
        x = (x - mean) / std
        p = cfg.patch_size
        n = cfg.image_size // p
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), use_bias=False,
                    name="patch_embed")(x)
        tokens = x.reshape(b, n * n, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), cfg.param_dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), tokens], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n * n + 1, cfg.hidden_size), cfg.param_dtype)
        tokens = tokens + pos[None]
        tokens = nn.LayerNorm(name="ln_pre")(tokens)
        for i in range(cfg.num_layers):
            tokens = CLIPViTBlock(cfg, name=f"block_{i}")(tokens)
        tokens = nn.LayerNorm(name="ln_post")(tokens)
        proj = self.param("visual_projection",
                          nn.initializers.normal(0.02),
                          (cfg.hidden_size, cfg.projection_dim),
                          cfg.param_dtype)
        pooled = tokens[:, 0] @ proj
        patches = (tokens[:, 1:] @ proj).reshape(b, n, n,
                                                 cfg.projection_dim)
        return pooled, patches


def tiny_clip_image_config(**overrides) -> CLIPImageConfig:
    base = dict(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                num_heads=2, projection_dim=32)
    base.update(overrides)
    return CLIPImageConfig(**base)

"""Monocular metric depth estimation (ZoeDepth-class) in Flax.

Fills the role of the reference's ZoeDepth dependency
(reference: test/estimate_depth.py:11-32 builds `zoedepth_nk` and calls
`model.infer(img)`; webapp/webapps/zoe_depth_webapp.py:21-47 serves it).

Architecture: DPT-style dense prediction transformer — a ViT backbone whose
tokens are reassembled at 4 scales, fused top-down with residual conv units,
followed by a ZoeDepth-style metric-bins head (softmax over log-spaced depth
bins, linear combination -> metric depth). This is an idiomatic TPU
re-design (patchified ViT = big MXU matmuls), not a translation of the
BEiT/timm graph; weights are random unless converted (models with publicly
released checkpoints can be mapped through models/weights.py-style
converters).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.ops.resize import resize_nhwc


@dataclasses.dataclass(frozen=True)
class ZoeDepthConfig:
    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    # ViT blocks whose tokens feed the 4 reassemble scales.
    hook_layers: Tuple[int, ...] = (2, 5, 8, 11)
    fusion_channels: int = 256
    # Metric-bins heads. The reference uses the `zoedepth_nk` variant
    # (test/estimate_depth.py:18): TWO domain heads (N: indoor, K: outdoor)
    # selected by a router on the bottleneck features. heads=1 gives the
    # single-domain zoedepth variant.
    num_bins: int = 64
    num_heads_nk: int = 2
    head_depth_ranges: Tuple[Tuple[float, float], ...] = ((0.01, 10.0),
                                                          (0.01, 80.0))
    min_depth: float = 0.01
    max_depth: float = 80.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class ViTBlock(nn.Module):
    config: ZoeDepthConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        h = nn.LayerNorm(name="norm1")(x)
        b, s, _ = h.shape
        qkv = nn.Dense(3 * d, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // cfg.num_heads
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, s, cfg.num_heads, hd)
        v = v.reshape(b, s, cfg.num_heads, hd)
        from diffusionhandles_tpu.ops.attention import dot_product_attention
        o = dot_product_attention(q, k, v).reshape(b, s, d)
        x = x + nn.Dense(d, name="proj")(o)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(d * cfg.mlp_ratio, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(d, name="fc2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, name="conv2")(h)
        return x + h


class ZoeDepthModel(nn.Module):
    """[B, H, W, 3] in [0,1] -> metric depth [B, H, W]."""

    config: ZoeDepthConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.config
        b = img.shape[0]
        x = resize_nhwc(img.astype(jnp.float32),
                        (cfg.image_size, cfg.image_size), "bilinear")
        # ImageNet normalization (standard for DPT backbones).
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        x = (x - mean) / std

        p = cfg.patch_size
        n = cfg.image_size // p
        x = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        tokens = x.reshape(b, n * n, cfg.hidden_size)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n * n, cfg.hidden_size), cfg.param_dtype)
        tokens = tokens + pos[None]

        hooks = []
        for i in range(cfg.num_layers):
            tokens = ViTBlock(cfg, name=f"block_{i}")(tokens)
            if i in cfg.hook_layers:
                hooks.append(tokens)

        # Reassemble hooks to pyramid scales (1/4, 1/8, 1/16, 1/32 of the
        # backbone input) and fuse top-down (DPT).
        fc = cfg.fusion_channels
        scales = [4, 2, 1, 0.5]  # relative to the n x n token grid
        feats = []
        for level, (tok, s) in enumerate(zip(hooks, scales)):
            f = tok.reshape(b, n, n, cfg.hidden_size)
            f = nn.Conv(fc, (1, 1), name=f"reassemble_{level}")(f)
            size = int(n * s)
            f = resize_nhwc(f, (size, size), "bilinear")
            f = nn.Conv(fc, (3, 3), padding=1, name=f"rn_{level}")(f)
            feats.append(f)

        x = feats[3]
        for level in [3, 2, 1, 0]:
            if level != 3:
                x = x + feats[level]
            x = ResidualConvUnit(fc, name=f"rcu_{level}")(x)
            if level != 0:
                x = resize_nhwc(x, (x.shape[1] * 2, x.shape[2] * 2),
                                "bilinear")

        # Metric-bins head(s): per-pixel softmax over log-spaced bin
        # centers; with num_heads_nk > 1, a router on the pooled bottleneck
        # picks the domain head (ZoeDepth-NK style; soft routing keeps the
        # graph static and differentiable).
        x = nn.Conv(fc // 2, (3, 3), padding=1, name="head_conv1")(x)
        x = nn.relu(x)

        n_heads = cfg.num_heads_nk
        head_depths = []
        for d_idx in range(n_heads):
            lo, hi = (cfg.head_depth_ranges[d_idx]
                      if d_idx < len(cfg.head_depth_ranges)
                      else (cfg.min_depth, cfg.max_depth))
            logits = nn.Conv(cfg.num_bins, (1, 1),
                             name=f"bin_logits_{d_idx}")(x)
            probs = jax.nn.softmax(logits, axis=-1)
            centers = jnp.exp(jnp.linspace(np.log(lo), np.log(hi),
                                           cfg.num_bins))
            head_depths.append(jnp.einsum("bhwk,k->bhw", probs, centers))

        if n_heads == 1:
            depth = head_depths[0]
        else:
            pooled = jnp.mean(feats[3], axis=(1, 2))  # bottleneck features
            route = nn.Dense(n_heads, name="router")(nn.relu(
                nn.Dense(fc, name="router_fc")(pooled)))
            route = jax.nn.softmax(route, axis=-1)  # [B, n_heads]
            depth = jnp.einsum("dbhw,bd->bhw",
                               jnp.stack(head_depths, axis=0), route)

        h, w = img.shape[1], img.shape[2]
        depth = resize_nhwc(depth[..., None], (h, w), "bilinear")[..., 0]
        return jnp.clip(depth, cfg.min_depth, cfg.max_depth)


class DepthEstimator:
    """Service-level interface (parity with the reference's depth-estimator
    service contract, webapp/webapps/depth_estimator_webapp.py)."""

    def estimate_depth(self, img: np.ndarray) -> np.ndarray:
        """img [1, 3, H, W] in [0,1] -> depth [1, 1, H, W] (metric)."""
        raise NotImplementedError


class ZoeDepthEstimator(DepthEstimator):
    def __init__(self, config: ZoeDepthConfig = None, params=None,
                 seed: int = 0):
        self.config = config or ZoeDepthConfig()
        self.model = ZoeDepthModel(self.config)
        if params is None:
            img = jnp.zeros((1, 64, 64, 3), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), img)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def estimate_depth(self, img: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.moveaxis(np.asarray(img, np.float32), -3, -1))
        depth = self._apply(self.params, x)
        return np.asarray(depth)[:, None]


def tiny_zoedepth_config(**overrides) -> ZoeDepthConfig:
    base = dict(image_size=64, patch_size=8, hidden_size=32, num_layers=4,
                num_heads=2, hook_layers=(0, 1, 2, 3), fusion_channels=16,
                num_bins=8)
    base.update(overrides)
    return ZoeDepthConfig(**base)

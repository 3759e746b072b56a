"""Swin Transformer backbone in Flax (NHWC) — release-convertible.

The vision backbone of GroundingDINO (the text-grounding stage inside the
reference's LangSAM dependency, reference: test/estimate_foreground.py:6);
the released `groundingdino_swint_ogc.pth` uses Swin-T with out_indices
(1, 2, 3). Published graph: 4x4 patch embed + LN, stages of shifted-window
attention blocks (per-window relative position bias, cyclic shift with an
attention mask on the shifted blocks), patch-merging downsamples, and a
LayerNorm per requested output level.

Module names mirror the release state dict (`layers_{i}_blocks_{j}`)
so the conversion (models/weights_gdino.py) is a transparent 1:1 mapping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96                      # Swin-T
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * 2 ** i


def tiny_swin_config(**overrides) -> SwinConfig:
    base = dict(embed_dim=16, depths=(1, 1, 2), num_heads=(2, 2, 2),
                window_size=2, out_indices=(0, 1, 2))
    base.update(overrides)
    return SwinConfig(**base)


def _rel_pos_index(ws: int) -> np.ndarray:
    """Relative position index inside a ws x ws window (published Swin)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]          # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]        # [N, N]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: [nW, N, C] windows; attn_mask: [nW0, N, N] or None (added to
        the logits per shifted-window group)."""
        ws = self.window_size
        n = ws * ws
        nw, _, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, param_dtype=self.param_dtype,
                       name="qkv")(x).reshape(nw, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("wqhc,wkhc->whqk", q, k) / np.sqrt(hd)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, self.num_heads),
                           self.param_dtype)
        bias = table[_rel_pos_index(ws)]                   # [N, N, H]
        logits = logits + jnp.transpose(bias, (2, 0, 1))[None]
        if attn_mask is not None:
            g = attn_mask.shape[0]
            logits = logits.reshape(nw // g, g, self.num_heads, n, n)
            logits = logits + attn_mask[None, :, None]
            logits = logits.reshape(nw, self.num_heads, n, n)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("whqk,wkhc->wqhc", attn, v).reshape(nw, n, c)
        return nn.Dense(c, param_dtype=self.param_dtype, name="proj")(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.moveaxis(x, 2, 3).reshape(-1, ws * ws, c)


def _window_reverse(wins, ws, b, h, w):
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1)
    return jnp.moveaxis(x, 2, 3).reshape(b, h, w, -1)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (published Swin img_mask)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    wins = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        # pad to window multiples (bottom/right, published behavior)
        ph, pw = (-h) % ws, (-w) % ws
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name="norm1")(x)
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hp, wp, ws, shift))
        else:
            mask = None
        wins = _window_partition(x, ws)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               self.param_dtype, name="attn")(wins, mask)
        x = _window_reverse(wins, ws, b, hp, wp)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + x
        hmid = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name="norm2")(x)
        hmid = nn.Dense(int(self.dim * self.mlp_ratio),
                        param_dtype=self.param_dtype, name="fc1")(hmid)
        hmid = nn.Dense(self.dim, param_dtype=self.param_dtype,
                        name="fc2")(nn.gelu(hmid, approximate=False))
        return x + hmid


class PatchMerging(nn.Module):
    dim: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ph, pw = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        # published concat order: (0::2, 0::2), (1::2, 0::2), (0::2, 1::2),
        # (1::2, 1::2)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        param_dtype=self.param_dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """[B, H, W, 3] -> dict {level_index: [B, H/s, W/s, C_i]} for
    out_indices (strides 4 * 2^i)."""

    config: SwinConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        p = cfg.patch_size
        b, h, w, _ = x.shape
        ph, pw = (-h) % p, (-w) % p
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    param_dtype=cfg.param_dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                         name="patch_embed_norm")(x)

        outs = {}
        for i, depth in enumerate(cfg.depths):
            dim = cfg.stage_dim(i)
            for j in range(depth):
                x = SwinBlock(dim, cfg.num_heads[i], cfg.window_size,
                              shift=(0 if j % 2 == 0
                                     else cfg.window_size // 2),
                              mlp_ratio=cfg.mlp_ratio,
                              param_dtype=cfg.param_dtype,
                              name=f"layers_{i}_blocks_{j}")(x)
            if i in cfg.out_indices:
                outs[i] = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                                       name=f"out_norm_{i}")(x)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(dim, cfg.param_dtype,
                                 name=f"layers_{i}_downsample")(x)
        return outs

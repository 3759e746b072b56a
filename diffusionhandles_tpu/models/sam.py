"""SAM-style promptable mask decoder in Flax.

Completes the segmentation family: the reference's LangSAM dependency is
GroundingDINO (text -> boxes) + SAM (box/point -> mask)
(reference: test/estimate_foreground.py, webapp/webapps/
langsam_segmenter_webapp.py). Here the grounding stage is the CLIP
similarity segmenter (models/segmenter.py) and this module is the
promptable refinement stage: a two-way transformer mask decoder over a ViT
image embedding, prompted with points/boxes — the SAM architecture, sized
configurably (weights are random unless converted from a released SAM
checkpoint; the full-size config matches SAM-B's decoder shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.ops.attention import dot_product_attention
from diffusionhandles_tpu.ops.resize import resize_nhwc


@dataclasses.dataclass(frozen=True)
class SAMDecoderConfig:
    embed_dim: int = 256
    num_layers: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    num_mask_tokens: int = 4  # 1 primary + 3 multimask outputs
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def _fourier_point_embedding(points, dim: int, scale: float = 1.0):
    """Random-Fourier positional encoding of [N, 2] points in [0, 1]^2
    (SAM's PositionEmbeddingRandom, fixed seed for determinism)."""
    rng = np.random.RandomState(0)
    gauss = jnp.asarray(rng.randn(2, dim // 2).astype(np.float32)) * scale
    proj = (2.0 * points - 1.0) @ gauss * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class TwoWayAttentionBlock(nn.Module):
    config: SAMDecoderConfig

    @nn.compact
    def __call__(self, tokens, image, skip_first_self: bool = False):
        cfg = self.config
        d = cfg.embed_dim
        hd = d // cfg.num_heads

        def attn(q, kv, name):
            dense = lambda nm: nn.Dense(d, dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype,
                                        name=f"{name}_{nm}")
            b, sq = q.shape[0], q.shape[1]
            sk = kv.shape[1]
            qq = dense("q")(q).reshape(b, sq, cfg.num_heads, hd)
            kk = dense("k")(kv).reshape(b, sk, cfg.num_heads, hd)
            vv = dense("v")(kv).reshape(b, sk, cfg.num_heads, hd)
            o = dot_product_attention(qq, kk, vv).reshape(b, sq, d)
            return dense("out")(o)

        ln = lambda name: nn.LayerNorm(param_dtype=cfg.param_dtype,
                                       name=name)
        # token self-attention
        if not skip_first_self:
            tokens = ln("ln1")(tokens + attn(tokens, tokens, "self_attn"))
        # tokens -> image cross-attention
        tokens = ln("ln2")(tokens + attn(tokens, image, "t2i_attn"))
        # token MLP
        h = nn.Dense(cfg.mlp_dim, param_dtype=cfg.param_dtype,
                     name="mlp_fc1")(tokens)
        h = nn.Dense(cfg.embed_dim, param_dtype=cfg.param_dtype,
                     name="mlp_fc2")(nn.relu(h))
        tokens = ln("ln3")(tokens + h)
        # image -> tokens cross-attention
        image = ln("ln4")(image + attn(image, tokens, "i2t_attn"))
        return tokens, image


class SAMMaskDecoder(nn.Module):
    """Two-way transformer mask decoder (SAM architecture)."""

    config: SAMDecoderConfig

    @nn.compact
    def __call__(self, image_embedding, point_prompts, point_labels):
        """Args:
          image_embedding: [B, He, We, C] from a ViT image encoder.
          point_prompts: [B, P, 2] in [0, 1]^2 (x, y).
          point_labels: [B, P] (1 fg, 0 bg, -1 padding).

        Returns (mask_logits [B, M, 4*He, 4*We], iou_pred [B, M]).
        """
        cfg = self.config
        b, he, we, c = image_embedding.shape
        if c != cfg.embed_dim:
            image_embedding = nn.Dense(cfg.embed_dim,
                                       param_dtype=cfg.param_dtype,
                                       name="embed_proj")(image_embedding)
        m = cfg.num_mask_tokens

        mask_tokens = self.param("mask_tokens",
                                 nn.initializers.normal(0.02),
                                 (m + 1, cfg.embed_dim), cfg.param_dtype)
        label_embed = self.param("label_embed",
                                 nn.initializers.normal(0.02),
                                 (3, cfg.embed_dim), cfg.param_dtype)

        pe = _fourier_point_embedding(point_prompts.reshape(-1, 2),
                                      cfg.embed_dim).reshape(
            b, -1, cfg.embed_dim)
        pe = pe + label_embed[jnp.clip(point_labels + 1, 0, 2)]
        pe = jnp.where((point_labels >= 0)[..., None], pe, 0.0)

        tokens = jnp.concatenate(
            [jnp.broadcast_to(mask_tokens[None], (b, m + 1, cfg.embed_dim)),
             pe], axis=1)

        # image positional encoding (dense grid through the same Fourier map)
        yy, xx = jnp.meshgrid(
            (jnp.arange(he) + 0.5) / he, (jnp.arange(we) + 0.5) / we,
            indexing="ij")
        grid = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
        img_pe = _fourier_point_embedding(grid, cfg.embed_dim)
        image = image_embedding.reshape(b, he * we, cfg.embed_dim)

        for i in range(cfg.num_layers):
            tokens, image = TwoWayAttentionBlock(
                cfg, name=f"block_{i}")(
                tokens + 0.0, image + img_pe[None],
                skip_first_self=(i == 0))

        mask_tok_out = tokens[:, :m]          # [B, M, C]
        iou_tok_out = tokens[:, m]            # [B, C]

        # upscale the image embedding 4x and dot with per-mask hypernet MLPs
        img2d = image.reshape(b, he, we, cfg.embed_dim)
        up = nn.ConvTranspose(cfg.embed_dim // 4, (2, 2), strides=(2, 2),
                              param_dtype=cfg.param_dtype, name="up1")(img2d)
        up = nn.gelu(up)
        up = nn.ConvTranspose(cfg.embed_dim // 8, (2, 2), strides=(2, 2),
                              param_dtype=cfg.param_dtype, name="up2")(up)
        up = nn.gelu(up)

        hyper = nn.Dense(cfg.embed_dim // 8, param_dtype=cfg.param_dtype,
                         name="hypernet")(nn.relu(nn.Dense(
                             cfg.embed_dim, param_dtype=cfg.param_dtype,
                             name="hypernet_fc")(mask_tok_out)))
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)

        iou_pred = nn.Dense(m, param_dtype=cfg.param_dtype,
                            name="iou_head")(nn.relu(nn.Dense(
                                cfg.embed_dim, param_dtype=cfg.param_dtype,
                                name="iou_fc")(iou_tok_out)))
        return masks, iou_pred


class PromptableSegmenter:
    """Point/box-promptable segmentation (SAM-style interface)."""

    def __init__(self, image_encoder=None, image_params=None,
                 decoder_config: Optional[SAMDecoderConfig] = None,
                 seed: int = 0):
        from diffusionhandles_tpu.models.clip_image import (
            CLIPImageEncoder, tiny_clip_image_config)
        if image_encoder is None:
            cfg = tiny_clip_image_config(
                image_size=224, patch_size=16, hidden_size=256,
                num_layers=6, num_heads=4, projection_dim=256)
            image_encoder = CLIPImageEncoder(cfg)
        self.image_encoder = image_encoder
        if image_params is None:
            image_params = jax.jit(image_encoder.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)))
        self.image_params = image_params
        self.decoder_config = decoder_config or SAMDecoderConfig()
        self.decoder = SAMMaskDecoder(self.decoder_config)
        n = 224 // 16
        dummy_emb = jnp.zeros((1, n, n, 256))
        self.decoder_params = jax.jit(self.decoder.init)(
            jax.random.PRNGKey(seed + 1), dummy_emb,
            jnp.zeros((1, 4, 2)), jnp.zeros((1, 4), jnp.int32))
        self._embed = jax.jit(self.image_encoder.apply)
        self._decode = jax.jit(self.decoder.apply)

    def segment(self, img: np.ndarray, points, labels=None) -> np.ndarray:
        """img [1,3,H,W] in [0,1]; points [P,2] in pixels; labels [P]
        (1 fg / 0 bg). Returns the best mask [1,1,H,W] (by IoU pred)."""
        h, w = img.shape[-2:]
        points = np.asarray(points, np.float32).reshape(1, -1, 2)
        norm = points / np.array([[w, h]], np.float32)
        if labels is None:
            labels = np.ones(points.shape[1], np.int32)
        labels = np.asarray(labels, np.int32).reshape(1, -1)
        x = jnp.asarray(np.moveaxis(np.asarray(img, np.float32), -3, -1))
        _, patches = self._embed(self.image_params, x)
        masks, iou = self._decode(self.decoder_params, patches,
                                  jnp.asarray(norm), jnp.asarray(labels))
        best = int(jnp.argmax(iou[0]))
        mask = resize_nhwc(masks[:, best][..., None], (h, w),
                           "bilinear")[..., 0]
        return (np.asarray(mask) > 0)[:, None].astype(np.float32)

"""Segment Anything (SAM) in Flax — release-convertible.

The reference's foreground masks come from LangSAM = GroundingDINO (text ->
boxes) + SAM (box/points -> mask) (reference: test/estimate_foreground.py:
6-42, webapp/webapps/langsam_segmenter_webapp.py). Here the grounding stage
is the CLIP similarity segmenter (models/segmenter.py); this module is the
published SAM graph so released `sam_vit_{b,l,h}` checkpoints map onto it
(converter: models/weights_sam.py):

* ImageEncoderViT (ViT-det): 16x16 patch embed, learned absolute pos embed,
  transformer blocks with decomposed relative-position attention — windowed
  (14x14) except at the global indices — and a 2-conv LayerNorm2d neck to
  the 256-d embedding grid.
* PromptEncoder: random-Fourier point encoding (gaussian matrix from the
  checkpoint buffer), per-label point embeddings, box corner embeddings,
  mask downscaling convs, no-mask dense embedding.
* MaskDecoder: two-way transformer (token self-attn, token<->image cross
  attn at rate-2 downsampled width), iou + 4 mask tokens, transposed-conv
  4x upscaling, per-mask hypernetwork MLPs, IoU prediction head.

NHWC/functional throughout; module names mirror the release state dict so
the conversion is a transparent 1:1 mapping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.ops.resize import resize_nhwc


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768            # vit_b; vit_l 1024, vit_h 1280
    depth: int = 12                 # vit_b; vit_l 24, vit_h 32
    num_heads: int = 12             # vit_b; vit_l/h 16
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    mlp_ratio: float = 4.0
    prompt_embed_dim: int = 256
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    decoder_depth: int = 2
    num_mask_tokens: int = 4        # 1 primary + 3 multimask
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def embedding_size(self) -> int:
        return self.img_size // self.patch_size


def sam_vit_b() -> SAMConfig:
    return SAMConfig()


def sam_vit_l() -> SAMConfig:
    return SAMConfig(embed_dim=1024, depth=24, num_heads=16,
                     global_attn_indexes=(5, 11, 17, 23))


def sam_vit_h() -> SAMConfig:
    return SAMConfig(embed_dim=1280, depth=32, num_heads=16,
                     global_attn_indexes=(7, 15, 23, 31))


def tiny_sam_config(**overrides) -> SAMConfig:
    # prompt_embed_dim must stay >= 64 (mask_downscaling uses dim // 64)
    base = dict(img_size=64, embed_dim=32, depth=2, num_heads=2,
                global_attn_indexes=(1,), window_size=2,
                prompt_embed_dim=64, decoder_mlp_dim=64)
    base.update(overrides)
    return SAMConfig(**base)


# ---------------------------------------------------------------------------
# Image encoder (ViT-det)
# ---------------------------------------------------------------------------

def _rel_pos_logits(q2d, rel_pos_h, rel_pos_w):
    """Decomposed relative-position logits (ViT-det).

    q2d: [B*, qh, qw, c] (UNSCALED q, per the published ordering);
    rel_pos_*: [2*size-1, c]. Returns [B*, qh, qw, qh, qw].
    """
    qh, qw = q2d.shape[1], q2d.shape[2]
    idx_h = np.arange(qh)[:, None] - np.arange(qh)[None, :] + (qh - 1)
    idx_w = np.arange(qw)[:, None] - np.arange(qw)[None, :] + (qw - 1)
    Rh = rel_pos_h[idx_h]                      # [qh, qh, c]
    Rw = rel_pos_w[idx_w]                      # [qw, qw, c]
    rel_h = jnp.einsum("bhwc,hkc->bhwk", q2d, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", q2d, Rw)
    return rel_h[..., :, None] + rel_w[..., None, :]


class ViTDetAttention(nn.Module):
    """Multi-head attention over a [B, H, W, C] grid with decomposed
    relative positions (rel_pos tables sized to this block's grid)."""

    config: SAMConfig
    grid: int  # attention grid side (window size or full embedding size)

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, h, w, c = x.shape
        nh = cfg.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, param_dtype=cfg.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, nh, hd]
        q = jnp.moveaxis(q, 2, 1).reshape(b * nh, h * w, hd)
        k = jnp.moveaxis(k, 2, 1).reshape(b * nh, h * w, hd)
        v = jnp.moveaxis(v, 2, 1).reshape(b * nh, h * w, hd)

        rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.grid - 1, hd), cfg.param_dtype)
        rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.grid - 1, hd), cfg.param_dtype)

        attn = (q * (hd ** -0.5)) @ jnp.swapaxes(k, -1, -2)
        attn = attn.reshape(b * nh, h, w, h, w) + _rel_pos_logits(
            q.reshape(b * nh, h, w, hd), rel_pos_h, rel_pos_w)
        attn = jax.nn.softmax(attn.reshape(b * nh, h * w, h * w), axis=-1)
        out = (attn @ v).reshape(b, nh, h * w, hd)
        out = jnp.moveaxis(out, 1, 2).reshape(b, h, w, c)
        return nn.Dense(c, param_dtype=cfg.param_dtype, name="proj")(out)


def _window_partition(x, ws: int):
    b, h, w, c = x.shape
    ph, pw = (-h) % ws, (-w) % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = jnp.moveaxis(x, 2, 3).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(wins, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = wins.shape[0] // (hp // ws * (wp // ws))
    x = wins.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = jnp.moveaxis(x, 2, 3).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class ViTDetBlock(nn.Module):
    config: SAMConfig
    window_size: int  # 0 = global

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=cfg.param_dtype,
                         name="norm1")(x)
        if self.window_size > 0:
            hw = h.shape[1:3]
            h, pad_hw = _window_partition(h, self.window_size)
            grid = self.window_size
        else:
            grid = h.shape[1]
        h = ViTDetAttention(cfg, grid, name="attn")(h)
        if self.window_size > 0:
            h = _window_unpartition(h, self.window_size, pad_hw, hw)
        x = shortcut + h
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=cfg.param_dtype,
                         name="norm2")(x)
        h = nn.Dense(int(cfg.embed_dim * cfg.mlp_ratio),
                     param_dtype=cfg.param_dtype, name="lin1")(h)
        h = nn.Dense(cfg.embed_dim, param_dtype=cfg.param_dtype,
                     name="lin2")(nn.gelu(h, approximate=False))
        return x + h


class ImageEncoderViT(nn.Module):
    config: SAMConfig

    @nn.compact
    def __call__(self, x):
        """x: [B, img_size, img_size, 3] (normalized) -> [B, E, E, 256]."""
        cfg = self.config
        e = cfg.embedding_size
        h = nn.Conv(cfg.embed_dim, (cfg.patch_size,) * 2,
                    strides=(cfg.patch_size,) * 2,
                    param_dtype=cfg.param_dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, e, e, cfg.embed_dim), cfg.param_dtype)
        h = h + pos
        for i in range(cfg.depth):
            ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
            h = ViTDetBlock(cfg, ws, name=f"blocks_{i}")(h)
        # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (all bias-free convs)
        h = nn.Conv(cfg.prompt_embed_dim, (1, 1), use_bias=False,
                    param_dtype=cfg.param_dtype, name="neck_conv1")(h)
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=cfg.param_dtype,
                         name="neck_ln1")(h)
        h = nn.Conv(cfg.prompt_embed_dim, (3, 3), padding=1, use_bias=False,
                    param_dtype=cfg.param_dtype, name="neck_conv2")(h)
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=cfg.param_dtype,
                         name="neck_ln2")(h)
        return h


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------

class PromptEncoder(nn.Module):
    """Points (+labels), boxes and mask inputs -> sparse/dense embeddings.

    Point labels: 1 fg, 0 bg, -1 padding (the padding point is appended by
    the caller when no box is given, matching the published behavior)."""

    config: SAMConfig

    def setup(self):
        cfg = self.config
        d = cfg.prompt_embed_dim
        self.gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0), (2, d // 2), cfg.param_dtype)
        # 0: neg point, 1: pos point, 2: box corner 1, 3: box corner 2
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, d), cfg.param_dtype) for i in range(4)]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (1, d),
            cfg.param_dtype)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (1, d),
            cfg.param_dtype)
        self.mask_down_conv1 = nn.Conv(d // 64, (2, 2), strides=(2, 2),
                                       param_dtype=cfg.param_dtype,
                                       name="mask_down_conv1")
        self.mask_down_ln1 = nn.LayerNorm(epsilon=1e-6,
                                          param_dtype=cfg.param_dtype,
                                          name="mask_down_ln1")
        self.mask_down_conv2 = nn.Conv(d // 16, (2, 2), strides=(2, 2),
                                       param_dtype=cfg.param_dtype,
                                       name="mask_down_conv2")
        self.mask_down_ln2 = nn.LayerNorm(epsilon=1e-6,
                                          param_dtype=cfg.param_dtype,
                                          name="mask_down_ln2")
        self.mask_down_conv3 = nn.Conv(d, (1, 1),
                                       param_dtype=cfg.param_dtype,
                                       name="mask_down_conv3")

    def _pe(self, coords):
        """coords in [0, 1]^2 -> [..., prompt_embed_dim]."""
        proj = (2.0 * coords - 1.0) @ self.gaussian_matrix
        proj = 2.0 * jnp.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def dense_pe(self):
        """Positional encoding of the embedding grid [E, E, D]."""
        e = self.config.embedding_size
        yy, xx = jnp.meshgrid((jnp.arange(e) + 0.5) / e,
                              (jnp.arange(e) + 0.5) / e, indexing="ij")
        return self._pe(jnp.stack([xx, yy], axis=-1))

    def embed_points(self, points, labels):
        """points [B, P, 2] in input-image pixels, labels [B, P]."""
        size = self.config.img_size
        coords = (points + 0.5) / size
        pe = self._pe(coords)
        pe = jnp.where((labels == -1)[..., None],
                       self.not_a_point_embed[0], pe)
        pe = pe + jnp.where((labels == 0)[..., None],
                            self.point_embeddings[0][0], 0.0)
        pe = pe + jnp.where((labels == 1)[..., None],
                            self.point_embeddings[1][0], 0.0)
        return pe

    def embed_boxes(self, boxes):
        """boxes [B, 2, 2] corner points (x1,y1),(x2,y2) in pixels."""
        size = self.config.img_size
        coords = (boxes + 0.5) / size
        pe = self._pe(coords)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3][0])
        return pe

    def embed_mask(self, mask):
        """mask [B, 4E, 4E, 1] logits -> dense embedding [B, E, E, D]."""
        h = nn.gelu(self.mask_down_ln1(self.mask_down_conv1(mask)),
                    approximate=False)
        h = nn.gelu(self.mask_down_ln2(self.mask_down_conv2(h)),
                    approximate=False)
        return self.mask_down_conv3(h)

    def no_mask_dense(self, batch: int):
        e = self.config.embedding_size
        return jnp.broadcast_to(
            self.no_mask_embed.reshape(1, 1, 1, -1),
            (batch, e, e, self.config.prompt_embed_dim))

    def __call__(self, points, labels, boxes=None, mask=None):
        sparse = self.embed_points(points, labels)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self.embed_boxes(boxes)], 1)
        if mask is not None:
            dense = self.embed_mask(mask)
        else:
            dense = self.no_mask_dense(points.shape[0])
        return sparse, dense


# ---------------------------------------------------------------------------
# Mask decoder (two-way transformer)
# ---------------------------------------------------------------------------

class DecoderAttention(nn.Module):
    config: SAMConfig
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        cfg = self.config
        d = cfg.prompt_embed_dim // self.downsample_rate
        nh = cfg.decoder_heads
        hd = d // nh
        dense = lambda feats, nm: nn.Dense(feats,
                                           param_dtype=cfg.param_dtype,
                                           name=nm)
        b = q.shape[0]
        qq = dense(d, "q_proj")(q).reshape(b, -1, nh, hd)
        kk = dense(d, "k_proj")(k).reshape(b, -1, nh, hd)
        vv = dense(d, "v_proj")(v).reshape(b, -1, nh, hd)
        logits = jnp.einsum("bqhc,bkhc->bhqk", qq, kk) / np.sqrt(hd)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, vv).reshape(b, -1, d)
        return dense(cfg.prompt_embed_dim, "out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    config: SAMConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.config
        ln = lambda nm: nn.LayerNorm(param_dtype=cfg.param_dtype, name=nm)
        if self.skip_first_layer_pe:
            queries = queries + DecoderAttention(cfg, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(cfg, name="self_attn")(
                q, q, queries)
        queries = ln("norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            cfg, downsample_rate=2, name="cross_attn_token_to_image")(
            q, k, keys)
        queries = ln("norm2")(queries)

        h = nn.Dense(cfg.decoder_mlp_dim, param_dtype=cfg.param_dtype,
                     name="mlp_lin1")(queries)
        h = nn.Dense(cfg.prompt_embed_dim, param_dtype=cfg.param_dtype,
                     name="mlp_lin2")(nn.relu(h))
        queries = ln("norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            cfg, downsample_rate=2, name="cross_attn_image_to_token")(
            k, q, queries)
        keys = ln("norm4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    config: SAMConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompt,
                 dense_prompt):
        """image_embedding [B, E, E, D]; image_pe [E, E, D];
        sparse_prompt [B, P, D]; dense_prompt [B, E, E, D].
        Returns (mask_logits [B, M, 4E, 4E], iou_pred [B, M])."""
        cfg = self.config
        d = cfg.prompt_embed_dim
        m = cfg.num_mask_tokens
        b, e = image_embedding.shape[0], image_embedding.shape[1]

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, d), cfg.param_dtype)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (m, d), cfg.param_dtype)
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (b, m + 1, d)),
             sparse_prompt], axis=1)

        src = image_embedding + dense_prompt
        keys = src.reshape(b, e * e, d)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, e * e, d),
                                  (b, e * e, d))

        queries = tokens
        for i in range(cfg.decoder_depth):
            queries, keys = TwoWayAttentionBlock(
                cfg, skip_first_layer_pe=(i == 0),
                name=f"layers_{i}")(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + DecoderAttention(
            cfg, downsample_rate=2, name="final_attn_token_to_image")(
            q, k, keys)
        queries = nn.LayerNorm(param_dtype=cfg.param_dtype,
                               name="norm_final_attn")(queries)

        iou_token_out = queries[:, 0]
        mask_tokens_out = queries[:, 1:m + 1]

        img2d = keys.reshape(b, e, e, d)
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                              param_dtype=cfg.param_dtype,
                              name="upscale_conv1")(img2d)
        up = nn.LayerNorm(epsilon=1e-6, param_dtype=cfg.param_dtype,
                          name="upscale_ln")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                              param_dtype=cfg.param_dtype,
                              name="upscale_conv2")(up)
        up = nn.gelu(up, approximate=False)          # [B, 4E, 4E, D/8]

        hyper = []
        for i in range(m):
            h = mask_tokens_out[:, i]
            for j, feats in enumerate([d, d, d // 8]):
                h = nn.Dense(feats, param_dtype=cfg.param_dtype,
                             name=f"hyper_{i}_lin{j}")(h)
                if j < 2:
                    h = nn.relu(h)
            hyper.append(h)
        hyper_in = jnp.stack(hyper, axis=1)           # [B, M, D/8]
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper_in, up)

        h = iou_token_out
        for j, feats in enumerate([d, d, m]):
            h = nn.Dense(feats, param_dtype=cfg.param_dtype,
                         name=f"iou_lin{j}")(h)
            if j < 2:
                h = nn.relu(h)
        return masks, h


class SamModel(nn.Module):
    """Full SAM: submodule names mirror the release state-dict prefixes."""

    config: SAMConfig

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.config)
        self.prompt_encoder = PromptEncoder(self.config)
        self.mask_decoder = MaskDecoder(self.config)

    def embed(self, image):
        return self.image_encoder(image)

    def decode(self, embedding, points, labels, boxes=None, mask=None):
        sparse, dense = self.prompt_encoder(points, labels, boxes, mask)
        return self.mask_decoder(embedding, self.prompt_encoder.dense_pe(),
                                 sparse, dense)

    def __call__(self, image, points, labels, boxes=None, mask=None):
        return self.decode(self.embed(image), points, labels, boxes, mask)


# SAM's input normalization (published pixel stats, [0,255] scale).
_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


class PromptableSegmenter:
    """Point/box-promptable segmentation with the published predictor
    pipeline: longest-side resize to img_size, bottom/right padding, mask
    selection by predicted IoU, logit upsampling back to the original
    resolution, threshold at 0."""

    def __init__(self, config: Optional[SAMConfig] = None, params=None,
                 seed: int = 0, checkpoint_path: Optional[str] = None,
                 multimask: bool = True):
        self.config = config or tiny_sam_config()
        self.model = SamModel(self.config)
        self.multimask = multimask
        if checkpoint_path is not None:
            from diffusionhandles_tpu.models.weights_sam import (
                load_sam_checkpoint)
            params = load_sam_checkpoint(checkpoint_path, self.config)
        if params is None:
            s = self.config.img_size
            params = jax.jit(self.model.init, static_argnames=())(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, s, s, 3), jnp.float32),
                jnp.zeros((1, 2, 2), jnp.float32),
                jnp.zeros((1, 2), jnp.int32),
                jnp.zeros((1, 2, 2), jnp.float32),
                jnp.zeros((1, s // 4, s // 4, 1), jnp.float32))
        self.params = params
        self._embed = jax.jit(
            lambda p, img: self.model.apply(p, img, method=SamModel.embed))
        self._decode = jax.jit(
            lambda p, emb, pts, lbl: self.model.apply(
                p, emb, pts, lbl, method=SamModel.decode))
        self._decode_box = jax.jit(
            lambda p, emb, pts, lbl, box: self.model.apply(
                p, emb, pts, lbl, box, method=SamModel.decode))

    def _preprocess(self, img: np.ndarray):
        """img [1,3,H,W] in [0,1] -> padded input + resized (h, w)."""
        h, w = img.shape[-2:]
        s = self.config.img_size
        scale = s / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        x = np.moveaxis(np.asarray(img, np.float32), 1, -1)
        x = np.asarray(resize_nhwc(jnp.asarray(x), (nh, nw), "bilinear"))
        x = (x * 255.0 - _PIXEL_MEAN) / _PIXEL_STD
        x = np.pad(x, ((0, 0), (0, s - nh), (0, s - nw), (0, 0)))
        return jnp.asarray(x), (nh, nw), scale

    def predict(self, img: np.ndarray, points=None, labels=None,
                boxes=None):
        """img [1,3,H,W] in [0,1]; points [P,2] pixel coords; labels [P];
        boxes [x1,y1,x2,y2]. Returns (mask [1,1,H,W], iou score)."""
        h, w = img.shape[-2:]
        x, (nh, nw), scale = self._preprocess(img)
        emb = self._embed(self.params, x)

        if points is None:
            if boxes is not None:
                # box-only prompt: the published PromptEncoder emits NO point
                # tokens at all (SamPredictor passes points=None; the
                # not_a_point pad is only appended alongside real points when
                # no box is given) — sparse prompt is just the 2 box corners
                pts = np.zeros((1, 0, 2), np.float32)
                lbl = np.zeros((1, 0), np.int32)
            else:
                pts = np.zeros((1, 1, 2), np.float32)
                lbl = -np.ones((1, 1), np.int32)
        else:
            pts = np.asarray(points, np.float32).reshape(1, -1, 2) * scale
            lbl = (np.ones((1, pts.shape[1]), np.int32) if labels is None
                   else np.asarray(labels, np.int32).reshape(1, -1))
            if boxes is None:
                # pad point appended when no box (published behavior)
                pts = np.concatenate([pts, np.zeros((1, 1, 2), np.float32)],
                                     axis=1)
                lbl = np.concatenate([lbl, -np.ones((1, 1), np.int32)],
                                     axis=1)
        if boxes is not None:
            box = (np.asarray(boxes, np.float32).reshape(1, 2, 2) * scale)
            masks, iou = self._decode_box(self.params, emb,
                                          jnp.asarray(pts),
                                          jnp.asarray(lbl),
                                          jnp.asarray(box))
        else:
            masks, iou = self._decode(self.params, emb, jnp.asarray(pts),
                                      jnp.asarray(lbl))

        if self.multimask:
            best = 1 + int(jnp.argmax(iou[0, 1:]))
        else:
            best = 0
        logits = masks[:, best][..., None]           # [1, 4E, 4E, 1]
        s = self.config.img_size
        logits = resize_nhwc(logits, (s, s), "bilinear")
        logits = logits[:, :nh, :nw]
        logits = resize_nhwc(logits, (h, w), "bilinear")[..., 0]
        mask = (np.asarray(logits) > 0.0)[:, None].astype(np.float32)
        return mask, float(iou[0, best])

    def segment(self, img: np.ndarray, points, labels=None) -> np.ndarray:
        """Back-compat API: best mask [1,1,H,W] for point prompts."""
        mask, _ = self.predict(img, points=points, labels=labels)
        return mask

"""GroundingDINO (open-vocabulary text -> boxes) in Flax — the published
graph of the reference's LangSAM grounding stage (reference:
test/estimate_foreground.py:6-40; LangSAM = GroundingDINO + SAM).

Architecture (groundingdino_swint_ogc):
* Swin-T backbone (models/swin.py), out strides 8/16/32 + an extra
  stride-64 conv level; 1x1 conv + GroupNorm projections to d_model=256.
* BERT-base text tower (models/bert.py) + a 768->256 feature map.
* Feature enhancer: 6 layers of {bi-directional image<->text fusion
  (BiMultiHeadAttention with layer-scale gammas), text self-attention,
  multi-scale deformable image self-attention}.
* Language-guided query selection (two-stage): contrastive image-text
  logits over encoder memory pick the top-900 proposals; their refined
  boxes seed the decoder reference points; queries are learned embeddings.
* Cross-modality decoder: 6 layers of {query self-attention, text
  cross-attention, deformable image cross-attention, FFN} with iterative
  box refinement (per-layer MLP heads, sigmoid-space deltas).
* Outputs: contrastive logits per text token + cxcywh boxes; a phrase
  score is the max logit over the caption's tokens.

All shapes static; deformable sampling is bilinear gather in [0,1]^2
normalized coordinates (grid_sample align_corners=False semantics).
TPU-native: batched einsum attention, no dynamic control flow.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.models.bert import BertConfig, BertModel
from diffusionhandles_tpu.models.swin import SwinConfig, SwinTransformer


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    d_model: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    num_queries: int = 900
    max_text_len: int = 256
    fusion_dim: int = 1024      # BiMultiHeadAttention embed dim
    fusion_heads: int = 4
    text_layer_heads: int = 4
    text_layer_ffn: int = 1024
    # bert-base-uncased ids for [CLS], [SEP], '.', '?' — the phrase
    # delimiters of generate_masks_with_special_tokens_and_transfer_map
    special_token_ids: Tuple[int, ...] = (101, 102, 1012, 1029)
    # the swint_ogc config's PositionEmbeddingSineHW temperature
    # (pe_temperatureH = pe_temperatureW = 20, NOT the DETR 10000)
    pe_temperature: float = 20.0
    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    param_dtype: Any = jnp.float32


def tiny_gdino_config(**overrides) -> GroundingDinoConfig:
    from diffusionhandles_tpu.models.bert import tiny_bert_config
    from diffusionhandles_tpu.models.swin import tiny_swin_config
    base = dict(d_model=32, num_heads=4, num_levels=4, num_points=2,
                enc_layers=2, dec_layers=2, ffn_dim=64, num_queries=20,
                max_text_len=32, fusion_dim=64, fusion_heads=2,
                text_layer_heads=2, text_layer_ffn=32,
                swin=tiny_swin_config(), bert=tiny_bert_config())
    base.update(overrides)
    return GroundingDinoConfig(**base)


def _inverse_sigmoid(x, eps=1e-3):
    """Published util.misc.inverse_sigmoid: clamp x to [0,1], then clamp
    numerator/denominator separately (so x=1 -> log(1/eps), x=0 ->
    log(eps/1))."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.maximum(x, eps) / jnp.maximum(1.0 - x, eps))


def _sine_embed(x, dim: int, temperature: float = 10000.0):
    """[...,] scalar positions in [0,1] -> [..., dim] sine embedding
    (DETR convention: scale 2*pi, per-frequency interleaved sin/cos)."""
    freqs = temperature ** (jnp.arange(dim // 2, dtype=jnp.float32)
                            * 2.0 / dim)
    ang = x[..., None] * (2 * math.pi) / freqs          # [..., dim//2]
    return jnp.stack([jnp.sin(ang), jnp.cos(ang)],
                     axis=-1).reshape(x.shape + (dim,))


def _box_sine_embed(boxes, d_model: int):
    """cxcywh boxes in [0,1] -> [..., 2*d_model] (128 dims per coord for
    d_model=256, the published ref_point_head input). The published
    gen_sineembed_for_position emits (pos_y, pos_x, pos_w, pos_h) — the
    y embedding comes FIRST, then x, then w, h."""
    per = d_model // 2
    order = (1, 0, 2, 3)                                # cy, cx, w, h
    parts = [_sine_embed(boxes[..., i], per) for i in order]
    return jnp.concatenate(parts, axis=-1)


def build_text_token_masks(input_ids, txt_mask, special_ids):
    """The published generate_masks_with_special_tokens_and_transfer_map:
    tokens between consecutive special tokens ([CLS]/[SEP]/'.'/'?') form
    independent phrases. Each phrase (including its trailing special token)
    gets block self-attention and fresh arange(0..len-1) position ids;
    [CLS] attends only itself with position 0; padding tokens attend only
    themselves with position 0.

    input_ids [B,S] int; txt_mask [B,S] bool (valid tokens).
    Returns (attn [B,S,S] bool, position_ids [B,S] int32).
    """
    sp = jnp.zeros(input_ids.shape, bool)
    for sid in special_ids:
        sp = sp | (input_ids == sid)
    sp = sp & txt_mask
    b, s = input_ids.shape
    # phrase/block id = number of special tokens strictly before the token
    block = jnp.cumsum(sp.astype(jnp.int32), axis=1) - sp.astype(jnp.int32)
    valid = txt_mask
    attn = (block[:, :, None] == block[:, None, :]) \
        & valid[:, :, None] & valid[:, None, :]
    attn = attn | jnp.eye(s, dtype=bool)[None]
    # previous special position (exclusive running max), -1 if none
    idx = jnp.arange(s, dtype=jnp.int32)[None]
    marked = jnp.where(sp, idx, -1)
    run = jax.lax.associative_scan(jnp.maximum, marked, axis=1)
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), run[:, :-1]], axis=1)
    covered = idx <= jnp.max(marked, axis=1, keepdims=True)
    position_ids = jnp.where(covered & valid, idx - prev - 1, 0)
    return attn, position_ids.astype(jnp.int32)


class _InProj(nn.Module):
    """Fused qkv projection with torch nn.MultiheadAttention's parameter
    layout (one [D, 3D] kernel + [3D] bias, converted from
    in_proj_weight/in_proj_bias)."""

    d: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], 3 * self.d), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (3 * self.d,), self.param_dtype)
        return x @ kernel + bias


class MLP(nn.Module):
    hidden: int
    out: int
    num_layers: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            feats = self.out if i == self.num_layers - 1 else self.hidden
            x = nn.Dense(feats, param_dtype=self.param_dtype,
                         name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (Deformable-DETR)."""

    config: GroundingDinoConfig

    @nn.compact
    def __call__(self, query, ref_points, value, spatial_shapes):
        """query [B,Q,D]; ref_points [B,Q,2] (cx,cy) or [B,Q,4] (cxcywh)
        in [0,1]; value [B,S,D] flattened multi-level; spatial_shapes:
        static [(h,w)] per level. Returns [B,Q,D]."""
        cfg = self.config
        d, H, L, P = (cfg.d_model, cfg.num_heads, cfg.num_levels,
                      cfg.num_points)
        hd = d // H
        b, q, _ = query.shape
        v = nn.Dense(d, param_dtype=cfg.param_dtype,
                     name="value_proj")(value).reshape(
            b, -1, H, hd)
        off = nn.Dense(H * L * P * 2, param_dtype=cfg.param_dtype,
                       name="sampling_offsets")(query).reshape(
            b, q, H, L, P, 2)
        w = nn.Dense(H * L * P, param_dtype=cfg.param_dtype,
                     name="attention_weights")(query).reshape(
            b, q, H, L * P)
        w = jax.nn.softmax(w, axis=-1).reshape(b, q, H, L, P)

        if ref_points.shape[-1] == 2:
            normalizer = jnp.asarray([[wd, ht] for (ht, wd)
                                      in spatial_shapes], jnp.float32)
            loc = (ref_points[:, :, None, None, None, :]
                   + off / normalizer[None, None, None, :, None, :])
        else:
            cxcy = ref_points[..., :2]
            wh = ref_points[..., 2:]
            loc = (cxcy[:, :, None, None, None, :]
                   + off / P * wh[:, :, None, None, None, :] * 0.5)

        # gather per level
        outs = []
        start = 0
        for lvl, (ht, wd) in enumerate(spatial_shapes):
            vl = v[:, start:start + ht * wd].reshape(b, ht, wd, H, hd)
            outs.append(_bilinear_sample(vl, loc[:, :, :, lvl]))
            start += ht * wd
        sampled = jnp.stack(outs, axis=3)       # [B,Q,H,L,P,hd]
        out = jnp.sum(sampled * w[..., None], axis=(3, 4))  # [B,Q,H,hd]
        out = out.reshape(b, q, d)
        return nn.Dense(d, param_dtype=cfg.param_dtype,
                        name="output_proj")(out)


def _bilinear_sample(vl, loc):
    """vl [B,h,w,H,hd]; loc [B,Q,H,P,2] in [0,1] -> [B,Q,H,P,hd]
    (grid_sample align_corners=False, zero padding)."""
    b, h, w, H, hd = vl.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    flat_h = jnp.moveaxis(vl.reshape(b, h * w, H, hd), 2, 1)  # [B,H,S,hd]

    def gather(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        idx = jnp.moveaxis(yc * w + xc, 2, 1)                 # [B,H,Q,P]
        g = jax.vmap(jax.vmap(lambda fl, ix: fl[ix]))(flat_h, idx)
        g = jnp.moveaxis(g, 1, 2)                             # [B,Q,H,P,hd]
        return jnp.where(inb[..., None], g, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


class BiAttention(nn.Module):
    """Bi-directional image<->text attention (GLIP/GroundingDINO
    BiMultiHeadAttention) with pre-LN and layer-scale residuals."""

    config: GroundingDinoConfig

    @nn.compact
    def __call__(self, vis, txt, txt_mask):
        cfg = self.config
        e, H = cfg.fusion_dim, cfg.fusion_heads
        hd = e // H
        b, sv, dv = vis.shape
        sl = txt.shape[1]
        gamma_v = self.param("gamma_v", nn.initializers.constant(1e-4),
                             (dv,), cfg.param_dtype)
        gamma_l = self.param("gamma_l", nn.initializers.constant(1e-4),
                             (txt.shape[-1],), cfg.param_dtype)
        vn = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                          name="layer_norm_v")(vis)
        ln = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                          name="layer_norm_l")(txt)
        dense = lambda feats, nm: nn.Dense(feats,
                                           param_dtype=cfg.param_dtype,
                                           name=nm)
        qv = dense(e, "v_proj")(vn).reshape(b, sv, H, hd) / np.sqrt(hd)
        kl = dense(e, "l_proj")(ln).reshape(b, sl, H, hd)
        valv = dense(e, "values_v_proj")(vn).reshape(b, sv, H, hd)
        vall = dense(e, "values_l_proj")(ln).reshape(b, sl, H, hd)
        logits = jnp.einsum("bvhc,blhc->bhvl", qv, kl)
        logits = jnp.clip(logits, -50000.0, 50000.0)
        # v attends l (mask padded text); l attends v
        lmask = txt_mask[:, None, None, :]
        attn_v = jax.nn.softmax(jnp.where(lmask, logits, -1e9), axis=-1)
        attn_l = jax.nn.softmax(logits, axis=2)
        out_v = jnp.einsum("bhvl,blhc->bvhc", attn_v, vall).reshape(
            b, sv, e)
        out_l = jnp.einsum("bhvl,bvhc->blhc", attn_l, valv).reshape(
            b, sl, e)
        # published BiAttentionBlock adds the residual to the NORMED
        # inputs (v = layer_norm_v(v); ...; v = v + gamma_v * delta_v)
        vis = vn + gamma_v * dense(dv, "out_v_proj")(out_v)
        txt = ln + gamma_l * dense(txt.shape[-1], "out_l_proj")(out_l)
        return vis, txt


class TextSelfAttnLayer(nn.Module):
    """Post-LN transformer encoder layer over the text tokens."""

    config: GroundingDinoConfig

    @nn.compact
    def __call__(self, txt, attn_mask, pos):
        """attn_mask: [B,S,S] bool per-phrase block mask (the published
        layers consume ~text_self_attention_masks, not the padding mask)."""
        cfg = self.config
        d = txt.shape[-1]
        H = cfg.text_layer_heads
        hd = d // H
        b, s, _ = txt.shape
        # one fused in_proj (torch nn.MultiheadAttention layout); pos is
        # added to q/k only, v comes from the raw tokens
        proj = _InProj(d, cfg.param_dtype, name="in_proj")
        q, k, _ = jnp.split(proj(txt + pos), 3, axis=-1)
        _, _, v = jnp.split(proj(txt), 3, axis=-1)
        q = q.reshape(b, s, H, hd)
        k = k.reshape(b, s, H, hd)
        v = v.reshape(b, s, H, hd)
        logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) / np.sqrt(hd)
        logits = jnp.where(attn_mask[:, None, :, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(b, s, d)
        txt = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype, name="norm1")(
            txt + nn.Dense(d, param_dtype=cfg.param_dtype,
                           name="out_proj")(out))
        hmid = nn.Dense(cfg.text_layer_ffn, param_dtype=cfg.param_dtype,
                        name="linear1")(txt)
        hmid = nn.Dense(d, param_dtype=cfg.param_dtype,
                        name="linear2")(nn.relu(hmid))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                            name="norm2")(txt + hmid)


class DeformableEncoderLayer(nn.Module):
    """Deformable image self-attention + FFN (Deformable-DETR encoder)."""

    config: GroundingDinoConfig

    @nn.compact
    def __call__(self, src, pos, ref_points, spatial_shapes):
        cfg = self.config
        h = MSDeformAttn(cfg, name="self_attn")(
            src + pos, ref_points, src, spatial_shapes)
        src = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                           name="norm1")(src + h)
        h = nn.Dense(cfg.ffn_dim, param_dtype=cfg.param_dtype,
                     name="linear1")(src)
        h = nn.Dense(cfg.d_model, param_dtype=cfg.param_dtype,
                     name="linear2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                            name="norm2")(src + h)


class DecoderLayer(nn.Module):
    """Query self-attn -> text cross-attn -> deformable image cross-attn
    -> FFN (GroundingDINO cross-modality decoder layer)."""

    config: GroundingDinoConfig

    @nn.compact
    def __call__(self, tgt, query_pos, ref_points, memory, spatial_shapes,
                 txt, txt_mask):
        cfg = self.config
        d = cfg.d_model
        H = cfg.num_heads
        hd = d // H
        b, q, _ = tgt.shape

        # self attention among queries (standard MHA, fused in_proj)
        proj = _InProj(d, cfg.param_dtype, name="self_attn_in_proj")
        qq, kk, _ = jnp.split(proj(tgt + query_pos), 3, axis=-1)
        _, _, vv = jnp.split(proj(tgt), 3, axis=-1)
        logits = jnp.einsum(
            "bqhc,bkhc->bhqk", qq.reshape(b, q, H, hd),
            kk.reshape(b, q, H, hd)) / np.sqrt(hd)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn,
                         vv.reshape(b, q, H, hd)).reshape(b, q, d)
        out = nn.Dense(d, param_dtype=cfg.param_dtype,
                       name="self_attn_out_proj")(out)
        tgt = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                           name="norm2")(tgt + out)

        # text cross attention
        projt = _InProj(d, cfg.param_dtype, name="ca_text_in_proj")
        qq = jnp.split(projt(tgt + query_pos), 3, axis=-1)[0]
        kk = jnp.split(projt(txt), 3, axis=-1)[1]
        vv = jnp.split(projt(txt), 3, axis=-1)[2]
        st = txt.shape[1]
        logits = jnp.einsum(
            "bqhc,bkhc->bhqk", qq.reshape(b, q, H, hd),
            kk.reshape(b, st, H, hd)) / np.sqrt(hd)
        logits = jnp.where(txt_mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn,
                         vv.reshape(b, st, H, hd)).reshape(b, q, d)
        out = nn.Dense(d, param_dtype=cfg.param_dtype,
                       name="ca_text_out_proj")(out)
        tgt = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                           name="catext_norm")(tgt + out)

        # deformable image cross attention
        h = MSDeformAttn(cfg, name="cross_attn")(
            tgt + query_pos, ref_points, memory, spatial_shapes)
        tgt = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                           name="norm1")(tgt + h)

        h = nn.Dense(cfg.ffn_dim, param_dtype=cfg.param_dtype,
                     name="linear1")(tgt)
        h = nn.Dense(d, param_dtype=cfg.param_dtype,
                     name="linear2")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype,
                            name="norm3")(tgt + h)


def _image_pos_embed(spatial_shapes, d_model: int,
                     temperature: float = 20.0):
    """Per-level sine position embeddings [S_total, d_model] — the
    published PositionEmbeddingSineHW with normalize=True: cumsum
    positions ((i+1)/H, (j+1)/W with a 1e-6 eps in the denominator),
    scale 2*pi, temperature 20 for the swint_ogc release, y-block first."""
    per = d_model // 2
    eps = 1e-6
    parts = []
    for (h, w) in spatial_shapes:
        yy = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + eps)
        xx = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + eps)
        ey = _sine_embed(yy, per, temperature)[:, None, :].repeat(w, axis=1)
        ex = _sine_embed(xx, per, temperature)[None, :, :].repeat(h, axis=0)
        parts.append(jnp.concatenate([ey, ex], -1).reshape(h * w, d_model))
    return jnp.concatenate(parts, axis=0)


def _encoder_ref_points(spatial_shapes):
    """Per-pixel normalized (cx, cy) reference points [S_total, 2]."""
    pts = []
    for (h, w) in spatial_shapes:
        yy, xx = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                              (jnp.arange(w) + 0.5) / w, indexing="ij")
        pts.append(jnp.stack([xx, yy], -1).reshape(h * w, 2))
    return jnp.concatenate(pts, axis=0)


def _output_proposals(spatial_shapes):
    """Two-stage proposal anchors (gen_encoder_output_proposals): grid
    centers, wh = 0.05 * 2^level. Returns (proposals [S_total, 4] in
    inverse-sigmoid space with +inf at invalid rows, valid [S_total]).
    A proposal is valid iff ALL its sigmoid-space coords lie strictly in
    (0.01, 0.99) — border grid centers of fine levels are excluded, and
    the published code also ZEROES the encoder memory at invalid rows
    before the enc_output projection."""
    props = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        yy, xx = jnp.meshgrid((jnp.arange(h) + 0.5) / h,
                              (jnp.arange(w) + 0.5) / w, indexing="ij")
        wh = jnp.full((h * w, 2), 0.05 * 2 ** lvl)
        props.append(jnp.concatenate(
            [jnp.stack([xx, yy], -1).reshape(h * w, 2), wh], -1))
    raw = jnp.concatenate(props, axis=0)
    valid = jnp.all((raw > 0.01) & (raw < 0.99), axis=-1)
    # published: exact log(p/(1-p)) on valid rows, +inf elsewhere
    unsig = jnp.log(raw / (1.0 - raw))
    return jnp.where(valid[:, None], unsig, jnp.inf), valid


class GroundingDinoModel(nn.Module):
    """Full graph. __call__(image [B,H,W,3] normalized, input_ids, txt_mask)
    -> (pred_logits [B, Q, max_text_len], pred_boxes [B, Q, 4] cxcywh)."""

    config: GroundingDinoConfig

    def setup(self):
        cfg = self.config
        self.backbone = SwinTransformer(cfg.swin)
        self.bert = BertModel(cfg.bert)
        self.feat_map = nn.Dense(cfg.d_model, param_dtype=cfg.param_dtype)
        nlvl_backbone = len(cfg.swin.out_indices)
        self.input_proj_convs = [
            nn.Conv(cfg.d_model, (1, 1), param_dtype=cfg.param_dtype,
                    name=f"input_proj_{i}_conv")
            for i in range(nlvl_backbone)]
        self.input_proj_extra = nn.Conv(
            cfg.d_model, (3, 3), strides=(2, 2), padding=1,
            param_dtype=cfg.param_dtype,
            name=f"input_proj_{nlvl_backbone}_conv")
        self.input_proj_norms = [
            nn.GroupNorm(num_groups=min(32, cfg.d_model), epsilon=1e-5,
                         param_dtype=cfg.param_dtype,
                         name=f"input_proj_{i}_norm")
            for i in range(nlvl_backbone + 1)]
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (cfg.num_levels, cfg.d_model), cfg.param_dtype)
        self.enc_layers_mod = [DeformableEncoderLayer(
            cfg, name=f"enc_layer_{i}") for i in range(cfg.enc_layers)]
        self.text_layers_mod = [TextSelfAttnLayer(
            cfg, name=f"text_layer_{i}") for i in range(cfg.enc_layers)]
        self.fusion_layers_mod = [BiAttention(
            cfg, name=f"fusion_layer_{i}") for i in range(cfg.enc_layers)]
        self.dec_layers_mod = [DecoderLayer(
            cfg, name=f"dec_layer_{i}") for i in range(cfg.dec_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype)
        self.ref_point_head = MLP(cfg.d_model, cfg.d_model, 2,
                                  cfg.param_dtype)
        self.bbox_embed = [MLP(cfg.d_model, 4, 3, cfg.param_dtype,
                               name=f"bbox_embed_{i}")
                           for i in range(cfg.dec_layers)]
        self.enc_output = nn.Dense(cfg.d_model,
                                   param_dtype=cfg.param_dtype)
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, param_dtype=cfg.param_dtype)
        self.enc_out_bbox_embed = MLP(cfg.d_model, 4, 3, cfg.param_dtype)
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (cfg.num_queries, cfg.d_model), cfg.param_dtype)

    def __call__(self, image, input_ids, txt_mask):
        cfg = self.config
        b = image.shape[0]

        # ---- towers
        feats = self.backbone(image)
        levels = [feats[i] for i in sorted(feats)]
        levels.append(self.input_proj_extra(levels[-1]))
        srcs = []
        spatial_shapes = []
        for i, f in enumerate(levels):
            x = (self.input_proj_convs[i](f)
                 if i < len(self.input_proj_convs) else f)
            x = self.input_proj_norms[i](x)
            spatial_shapes.append((x.shape[1], x.shape[2]))
            srcs.append(x.reshape(b, -1, cfg.d_model))
        src = jnp.concatenate(srcs, axis=1)

        # per-phrase block self-attention masks + fresh position ids
        # (generate_masks_with_special_tokens_and_transfer_map) feed both
        # the BERT tower and the enhancer's text layers
        text_self_mask, position_ids = build_text_token_masks(
            input_ids, txt_mask, cfg.special_token_ids)
        hidden, _ = self.bert(input_ids, text_self_mask,
                              position_ids=position_ids)
        txt = self.feat_map(hidden)              # [B, St, D]
        st = txt.shape[1]

        # ---- feature enhancer
        pos = _image_pos_embed(spatial_shapes, cfg.d_model,
                               temperature=cfg.pe_temperature)
        lvl_pos = jnp.concatenate(
            [jnp.broadcast_to(self.level_embed[i],
                              (h * w, cfg.d_model))
             for i, (h, w) in enumerate(spatial_shapes)], axis=0)
        pos = (pos + lvl_pos)[None]
        ref_enc = _encoder_ref_points(spatial_shapes)[None, :, :]
        # published get_sine_pos_embed consumes RAW integer per-phrase
        # position ids (no normalization by sequence length)
        pos_text = _sine_embed(position_ids.astype(jnp.float32),
                               cfg.d_model)

        for i in range(cfg.enc_layers):
            src, txt = self.fusion_layers_mod[i](src, txt, txt_mask)
            txt = self.text_layers_mod[i](txt, text_self_mask, pos_text)
            src = self.enc_layers_mod[i](src, pos, ref_enc, spatial_shapes)

        # ---- language-guided query selection (two stage)
        proposals, prop_valid = _output_proposals(spatial_shapes)
        proposals = proposals[None]
        # gen_encoder_output_proposals zeroes the memory at padded/invalid
        # rows BEFORE the enc_output projection (the projected bias+norm
        # of a zero row is what the published scores see there)
        memory = self.enc_output_norm(self.enc_output(
            jnp.where(prop_valid[None, :, None], src, 0.0)))
        txt_masked = jnp.where(txt_mask[..., None], txt, 0.0)
        enc_logits = jnp.einsum("bsd,btd->bst", memory, txt_masked)
        enc_scores = jnp.max(
            jnp.where(txt_mask[:, None, :], enc_logits, -jnp.inf), axis=-1)
        _, topk = jax.lax.top_k(enc_scores, cfg.num_queries)
        enc_boxes = self.enc_out_bbox_embed(memory) + proposals
        ref = jax.nn.sigmoid(
            jnp.take_along_axis(enc_boxes, topk[..., None], axis=1))
        ref = jax.lax.stop_gradient(ref)

        tgt = jnp.broadcast_to(self.tgt_embed[None],
                               (b,) + self.tgt_embed.shape)

        # ---- cross-modality decoder with iterative box refinement.
        # Published semantics: the RUNNING refinement chain applies
        # bbox_embed to the RAW layer output, while the REPORTED boxes
        # recompute bbox_embed on the decoder-normed output against the
        # reference points going INTO that layer (TransformerDecoder
        # appends norm(output) to `intermediate` but refines on `output`).
        boxes_out = None
        for i in range(cfg.dec_layers):
            query_pos = self.ref_point_head(
                _box_sine_embed(ref, cfg.d_model))
            tgt = self.dec_layers_mod[i](tgt, query_pos, ref, src,
                                         spatial_shapes, txt, txt_mask)
            ref_unsig = _inverse_sigmoid(ref)
            boxes_out = jax.nn.sigmoid(
                self.bbox_embed[i](self.decoder_norm(tgt)) + ref_unsig)
            ref = jax.lax.stop_gradient(jax.nn.sigmoid(
                self.bbox_embed[i](tgt) + ref_unsig))

        hs = self.decoder_norm(tgt)
        logits = jnp.einsum("bqd,btd->bqt", hs, txt_masked)
        logits = jnp.where(txt_mask[:, None, :], logits, -jnp.inf)
        pad = cfg.max_text_len - st
        if pad > 0:
            logits = jnp.pad(logits, ((0, 0), (0, 0), (0, pad)),
                             constant_values=-jnp.inf)
        return logits[:, :, :cfg.max_text_len], boxes_out


# ImageNet stats (GroundingDINO's input normalization)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class GroundingDinoGrounder:
    """Text -> boxes predictor (the grounding stage of LangSAM,
    reference: test/estimate_foreground.py:37-39): fixed-size square
    resize (TPU-static), ImageNet normalization, WordPiece caption
    tokenization, sigmoid phrase scores = max contrastive logit over the
    caption's tokens."""

    def __init__(self, config: Optional[GroundingDinoConfig] = None,
                 params=None, checkpoint_path: Optional[str] = None,
                 vocab_path: Optional[str] = None, input_size: int = 512,
                 box_threshold: float = 0.35, seed: int = 0):
        from diffusionhandles_tpu.models.bert import WordPieceTokenizer
        self.config = config or GroundingDinoConfig()
        self.model = GroundingDinoModel(self.config)
        self.input_size = input_size
        self.box_threshold = box_threshold
        self.tokenizer = WordPieceTokenizer(
            vocab_path, self.config.bert.vocab_size)
        if checkpoint_path is not None:
            from diffusionhandles_tpu.models.weights_gdino import (
                load_gdino_checkpoint)
            params = load_gdino_checkpoint(checkpoint_path, self.config)
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, input_size, input_size, 3), jnp.float32),
                jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), bool))
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def predict_boxes(self, img: np.ndarray, caption: str,
                      box_threshold: Optional[float] = None):
        """img [1,3,H,W] in [0,1] -> (boxes [N,4] xyxy pixels,
        scores [N]), N >= 1 (the best box is always included)."""
        from diffusionhandles_tpu.ops.resize import resize_nhwc

        thr = self.box_threshold if box_threshold is None else box_threshold
        h, w = img.shape[-2:]
        s = self.input_size
        x = np.moveaxis(np.asarray(img, np.float32), 1, -1)
        x = np.asarray(resize_nhwc(jnp.asarray(x), (s, s), "bilinear"))
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD

        cap = caption.strip().lower()
        if not cap.endswith("."):
            cap = cap + "."
        ids, mask = self.tokenizer([cap], max_length=min(
            64, self.config.max_text_len))
        logits, boxes = self._apply(self.params, jnp.asarray(x),
                                    jnp.asarray(ids), jnp.asarray(mask))
        lg = np.asarray(logits[0])
        valid = np.asarray(mask[0])
        lg = lg[:, :valid.shape[0]]
        lg = np.where(valid[None, :], lg, -np.inf)
        scores = 1.0 / (1.0 + np.exp(-lg.max(axis=-1)))     # [Q]
        bx = np.asarray(boxes[0])                            # cxcywh [0,1]
        xyxy = np.stack([
            (bx[:, 0] - bx[:, 2] / 2) * w, (bx[:, 1] - bx[:, 3] / 2) * h,
            (bx[:, 0] + bx[:, 2] / 2) * w, (bx[:, 1] + bx[:, 3] / 2) * h,
        ], axis=-1)
        keep = scores > thr
        if not keep.any():
            keep = scores == scores.max()
        order = np.argsort(-scores[keep])
        return xyxy[keep][order], scores[keep][order]

    def best_box(self, img: np.ndarray, caption: str) -> np.ndarray:
        boxes, _ = self.predict_boxes(img, caption)
        return boxes[0]

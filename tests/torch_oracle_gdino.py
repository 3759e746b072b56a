"""Independent torch oracle of the FULL assembled GroundingDINO graph,
written clean-room from the published IDEA-Research architecture (the
grounding stage of the reference's LangSAM dependency, reference:
test/estimate_foreground.py:6-42). Release state-dict naming throughout so
models/weights_gdino.py:convert_gdino consumes it unchanged.

Covers every piece the per-module crosschecks cannot: per-phrase text
masks/position ids, SineHW image position embeddings (temperature 20),
level embeddings, the fusion -> text -> deformable encoder interleave,
gen_encoder_output_proposals validity masking + memory zeroing,
language-guided top-k query selection, sine query positions in
(y, x, w, h) order, the decoder's raw-output box refinement vs
normed-output reported boxes, and the contrastive logit head.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_oracle_swin_bert import OracleSwin, OracleBert


def inverse_sigmoid(x, eps=1e-3):
    x = x.clamp(min=0, max=1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def generate_masks_with_special_tokens(ids, valid, special_ids):
    """The published generate_masks_with_special_tokens_and_transfer_map
    sequential loop. ids/valid [B,S]. Returns (attn [B,S,S] bool,
    position_ids [B,S] long)."""
    bs, num_token = ids.shape
    sp = torch.zeros((bs, num_token), dtype=torch.bool)
    for sid in special_ids:
        sp |= ids == sid
    sp &= valid
    attn = torch.eye(num_token, dtype=torch.bool)[None].repeat(bs, 1, 1)
    position_ids = torch.zeros((bs, num_token), dtype=torch.long)
    for row in range(bs):
        previous_col = 0
        for col in torch.nonzero(sp[row]).flatten().tolist():
            if col == 0 or col == num_token - 1:
                attn[row, col, col] = True
                position_ids[row, col] = 0
            else:
                attn[row, previous_col + 1:col + 1,
                     previous_col + 1:col + 1] = True
                position_ids[row, previous_col + 1:col + 1] = torch.arange(
                    0, col - previous_col)
            previous_col = col
    return attn, position_ids


def get_sine_pos_embed(pos, num_pos_feats, temperature=10000.0):
    """[...,] -> [..., num_pos_feats]; published interleaved sin/cos with
    paired frequencies temperature ** (2*(i//2)/num_pos_feats)."""
    scale = 2 * math.pi
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_pos_feats)
    x = pos[..., None] * scale / dim_t
    return torch.stack((x[..., 0::2].sin(), x[..., 1::2].cos()),
                       dim=-1).flatten(-2)


def gen_sineembed_for_position(boxes, d_model):
    """cxcywh [B,Q,4] -> [B,Q,2*d_model]: (pos_y, pos_x, pos_w, pos_h),
    d_model//2 dims each (the published gen_sineembed_for_position)."""
    per = d_model // 2
    pos_y = get_sine_pos_embed(boxes[..., 1], per)
    pos_x = get_sine_pos_embed(boxes[..., 0], per)
    pos_w = get_sine_pos_embed(boxes[..., 2], per)
    pos_h = get_sine_pos_embed(boxes[..., 3], per)
    return torch.cat((pos_y, pos_x, pos_w, pos_h), dim=-1)


def pos_embed_sine_hw(h, w, d_model, temperature=20.0):
    """PositionEmbeddingSineHW with normalize=True: cumsum positions
    (i+1)/(H+eps) * 2*pi, y block first. Returns [h*w, d_model]."""
    per = d_model // 2
    eps = 1e-6
    yy = (torch.arange(h, dtype=torch.float32) + 1.0) / (h + eps)
    xx = (torch.arange(w, dtype=torch.float32) + 1.0) / (w + eps)
    ey = get_sine_pos_embed(yy, per, temperature)[:, None, :].repeat(1, w, 1)
    ex = get_sine_pos_embed(xx, per, temperature)[None, :, :].repeat(h, 1, 1)
    return torch.cat([ey, ex], -1).reshape(h * w, d_model)


class OracleMHA(nn.Module):
    """torch nn.MultiheadAttention parameter layout (in_proj_weight /
    in_proj_bias / out_proj) with an explicit forward."""

    def __init__(self, d, heads):
        super().__init__()
        self.in_proj_weight = nn.Parameter(torch.zeros(3 * d, d))
        self.in_proj_bias = nn.Parameter(torch.zeros(3 * d))
        self.out_proj = nn.Linear(d, d)
        self.heads = heads

    def forward(self, q, k, v, attn_mask=None, key_padding_mask=None):
        """attn_mask [B,S,S] bool True=allowed; key_padding_mask [B,Sk]
        bool True=valid."""
        d = q.shape[-1]
        hd = d // self.heads
        b, sq, _ = q.shape
        sk = k.shape[1]
        wq, wk, wv = self.in_proj_weight.split(d)
        bq, bk, bv = self.in_proj_bias.split(d)
        qq = (q @ wq.T + bq).view(b, sq, self.heads, hd)
        kk = (k @ wk.T + bk).view(b, sk, self.heads, hd)
        vv = (v @ wv.T + bv).view(b, sk, self.heads, hd)
        logits = torch.einsum("bqhc,bkhc->bhqk", qq, kk) / np.sqrt(hd)
        if attn_mask is not None:
            logits = logits.masked_fill(~attn_mask[:, None], -1e9)
        if key_padding_mask is not None:
            logits = logits.masked_fill(
                ~key_padding_mask[:, None, None, :], -1e9)
        attn = logits.softmax(-1)
        out = torch.einsum("bhqk,bkhc->bqhc", attn, vv).reshape(b, sq, d)
        return self.out_proj(out)


class OracleMSDeformAttn(nn.Module):
    def __init__(self, d, heads, levels, points):
        super().__init__()
        self.sampling_offsets = nn.Linear(d, heads * levels * points * 2)
        self.attention_weights = nn.Linear(d, heads * levels * points)
        self.value_proj = nn.Linear(d, d)
        self.output_proj = nn.Linear(d, d)
        self.heads, self.levels, self.points = heads, levels, points

    def forward(self, query, ref, value, shapes):
        """query [B,Q,D]; ref [B,Q,2|4] in [0,1]; value [B,S,D]."""
        b, q, d = query.shape
        H, L, P = self.heads, self.levels, self.points
        hd = d // H
        v = self.value_proj(value).view(b, -1, H, hd)
        off = self.sampling_offsets(query).view(b, q, H, L, P, 2)
        w = self.attention_weights(query).view(b, q, H, L * P)
        w = w.softmax(-1).view(b, q, H, L, P)
        if ref.shape[-1] == 2:
            normalizer = torch.tensor([[wd, ht] for (ht, wd) in shapes],
                                      dtype=torch.float32)
            loc = (ref[:, :, None, None, None, :]
                   + off / normalizer[None, None, None, :, None, :])
        else:
            loc = (ref[:, :, None, None, None, :2]
                   + off / P * ref[:, :, None, None, None, 2:] * 0.5)
        # published multi_scale_deformable_attn_pytorch (grid_sample,
        # align_corners=False, zero padding)
        grids = 2 * loc - 1
        start = 0
        sampled = []
        for lvl, (ht, wd) in enumerate(shapes):
            vl = v[:, start:start + ht * wd].permute(0, 2, 3, 1).reshape(
                b * H, hd, ht, wd)
            g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
                b * H, q, P, 2)
            s = F.grid_sample(vl, g, mode="bilinear",
                              padding_mode="zeros", align_corners=False)
            sampled.append(s)                       # [B*H, hd, Q, P]
            start += ht * wd
        sampled = torch.stack(sampled, dim=-2)      # [B*H, hd, Q, L, P]
        wf = w.permute(0, 2, 1, 3, 4).reshape(b * H, 1, q, L * P)
        out = (sampled.flatten(-2) * wf).sum(-1)    # [B*H, hd, Q]
        out = out.view(b, H * hd, q).transpose(1, 2)
        return self.output_proj(out)


class OracleBiAttention(nn.Module):
    """BiAttentionBlock: pre-LN, BiMultiHeadAttention (clamped logits,
    scale on the v query), layer-scale residuals added to the NORMED
    inputs."""

    def __init__(self, d, embed_dim, heads):
        super().__init__()
        self.layer_norm_v = nn.LayerNorm(d)
        self.layer_norm_l = nn.LayerNorm(d)
        attn = nn.Module()
        attn.v_proj = nn.Linear(d, embed_dim)
        attn.l_proj = nn.Linear(d, embed_dim)
        attn.values_v_proj = nn.Linear(d, embed_dim)
        attn.values_l_proj = nn.Linear(d, embed_dim)
        attn.out_v_proj = nn.Linear(embed_dim, d)
        attn.out_l_proj = nn.Linear(embed_dim, d)
        self.attn = attn
        self.gamma_v = nn.Parameter(torch.full((d,), 1e-4))
        self.gamma_l = nn.Parameter(torch.full((d,), 1e-4))
        self.heads, self.embed_dim = heads, embed_dim

    def forward(self, vis, txt, txt_valid):
        vn = self.layer_norm_v(vis)
        ln = self.layer_norm_l(txt)
        e, H = self.embed_dim, self.heads
        hd = e // H
        b, sv, _ = vn.shape
        sl = ln.shape[1]
        qv = (self.attn.v_proj(vn) / np.sqrt(hd)).view(b, sv, H, hd)
        kl = self.attn.l_proj(ln).view(b, sl, H, hd)
        valv = self.attn.values_v_proj(vn).view(b, sv, H, hd)
        vall = self.attn.values_l_proj(ln).view(b, sl, H, hd)
        logits = torch.einsum("bvhc,blhc->bhvl", qv, kl)
        logits = logits.clamp(min=-50000.0, max=50000.0)
        attn_v = logits.masked_fill(
            ~txt_valid[:, None, None, :], float("-inf")).softmax(-1)
        attn_l = logits.softmax(2)
        out_v = torch.einsum("bhvl,blhc->bvhc", attn_v, vall).reshape(
            b, sv, e)
        out_l = torch.einsum("bhvl,bvhc->blhc", attn_l, valv).reshape(
            b, sl, e)
        vis = vn + self.gamma_v * self.attn.out_v_proj(out_v)
        txt = ln + self.gamma_l * self.attn.out_l_proj(out_l)
        return vis, txt


class OracleTextLayer(nn.Module):
    """Post-LN TransformerEncoderLayer over text tokens (pos added to q/k
    only, block attn mask)."""

    def __init__(self, d, heads, ffn):
        super().__init__()
        self.self_attn = OracleMHA(d, heads)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, txt, attn_mask, pos):
        q = txt + pos
        h = self.self_attn(q, q, txt, attn_mask=attn_mask)
        txt = self.norm1(txt + h)
        h = self.linear2(F.relu(self.linear1(txt)))
        return self.norm2(txt + h)


class OracleDeformEncoderLayer(nn.Module):
    def __init__(self, d, heads, levels, points, ffn):
        super().__init__()
        self.self_attn = OracleMSDeformAttn(d, heads, levels, points)
        self.norm1 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src, pos, ref, shapes):
        h = self.self_attn(src + pos, ref, src, shapes)
        src = self.norm1(src + h)
        h = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + h)


class OracleDecoderLayer(nn.Module):
    def __init__(self, d, heads, levels, points, ffn):
        super().__init__()
        self.cross_attn = OracleMSDeformAttn(d, heads, levels, points)
        self.norm1 = nn.LayerNorm(d)
        self.ca_text = OracleMHA(d, heads)
        self.catext_norm = nn.LayerNorm(d)
        self.self_attn = OracleMHA(d, heads)
        self.norm2 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ffn)
        self.linear2 = nn.Linear(ffn, d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, query_pos, ref, memory, shapes, txt, txt_valid):
        q = tgt + query_pos
        tgt = self.norm2(tgt + self.self_attn(q, q, tgt))
        tgt = self.catext_norm(tgt + self.ca_text(
            tgt + query_pos, txt, txt, key_padding_mask=txt_valid))
        tgt = self.norm1(tgt + self.cross_attn(
            tgt + query_pos, ref, memory, shapes))
        h = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + h)


class OracleMLP(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])

    def forward(self, x):
        for i, lin in enumerate(self.layers):
            x = lin(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class OracleGroundingDino(nn.Module):
    """Assembled graph at an arbitrary (tiny) config mirroring
    GroundingDinoConfig. Input image is NCHW, already normalized."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        sw = cfg.swin
        bt = cfg.bert
        d = cfg.d_model
        self.backbone = nn.ModuleList([OracleSwin(
            embed_dim=sw.embed_dim, depths=sw.depths, heads=sw.num_heads,
            ws=sw.window_size, patch=sw.patch_size,
            out_indices=sw.out_indices)])
        self.bert = OracleBert(
            vocab=bt.vocab_size, d=bt.hidden_size, layers=bt.num_layers,
            heads=bt.num_heads, inter=bt.intermediate_size,
            max_pos=bt.max_position_embeddings, types=bt.type_vocab_size)
        self.feat_map = nn.Linear(bt.hidden_size, d)
        nlvl = len(sw.out_indices)
        projs = []
        for i in sw.out_indices:
            projs.append(nn.Sequential(
                nn.Conv2d(sw.stage_dim(i), d, 1),
                nn.GroupNorm(min(32, d), d)))
        projs.append(nn.Sequential(
            nn.Conv2d(sw.stage_dim(sw.out_indices[-1]), d, 3, stride=2,
                      padding=1),
            nn.GroupNorm(min(32, d), d)))
        self.input_proj = nn.ModuleList(projs)

        tr = nn.Module()
        tr.level_embed = nn.Parameter(torch.zeros(cfg.num_levels, d))
        tr.tgt_embed = nn.Embedding(cfg.num_queries, d)
        enc = nn.Module()
        enc.layers = nn.ModuleList([
            OracleDeformEncoderLayer(d, cfg.num_heads, cfg.num_levels,
                                     cfg.num_points, cfg.ffn_dim)
            for _ in range(cfg.enc_layers)])
        enc.text_layers = nn.ModuleList([
            OracleTextLayer(d, cfg.text_layer_heads, cfg.text_layer_ffn)
            for _ in range(cfg.enc_layers)])
        enc.fusion_layers = nn.ModuleList([
            OracleBiAttention(d, cfg.fusion_dim, cfg.fusion_heads)
            for _ in range(cfg.enc_layers)])
        tr.encoder = enc
        dec = nn.Module()
        dec.layers = nn.ModuleList([
            OracleDecoderLayer(d, cfg.num_heads, cfg.num_levels,
                               cfg.num_points, cfg.ffn_dim)
            for _ in range(cfg.dec_layers)])
        dec.bbox_embed = nn.ModuleList([
            OracleMLP([d, d, d, 4]) for _ in range(cfg.dec_layers)])
        dec.ref_point_head = OracleMLP([2 * d, d, d])
        dec.norm = nn.LayerNorm(d)
        tr.decoder = dec
        tr.enc_output = nn.Linear(d, d)
        tr.enc_output_norm = nn.LayerNorm(d)
        tr.enc_out_bbox_embed = OracleMLP([d, d, d, 4])
        self.transformer = tr
        self.nlvl_backbone = nlvl

    def forward(self, image, ids, valid):
        cfg = self.cfg
        d = cfg.d_model
        b = image.shape[0]

        attn3d, position_ids = generate_masks_with_special_tokens(
            ids, valid, cfg.special_token_ids)
        hidden, _ = self.bert(ids, attn3d, position_ids=position_ids)
        txt = self.feat_map(hidden)
        st = txt.shape[1]

        feats = self.backbone[0](image)
        raw_levels = [feats[i].permute(0, 3, 1, 2) for i in sorted(feats)]
        xs = [self.input_proj[i](raw_levels[i])
              for i in range(self.nlvl_backbone)]
        xs.append(self.input_proj[self.nlvl_backbone](raw_levels[-1]))
        srcs, shapes, poss = [], [], []
        for i, x in enumerate(xs):
            ht, wd = x.shape[2], x.shape[3]
            shapes.append((ht, wd))
            srcs.append(x.flatten(2).transpose(1, 2))
            poss.append(pos_embed_sine_hw(ht, wd, d)
                        + self.transformer.level_embed[i])
        src = torch.cat(srcs, 1)
        pos = torch.cat(poss, 0)[None]

        refs = []
        for (ht, wd) in shapes:
            gy, gx = torch.meshgrid(
                (torch.arange(ht, dtype=torch.float32) + 0.5) / ht,
                (torch.arange(wd, dtype=torch.float32) + 0.5) / wd,
                indexing="ij")
            refs.append(torch.stack([gx, gy], -1).reshape(ht * wd, 2))
        ref_enc = torch.cat(refs, 0)[None]
        pos_text = get_sine_pos_embed(position_ids.float(), d)

        for i in range(cfg.enc_layers):
            src, txt = self.transformer.encoder.fusion_layers[i](
                src, txt, valid)
            txt = self.transformer.encoder.text_layers[i](
                txt, attn3d, pos_text)
            src = self.transformer.encoder.layers[i](
                src, pos, ref_enc, shapes)

        # gen_encoder_output_proposals + language-guided query selection
        props = []
        for lvl, (ht, wd) in enumerate(shapes):
            gy, gx = torch.meshgrid(
                (torch.arange(ht, dtype=torch.float32) + 0.5) / ht,
                (torch.arange(wd, dtype=torch.float32) + 0.5) / wd,
                indexing="ij")
            wh = torch.full((ht * wd, 2), 0.05 * 2 ** lvl)
            props.append(torch.cat(
                [torch.stack([gx, gy], -1).reshape(ht * wd, 2), wh], -1))
        raw = torch.cat(props, 0)
        prop_valid = ((raw > 0.01) & (raw < 0.99)).all(-1)
        proposals = torch.log(raw / (1 - raw))
        proposals = proposals.masked_fill(
            ~prop_valid[:, None], float("inf"))[None]
        output_memory = src.masked_fill(~prop_valid[None, :, None], 0.0)
        memory = self.transformer.enc_output_norm(
            self.transformer.enc_output(output_memory))
        enc_logits = torch.einsum(
            "bsd,btd->bst", memory,
            txt.masked_fill(~valid[..., None], 0.0))
        enc_scores = enc_logits.masked_fill(
            ~valid[:, None, :], float("-inf")).max(-1)[0]
        topk = enc_scores.topk(cfg.num_queries, dim=1)[1]
        enc_boxes = self.transformer.enc_out_bbox_embed(memory) + proposals
        ref = torch.gather(
            enc_boxes, 1, topk[..., None].repeat(1, 1, 4)).sigmoid()
        ref = ref.detach()

        tgt = self.transformer.tgt_embed.weight[None].repeat(b, 1, 1)
        boxes_out = None
        for i in range(cfg.dec_layers):
            query_pos = self.transformer.decoder.ref_point_head(
                gen_sineembed_for_position(ref, d))
            tgt = self.transformer.decoder.layers[i](
                tgt, query_pos, ref, src, shapes, txt, valid)
            ref_unsig = inverse_sigmoid(ref)
            boxes_out = (self.transformer.decoder.bbox_embed[i](
                self.transformer.decoder.norm(tgt)) + ref_unsig).sigmoid()
            ref = (self.transformer.decoder.bbox_embed[i](tgt)
                   + ref_unsig).sigmoid().detach()

        hs = self.transformer.decoder.norm(tgt)
        logits = torch.einsum("bqd,btd->bqt", hs,
                              txt.masked_fill(~valid[..., None], 0.0))
        logits = logits.masked_fill(~valid[:, None, :], float("-inf"))
        pad = cfg.max_text_len - st
        if pad > 0:
            logits = F.pad(logits, (0, pad), value=float("-inf"))
        return logits[:, :, :cfg.max_text_len], boxes_out

    def state_dict_release(self):
        """Release naming: the module tree already matches (backbone is a
        ModuleList so Swin keys come out as backbone.0.*); add the
        checkpoint's top-level bbox_embed.* aliases of
        transformer.decoder.bbox_embed.* (shared modules in the release
        file)."""
        out = dict(self.state_dict())
        for k, v in self.state_dict().items():
            if k.startswith("transformer.decoder.bbox_embed."):
                out[k[len("transformer.decoder."):]] = v
        return out

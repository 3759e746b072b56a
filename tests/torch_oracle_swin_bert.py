"""Independent torch oracles of the Swin backbone and BERT encoder with
release state-dict naming (the GroundingDINO checkpoint's `backbone.0.*`
and `bert.*` families). Written from the published architectures."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------

class WindowAttention(nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0) + (ws - 1)
        self.register_buffer(
            "relative_position_index",
            rel[..., 0] * (2 * ws - 1) + rel[..., 1])

    def forward(self, x, mask=None):
        nw, n, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(nw, n, 3, self.heads, hd)
        q, k, v = qkv.unbind(2)
        logits = torch.einsum("wqhc,wkhc->whqk", q, k) / np.sqrt(hd)
        bias = self.relative_position_bias_table[
            self.relative_position_index]
        logits = logits + bias.permute(2, 0, 1)[None]
        if mask is not None:
            g = mask.shape[0]
            logits = logits.view(nw // g, g, self.heads, n, n) \
                + mask[None, :, None]
            logits = logits.view(nw, self.heads, n, n)
        attn = logits.softmax(-1)
        out = torch.einsum("whqk,wkhc->wqhc", attn, v).reshape(nw, n, c)
        return self.proj(out)


class SwinBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, heads, ws)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.ModuleDict(dict(
            fc1=nn.Linear(dim, int(dim * mlp_ratio)),
            fc2=nn.Linear(int(dim * mlp_ratio), dim)))
        self.ws, self.shift = ws, shift

    def forward(self, x):
        b, h, w, c = x.shape
        ws = min(self.ws, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        x = self.norm1(x)
        ph, pw = (-h) % ws, (-w) % ws
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
        hp, wp = h + ph, w + pw
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            img = torch.zeros(hp, wp)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for vs in (slice(0, -ws), slice(-ws, -shift),
                           slice(-shift, None)):
                    img[hs, vs] = cnt
                    cnt += 1
            wins = img.view(hp // ws, ws, wp // ws, ws).permute(
                0, 2, 1, 3).reshape(-1, ws * ws)
            mask = (wins[:, :, None] != wins[:, None, :]) * -100.0
        else:
            mask = None
        wins = x.view(b, hp // ws, ws, wp // ws, ws, c).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        wins = self.attn(wins, mask)
        x = wins.view(b, hp // ws, wp // ws, ws, ws, c).permute(
            0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = shortcut + x[:, :h, :w]
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        b, h, w, c = x.shape
        x = F.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        return self.reduction(self.norm(x))


class OracleSwin(nn.Module):
    def __init__(self, embed_dim=16, depths=(1, 1, 2), heads=(2, 2, 2),
                 ws=2, patch=4, out_indices=(0, 1, 2)):
        super().__init__()
        self.patch_embed = nn.ModuleDict(dict(
            proj=nn.Conv2d(3, embed_dim, patch, patch),
            norm=nn.LayerNorm(embed_dim)))
        self.layers = nn.ModuleList()
        self.out_indices = out_indices
        for i, depth in enumerate(depths):
            dim = embed_dim * 2 ** i
            stage = nn.Module()
            stage.blocks = nn.ModuleList([
                SwinBlock(dim, heads[i], ws,
                          0 if j % 2 == 0 else ws // 2)
                for j in range(depth)])
            if i < len(depths) - 1:
                stage.downsample = PatchMerging(dim)
            self.layers.append(stage)
            if i in out_indices:
                setattr(self, f"norm{i}", nn.LayerNorm(dim))
        self.patch = patch

    def forward(self, x):
        x = self.patch_embed["proj"](x).permute(0, 2, 3, 1)
        x = self.patch_embed["norm"](x)
        outs = {}
        for i, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            if i in self.out_indices:
                outs[i] = getattr(self, f"norm{i}")(x)
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
        return outs

    def state_dict_release(self):
        out = {}
        for k, v in self.state_dict().items():
            k = k.replace("patch_embed.proj", "patch_embed.proj")
            out["backbone.0." + k] = v
        return out


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------

class BertLayer(nn.Module):
    def __init__(self, d, heads, inter):
        super().__init__()
        att = nn.Module()
        att.self = nn.Module()
        att.self.query = nn.Linear(d, d)
        att.self.key = nn.Linear(d, d)
        att.self.value = nn.Linear(d, d)
        att.output = nn.Module()
        att.output.dense = nn.Linear(d, d)
        att.output.LayerNorm = nn.LayerNorm(d, eps=1e-12)
        self.attention = att
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(d, inter)
        self.output = nn.Module()
        self.output.dense = nn.Linear(inter, d)
        self.output.LayerNorm = nn.LayerNorm(d, eps=1e-12)
        self.heads = heads

    def forward(self, x, mask):
        b, s, d = x.shape
        hd = d // self.heads
        q = self.attention.self.query(x).view(b, s, self.heads, hd)
        k = self.attention.self.key(x).view(b, s, self.heads, hd)
        v = self.attention.self.value(x).view(b, s, self.heads, hd)
        logits = torch.einsum("bqhc,bkhc->bhqk", q, k) / np.sqrt(hd)
        if mask.dim() == 3:       # pairwise mask (GroundingDINO phrases)
            logits = logits.masked_fill(~mask[:, None, :, :], -1e9)
        else:
            logits = logits.masked_fill(~mask[:, None, None, :], -1e9)
        out = torch.einsum("bhqk,bkhc->bqhc", logits.softmax(-1),
                           v).reshape(b, s, d)
        x = self.attention.output.LayerNorm(
            x + self.attention.output.dense(out))
        h = self.output.dense(F.gelu(self.intermediate.dense(x)))
        return self.output.LayerNorm(x + h)


class OracleBert(nn.Module):
    def __init__(self, vocab=128, d=32, layers=2, heads=2, inter=64,
                 max_pos=64, types=2):
        super().__init__()
        emb = nn.Module()
        emb.word_embeddings = nn.Embedding(vocab, d)
        emb.position_embeddings = nn.Embedding(max_pos, d)
        emb.token_type_embeddings = nn.Embedding(types, d)
        emb.LayerNorm = nn.LayerNorm(d, eps=1e-12)
        self.embeddings = emb
        enc = nn.Module()
        enc.layer = nn.ModuleList(
            [BertLayer(d, heads, inter) for _ in range(layers)])
        self.encoder = enc
        self.pooler = nn.Module()
        self.pooler.dense = nn.Linear(d, d)

    def forward(self, ids, mask, position_ids=None):
        s = ids.shape[1]
        if position_ids is None:
            pos_e = self.embeddings.position_embeddings.weight[:s][None]
        else:
            pos_e = self.embeddings.position_embeddings(position_ids)
        x = (self.embeddings.word_embeddings(ids) + pos_e
             + self.embeddings.token_type_embeddings.weight[0][None, None])
        x = self.embeddings.LayerNorm(x)
        for layer in self.encoder.layer:
            x = layer(x, mask)
        pooled = torch.tanh(self.pooler.dense(x[:, 0]))
        return x, pooled

    def state_dict_release(self):
        return {"bert." + k: v for k, v in self.state_dict().items()}

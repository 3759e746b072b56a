"""Independent torch oracle of ZoeDepth-NK (BEiT backbone + MiDaS DPT +
metric-bins NK head) with the isl-org/ZoeDepth release state-dict naming
(`core.core.pretrained.model.blocks.{i}.attn.qkv.weight`,
`core.core.scratch.refinenet1.resConfUnit1.conv1.weight`,
`seed_bin_regressors.nyu._net.0.weight`, ...).

Clean-room test-support code mirroring the semantics of
diffusionhandles_tpu/models/{beit,zoedepth}.py to prove the converter
(models/weights_zoedepth.py) + flax graph compute the same function
(reference dependency being reproduced: test/estimate_depth.py:18-30).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def rel_pos_index(grid: int) -> torch.Tensor:
    g = grid
    num_rel = (2 * g - 1) * (2 * g - 1)
    coords = np.stack(np.meshgrid(np.arange(g), np.arange(g),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += g - 1
    rel[..., 1] += g - 1
    rel[..., 0] *= 2 * g - 1
    idx = np.zeros((g * g + 1, g * g + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel + 1
    idx[0:, 0] = num_rel + 2
    idx[0, 0] = num_rel
    return torch.from_numpy(idx)


class BEiTAttention(nn.Module):
    def __init__(self, dim, heads, grid):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        num_rel = (2 * grid - 1) * (2 * grid - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_rel, heads))
        self.register_buffer("relative_position_index", rel_pos_index(grid))
        self.proj = nn.Linear(dim, dim)
        self.heads, self.head_dim = heads, dim // heads

    def forward(self, x):
        b, s, d = x.shape
        qkv_bias = torch.cat([self.q_bias,
                              torch.zeros_like(self.v_bias), self.v_bias])
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, s, self.heads, self.head_dim)
        k = k.view(b, s, self.heads, self.head_dim)
        v = v.view(b, s, self.heads, self.head_dim)
        bias = self.relative_position_bias_table[
            self.relative_position_index]          # [S, S, heads]
        bias = bias.permute(2, 0, 1)[None]
        logits = torch.einsum("bqhd,bkhd->bhqk",
                              q * self.head_dim ** -0.5, k) + bias
        probs = logits.softmax(-1)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.proj(out)


class BEiTBlock(nn.Module):
    def __init__(self, dim, heads, grid, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = BEiTAttention(dim, heads, grid)
        self.gamma_1 = nn.Parameter(torch.ones(dim))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.gamma_2 = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.gamma_2 * h


class ResidualConvUnit(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        h = self.conv2(F.relu(h))
        return x + h


class FeatureFusionBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(ch)
        self.resConfUnit2 = ResidualConvUnit(ch)
        self.out_conv = nn.Conv2d(ch, ch, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2.0, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


@dataclass
class OracleBEiTConfig:
    image_size: int = 64
    patch_size: int = 16
    embed_dim: int = 32
    num_layers: int = 4
    num_heads: int = 2
    hooks: Tuple[int, ...] = (0, 1, 2, 3)
    reassemble_channels: Tuple[int, ...] = (8, 16, 32, 32)
    fusion_channels: int = 16
    midas_out_channels: int = 8

    @property
    def grid(self):
        return self.image_size // self.patch_size


class OracleMidasDPT(nn.Module):
    """DPTDepthModel naming: pretrained.model.*, pretrained.act_postprocess*,
    scratch.*"""

    def __init__(self, cfg: OracleBEiTConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.embed_dim
        g = cfg.grid
        pre = nn.Module()
        pre.model = nn.Module()
        pre.model.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        pre.model.patch_embed = nn.Module()
        pre.model.patch_embed.proj = nn.Conv2d(3, d, cfg.patch_size,
                                               stride=cfg.patch_size)
        pre.model.blocks = nn.ModuleList(
            [BEiTBlock(d, cfg.num_heads, g) for _ in range(cfg.num_layers)])
        for level, out_ch in enumerate(cfg.reassemble_channels):
            post = nn.Sequential()
            readout = nn.Module()
            readout.project = nn.Sequential(nn.Linear(2 * d, d), nn.GELU())
            post.add_module("0", readout)
            post.add_module("1", nn.Identity())  # Transpose
            post.add_module("2", nn.Identity())  # Unflatten
            post.add_module("3", nn.Conv2d(d, out_ch, 1))
            if level == 0:
                post.add_module("4", nn.ConvTranspose2d(out_ch, out_ch, 4,
                                                        stride=4))
            elif level == 1:
                post.add_module("4", nn.ConvTranspose2d(out_ch, out_ch, 2,
                                                        stride=2))
            elif level == 3:
                post.add_module("4", nn.Conv2d(out_ch, out_ch, 3, stride=2,
                                               padding=1))
            setattr(pre, f"act_postprocess{level + 1}", post)
        self.pretrained = pre

        fc = cfg.fusion_channels
        scratch = nn.Module()
        for i, out_ch in enumerate(cfg.reassemble_channels):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(out_ch, fc, 3, padding=1, bias=False))
        scratch.refinenet1 = FeatureFusionBlock(fc)
        scratch.refinenet2 = FeatureFusionBlock(fc)
        scratch.refinenet3 = FeatureFusionBlock(fc)
        scratch.refinenet4 = FeatureFusionBlock(fc)
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(fc, fc // 2, 3, padding=1),
            nn.Identity(),  # Interpolate x2
            nn.Conv2d(fc // 2, cfg.midas_out_channels, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(cfg.midas_out_channels, 1, 1),
            nn.ReLU())
        self.scratch = scratch

    def forward(self, x):
        cfg = self.cfg
        g = cfg.grid
        b = x.shape[0]
        t = self.pretrained.model.patch_embed.proj(x)
        tokens = t.flatten(2).transpose(1, 2)
        cls = self.pretrained.model.cls_token.expand(b, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1)
        hooks = []
        for i, blk in enumerate(self.pretrained.model.blocks):
            tokens = blk(tokens)
            if i in cfg.hooks:
                hooks.append(tokens)
        feats = []
        for level, tok in enumerate(hooks):
            post = getattr(self.pretrained, f"act_postprocess{level + 1}")
            cls_t = tok[:, :1].expand(-1, tok.shape[1] - 1, -1)
            h = post[0].project(torch.cat([tok[:, 1:], cls_t], dim=-1))
            h = h.transpose(1, 2).reshape(b, cfg.embed_dim, g, g)
            h = post[3](h)
            if level in (0, 1, 3):
                h = post[4](h)
            feats.append(h)
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(feats[i])
              for i in range(4)]
        path4 = self.scratch.refinenet4(rn[3])
        path3 = self.scratch.refinenet3(path4, rn[2])
        path2 = self.scratch.refinenet2(path3, rn[1])
        path1 = self.scratch.refinenet1(path2, rn[0])
        oc = self.scratch.output_conv
        h = oc[0](path1)
        h = F.interpolate(h, scale_factor=2.0, mode="bilinear",
                          align_corners=True)
        out_feat = F.relu(oc[2](h))
        rel = F.relu(oc[4](out_feat))[:, 0]
        return rel, [out_feat, rn[3], path4, path3, path2, path1]


def conv_mlp(in_ch, mid, out, softplus=False):
    mods = [nn.Conv2d(in_ch, mid, 1), nn.ReLU(), nn.Conv2d(mid, out, 1)]
    if softplus:
        mods.append(nn.Softplus())
    return nn.Sequential(*mods)


class Wrapped(nn.Module):
    """Gives a submodule the release's `._net` attribute name."""

    def __init__(self, net):
        super().__init__()
        self._net = net

    def forward(self, x):
        return self._net(x)


def sinusoidal_positions(n, dim):
    pos = np.arange(n, dtype=np.float32)[:, None]
    i = np.arange(dim // 2, dtype=np.float32)[None, :]
    angle = pos / np.power(10000, 2 * i / dim)
    enc = np.zeros((n, dim), np.float32)
    enc[:, 0::2] = np.sin(angle)
    enc[:, 1::2] = np.cos(angle)
    return torch.from_numpy(enc)


@dataclass
class OracleZoeConfig:
    backbone: OracleBEiTConfig
    bin_names: Tuple[str, ...] = ("nyu", "kitti")
    n_bins: int = 8
    min_depths: Tuple[float, ...] = (1e-3, 1e-3)
    max_depths: Tuple[float, ...] = (10.0, 80.0)
    bin_embedding_dim: int = 16
    bottleneck_features: int = 16
    n_attractors: Tuple[int, ...] = (4, 2, 2, 1)
    attractor_alpha: float = 1e-3
    attractor_gamma: int = 2
    pt_dim: int = 16
    pt_heads: int = 2
    pt_layers: int = 2
    pt_ff: int = 32


class OracleZoeDepthNK(nn.Module):
    def __init__(self, cfg: OracleZoeConfig):
        super().__init__()
        self.cfg = cfg
        core = nn.Module()
        core.core = OracleMidasDPT(cfg.backbone)
        self.core = core
        fc = cfg.backbone.fusion_channels
        self.conv2 = nn.Conv2d(fc, cfg.bottleneck_features, 1)

        pt = nn.Module()
        pt.embedding_convPxP = nn.Conv2d(cfg.bottleneck_features, cfg.pt_dim,
                                         1)
        layer = nn.TransformerEncoderLayer(
            d_model=cfg.pt_dim, nhead=cfg.pt_heads,
            dim_feedforward=cfg.pt_ff, dropout=0.0, activation="relu")
        pt.transformer_encoder = nn.TransformerEncoder(layer, cfg.pt_layers)
        self.patch_transformer = pt
        self.mlp_classifier = nn.Sequential(
            nn.Linear(cfg.pt_dim, cfg.pt_dim), nn.ReLU(),
            nn.Linear(cfg.pt_dim, len(cfg.bin_names)))

        e = cfg.bin_embedding_dim
        self.seed_bin_regressors = nn.ModuleDict({
            name: Wrapped(conv_mlp(cfg.bottleneck_features,
                                   cfg.bottleneck_features, cfg.n_bins,
                                   softplus=True))
            for name in cfg.bin_names})
        self.seed_projector = Wrapped(
            conv_mlp(cfg.bottleneck_features, e, e))
        self.projectors = nn.ModuleList(
            [Wrapped(conv_mlp(fc, e, e)) for _ in range(4)])
        self.attractors = nn.ModuleDict({
            name: nn.ModuleList([
                Wrapped(conv_mlp(e, e, cfg.n_attractors[i], softplus=True))
                for i in range(4)])
            for name in cfg.bin_names})
        self.conditional_log_binomial = nn.ModuleDict({})
        for name in cfg.bin_names:
            m = nn.Module()
            m.mlp = nn.Sequential(
                nn.Conv2d(cfg.backbone.midas_out_channels + e, e, 1),
                nn.GELU(), nn.Conv2d(e, 4, 1), nn.Softplus())
            self.conditional_log_binomial[name] = m

    def _clb(self, name, feats, cond):
        cfg = self.cfg
        h = self.conditional_log_binomial[name].mlp(
            torch.cat([feats, cond], dim=1))
        eps = 1e-4
        p = h[:, 0] / (h[:, 0] + h[:, 1] + eps)
        t = h[:, 2] / (h[:, 2] + h[:, 3] + eps)
        p = p.clamp(eps, 1 - eps)
        t = t.clamp(eps, 1.0).unsqueeze(1)
        n = cfg.n_bins
        k = torch.arange(n, dtype=torch.float32)[None, :, None, None]
        log_comb = (torch.lgamma(torch.tensor(float(n)))
                    - torch.lgamma(k + 1.0)
                    - torch.lgamma(float(n) - k))
        logits = (log_comb + k * torch.log(p).unsqueeze(1)
                  + (n - 1 - k) * torch.log1p(-p).unsqueeze(1))
        return (logits / t).softmax(dim=1)

    def forward(self, x):
        cfg = self.cfg
        rel, feats = self.core.core(x)
        out_feat, btlnck, *x_blocks = feats
        btlnck = self.conv2(btlnck)

        emb = self.patch_transformer.embedding_convPxP(btlnck).flatten(2)
        emb = F.pad(emb, (1, 0))  # zero class token at seq front
        tokens = emb.permute(2, 0, 1)  # [S, B, D] (batch_first=False)
        tokens = tokens + sinusoidal_positions(
            tokens.shape[0], cfg.pt_dim)[:, None, :]
        tokens = self.patch_transformer.transformer_encoder(tokens)
        cls = tokens[0]
        domain_logits = self.mlp_classifier(cls)
        domain_probs = domain_logits.softmax(-1)

        def up(t, size):
            return F.interpolate(t, size=size, mode="bilinear",
                                 align_corners=True)

        depths = []
        for d_idx, name in enumerate(cfg.bin_names):
            b_prev = self.seed_bin_regressors[name](btlnck)
            prev_emb = self.seed_projector(btlnck)
            for i, xb in enumerate(x_blocks):
                e = self.projectors[i](xb)
                e = e + up(prev_emb, e.shape[-2:])
                A = self.attractors[name][i](e)
                bp = up(b_prev, e.shape[-2:])
                delta = A.unsqueeze(2) - bp.unsqueeze(1)  # [B,K,N,h,w]
                dx = delta / (1.0 + cfg.attractor_alpha
                              * delta.abs() ** cfg.attractor_gamma)
                b_prev = bp + dx.mean(dim=1)
                prev_emb = e
            centers = up(b_prev, out_feat.shape[-2:])
            cond = up(prev_emb, out_feat.shape[-2:])
            probs = self._clb(name, out_feat, cond)
            depth = (probs * centers).sum(dim=1)
            depths.append(depth.clamp(cfg.min_depths[d_idx],
                                      cfg.max_depths[d_idx]))
        stacked = torch.stack(depths, dim=0)
        choice = domain_probs.argmax(-1)
        depth = stacked[choice, torch.arange(x.shape[0])]
        return depth, domain_probs, rel

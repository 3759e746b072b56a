"""Independent torch oracle of the HF CLIP vision tower (+projections).

Release state-dict naming (`vision_model.embeddings.*`, `pre_layrnorm`
[the HF spelling], `encoder.layers.N.*`, `post_layernorm`,
`visual_projection.weight`) so converter tests exercise the same key
families a released openai/clip-vit-* checkpoint contains."""

import torch
import torch.nn as nn


def quick_gelu(x):
    return x * torch.sigmoid(1.702 * x)


class VisionLayer(nn.Module):
    def __init__(self, d, heads, mlp_dim):
        super().__init__()
        self.self_attn = nn.Module()
        self.self_attn.q_proj = nn.Linear(d, d)
        self.self_attn.k_proj = nn.Linear(d, d)
        self.self_attn.v_proj = nn.Linear(d, d)
        self.self_attn.out_proj = nn.Linear(d, d)
        self.layer_norm1 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, mlp_dim)
        self.mlp.fc2 = nn.Linear(mlp_dim, d)
        self.layer_norm2 = nn.LayerNorm(d)
        self.heads = heads
        self.head_dim = d // heads

    def forward(self, x):
        h = self.layer_norm1(x)
        b, s, d = h.shape
        q = self.self_attn.q_proj(h).view(b, s, self.heads, self.head_dim)
        k = self.self_attn.k_proj(h).view(b, s, self.heads, self.head_dim)
        v = self.self_attn.v_proj(h).view(b, s, self.heads, self.head_dim)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) \
            * (self.head_dim ** -0.5)
        out = torch.einsum("bhqk,bkhd->bqhd", logits.softmax(-1), v)
        x = x + self.self_attn.out_proj(out.reshape(b, s, d))
        h = self.layer_norm2(x)
        return x + self.mlp.fc2(quick_gelu(self.mlp.fc1(h)))


class OracleCLIPVision(nn.Module):
    def __init__(self, image_size=32, patch_size=8, d=32, layers=2,
                 heads=2, proj=32, mlp_ratio=4):
        super().__init__()
        n = image_size // patch_size
        self.embeddings = nn.Module()
        self.embeddings.class_embedding = nn.Parameter(torch.randn(d))
        self.embeddings.patch_embedding = nn.Conv2d(3, d, patch_size,
                                                    patch_size, bias=False)
        self.embeddings.position_embedding = nn.Embedding(n * n + 1, d)
        self.pre_layrnorm = nn.LayerNorm(d)   # the HF spelling
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [VisionLayer(d, heads, d * mlp_ratio) for _ in range(layers)])
        self.post_layernorm = nn.LayerNorm(d)
        self.n = n
        self.d = d

    def forward(self, x):
        """x: normalized NCHW -> (tokens post-ln [B, 1+n^2, D])."""
        b = x.shape[0]
        patches = self.embeddings.patch_embedding(x)
        patches = patches.flatten(2).transpose(1, 2)     # [B, n^2, D]
        cls = self.embeddings.class_embedding.expand(b, 1, self.d)
        tok = torch.cat([cls, patches], dim=1)
        tok = tok + self.embeddings.position_embedding.weight[None]
        tok = self.pre_layrnorm(tok)
        for layer in self.encoder.layers:
            tok = layer(tok)
        return self.post_layernorm(tok)

    def state_dict_prefixed(self):
        return {"vision_model." + k: v for k, v in self.state_dict().items()}

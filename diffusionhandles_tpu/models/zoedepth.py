"""ZoeDepth-NK metric depth estimation in Flax (real published graph).

Fills the role of the reference's ZoeDepth dependency (reference:
test/estimate_depth.py:11-32 builds the `zoedepth_nk` model and calls
`model.infer(img)`; webapp/webapps/zoe_depth_webapp.py:21-47 serves it).

Round 1 shipped a generic DPT+fixed-log-bins stand-in; this is the actual
ZoeDepth-NK architecture so released weights can map:

* MiDaS core = DPT-BEiT-L-384 (models/beit.py): relative depth + the
  multi-scale feature list [out_conv 32ch, l4_rn, r4, r3, r2, r1].
* A patch-transformer router on the bottleneck (1x1-conv embedding +
  sinusoidal positions + 4-layer post-norm transformer encoder with a class
  token) feeding an MLP classifier that picks the domain head
  (N=indoor/nyu, K=outdoor/kitti). TPU-static: both heads run and the
  routed result is selected by the classifier (soft or hard).
* Per domain: softplus seed-bin regressor at the bottleneck, then one
  inverse-attractor layer per decoder scale (attractor points pull bin
  centers, dx = mean_k (a_k - b) / (1 + alpha |a_k - b|^gamma)), and a
  conditional log-binomial distribution over the final bin centers
  conditioned on the 32-ch MiDaS output features.

Parameter naming follows the isl-org/ZoeDepth release (prefixes
`core.core.*` for the MiDaS model, `patch_transformer.*`,
`mlp_classifier.*`, `seed_bin_regressors.{domain}`, `projectors.{i}`,
`attractors.{domain}_{i}`, `conditional_log_binomial.{domain}`) via
models/weights_zoedepth.py; see PARITY.md for the validation scope.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.models.beit import (BEiTConfig, MidasDPT,
                                              tiny_beit_config)
from diffusionhandles_tpu.ops.resize import resize_nhwc


@dataclasses.dataclass(frozen=True)
class BinConf:
    name: str
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0


@dataclasses.dataclass(frozen=True)
class ZoeDepthConfig:
    """zoedepth_nk defaults (isl-org/ZoeDepth zoedepth_nk config)."""

    backbone: BEiTConfig = dataclasses.field(default_factory=BEiTConfig)
    bin_confs: Tuple[BinConf, ...] = (
        BinConf("nyu", 64, 1e-3, 10.0),
        BinConf("kitti", 64, 1e-3, 80.0))
    bin_embedding_dim: int = 128
    bottleneck_features: int = 256
    n_attractors: Tuple[int, ...] = (16, 8, 4, 1)
    attractor_alpha: float = 1e-3
    attractor_gamma: int = 2
    patch_transformer_dim: int = 128
    patch_transformer_heads: int = 4
    patch_transformer_layers: int = 4
    patch_transformer_ff: int = 1024
    # soft routing mixes both domain heads by classifier probability; hard
    # routing (the release behavior) picks the argmax domain.
    soft_routing: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def min_depth(self) -> float:
        return min(bc.min_depth for bc in self.bin_confs)

    @property
    def max_depth(self) -> float:
        return max(bc.max_depth for bc in self.bin_confs)


def sinusoidal_positions(n: int, dim: int) -> np.ndarray:
    """ZoeDepth PatchTransformerEncoder positional encoding."""
    pos = np.arange(n, dtype=np.float32)[:, None]
    i = np.arange(dim // 2, dtype=np.float32)[None, :]
    angle = pos / np.power(10000, 2 * i / dim)
    enc = np.zeros((n, dim), np.float32)
    enc[:, 0::2] = np.sin(angle)
    enc[:, 1::2] = np.cos(angle)
    return enc


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer semantics (post-norm, relu FF)."""

    dim: int
    heads: int
    ff_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        hd = d // self.heads
        b, s, _ = x.shape
        # torch MultiheadAttention: single packed in_proj, out_proj.
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.heads, hd)
        k = k.reshape(b, s, self.heads, hd)
        v = v.reshape(b, s, self.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) \
            * (hd ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        attn = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                         name="norm1")(x + attn)
        h = nn.Dense(self.ff_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                            name="norm2")(x + h)


class PatchTransformerEncoder(nn.Module):
    """1x1-conv patch embedding + positions + transformer, with class token
    (prepended zero embedding, ZoeDepth use_class_token=True)."""

    config: ZoeDepthConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.patch_transformer_dim
        b, h, w, _ = x.shape
        emb = nn.Conv(d, (1, 1), dtype=cfg.dtype,
                      param_dtype=cfg.param_dtype,
                      name="embedding_convPxP")(x)
        tokens = emb.reshape(b, h * w, d)
        # class token = zero-padding the sequence front (release behavior)
        tokens = jnp.concatenate(
            [jnp.zeros((b, 1, d), tokens.dtype), tokens], axis=1)
        pos = jnp.asarray(sinusoidal_positions(tokens.shape[1], d),
                          tokens.dtype)
        tokens = tokens + pos[None]
        for i in range(cfg.patch_transformer_layers):
            tokens = TransformerEncoderLayer(
                d, cfg.patch_transformer_heads, cfg.patch_transformer_ff,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                name=f"layers_{i}")(tokens)
        return tokens


class ConvMLP(nn.Module):
    """Conv1x1 -> ReLU -> Conv1x1 (+ optional softplus): the Projector /
    SeedBinRegressorUnnormed / attractor-net building block."""

    mid: int
    out: int
    softplus: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mid, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.out, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        return nn.softplus(h) if self.softplus else h


class AttractorLayerUnnormed(nn.Module):
    """Inverse attractor over unnormalized (softplus) bin centers:
    b_new = b + mean_k (a_k - b) / (1 + alpha |a_k - b|^gamma)."""

    config: ZoeDepthConfig
    n_attractors: int

    @nn.compact
    def __call__(self, b_embedding, b_prev, prev_b_embedding):
        cfg = self.config
        if prev_b_embedding is not None:
            prev = resize_nhwc(prev_b_embedding,
                               b_embedding.shape[1:3], "bilinear_ac")
            b_embedding = b_embedding + prev
        attractors = ConvMLP(cfg.bin_embedding_dim, self.n_attractors,
                             softplus=True, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype,
                             name="_net")(b_embedding)  # [B,h,w,K]
        b_prev = resize_nhwc(b_prev, b_embedding.shape[1:3], "bilinear_ac")
        delta = attractors[..., None] - b_prev[..., None, :]  # [B,h,w,K,N]
        dx = delta / (1.0 + cfg.attractor_alpha
                      * jnp.abs(delta) ** cfg.attractor_gamma)
        b_new = b_prev + jnp.mean(dx, axis=-2)
        return b_new, b_embedding


class ConditionalLogBinomial(nn.Module):
    """Per-pixel log-binomial distribution over n_bins classes whose p and
    temperature come from a conv-MLP on [features, bin embedding]."""

    config: ZoeDepthConfig
    n_bins: int
    p_eps: float = 1e-4

    @nn.compact
    def __call__(self, feats, condition):
        cfg = self.config
        x = jnp.concatenate([feats, condition], axis=-1)
        h = nn.Conv(cfg.bin_embedding_dim, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="mlp_conv1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(4, (1, 1), dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="mlp_conv2")(h)
        h = nn.softplus(h)
        p = h[..., 0] / (h[..., 0] + h[..., 1] + self.p_eps)
        t = h[..., 2] / (h[..., 2] + h[..., 3] + self.p_eps)
        p = jnp.clip(p, self.p_eps, 1.0 - self.p_eps)
        t = jnp.clip(t, self.p_eps, 1.0)[..., None]
        n = self.n_bins
        k = jnp.arange(n, dtype=jnp.float32)
        # log C(n-1, k) + k log p + (n-1-k) log (1-p), tempered softmax
        log_comb = (jax.lax.lgamma(jnp.float32(n))
                    - jax.lax.lgamma(k + 1.0)
                    - jax.lax.lgamma(jnp.float32(n) - k))
        logits = (log_comb[None, None, None]
                  + k * jnp.log(p)[..., None]
                  + (n - 1 - k) * jnp.log1p(-p)[..., None])
        return jax.nn.softmax(logits / t, axis=-1)


class ZoeDepthNK(nn.Module):
    """[B, H, W, 3] ImageNet-normalized -> (metric depth [B, H', W'],
    domain probabilities [B, n_domains], relative depth)."""

    config: ZoeDepthConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        rel_depth, feats = MidasDPT(cfg.backbone, name="core")(x)
        out_conv_feat, btlnck, *x_blocks = feats

        btlnck = nn.Conv(cfg.bottleneck_features, (1, 1), dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="conv2")(btlnck)

        # domain router
        tokens = PatchTransformerEncoder(
            cfg, name="patch_transformer")(btlnck)
        cls = tokens[:, 0]
        h = nn.Dense(cfg.patch_transformer_dim, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="mlp_classifier_0")(
                         cls)
        h = nn.relu(h)
        domain_logits = nn.Dense(len(cfg.bin_confs), dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype,
                                 name="mlp_classifier_2")(h)
        domain_probs = jax.nn.softmax(domain_logits, axis=-1)

        seed_projector = ConvMLP(cfg.bin_embedding_dim,
                                 cfg.bin_embedding_dim, dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype,
                                 name="seed_projector")
        projectors = [ConvMLP(cfg.bin_embedding_dim, cfg.bin_embedding_dim,
                              dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                              name=f"projectors_{i}")
                      for i in range(len(x_blocks))]

        depths = []
        for bc in cfg.bin_confs:
            # softplus seed bins at the bottleneck (SeedBinRegressorUnnormed)
            b_prev = ConvMLP(cfg.bottleneck_features, bc.n_bins,
                             softplus=True, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype,
                             name=f"seed_bin_regressors_{bc.name}")(btlnck)
            prev_emb = seed_projector(btlnck)
            for i, xb in enumerate(x_blocks):
                emb = projectors[i](xb)
                b_prev, prev_emb = AttractorLayerUnnormed(
                    cfg, cfg.n_attractors[i],
                    name=f"attractors_{bc.name}_{i}")(emb, b_prev, prev_emb)
            centers = resize_nhwc(b_prev, out_conv_feat.shape[1:3],
                                  "bilinear_ac")
            cond = resize_nhwc(prev_emb, out_conv_feat.shape[1:3],
                               "bilinear_ac")
            probs = ConditionalLogBinomial(
                cfg, bc.n_bins,
                name=f"conditional_log_binomial_{bc.name}")(out_conv_feat,
                                                            cond)
            depth = jnp.sum(probs * centers, axis=-1)
            depths.append(jnp.clip(depth, bc.min_depth, bc.max_depth))

        stacked = jnp.stack(depths, axis=0)  # [D, B, H, W]
        if cfg.soft_routing:
            depth = jnp.einsum("dbhw,bd->bhw", stacked, domain_probs)
        else:
            # hard routing (release behavior), static-shape select
            choice = jnp.argmax(domain_probs, axis=-1)  # [B]
            depth = jnp.take_along_axis(
                jnp.moveaxis(stacked, 0, 1), choice[:, None, None, None],
                axis=1)[:, 0]
        return depth, domain_probs, rel_depth


class ZoeDepthModel(nn.Module):
    """infer() parity wrapper: [B, H, W, 3] in [0,1] -> metric depth
    [B, H, W] at the input resolution (resize + ImageNet normalization +
    horizontal-flip averaging, reference zoedepth model.infer)."""

    config: ZoeDepthConfig
    flip_aug: bool = True

    @nn.compact
    def __call__(self, img):
        cfg = self.config
        bb = cfg.backbone
        x = resize_nhwc(img.astype(jnp.float32),
                        (bb.image_size, bb.image_size), "bilinear_ac")
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        x = (x - mean) / std
        core = ZoeDepthNK(cfg, name="nk")
        if self.flip_aug:
            both = jnp.concatenate([x, x[:, :, ::-1]], axis=0)
            d, _, _ = core(both)
            b = img.shape[0]
            depth = 0.5 * (d[:b] + d[b:, :, ::-1])
        else:
            depth, _, _ = core(x)
        h, w = img.shape[1], img.shape[2]
        depth = resize_nhwc(depth[..., None], (h, w), "bilinear_ac")[..., 0]
        return jnp.clip(depth, cfg.min_depth, cfg.max_depth)


class DepthEstimator:
    """Service-level interface (parity with the reference's depth-estimator
    service contract, webapp/webapps/depth_estimator_webapp.py)."""

    def estimate_depth(self, img: np.ndarray) -> np.ndarray:
        """img [1, 3, H, W] in [0,1] -> depth [1, 1, H, W] (metric)."""
        raise NotImplementedError


class ZoeDepthEstimator(DepthEstimator):
    def __init__(self, config: ZoeDepthConfig = None, params=None,
                 seed: int = 0, checkpoint_path: str = None):
        self.config = config or ZoeDepthConfig()
        self.model = ZoeDepthModel(self.config)
        if params is None and checkpoint_path is not None:
            from diffusionhandles_tpu.models.weights_zoedepth import \
                load_zoedepth_checkpoint
            params = load_zoedepth_checkpoint(checkpoint_path, self.config)
        if params is None:
            img = jnp.zeros((1, 32, 32, 3), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), img)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def estimate_depth(self, img: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.moveaxis(np.asarray(img, np.float32), -3, -1))
        depth = self._apply(self.params, x)
        return np.asarray(depth)[:, None]


def tiny_zoedepth_config(**overrides) -> ZoeDepthConfig:
    base = dict(
        backbone=tiny_beit_config(),
        bin_confs=(BinConf("nyu", 8, 1e-3, 10.0),
                   BinConf("kitti", 8, 1e-3, 80.0)),
        bin_embedding_dim=16,
        bottleneck_features=16,
        n_attractors=(4, 2, 2, 1),
        patch_transformer_dim=16,
        patch_transformer_heads=2,
        patch_transformer_layers=2,
        patch_transformer_ff=32,
    )
    base.update(overrides)
    return ZoeDepthConfig(**base)

"""CLIP text encoder (OpenCLIP ViT-H text tower, as used by SD-2) in Flax.

Replaces the reference's `transformers.CLIPTextModel`
(reference: diffhandles/guided_stable_diffuser.py:35,93-108): prompts are
encoded to [B, 77, 1024] last-hidden-state embeddings with a causal mask and
final layer norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """Defaults match stabilityai/stable-diffusion-2(-depth) text_encoder."""

    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_heads: int = 16
    num_layers: int = 23
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # SD2 uses exact gelu; SD1 uses quick_gelu
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(f"Unknown activation {name}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        d = cfg.hidden_size
        head_dim = d // cfg.num_heads
        dense = lambda name: nn.Dense(d, dtype=cfg.dtype,
                                      param_dtype=cfg.param_dtype, name=name)
        b, s, _ = x.shape
        q = dense("q_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(b, s, cfg.num_heads, head_dim)
        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return dense("out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype, name=name)
        x = x + CLIPAttention(cfg, name="self_attn")(ln("layer_norm1")(x),
                                                     causal_mask)
        h = ln("layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids):
        """input_ids [B, 77] -> last_hidden_state [B, 77, hidden]."""
        cfg = self.config
        s = input_ids.shape[-1]
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size), cfg.param_dtype)
        x = tok + pos[None, :s, :].astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype,
                         name="final_layer_norm")(x)
        return x


def init_clip_params(config: CLIPTextConfig, seed: int = 0):
    model = CLIPTextEncoder(config)
    ids = jnp.zeros((1, config.max_position_embeddings), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), ids)
    return model, params


def tiny_clip_config(**overrides) -> CLIPTextConfig:
    base = dict(vocab_size=1024, hidden_size=32, intermediate_size=64,
                num_heads=2, num_layers=2)
    base.update(overrides)
    return CLIPTextConfig(**base)

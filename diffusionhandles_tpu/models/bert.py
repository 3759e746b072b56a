"""BERT text encoder in Flax + a WordPiece tokenizer — release-convertible.

GroundingDINO's text tower is bert-base-uncased (the text-grounding stage
inside the reference's LangSAM dependency, reference:
test/estimate_foreground.py:6). Published graph: word + position +
token-type embeddings with LayerNorm, post-LN transformer layers
(attention.output / intermediate / output naming), and a tanh pooler.

Module names mirror the HF state dict so the conversion
(models/weights_gdino.py) is a transparent 1:1 mapping.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522              # bert-base-uncased
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    param_dtype: Any = jnp.float32


def tiny_bert_config(**overrides) -> BertConfig:
    base = dict(vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
                intermediate_size=64, max_position_embeddings=64)
    base.update(overrides)
    return BertConfig(**base)


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, attn_mask):
        """attn_mask: [B,S] key-padding mask or [B,S,S] full pairwise mask
        (GroundingDINO feeds BERT its per-phrase block masks)."""
        cfg = self.config
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        b, s, _ = x.shape
        dense = lambda feats, nm: nn.Dense(feats,
                                           param_dtype=cfg.param_dtype,
                                           name=nm)
        q = dense(d, "query")(x).reshape(b, s, cfg.num_heads, hd)
        k = dense(d, "key")(x).reshape(b, s, cfg.num_heads, hd)
        v = dense(d, "value")(x).reshape(b, s, cfg.num_heads, hd)
        logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) / np.sqrt(hd)
        if attn_mask.ndim == 3:
            logits = jnp.where(attn_mask[:, None, :, :], logits, -1e9)
        else:
            logits = jnp.where(attn_mask[:, None, None, :], logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(b, s, d)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         param_dtype=cfg.param_dtype,
                         name="attention_output_LayerNorm")(
            x + dense(d, "attention_output_dense")(out))
        h = dense(cfg.intermediate_size, "intermediate_dense")(x)
        h = dense(d, "output_dense")(nn.gelu(h, approximate=False))
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            param_dtype=cfg.param_dtype,
                            name="output_LayerNorm")(x + h)


class BertModel(nn.Module):
    """input_ids [B, S] + attention_mask ([B, S] padding or [B, S, S]
    pairwise) -> (hidden [B, S, D], pooled [B, D]). `position_ids` [B, S]
    overrides the default arange positions (GroundingDINO resets positions
    per phrase)."""

    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 token_type_ids=None, position_ids=None):
        cfg = self.config
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), bool)
        attention_mask = attention_mask.astype(bool)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        word = self.param("word_embeddings",
                          nn.initializers.normal(0.02),
                          (cfg.vocab_size, cfg.hidden_size),
                          cfg.param_dtype)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         cfg.param_dtype)
        tok_type = self.param("token_type_embeddings",
                              nn.initializers.normal(0.02),
                              (cfg.type_vocab_size, cfg.hidden_size),
                              cfg.param_dtype)
        if position_ids is None:
            pos_e = pos[jnp.arange(s)][None]
        else:
            pos_e = pos[position_ids]
        x = word[input_ids] + pos_e + tok_type[token_type_ids]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         param_dtype=cfg.param_dtype,
                         name="embeddings_LayerNorm")(x)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(x, attention_mask)
        pooled = nn.tanh(nn.Dense(cfg.hidden_size,
                                  param_dtype=cfg.param_dtype,
                                  name="pooler")(x[:, 0]))
        return x, pooled


class WordPieceTokenizer:
    """Greedy-longest-match WordPiece (bert-base-uncased semantics):
    lowercase, punctuation splitting, '##' continuation pieces. Loads a
    real vocab.txt when given; otherwise a deterministic hash fallback
    for CI (loud refusal when a vocab path is expected but missing)."""

    CLS, SEP, UNK, PAD = "[CLS]", "[SEP]", "[UNK]", "[PAD]"

    def __init__(self, vocab_path: Optional[str] = None,
                 vocab_size: int = 30522):
        self.vocab_size = vocab_size
        if vocab_path is not None:
            import pathlib
            p = pathlib.Path(vocab_path)
            if not p.exists():
                raise FileNotFoundError(
                    f"BERT vocab file not found: {vocab_path} — refusing "
                    f"the hash fallback for a real-weight run")
            words = p.read_text(encoding="utf-8").splitlines()
            self.vocab = {w: i for i, w in enumerate(words)}
        else:
            self.vocab = None

    def _ids(self, token: str) -> List[int]:
        if self.vocab is None:
            return [hash(token) % (self.vocab_size - 10) + 10]
        if token in (self.CLS, self.SEP, self.PAD):
            return [self.vocab[token]]
        pieces = []
        start = 0
        while start < len(token):
            end = len(token)
            cur = None
            while start < end:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.vocab.get(self.UNK, 100)]
            pieces.append(self.vocab[cur])
            start = end
        return pieces

    def _basic(self, text: str) -> List[str]:
        out = []
        word = ""
        for ch in text.lower():
            if ch.isalnum():
                word += ch
            else:
                if word:
                    out.append(word)
                    word = ""
                if not ch.isspace():
                    out.append(ch)
        if word:
            out.append(word)
        return out

    def __call__(self, texts: List[str], max_length: int = 64):
        """-> (ids [B, L], attention_mask [B, L]) numpy int32/bool."""
        batch_ids = []
        for t in texts:
            ids = self._ids(self.CLS) if self.vocab else [101]
            for tok in self._basic(t):
                ids.extend(self._ids(tok))
            ids.extend(self._ids(self.SEP) if self.vocab else [102])
            ids = ids[:max_length]
            batch_ids.append(ids)
        L = max_length
        out = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), bool)
        for i, ids in enumerate(batch_ids):
            out[i, :len(ids)] = ids
            mask[i, :len(ids)] = True
        return out, mask

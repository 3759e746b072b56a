"""GroundingDINO torch checkpoint -> Flax parameter conversion.

Maps the released `groundingdino_swint_ogc.pth` state dict (IDEA-Research
naming: backbone.0.* Swin, bert.* HF BERT, feat_map, input_proj,
transformer.{encoder,decoder}.*) onto models/groundingdino.py +
models/swin.py + models/bert.py. The reference consumes GroundingDINO
through LangSAM (reference: test/estimate_foreground.py:6-40).

Validated as an exact bijection against the model's init tree; fails
loudly otherwise (same policy as models/weights.py). The checkpoint's
top-level `bbox_embed.*` keys are aliases of
`transformer.decoder.bbox_embed.*` (shared modules) and are consumed by
checking equality with the decoder copies.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def _d(v):
    return np.transpose(np.asarray(v), (1, 0)).astype(np.float32)


def _c(v):
    return np.transpose(np.asarray(v), (2, 3, 1, 0)).astype(np.float32)


def _put(flat, path: str, leaf, v):
    key = tuple(path.split("/")) + ((leaf,) if leaf else ())
    flat[key] = np.asarray(v, np.float32)


def _ln(flat, path, leaf_name, v):
    _put(flat, path, "scale" if leaf_name == "weight" else "bias", v)


def _map_swin(flat, k: str, v):
    """backbone.0.* -> backbone/* (models/swin.py naming)."""
    if k.startswith("patch_embed.proj."):
        _put(flat, "backbone/patch_embed",
             "kernel" if k.endswith("weight") else "bias",
             _c(v) if k.endswith("weight") else v)
        return True
    if k.startswith("patch_embed.norm."):
        _ln(flat, "backbone/patch_embed_norm", k.split(".")[-1], v)
        return True
    m = re.match(r"norm(\d)\.(weight|bias)$", k)
    if m:
        _ln(flat, f"backbone/out_norm_{m.group(1)}", m.group(2), v)
        return True
    m = re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.+?)\.?(weight|bias)?$",
                 k)
    if m:
        i, j, rest, leaf = m.groups()
        p = f"backbone/layers_{i}_blocks_{j}"
        if rest == "attn.relative_position_bias_table":
            _put(flat, f"{p}/attn", "relative_position_bias_table", v)
        elif rest == "attn.relative_position_index":
            pass  # recomputed statically
        elif rest in ("norm1", "norm2"):
            _ln(flat, f"{p}/{rest}", leaf, v)
        elif rest == "attn.qkv":
            _put(flat, f"{p}/attn/qkv",
                 "kernel" if leaf == "weight" else "bias",
                 _d(v) if leaf == "weight" else v)
        elif rest == "attn.proj":
            _put(flat, f"{p}/attn/proj",
                 "kernel" if leaf == "weight" else "bias",
                 _d(v) if leaf == "weight" else v)
        elif rest in ("mlp.fc1", "mlp.fc2"):
            _put(flat, f"{p}/{rest.split('.')[1]}",
                 "kernel" if leaf == "weight" else "bias",
                 _d(v) if leaf == "weight" else v)
        else:
            return False
        return True
    m = re.match(r"layers\.(\d+)\.downsample\.(reduction|norm)\."
                 r"(weight|bias)$", k)
    if m:
        i, what, leaf = m.groups()
        p = f"backbone/layers_{i}_downsample"
        if what == "reduction":
            _put(flat, f"{p}/reduction", "kernel", _d(v))
        else:
            _ln(flat, f"{p}/norm", leaf, v)
        return True
    return False


def _map_bert(flat, k: str, v):
    """bert.* (HF naming) -> bert/* (models/bert.py naming)."""
    if k == "embeddings.word_embeddings.weight":
        _put(flat, "bert", "word_embeddings", v)
    elif k == "embeddings.position_embeddings.weight":
        _put(flat, "bert", "position_embeddings", v)
    elif k == "embeddings.token_type_embeddings.weight":
        _put(flat, "bert", "token_type_embeddings", v)
    elif k.startswith("embeddings.LayerNorm."):
        _ln(flat, "bert/embeddings_LayerNorm", k.split(".")[-1], v)
    elif k.startswith("pooler.dense."):
        _put(flat, "bert/pooler",
             "kernel" if k.endswith("weight") else "bias",
             _d(v) if k.endswith("weight") else v)
    else:
        m = re.match(r"encoder\.layer\.(\d+)\.(.+)\.(weight|bias)$", k)
        if not m:
            return False
        i, rest, leaf = m.groups()
        p = f"bert/layer_{i}"
        name = {
            "attention.self.query": ("query", "dense"),
            "attention.self.key": ("key", "dense"),
            "attention.self.value": ("value", "dense"),
            "attention.output.dense": ("attention_output_dense", "dense"),
            "attention.output.LayerNorm": ("attention_output_LayerNorm",
                                           "ln"),
            "intermediate.dense": ("intermediate_dense", "dense"),
            "output.dense": ("output_dense", "dense"),
            "output.LayerNorm": ("output_LayerNorm", "ln"),
        }.get(rest)
        if name is None:
            return False
        if name[1] == "ln":
            _ln(flat, f"{p}/{name[0]}", leaf, v)
        else:
            _put(flat, f"{p}/{name[0]}",
                 "kernel" if leaf == "weight" else "bias",
                 _d(v) if leaf == "weight" else v)
    return True


def _map_deform(flat, p: str, rest: str, leaf: str, v):
    if rest not in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
        return False
    _put(flat, f"{p}/{rest}", "kernel" if leaf == "weight" else "bias",
         _d(v) if leaf == "weight" else v)
    return True


def _map_mlp(flat, p: str, rest: str, leaf: str, v):
    m = re.match(r"layers\.(\d)$", rest)
    if not m:
        return False
    _put(flat, f"{p}/layers_{m.group(1)}",
         "kernel" if leaf == "weight" else "bias",
         _d(v) if leaf == "weight" else v)
    return True


def convert_gdino(state: Dict[str, np.ndarray]) -> dict:
    flat: dict = {}
    alias = {}
    for tkey, value in state.items():
        k = tkey[len("module."):] if tkey.startswith("module.") else tkey
        v = np.asarray(value)
        ok = False
        base, leaf = (k[:-7], "weight") if k.endswith(".weight") else \
            ((k[:-5], "bias") if k.endswith(".bias") else (k, ""))

        if k.startswith("backbone.0."):
            ok = _map_swin(flat, k[len("backbone.0."):], v)
        elif k.startswith("bert."):
            ok = _map_bert(flat, k[len("bert."):], v)
        elif base == "feat_map":
            _put(flat, "feat_map", "kernel" if leaf == "weight" else
                 "bias", _d(v) if leaf == "weight" else v)
            ok = True
        elif k.startswith("input_proj."):
            m = re.match(r"input_proj\.(\d)\.(\d)\.(weight|bias)$", k)
            if m:
                i, sub, leaf2 = m.groups()
                if sub == "0":
                    name = f"input_proj_{i}_conv"
                    _put(flat, name,
                         "kernel" if leaf2 == "weight" else "bias",
                         _c(v) if leaf2 == "weight" else v)
                else:
                    _ln(flat, f"input_proj_{i}_norm", leaf2, v)
                ok = True
        elif k == "transformer.level_embed":
            _put(flat, "", "level_embed", v)
            ok = True
        elif k == "transformer.tgt_embed.weight":
            _put(flat, "", "tgt_embed", v)
            ok = True
        elif k.startswith("transformer.encoder.layers."):
            m = re.match(r"transformer\.encoder\.layers\.(\d+)\.(.+)$", k)
            i, rest = m.groups()
            p = f"enc_layer_{i}"
            if rest.startswith("self_attn."):
                sub = rest[len("self_attn."):]
                sub = sub.rsplit(".", 1)[0] if "." in sub else sub
                ok = _map_deform(flat, f"{p}/self_attn", sub, leaf, v)
            elif base.split(".")[-1] in ("norm1", "norm2"):
                _ln(flat, f"{p}/{base.split('.')[-1]}", leaf, v)
                ok = True
            elif base.split(".")[-1] in ("linear1", "linear2"):
                _put(flat, f"{p}/{base.split('.')[-1]}",
                     "kernel" if leaf == "weight" else "bias",
                     _d(v) if leaf == "weight" else v)
                ok = True
        elif k.startswith("transformer.encoder.text_layers."):
            m = re.match(r"transformer\.encoder\.text_layers\.(\d+)\.(.+)$",
                         k)
            i, rest = m.groups()
            p = f"text_layer_{i}"
            if rest.startswith("self_attn."):
                sub = rest[len("self_attn."):]
                if sub == "in_proj_weight":
                    _put(flat, f"{p}/in_proj", "kernel", _d(v))
                    ok = True
                elif sub == "in_proj_bias":
                    _put(flat, f"{p}/in_proj", "bias", v)
                    ok = True
                elif sub.startswith("out_proj."):
                    _put(flat, f"{p}/out_proj",
                         "kernel" if leaf == "weight" else "bias",
                         _d(v) if leaf == "weight" else v)
                    ok = True
            elif base.split(".")[-1] in ("norm1", "norm2"):
                _ln(flat, f"{p}/{base.split('.')[-1]}", leaf, v)
                ok = True
            elif base.split(".")[-1] in ("linear1", "linear2"):
                _put(flat, f"{p}/{base.split('.')[-1]}",
                     "kernel" if leaf == "weight" else "bias",
                     _d(v) if leaf == "weight" else v)
                ok = True
        elif k.startswith("transformer.encoder.fusion_layers."):
            m = re.match(
                r"transformer\.encoder\.fusion_layers\.(\d+)\.(.+)$", k)
            i, rest = m.groups()
            p = f"fusion_layer_{i}"
            if rest in ("gamma_v", "gamma_l"):
                _put(flat, p, rest, v)
                ok = True
            elif base.split(".")[-2:-1] == ["attn"] or \
                    base.startswith("attn."):
                sub = base.split(".")[-1]
                if sub in ("v_proj", "l_proj", "values_v_proj",
                           "values_l_proj", "out_v_proj", "out_l_proj"):
                    _put(flat, f"{p}/{sub}",
                         "kernel" if leaf == "weight" else "bias",
                         _d(v) if leaf == "weight" else v)
                    ok = True
            elif base.split(".")[-1] in ("layer_norm_v", "layer_norm_l"):
                _ln(flat, f"{p}/{base.split('.')[-1]}", leaf, v)
                ok = True
        elif k.startswith("transformer.decoder.layers."):
            m = re.match(r"transformer\.decoder\.layers\.(\d+)\.(.+)$", k)
            i, rest = m.groups()
            p = f"dec_layer_{i}"
            sub = base.split(".")[-1]
            if rest.startswith("cross_attn."):
                ok = _map_deform(flat, f"{p}/cross_attn", sub, leaf, v)
            elif rest.startswith("self_attn.") or rest.startswith(
                    "ca_text."):
                prefix = ("self_attn" if rest.startswith("self_attn.")
                          else "ca_text")
                tail = rest[len(prefix) + 1:]
                if tail == "in_proj_weight":
                    _put(flat, f"{p}/{prefix}_in_proj", "kernel", _d(v))
                    ok = True
                elif tail == "in_proj_bias":
                    _put(flat, f"{p}/{prefix}_in_proj", "bias", v)
                    ok = True
                elif tail.startswith("out_proj."):
                    _put(flat, f"{p}/{prefix}_out_proj",
                         "kernel" if leaf == "weight" else "bias",
                         _d(v) if leaf == "weight" else v)
                    ok = True
            elif sub in ("norm1", "norm2", "norm3", "catext_norm"):
                _ln(flat, f"{p}/{sub}", leaf, v)
                ok = True
            elif sub in ("linear1", "linear2"):
                _put(flat, f"{p}/{sub}",
                     "kernel" if leaf == "weight" else "bias",
                     _d(v) if leaf == "weight" else v)
                ok = True
        elif k.startswith("transformer.decoder.bbox_embed."):
            m = re.match(
                r"transformer\.decoder\.bbox_embed\.(\d+)\.(.+)\."
                r"(weight|bias)$", k)
            i, rest, leaf2 = m.groups()
            ok = _map_mlp(flat, f"bbox_embed_{i}", rest, leaf2, v)
        elif k.startswith("bbox_embed."):
            # top-level alias of transformer.decoder.bbox_embed (shared
            # modules in the release checkpoint) — consume, check later
            alias[k] = v
            ok = True
        elif k.startswith("transformer.decoder.ref_point_head."):
            m = re.match(r"transformer\.decoder\.ref_point_head\.(.+)\."
                         r"(weight|bias)$", k)
            ok = _map_mlp(flat, "ref_point_head", m.group(1), m.group(2),
                          v)
        elif k.startswith("transformer.decoder.norm."):
            _ln(flat, "decoder_norm", leaf, v)
            ok = True
        elif k.startswith("transformer.enc_output_norm."):
            _ln(flat, "enc_output_norm", leaf, v)
            ok = True
        elif k.startswith("transformer.enc_output."):
            _put(flat, "enc_output",
                 "kernel" if leaf == "weight" else "bias",
                 _d(v) if leaf == "weight" else v)
            ok = True
        elif k.startswith("transformer.enc_out_bbox_embed."):
            m = re.match(r"transformer\.enc_out_bbox_embed\.(.+)\."
                         r"(weight|bias)$", k)
            ok = _map_mlp(flat, "enc_out_bbox_embed", m.group(1),
                          m.group(2), v)
        if not ok:
            raise ValueError(f"Unmapped GroundingDINO checkpoint key: "
                             f"{tkey} shape {v.shape}")

    # verify the top-level bbox_embed aliases agree with the decoder copies
    for k, v in alias.items():
        m = re.match(r"bbox_embed\.(\d+)\.layers\.(\d)\.(weight|bias)$", k)
        if not m:
            raise ValueError(f"Unmapped GroundingDINO key: {k}")
        i, j, leaf = m.groups()
        want = flat.get(("bbox_embed_" + i, "layers_" + j,
                         "kernel" if leaf == "weight" else "bias"))
        got = _d(v) if leaf == "weight" else np.asarray(v, np.float32)
        if want is not None and not np.allclose(want, got):
            raise ValueError(f"bbox_embed alias mismatch at {k}")

    # top-level params live under "" in _put — rehome them
    fixed = {}
    for key, v in flat.items():
        fixed[tuple(p for p in key if p != "")] = v
    return {"params": unflatten_dict(fixed)}


def validate_gdino_bijection(converted: dict, expected: dict):
    conv = flatten_dict(converted["params"])
    init = flatten_dict(expected["params"])
    missing = sorted(set(init) - set(conv))
    orphans = sorted(set(conv) - set(init))
    if missing or orphans:
        raise ValueError(
            f"groundingdino conversion mismatch: {len(missing)} model "
            f"params unassigned (e.g. {missing[:4]}), {len(orphans)} "
            f"checkpoint keys unconsumed (e.g. {orphans[:4]}).")
    bad = [(k, conv[k].shape, init[k].shape) for k in init
           if tuple(conv[k].shape) != tuple(init[k].shape)]
    if bad:
        raise ValueError(
            f"groundingdino conversion shape mismatches: {bad[:4]}")


def load_gdino_checkpoint(path: str, config=None):
    """Load a released groundingdino_*.pth ({'model': sd}) and validate
    bijection against the model init."""
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=True)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    state = {k: v.float().numpy() for k, v in sd.items()
             if hasattr(v, "numpy")}
    converted = convert_gdino(state)

    import jax
    import jax.numpy as jnp
    from diffusionhandles_tpu.models.groundingdino import (
        GroundingDinoConfig, GroundingDinoModel)
    config = config or GroundingDinoConfig()
    model = GroundingDinoModel(config)
    s = 4 * config.swin.patch_size * config.swin.window_size
    init = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, s, s, 3), jnp.float32),
                             jnp.zeros((1, 8), jnp.int32),
                             jnp.ones((1, 8), bool)),
        jax.random.PRNGKey(0))
    validate_gdino_bijection(converted, init)
    return converted

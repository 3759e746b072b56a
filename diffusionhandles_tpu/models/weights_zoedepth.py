"""ZoeDepth-NK torch checkpoint -> Flax parameter conversion.

Maps the isl-org/ZoeDepth release state-dict naming (MiDaS DPT-BEiT-L-384
core under `core.core.*`, metric-bins NK head at the top level) onto
models/beit.py + models/zoedepth.py. The reference loads this model via
torch.hub (reference: test/estimate_depth.py:18-30); here conversion is
offline from a local .pt/.bin file.

Buffers that our functional modules recompute (relative_position_index,
log-binomial class indices) are skipped. `load_zoedepth_checkpoint`
validates the conversion as an exact bijection onto the model's init tree
and fails loudly otherwise (same policy as models/weights.py).
"""

from __future__ import annotations

import pathlib
import re
from typing import Dict, Optional

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# torch buffers (recomputed statically here, not parameters)
_SKIP_SUFFIXES = ("relative_position_index", "k_idx", "K_minus_1",
                  "num_batches_tracked", "pos_enc")


def _assign(flat: dict, path: str, value: np.ndarray, kind: str):
    if kind == "conv":
        value = np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        leaf = "kernel"
    elif kind == "convT":
        # torch ConvTranspose2d [I, O, kh, kw] -> flax ConvTranspose
        # (transpose_kernel=False) [kh, kw, I, O] with SPATIALLY FLIPPED
        # taps (verified numerically: torch computes the gradient-of-conv,
        # flax's default does not mirror the kernel).
        value = np.transpose(value, (2, 3, 0, 1))[::-1, ::-1].copy()
        leaf = "kernel"
    elif kind == "dense":
        value = np.transpose(value, (1, 0))
        leaf = "kernel"
    elif kind == "scale":
        leaf = "scale"
    elif kind == "bias":
        leaf = "bias"
    elif kind == "raw":   # direct parameter (cls_token, gamma, bias tables)
        leaf = None
    else:
        raise ValueError(kind)
    key = tuple(path.split("/")) + ((leaf,) if leaf else ())
    flat[key] = value.astype(np.float32)


_NORMS = ("norm1", "norm2", "conv_norm_out")


def _map_backbone(k: str) -> Optional[str]:
    """core.core.pretrained.model.* -> nk/core/backbone/*"""
    m = re.match(r"blocks\.(\d+)\.(.+)", k)
    if k == "cls_token":
        return "backbone/cls_token"
    if k.startswith("patch_embed.proj"):
        return "backbone/patch_embed"
    if m:
        i, rest = m.group(1), m.group(2)
        rest = rest.replace("attn.", "attn/")
        rest = rest.replace("mlp.fc1", "fc1").replace("mlp.fc2", "fc2")
        rest = rest.replace(".", "/") if "/" not in rest else rest
        return f"backbone/blocks_{i}/{rest}"
    return None


def convert_zoedepth(state: Dict[str, np.ndarray]) -> dict:
    """Full ZoeDepth-NK state dict -> {'params': ...} for ZoeDepthModel."""
    flat: dict = {}
    for tkey, value in state.items():
        if any(tkey.endswith(s) for s in _SKIP_SUFFIXES):
            continue
        value = np.asarray(value)
        k = tkey
        if k.startswith("core.core."):
            k = k[len("core.core."):]
            path, kind = _map_midas_key(k, value)
        else:
            path, kind = _map_head_key(k, value)
        if path is None:
            raise ValueError(f"Unmapped ZoeDepth checkpoint key: {tkey} "
                             f"shape {value.shape}")
        _assign(flat, "nk/" + path, value, kind)
    return {"params": unflatten_dict(flat)}


def _wb(k: str):
    if k.endswith(".weight"):
        return k[:-len(".weight")], "weight"
    if k.endswith(".bias"):
        return k[:-len(".bias")], "bias"
    return k, None


def _map_midas_key(k: str, value):
    """pretrained.model.* / pretrained.act_postprocess* / scratch.*"""
    if k.startswith("pretrained.model."):
        k2 = k[len("pretrained.model."):]
        if k2 == "cls_token":
            return "core/backbone/cls_token", "raw"
        base, suffix = _wb(k2)
        if base.startswith("patch_embed.proj"):
            return ("core/backbone/patch_embed",
                    "conv" if suffix == "weight" else "bias")
        m = re.match(r"blocks\.(\d+)\.(.+)", base if suffix else k2)
        if m:
            i, rest = m.group(1), m.group(2)
            prefix = f"core/backbone/blocks_{i}"
            if rest in ("gamma_1", "gamma_2"):
                return f"{prefix}/{rest}", "raw"
            if rest == "attn.q_bias":
                return f"{prefix}/attn/q_bias", "raw"
            if rest == "attn.v_bias":
                return f"{prefix}/attn/v_bias", "raw"
            if rest == "attn.relative_position_bias_table":
                return f"{prefix}/attn/relative_position_bias_table", "raw"
            if rest == "attn.qkv":
                return f"{prefix}/attn/qkv", "dense"
            if rest == "attn.proj":
                return (f"{prefix}/attn/proj",
                        "dense" if suffix == "weight" else "bias")
            if rest in ("norm1", "norm2"):
                return (f"{prefix}/{rest}",
                        "scale" if suffix == "weight" else "bias")
            if rest == "mlp.fc1":
                return (f"{prefix}/fc1",
                        "dense" if suffix == "weight" else "bias")
            if rest == "mlp.fc2":
                return (f"{prefix}/fc2",
                        "dense" if suffix == "weight" else "bias")
        return None, None
    if k.startswith("pretrained.act_postprocess"):
        base, suffix = _wb(k)
        m = re.match(r"pretrained\.act_postprocess(\d)\.(\d+)(?:\.project\.0)?",
                     base)
        if not m:
            return None, None
        level = int(m.group(1)) - 1
        idx = int(m.group(2))
        wkind = "dense" if suffix == "weight" else "bias"
        if idx == 0:     # ProjectReadout Linear
            return f"core/readout_{level}/project", wkind
        if idx == 3:     # 1x1 conv to per-level channels
            return (f"core/reassemble_conv_{level}",
                    "conv" if suffix == "weight" else "bias")
        if idx == 4:     # resample: convT for levels 0/1, strided conv for 3
            if level in (0, 1):
                return (f"core/resample_{level}",
                        "convT" if suffix == "weight" else "bias")
            return (f"core/resample_{level}",
                    "conv" if suffix == "weight" else "bias")
        return None, None
    if k.startswith("scratch."):
        base, suffix = _wb(k[len("scratch."):])
        wkind = "conv" if suffix == "weight" else "bias"
        m = re.match(r"layer(\d)_rn$", base)
        if m:
            return f"core/layer{m.group(1)}_rn", wkind
        m = re.match(r"refinenet(\d)\.(out_conv|resConfUnit\d\.conv\d)$",
                     base)
        if m:
            sub = m.group(2).replace(".", "/")
            return f"core/refinenet{m.group(1)}/{sub}", wkind
        m = re.match(r"output_conv\.(\d)$", base)
        if m:
            return f"core/output_conv_{m.group(1)}", wkind
        return None, None
    return None, None


def _map_head_key(k: str, value):
    base, suffix = _wb(k)
    dense = "dense" if suffix == "weight" else "bias"
    conv = "conv" if suffix == "weight" else "bias"
    if base == "conv2":
        return "conv2", conv
    if base == "patch_transformer.embedding_convPxP":
        return "patch_transformer/embedding_convPxP", conv
    m = re.match(r"patch_transformer\.transformer_encoder\.layers\.(\d+)\.(.+)",
                 base if suffix else k)
    if m:
        i, rest = m.group(1), m.group(2)
        p = f"patch_transformer/layers_{i}"
        if rest == "self_attn.in_proj_weight":
            return f"{p}/in_proj", "dense"
        if rest == "self_attn.in_proj_bias":
            return f"{p}/in_proj", "bias"
        if rest == "self_attn.out_proj":
            return f"{p}/out_proj", dense
        if rest in ("linear1", "linear2"):
            return f"{p}/{rest}", dense
        if rest in ("norm1", "norm2"):
            return (f"{p}/{rest}", "scale" if suffix == "weight" else "bias")
        return None, None
    m = re.match(r"mlp_classifier\.(\d)$", base)
    if m:
        return f"mlp_classifier_{m.group(1)}", dense
    m = re.match(r"seed_bin_regressors\.(\w+)\._net\.(\d)$", base)
    if m:
        conv_name = "conv1" if m.group(2) == "0" else "conv2"
        return f"seed_bin_regressors_{m.group(1)}/{conv_name}", conv
    m = re.match(r"seed_projector\._net\.(\d)$", base)
    if m:
        conv_name = "conv1" if m.group(1) == "0" else "conv2"
        return f"seed_projector/{conv_name}", conv
    m = re.match(r"projectors\.(\d+)\._net\.(\d)$", base)
    if m:
        conv_name = "conv1" if m.group(2) == "0" else "conv2"
        return f"projectors_{m.group(1)}/{conv_name}", conv
    m = re.match(r"attractors\.(\w+)\.(\d+)\._net\.(\d)$", base)
    if m:
        conv_name = "conv1" if m.group(3) == "0" else "conv2"
        return (f"attractors_{m.group(1)}_{m.group(2)}/_net/{conv_name}",
                conv)
    m = re.match(r"conditional_log_binomial\.(\w+)\.mlp\.(\d)$", base)
    if m:
        conv_name = "mlp_conv1" if m.group(2) == "0" else "mlp_conv2"
        return f"conditional_log_binomial_{m.group(1)}/{conv_name}", conv
    return None, None


def load_zoedepth_checkpoint(path: str, config=None):
    """Load a ZoeDepth-NK .pt/.bin checkpoint (torch save of {'model': sd}
    or a bare state dict) and validate bijection against the model init."""
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=True)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    state = {k: v.float().numpy() for k, v in sd.items()
             if hasattr(v, "numpy")}
    converted = convert_zoedepth(state)
    if config is not None:
        import jax
        import jax.numpy as jnp
        from diffusionhandles_tpu.models.weights import validate_bijection
        from diffusionhandles_tpu.models.zoedepth import ZoeDepthModel
        model = ZoeDepthModel(config)
        init = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros(
                (1, 32, 32, 3), jnp.float32)), jax.random.PRNGKey(0))
        validate_bijection(converted, init, "zoedepth")
    return converted

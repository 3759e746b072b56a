"""SAM torch checkpoint -> Flax parameter conversion.

Maps the released `sam_vit_{b,l,h}_*.pth` state dict (facebookresearch/
segment-anything naming: image_encoder.*, prompt_encoder.*, mask_decoder.*)
onto models/sam.SamModel. The reference consumes SAM through LangSAM
(reference: test/estimate_foreground.py:6-42).

Validated as an exact bijection against the model's init tree; fails loudly
otherwise (same policy as models/weights.py).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def _conv(v):
    return np.transpose(v, (2, 3, 1, 0))          # OIHW -> HWIO


def _convT(v):
    # torch ConvTranspose2d [I, O, kh, kw] -> flax [kh, kw, I, O] with
    # spatially flipped taps (verified numerically in weights_zoedepth).
    return np.transpose(v, (2, 3, 0, 1))[::-1, ::-1].copy()


def _dense(v):
    return np.transpose(v, (1, 0))


def _map_image_encoder(k: str, v):
    base, leaf = (k[:-7], "weight") if k.endswith(".weight") else \
        ((k[:-5], "bias") if k.endswith(".bias") else (k, None))
    if k == "pos_embed":
        return ("image_encoder/pos_embed",), v
    if base == "patch_embed.proj":
        val = _conv(v) if leaf == "weight" else v
        return ("image_encoder/patch_embed",
                "kernel" if leaf == "weight" else "bias"), val
    m = re.match(r"blocks\.(\d+)\.(.+)", base if leaf else k)
    if m:
        i, rest = m.group(1), m.group(2)
        p = f"image_encoder/blocks_{i}"
        if rest in ("norm1", "norm2"):
            return (f"{p}/{rest}",
                    "scale" if leaf == "weight" else "bias"), v
        if rest == "attn.qkv":
            return (f"{p}/attn/qkv",
                    "kernel" if leaf == "weight" else "bias"), \
                (_dense(v) if leaf == "weight" else v)
        if rest == "attn.proj":
            return (f"{p}/attn/proj",
                    "kernel" if leaf == "weight" else "bias"), \
                (_dense(v) if leaf == "weight" else v)
        if rest in ("attn.rel_pos_h", "attn.rel_pos_w"):
            return (f"{p}/attn/{rest.split('.')[1]}",), v
        if rest in ("mlp.lin1", "mlp.lin2"):
            return (f"{p}/{rest.split('.')[1]}",
                    "kernel" if leaf == "weight" else "bias"), \
                (_dense(v) if leaf == "weight" else v)
    m = re.match(r"neck\.(\d)$", base)
    if m:
        idx = int(m.group(1))
        name = {0: "neck_conv1", 1: "neck_ln1",
                2: "neck_conv2", 3: "neck_ln2"}[idx]
        if idx in (0, 2):
            return (f"image_encoder/{name}", "kernel"), _conv(v)
        return (f"image_encoder/{name}",
                "scale" if leaf == "weight" else "bias"), v
    return None, None


def _map_prompt_encoder(k: str, v):
    if k == "pe_layer.positional_encoding_gaussian_matrix":
        return ("prompt_encoder/positional_encoding_gaussian_matrix",), v
    m = re.match(r"point_embeddings\.(\d)\.weight$", k)
    if m:
        return (f"prompt_encoder/point_embed_{m.group(1)}",), v
    if k == "not_a_point_embed.weight":
        return ("prompt_encoder/not_a_point_embed",), v
    if k == "no_mask_embed.weight":
        return ("prompt_encoder/no_mask_embed",), v
    m = re.match(r"mask_downscaling\.(\d)\.(weight|bias)$", k)
    if m:
        idx, leaf = int(m.group(1)), m.group(2)
        name = {0: ("mask_down_conv1", "conv"), 1: ("mask_down_ln1", "ln"),
                3: ("mask_down_conv2", "conv"), 4: ("mask_down_ln2", "ln"),
                6: ("mask_down_conv3", "conv")}[idx]
        if name[1] == "conv":
            return (f"prompt_encoder/{name[0]}",
                    "kernel" if leaf == "weight" else "bias"), \
                (_conv(v) if leaf == "weight" else v)
        return (f"prompt_encoder/{name[0]}",
                "scale" if leaf == "weight" else "bias"), v
    return None, None


def _map_mask_decoder(k: str, v):
    if k == "iou_token.weight":
        return ("mask_decoder/iou_token",), v
    if k == "mask_tokens.weight":
        return ("mask_decoder/mask_tokens",), v
    base, leaf = (k[:-7], "weight") if k.endswith(".weight") else \
        (k[:-5], "bias")
    dk = "kernel" if leaf == "weight" else "bias"
    sk = "scale" if leaf == "weight" else "bias"

    m = re.match(r"transformer\.layers\.(\d)\.(.+)", base)
    if m:
        i, rest = m.group(1), m.group(2)
        p = f"mask_decoder/layers_{i}"
        m2 = re.match(
            r"(self_attn|cross_attn_token_to_image|cross_attn_image_to_"
            r"token)\.(q_proj|k_proj|v_proj|out_proj)$", rest)
        if m2:
            return (f"{p}/{m2.group(1)}/{m2.group(2)}", dk), \
                (_dense(v) if leaf == "weight" else v)
        if rest in ("norm1", "norm2", "norm3", "norm4"):
            return (f"{p}/{rest}", sk), v
        if rest in ("mlp.lin1", "mlp.lin2"):
            return (f"{p}/mlp_{rest.split('.')[1]}", dk), \
                (_dense(v) if leaf == "weight" else v)
        return None, None
    m = re.match(r"transformer\.final_attn_token_to_image\.(\w+)$", base)
    if m:
        return (f"mask_decoder/final_attn_token_to_image/{m.group(1)}",
                dk), (_dense(v) if leaf == "weight" else v)
    if base == "transformer.norm_final_attn":
        return ("mask_decoder/norm_final_attn", sk), v
    m = re.match(r"output_upscaling\.(\d)$", base)
    if m:
        idx = int(m.group(1))
        if idx == 1:
            return ("mask_decoder/upscale_ln", sk), v
        name = {0: "upscale_conv1", 3: "upscale_conv2"}[idx]
        return (f"mask_decoder/{name}", dk), \
            (_convT(v) if leaf == "weight" else v)
    m = re.match(r"output_hypernetworks_mlps\.(\d)\.layers\.(\d)$", base)
    if m:
        return (f"mask_decoder/hyper_{m.group(1)}_lin{m.group(2)}", dk), \
            (_dense(v) if leaf == "weight" else v)
    m = re.match(r"iou_prediction_head\.layers\.(\d)$", base)
    if m:
        return (f"mask_decoder/iou_lin{m.group(1)}", dk), \
            (_dense(v) if leaf == "weight" else v)
    return None, None


def convert_sam(state: Dict[str, np.ndarray]) -> dict:
    flat = {}
    for tkey, value in state.items():
        v = np.asarray(value)
        if tkey.startswith("image_encoder."):
            path, val = _map_image_encoder(tkey[len("image_encoder."):], v)
        elif tkey.startswith("prompt_encoder."):
            path, val = _map_prompt_encoder(
                tkey[len("prompt_encoder."):], v)
        elif tkey.startswith("mask_decoder."):
            path, val = _map_mask_decoder(tkey[len("mask_decoder."):], v)
        else:
            path = None
        if path is None:
            raise ValueError(f"Unmapped SAM checkpoint key: {tkey} "
                             f"shape {v.shape}")
        key = tuple(path[0].split("/")) + tuple(path[1:])
        flat[key] = np.asarray(val, np.float32)
    return {"params": unflatten_dict(flat)}


def validate_sam_bijection(converted: dict, expected: dict):
    conv = flatten_dict(converted["params"])
    init = flatten_dict(expected["params"])
    missing = sorted(set(init) - set(conv))
    orphans = sorted(set(conv) - set(init))
    if missing or orphans:
        raise ValueError(
            f"sam checkpoint conversion mismatch: {len(missing)} model "
            f"params unassigned (e.g. {missing[:4]}), {len(orphans)} "
            f"checkpoint keys unconsumed (e.g. {orphans[:4]}).")
    shape_bad = [(k, conv[k].shape, init[k].shape) for k in init
                 if tuple(conv[k].shape) != tuple(init[k].shape)]
    if shape_bad:
        raise ValueError(f"sam checkpoint conversion shape mismatches: "
                         f"{shape_bad[:4]}")


def load_sam_checkpoint(path: str, config=None):
    """Load a released SAM .pth (a bare state dict) and validate bijection
    against the model init."""
    import torch

    raw = torch.load(str(path), map_location="cpu", weights_only=True)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    state = {k: v.float().numpy() for k, v in sd.items()
             if hasattr(v, "numpy")}
    converted = convert_sam(state)

    import jax
    import jax.numpy as jnp
    from diffusionhandles_tpu.models.sam import SamModel, sam_vit_h
    config = config or sam_vit_h()
    model = SamModel(config)
    s = config.img_size
    init = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, 2, 2), jnp.float32),
            jnp.zeros((1, 2), jnp.int32),
            jnp.zeros((1, 2, 2), jnp.float32),
            jnp.zeros((1, s // 4, s // 4, 1), jnp.float32)),
        jax.random.PRNGKey(0))
    validate_sam_bijection(converted, init)
    return converted

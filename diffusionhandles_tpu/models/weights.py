"""HF torch checkpoint -> Flax parameter conversion (offline).

The reference pulls SD-2-depth weights from the HuggingFace hub at runtime
(reference: diffhandles/guided_stable_diffuser.py:33-36). Here weights are
converted once from a *local* checkpoint directory (the standard diffusers
layout: unet/, vae/, text_encoder/, tokenizer/ with .safetensors or .bin
files); no network access is required. If no checkpoint is provided, models
run with seeded random weights at the real architecture shapes — useful for
benchmarking and CI, documented as such.
"""

from __future__ import annotations

import pathlib
import re
from typing import Dict, Optional

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def _load_torch_state_dict(model_dir: pathlib.Path) -> Dict[str, np.ndarray]:
    """Load a diffusers submodel state dict as numpy (safetensors or .bin)."""
    state = {}
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            state.update(load_file(str(f)))
        return state
    bin_files = sorted(model_dir.glob("*.bin"))
    if bin_files:
        import torch
        for f in bin_files:
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
        return state
    raise FileNotFoundError(f"No weight files in {model_dir}")


def _assign(flat: dict, flax_key: str, value: np.ndarray, kind: str):
    """kind: 'conv' | 'dense' | 'scale' | 'bias' | 'embed'."""
    value = np.asarray(value)  # tolerate raw torch tensors
    if kind == "conv":
        value = np.transpose(value, (2, 3, 1, 0))  # OIHW -> HWIO
        name = "kernel"
    elif kind == "dense":
        value = np.transpose(value, (1, 0))  # [O,I] -> [I,O]
        name = "kernel"
    elif kind == "scale":
        name = "scale"
    elif kind == "bias":
        name = "bias"
    elif kind == "embed":
        name = "embedding"
    else:
        raise ValueError(kind)
    flat[tuple(flax_key.split(".")) + ((name,) if name else ())] = \
        value.astype(np.float32)


_NORM_MODULES = ("norm", "norm1", "norm2", "norm3", "conv_norm_out",
                 "group_norm", "layer_norm1", "layer_norm2",
                 "final_layer_norm")


def _torch_key_to_flax(torch_key: str) -> Optional[str]:
    """Map a diffusers UNet/VAE torch key to our flax module path."""
    k = torch_key
    # list indices: 'down_blocks.0.' -> 'down_blocks_0.' (also at the end
    # of the path, e.g. 'to_out.0')
    k = re.sub(r"\.(\d+)(?=\.|$)", r"_\1", k)
    k = k.replace("transformer_blocks_0", "block0")
    k = k.replace("ff.net_0.proj", "ff_proj")
    k = k.replace("ff.net_2", "ff_out")
    k = k.replace("to_out_0", "to_out")
    k = k.replace("time_embedding.linear_1", "time_embedding_linear_1")
    k = k.replace("time_embedding.linear_2", "time_embedding_linear_2")
    return k


def convert_unet(state: Dict[str, np.ndarray]) -> dict:
    flat: dict = {}
    for tkey, value in state.items():
        if tkey.endswith(".weight"):
            base, suffix = tkey[:-len(".weight")], "weight"
        elif tkey.endswith(".bias"):
            base, suffix = tkey[:-len(".bias")], "bias"
        else:
            continue
        fkey = _torch_key_to_flax(base)
        leaf = fkey.split(".")[-1]
        if suffix == "bias":
            kind = "bias"
        elif value.ndim == 4:
            kind = "conv"
        elif value.ndim == 2:
            kind = "dense"
        elif leaf in _NORM_MODULES or value.ndim == 1:
            kind = "scale"
        else:
            raise ValueError(f"Unhandled param {tkey} shape {value.shape}")
        _assign(flat, fkey, value, kind)
    return {"params": unflatten_dict(flat)}


def convert_vae(state: Dict[str, np.ndarray]) -> dict:
    flat: dict = {}
    for tkey, value in state.items():
        if tkey.endswith(".weight"):
            base, suffix = tkey[:-len(".weight")], "weight"
        elif tkey.endswith(".bias"):
            base, suffix = tkey[:-len(".bias")], "bias"
        else:
            continue
        k = base
        k = re.sub(r"down_blocks\.(\d+)\.resnets\.(\d+)", r"down_\1_resnets_\2", k)
        k = re.sub(r"down_blocks\.(\d+)\.downsamplers\.0\.conv", r"down_\1_downsample", k)
        k = re.sub(r"up_blocks\.(\d+)\.resnets\.(\d+)", r"up_\1_resnets_\2", k)
        k = re.sub(r"up_blocks\.(\d+)\.upsamplers\.0\.conv", r"up_\1_upsample", k)
        k = re.sub(r"mid_block\.resnets\.(\d+)", r"mid_resnets_\1", k)
        k = k.replace("mid_block.attentions.0", "mid_attn")
        k = k.replace("to_out.0", "to_out")
        leaf = k.split(".")[-1]
        if suffix == "bias":
            kind = "bias"
        elif value.ndim == 4:
            kind = "conv"
        elif value.ndim == 2:
            kind = "dense"
        else:
            kind = "scale"
        _assign(flat, k, value, kind)
    return {"params": unflatten_dict(flat)}


def convert_text_encoder(state: Dict[str, np.ndarray]) -> dict:
    flat: dict = {}
    for tkey, value in state.items():
        if not tkey.startswith("text_model."):
            continue
        k = tkey[len("text_model."):]
        if k == "embeddings.token_embedding.weight":
            _assign(flat, "token_embedding", value, "embed")
            continue
        if k == "embeddings.position_embedding.weight":
            flat[("position_embedding",)] = np.asarray(value,
                                                       np.float32)
            continue
        k = re.sub(r"encoder\.layers\.(\d+)", r"layers_\1", k)
        k = k.replace(".mlp.", ".")
        if k.endswith(".weight"):
            base, kind = k[:-len(".weight")], None
            kind = "dense" if value.ndim == 2 else "scale"
        elif k.endswith(".bias"):
            base, kind = k[:-len(".bias")], "bias"
        else:
            continue
        _assign(flat, base, value, kind)
    return {"params": unflatten_dict(flat)}


def validate_bijection(converted: dict, expected: dict, what: str):
    """Fail LOUDLY if the converted tree does not exactly cover the model's
    init tree (an unmapped checkpoint key family would otherwise produce
    silent garbage at apply time via an unflatten mismatch)."""
    conv = flatten_dict(converted["params"])
    init = flatten_dict(expected["params"])
    missing = sorted(set(init) - set(conv))
    orphans = sorted(set(conv) - set(init))
    if missing or orphans:
        raise ValueError(
            f"{what} checkpoint conversion mismatch: "
            f"{len(missing)} model params unassigned "
            f"(e.g. {missing[:4]}), {len(orphans)} checkpoint keys "
            f"unconsumed (e.g. {orphans[:4]}).")
    shape_bad = [(k, conv[k].shape, init[k].shape) for k in init
                 if tuple(conv[k].shape) != tuple(init[k].shape)]
    if shape_bad:
        raise ValueError(f"{what} checkpoint conversion shape mismatches: "
                         f"{shape_bad[:4]}")


def load_sd_checkpoint(checkpoint_dir: str, expected_unet: dict = None,
                       expected_vae: dict = None, expected_text: dict = None):
    """Load (unet, vae, text_encoder) param trees from a diffusers layout.

    When `expected_*` init trees are given, each converted tree is validated
    as an exact bijection onto the model structure (keys AND shapes) and the
    load fails loudly on any mismatch.
    """
    root = pathlib.Path(checkpoint_dir)
    unet = convert_unet(_load_torch_state_dict(root / "unet"))
    vae = convert_vae(_load_torch_state_dict(root / "vae"))
    text = convert_text_encoder(_load_torch_state_dict(root / "text_encoder"))
    if expected_unet is not None:
        validate_bijection(unet, expected_unet, "unet")
    if expected_vae is not None:
        validate_bijection(vae, expected_vae, "vae")
    if expected_text is not None:
        validate_bijection(text, expected_text, "text_encoder")
    return unet, vae, text

"""HF CLIPModel checkpoint -> Flax conversion (vision + text + projections).

Makes the CLIP-similarity grounding stage (models/segmenter.py — the
text-grounding substitution for the reference's GroundingDINO inside
LangSAM, reference: test/estimate_foreground.py:6-42) release-convertible:
a released `openai/clip-vit-*` state dict maps onto CLIPImageEncoder +
CLIPTextEncoder with the dual projections.

Same policy as every converter here: exact key/shape bijection against the
model init trees, loud failure otherwise.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

from diffusionhandles_tpu.models.clip_image import CLIPImageConfig
from diffusionhandles_tpu.models.clip_text import CLIPTextConfig


def clip_vit_b16() -> Tuple[CLIPImageConfig, CLIPTextConfig]:
    """openai/clip-vit-base-patch16."""
    img = CLIPImageConfig(image_size=224, patch_size=16, hidden_size=768,
                          num_layers=12, num_heads=12, projection_dim=512)
    txt = CLIPTextConfig(hidden_size=512, intermediate_size=2048,
                         num_heads=8, num_layers=12,
                         hidden_act="quick_gelu")
    return img, txt


def clip_vit_l14() -> Tuple[CLIPImageConfig, CLIPTextConfig]:
    """openai/clip-vit-large-patch14."""
    img = CLIPImageConfig(image_size=224, patch_size=14, hidden_size=1024,
                          num_layers=24, num_heads=16, projection_dim=768)
    txt = CLIPTextConfig(hidden_size=768, intermediate_size=3072,
                         num_heads=12, num_layers=12,
                         hidden_act="quick_gelu")
    return img, txt


def _dense(v):
    return np.transpose(np.asarray(v), (1, 0))


def convert_clip_vision(state: Dict[str, np.ndarray]) -> dict:
    """vision_model.* + visual_projection -> CLIPImageEncoder params."""
    flat = {}

    def put(path: str, v, leaf="kernel"):
        flat[tuple(path.split("/")) + ((leaf,) if leaf else ())] = \
            np.asarray(v, np.float32)

    for tkey, v in state.items():
        if tkey == "visual_projection.weight":
            flat[("visual_projection",)] = _dense(v).astype(np.float32)
            continue
        if not tkey.startswith("vision_model."):
            continue
        k = tkey[len("vision_model."):]
        if k == "embeddings.class_embedding":
            flat[("class_embedding",)] = np.asarray(v, np.float32)
        elif k == "embeddings.patch_embedding.weight":
            put("patch_embed", np.transpose(v, (2, 3, 1, 0)))
        elif k == "embeddings.position_embedding.weight":
            flat[("pos_embed",)] = np.asarray(v, np.float32)
        elif k.startswith("pre_layrnorm.") or k.startswith("pre_layernorm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            put("ln_pre", v, leaf)
        elif k.startswith("post_layernorm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            put("ln_post", v, leaf)
        else:
            m = re.match(r"encoder\.layers\.(\d+)\.(.+)\.(weight|bias)$", k)
            if not m:
                raise ValueError(f"Unmapped CLIP vision key: {tkey}")
            i, rest, leaf = m.group(1), m.group(2), m.group(3)
            p = f"block_{i}"
            if rest in ("layer_norm1", "layer_norm2"):
                name = "ln1" if rest == "layer_norm1" else "ln2"
                put(f"{p}/{name}", v,
                    "scale" if leaf == "weight" else "bias")
            elif rest.startswith("self_attn."):
                proj = rest.split(".")[1]  # q_proj/k_proj/v_proj/out_proj
                put(f"{p}/{proj}", _dense(v) if leaf == "weight" else v,
                    "kernel" if leaf == "weight" else "bias")
            elif rest in ("mlp.fc1", "mlp.fc2"):
                put(f"{p}/{rest.split('.')[1]}",
                    _dense(v) if leaf == "weight" else v,
                    "kernel" if leaf == "weight" else "bias")
            else:
                raise ValueError(f"Unmapped CLIP vision key: {tkey}")
    return {"params": unflatten_dict(flat)}


def _validate(converted, expected, what):
    conv = flatten_dict(converted["params"])
    init = flatten_dict(expected["params"])
    missing = sorted(set(init) - set(conv))
    orphans = sorted(set(conv) - set(init))
    if missing or orphans:
        raise ValueError(
            f"{what} conversion mismatch: {len(missing)} unassigned "
            f"(e.g. {missing[:4]}), {len(orphans)} unconsumed "
            f"(e.g. {orphans[:4]}).")
    bad = [(k, conv[k].shape, init[k].shape) for k in init
           if tuple(conv[k].shape) != tuple(init[k].shape)]
    if bad:
        raise ValueError(f"{what} conversion shape mismatches: {bad[:4]}")


def load_clip_checkpoint(path: str, image_config: CLIPImageConfig,
                         text_config: CLIPTextConfig):
    """Load a full HF CLIPModel state dict (.bin/.pt or .safetensors) ->
    (vision_params, text_params, text_projection [D, P])."""
    import pathlib

    p = pathlib.Path(path)
    if p.suffix == ".safetensors":
        from safetensors.numpy import load_file
        state = load_file(str(p))
    else:
        import torch
        raw = torch.load(str(p), map_location="cpu", weights_only=True)
        sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        state = {k: v.float().numpy() for k, v in sd.items()
                 if hasattr(v, "numpy")}
    state = {k[len("clip."):] if k.startswith("clip.") else k: v
             for k, v in state.items()}
    state.pop("logit_scale", None)
    state.pop("text_model.embeddings.position_ids", None)
    state.pop("vision_model.embeddings.position_ids", None)

    from diffusionhandles_tpu.models.weights import convert_text_encoder
    vision = convert_clip_vision(
        {k: v for k, v in state.items()
         if k.startswith("vision_model.") or k == "visual_projection.weight"})
    text = convert_text_encoder(state)
    text_projection = _dense(state["text_projection.weight"]).astype(
        np.float32)

    import jax
    import jax.numpy as jnp
    from diffusionhandles_tpu.models.clip_image import CLIPImageEncoder
    from diffusionhandles_tpu.models.clip_text import CLIPTextEncoder
    s = image_config.image_size
    init_v = jax.eval_shape(
        lambda k: CLIPImageEncoder(image_config).init(
            k, jnp.zeros((1, s, s, 3), jnp.float32)), jax.random.PRNGKey(0))
    _validate(vision, init_v, "clip-vision")
    init_t = jax.eval_shape(
        lambda k: CLIPTextEncoder(text_config).init(
            k, jnp.zeros((1, 77), jnp.int32)), jax.random.PRNGKey(0))
    _validate(text, init_t, "clip-text")
    return vision, text, text_projection

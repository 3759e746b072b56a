"""Converted-parameter store (orbax).

Convert HF torch checkpoints once (models/weights.py), then save/load the
flax trees with orbax for fast startup — the analogue of the reference's
HuggingFace hub cache (reference: guided_stable_diffuser.py:33-36).
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax


def save_params(path, params: Any) -> None:
    import orbax.checkpoint as ocp
    path = pathlib.Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()


def load_params(path, like: Any = None) -> Any:
    import orbax.checkpoint as ocp
    path = pathlib.Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    if like is not None:
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), like)
        return ckpt.restore(path, abstract)
    return ckpt.restore(path)


def convert_and_store(hf_checkpoint_dir: str, out_dir: str) -> None:
    """One-shot: diffusers layout -> orbax store (unet/, vae/, text/)."""
    from diffusionhandles_tpu.models.weights import load_sd_checkpoint
    out = pathlib.Path(out_dir)
    unet, vae, text = load_sd_checkpoint(hf_checkpoint_dir)
    save_params(out / "unet", unet)
    save_params(out / "vae", vae)
    save_params(out / "text_encoder", text)

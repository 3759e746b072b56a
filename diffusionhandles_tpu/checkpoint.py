"""Input-image-identity checkpoints.

The reference serializes the "identity" of an inverted input image
(null-text embeddings, init noise, 3 activation stacks, latent image) to an
npz file to skip re-inversion (reference: test/test_diffusion_handles.py:
85-114, webapp/webapps/diffhandles_webapp.py:82-96). This module keeps the
exact field names and torch NCHW layouts on disk so identity files are
interchangeable with the reference, while the in-memory framework layout is
NHWC.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict

import numpy as np


def _is_jax(x) -> bool:
    return type(x).__module__.startswith("jax")


def to_nchw(x):
    """[..., H, W, C] -> [..., C, H, W].

    Device arrays stay on device (the activation stacks are ~0.5 GB; a
    host round-trip through the device tunnel costs tens of seconds).
    """
    if _is_jax(x):
        import jax.numpy as jnp
        return jnp.moveaxis(x, -1, -3)
    return np.moveaxis(np.asarray(x), -1, -3)


def to_nhwc(x):
    """[..., C, H, W] -> [..., H, W, C] (device arrays stay on device)."""
    if _is_jax(x):
        import jax.numpy as jnp
        return jnp.moveaxis(x, -3, -1)
    return np.moveaxis(np.asarray(x), -3, -1)


def save_identity(path, null_text_emb, init_noise, activations,
                  latent_image) -> None:
    """Save an input-image identity npz (reference field names/layouts).

    Inputs are framework-layout (NHWC); stored as NCHW float32/16.
    """
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = {
        "null_text_emb": np.asarray(null_text_emb, np.float32),
        "init_noise": to_nchw(init_noise).astype(np.float32),
        "activations1": to_nchw(activations[0]).astype(np.float32),
        "activations2": to_nchw(activations[1]).astype(np.float32),
        "activations3": to_nchw(activations[2]).astype(np.float32),
        "latent_image": to_nchw(latent_image).astype(np.float32),
    }
    np.savez(path, **data)


def load_identity(path) -> Dict[str, Any]:
    """Load an identity npz -> dict with framework-layout (NHWC) arrays."""
    data = np.load(path)
    return {
        "null_text_emb": data["null_text_emb"].astype(np.float32),
        "init_noise": to_nhwc(data["init_noise"]).astype(np.float32),
        "activations": [to_nhwc(data[f"activations{i + 1}"]).astype(
            np.float32) for i in range(3)],
        "latent_image": to_nhwc(data["latent_image"]).astype(np.float32),
    }

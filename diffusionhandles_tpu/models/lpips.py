"""LPIPS perceptual distance (VGG16 backbone) in Flax.

The repo's north-star metric is recon PSNR/LPIPS parity (BASELINE.md). This
implements the standard LPIPS formulation: VGG16 feature stacks at
relu{1_2, 2_2, 3_3, 4_3, 5_3}, unit-normalized along channels, squared
differences weighted by learned 1x1 "lin" heads, averaged over space and
summed over layers. Weights convert from the released torchvision VGG16 +
LPIPS lin checkpoints via `convert_lpips_weights`; with random weights the
measure is still a deterministic perceptual-feature distance (documented,
not calibrated).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (channels, num_convs) per stage; features tapped at each
# stage's last relu.
_VGG_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3),
                                            (512, 3), (512, 3))


class VGG16Features(nn.Module):
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, 3] normalized; returns 5 feature maps."""
        feats = []
        idx = 0
        for stage, (ch, n_convs) in enumerate(_VGG_STAGES):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1,
                            param_dtype=self.param_dtype,
                            name=f"conv_{idx}")(x)
                x = nn.relu(x)
                idx += 1
            feats.append(x)
            if stage < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        """a, b: [B, H, W, 3] in [0, 1]. Returns [B] distances."""
        mean = jnp.array([0.485, 0.456, 0.406])
        std = jnp.array([0.229, 0.224, 0.225])
        vgg = VGG16Features(param_dtype=self.param_dtype, name="vgg")
        fa = vgg((a - mean) / std)
        fb = vgg((b - mean) / std)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = self.param(f"lin_{i}", nn.initializers.ones,
                           (diff.shape[-1],), self.param_dtype)
            total = total + jnp.mean(
                jnp.sum(diff * jnp.abs(w), axis=-1), axis=(1, 2))
        return total


class LPIPSMetric:
    def __init__(self, params=None, seed: int = 0):
        self.model = LPIPS()
        if params is None:
            x = jnp.zeros((1, 32, 32, 3))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x,
                                              x)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, a: np.ndarray, b: np.ndarray) -> float:
        """a, b: [C, H, W] or [1, C, H, W] images in [0, 1]."""
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if a.ndim == 3:
            a = a[None]
            b = b[None]
        a = np.moveaxis(a, 1, -1)
        b = np.moveaxis(b, 1, -1)
        return float(self._apply(self.params, jnp.asarray(a),
                                 jnp.asarray(b))[0])


def convert_lpips_weights(vgg_state: dict, lin_state: dict) -> dict:
    """Map torchvision VGG16 `features.*` conv weights + LPIPS `lin*.model.1`
    1x1 weights into the flax tree."""
    flat = {}
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, cid in enumerate(conv_ids):
        w = np.asarray(vgg_state[f"features.{cid}.weight"])
        flat[("vgg", f"conv_{i}", "kernel")] = np.transpose(
            w, (2, 3, 1, 0)).astype(np.float32)
        flat[("vgg", f"conv_{i}", "bias")] = np.asarray(
            vgg_state[f"features.{cid}.bias"], np.float32)
    for i in range(5):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        flat[(f"lin_{i}",)] = w.reshape(-1).astype(np.float32)
    from flax.traverse_util import unflatten_dict
    return {"params": unflatten_dict(flat)}

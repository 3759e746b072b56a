"""Device mesh helpers.

The reference has no multi-device parallelism (SURVEY.md section 2.4: a
shell script places single-GPU HTTP services on 3 GPUs). Here parallelism is
first-class: a ('data', 'model') mesh where
* 'data' shards independent edits/samples (the natural unit: one edit per
  chip, matching the reference's per-sample driver loop,
  test/test_diffusion_handles.py:68), and
* 'model' tensor-parallelizes the U-Net/VAE (attention heads and MLP/conv
  channels) for larger SD variants.
Sequence/pipeline/expert parallelism are deliberately out of scope at 64^2
latents (max 4096 attention tokens) — see SURVEY.md sections 2.4 and 5.7.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Create a 2D ('data', 'model') mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, have {len(devices)}")
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axes)

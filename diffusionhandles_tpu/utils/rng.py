"""Seeded noise with reference parity.

The reference seeds torch's CPU Mersenne-Twister and samples the initial
latent noise on the host (reference: diffhandles/guided_stable_diffuser.py:
159,197-200 — `torch.manual_seed` returns the default CPU generator and
diffusers' `randn_tensor` samples on the generator's device before moving to
the accelerator). Exactly reproducing that stream therefore only needs torch
CPU, which this environment ships; we expose it as the default so that
seed-2773 pipelines are bitwise identical to the reference, with a pure-JAX
threefry fallback (distributionally equivalent) when torch is unavailable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

try:  # torch (CPU) is optional at runtime.
    import torch as _torch
except Exception:  # pragma: no cover
    _torch = None


def seeded_randn(shape: Sequence[int], seed: int,
                 method: str = "torch_cpu") -> np.ndarray:
    """Standard-normal noise with the given seed, as float32 on the host."""
    if method == "torch_cpu" and _torch is not None:
        gen = _torch.Generator(device="cpu").manual_seed(int(seed))
        return _torch.randn(tuple(shape), generator=gen,
                            dtype=_torch.float32).numpy()
    if method in ("jax", "torch_cpu"):  # fallback when torch is missing
        import jax
        key = jax.random.PRNGKey(int(seed))
        return np.asarray(jax.random.normal(key, tuple(shape),
                                            dtype=np.float32))
    raise ValueError(f"Unknown noise rng method '{method}'")

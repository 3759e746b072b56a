"""diffusionhandles_tpu — TPU-native DiffusionHandles framework.

A from-scratch JAX/Flax/Pallas re-design of the training-free 3D-aware image
editing pipeline from adobe-research/DiffusionHandles (CVPR 2024), built for
TPU: functional activation capture, jitted scan-based denoising loops,
jax.grad guidance, and Pallas/XLA geometry kernels.
"""

from diffusionhandles_tpu.config import (DiffusionHandlesConfig, load_config)

__all__ = ["DiffusionHandles", "DiffusionHandlesConfig", "load_config"]
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import: keeps `import diffusionhandles_tpu` light (config-only) and
    # avoids pulling jax/flax until a model-facing symbol is requested.
    if name == "DiffusionHandles":
        from diffusionhandles_tpu.pipeline import DiffusionHandles
        return DiffusionHandles
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

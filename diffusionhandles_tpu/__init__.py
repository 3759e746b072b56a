"""diffusionhandles_tpu — TPU-native DiffusionHandles framework.

A from-scratch JAX/Flax/Pallas re-design of the training-free 3D-aware image
editing pipeline from adobe-research/DiffusionHandles (CVPR 2024), built for
TPU: functional activation capture, jitted scan-based denoising loops,
jax.grad guidance, and Pallas/XLA geometry kernels.
"""

from diffusionhandles_tpu.config import (DiffusionHandlesConfig, load_config)

__all__ = ["DiffusionHandles", "DiffusionHandlesConfig", "load_config"]
__version__ = "0.1.0"


_LAZY = {
    "DiffusionHandles": ("diffusionhandles_tpu.pipeline",
                         "DiffusionHandles"),
    "GuidedStableDiffuser": ("diffusionhandles_tpu.diffuser",
                             "GuidedStableDiffuser"),
    "StableNullInverter": ("diffusionhandles_tpu.inverter",
                           "StableNullInverter"),
    "transform_depth": ("diffusionhandles_tpu.geometry.transform",
                        "transform_depth"),
    "edit_batch": ("diffusionhandles_tpu.parallel.batch", "edit_batch"),
}


def __getattr__(name):
    # Lazy import: keeps `import diffusionhandles_tpu` light (config-only)
    # and avoids pulling jax/flax until a model-facing symbol is requested.
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

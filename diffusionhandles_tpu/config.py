"""Configuration system.

YAML-compatible dataclass configs using the same keys as the reference's
OmegaConf config (reference: diffhandles/config/default.yaml:1-15), so that the
reference's ablation YAMLs (reference: test/config/*.yaml) load unchanged.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Optional

import yaml


@dataclasses.dataclass
class GuidedDiffuserConfig:
    """Hyperparameters of the guided diffuser.

    Keys and defaults mirror reference: diffhandles/config/default.yaml:1-14.
    TPU-specific additions are grouped at the bottom.
    """

    bg_weight: float = 1.25
    fg_weight: float = 1.5
    fg_patch_size: int = 1
    bg_patch_size: int = 1
    use_depth: bool = True
    save_denoising_steps: bool = False
    bg_loss_type: str = "global_avg"  # 'global_avg' | 'local_avg'
    num_timesteps: int = 50
    num_optsteps: int = 3
    guidance_max_step: int = 38
    guidance_schedule_type: str = "constant"  # 'constant' | 'linear' | 'quadratic'
    bg_erosion: int = 0
    seed: int = 2773

    # --- TPU-specific settings (no reference counterpart) ---
    # Compute dtype for the diffusion model ('bfloat16' recommended on TPU).
    dtype: str = "bfloat16"
    # Parameter storage dtype; bf16 halves weight HBM traffic (the pipeline
    # optimizes latents/embeddings, never weights, so fp32 master weights
    # buy nothing at inference).
    param_dtype: str = "bfloat16"
    # Classifier-free guidance scale (hardcoded 7.5 in the reference,
    # guided_stable_diffuser.py:264).
    guidance_scale: float = 7.5
    # Learning rate of the guidance gradient-descent on latents
    # (hardcoded 0.1 in the reference, guided_stable_diffuser.py:434).
    guidance_lr: float = 0.1
    # Maximum number of deduplicated (orig-cell, trans-cell) correspondence
    # pairs carried through the jitted guidance energy (fixed shapes for XLA).
    max_correspondences: int = 16384
    # 'torch_cpu' reproduces the reference's seeded torch CPU RNG bitwise;
    # 'jax' uses a JAX threefry key derived from `seed`.
    noise_rng: str = "torch_cpu"
    # Storage dtype of the recorded activation stacks (~1 GB at fp32 for
    # 50 steps); bf16 halves HBM traffic in the guided pass. Use 'float32'
    # for strict numerical parity runs.
    activation_store_dtype: str = "bfloat16"
    # Pallas flash attention for the no-grad U-Net passes (3x faster than
    # dense attention at the 4096-token self-attention layers).
    flash_attention: bool = True
    # Use jax.checkpoint on U-Net blocks when differentiating the guidance
    # energy (trades FLOPs for HBM). Batch-1 64^2 guidance fits HBM without
    # remat, so the default favors speed (bwd ~2.2x fwd instead of ~3x).
    remat_guidance: bool = False
    # Pallas flattened-shift kernel for eligible 3x3 convs (ops/conv.py);
    # applied only on TPU backends (XLA conv path elsewhere).
    pallas_conv: bool = True
    # Null-text inner optimization loop form: 'while' (reference
    # semantics with the on-device early stop — optimal with real
    # checkpoints where most iterations stop early) or 'scan' (masked
    # fixed-trip loop, IDENTICAL values; faster when all iterations run,
    # e.g. random-weight benches).
    null_opt_inner_loop: str = "while"
    # Capture the guidance activation stacks during the null-text
    # inversion's per-timestep conditional U-Net pass instead of running
    # the separate recording-reconstruction scan: the inversion's CFG
    # roll-forward visits exactly the recording trajectory, so its
    # cond-row activations equal the recording pass's (the pipeline facade
    # then serves generate_input_image from the capture — one whole
    # 50-step batch-2 scan saved per edit). Disable for strict
    # phase-by-phase parity debugging.
    fused_recording: bool = True


@dataclasses.dataclass
class ModelPathsConfig:
    """Where to find converted / original model weights.

    If `checkpoint_dir` is None, models are created with seeded random weights
    at the real architecture shapes (useful for benchmarking and offline CI;
    outputs are not meaningful images).
    """

    checkpoint_dir: Optional[str] = None
    model_name: str = "stabilityai/stable-diffusion-2-depth"


@dataclasses.dataclass
class DiffusionHandlesConfig:
    """Top-level config (reference: diffhandles/config/default.yaml)."""

    guided_diffuser: GuidedDiffuserConfig = dataclasses.field(
        default_factory=GuidedDiffuserConfig)
    depth_transform_mode: str = "pc"  # 'pc' | 'mesh'
    model_paths: ModelPathsConfig = dataclasses.field(
        default_factory=ModelPathsConfig)


def _update_dataclass(obj: Any, data: dict) -> Any:
    for key, value in data.items():
        if not hasattr(obj, key):
            raise KeyError(
                f"Unknown config key '{key}' for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _update_dataclass(current, value)
        else:
            setattr(obj, key, value)
    return obj


def load_config(path: Optional[str] = None) -> DiffusionHandlesConfig:
    """Load a config YAML, overlaying it on the defaults.

    Accepts the reference's YAML schema verbatim
    (reference: diffhandles/diffusion_handles.py:15-20).
    """
    conf = DiffusionHandlesConfig()
    if path is not None:
        with open(pathlib.Path(path), "r") as f:
            data = yaml.safe_load(f) or {}
        _update_dataclass(conf, data)
    return conf


def config_from_dict(data: dict) -> DiffusionHandlesConfig:
    conf = DiffusionHandlesConfig()
    _update_dataclass(conf, data)
    return conf


def config_to_dict(conf: Any) -> dict:
    return dataclasses.asdict(conf)

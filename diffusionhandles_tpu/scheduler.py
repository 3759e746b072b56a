"""DDIM scheduler as pure JAX functions.

Replicates the numerics of diffusers' DDIMScheduler as configured by the
reference (reference: diffhandles/guided_stable_diffuser.py:31-32):
  beta_start=0.00085, beta_end=0.012, beta_schedule='scaled_linear',
  clip_sample=False, set_alpha_to_one=False, eta=0, prediction_type='epsilon',
  1000 training timesteps, 'leading' timestep spacing, steps_offset=0,
plus the inverter's closed-form prev/next steps
(reference: diffhandles/stable_null_inverter.py:25-43).

Design: a frozen table object (`DDIMSchedule`) holds every per-step constant
precomputed on the host, so the jitted per-step functions are pure gathers +
FMAs — no data-dependent control flow, scan-friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DDIMSchedule(NamedTuple):
    """Precomputed DDIM tables for a fixed number of inference steps.

    All arrays are float32. `timesteps` is ordered high->low (denoising
    order), matching `scheduler.timesteps` in diffusers.
    """

    num_train_timesteps: int
    num_inference_steps: int
    # [num_inference_steps] training timesteps in denoising order (t0 > t1 > ...).
    timesteps: np.ndarray
    # [num_train_timesteps] cumulative alpha products.
    alphas_cumprod: np.ndarray
    final_alpha_cumprod: float
    # Per-inference-step gathered constants, indexed by denoising step s
    # (s=0 is the noisiest step, t=timesteps[0]).
    alpha_t: np.ndarray        # alphas_cumprod[timesteps[s]]
    alpha_prev: np.ndarray     # alphas_cumprod[timesteps[s] - ratio], final for <0


def make_ddim_schedule(
    num_inference_steps: int = 50,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> DDIMSchedule:
    # 'scaled_linear' beta schedule.
    betas = np.linspace(
        beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps,
        dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    # set_alpha_to_one=False -> final alpha is alphas_cumprod[0].
    final_alpha_cumprod = float(alphas_cumprod[0])

    # 'leading' timestep spacing with steps_offset=0.
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()
    timesteps = timesteps[::-1].copy().astype(np.int64)

    prev_timesteps = timesteps - step_ratio
    alpha_t = alphas_cumprod[timesteps]
    alpha_prev = np.where(
        prev_timesteps >= 0,
        alphas_cumprod[np.clip(prev_timesteps, 0, None)],
        final_alpha_cumprod)

    return DDIMSchedule(
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
        timesteps=timesteps,
        alphas_cumprod=alphas_cumprod.astype(np.float32),
        final_alpha_cumprod=final_alpha_cumprod,
        alpha_t=alpha_t.astype(np.float32),
        alpha_prev=alpha_prev.astype(np.float32),
    )


def ddim_step(schedule: DDIMSchedule, eps, step_idx, sample):
    """One deterministic (eta=0) DDIM denoising step x_t -> x_{t-1}.

    `step_idx` is the denoising step index s (0 = noisiest); may be a traced
    int32 (scan carry), the per-step constants are gathered on device.

    Matches diffusers DDIMScheduler.step with the reference's settings and
    the inverter's `prev_step` (reference: stable_null_inverter.py:25-33).
    """
    alpha_t = jnp.asarray(schedule.alpha_t)[step_idx]
    alpha_prev = jnp.asarray(schedule.alpha_prev)[step_idx]
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    pred_x0 = (sample - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
    direction = jnp.sqrt(1.0 - alpha_prev) * eps
    return jnp.sqrt(alpha_prev) * pred_x0 + direction


def ddim_next_step(schedule: DDIMSchedule, eps, step_idx, sample):
    """One inversion (forward-noising) step x_t -> x_{t+next_ratio}.

    `step_idx` indexes the *inversion* iteration i in [0, S): the reference
    iterates timesteps low->high as `timesteps[S - i - 1]`
    (reference: stable_null_inverter.py:35-43,112-122). In our per-step
    constant arrays that timestep is at denoising index S - 1 - i, whose
    (alpha_t, alpha_prev) pair is exactly the (next, current) alpha pair of
    the inversion step.
    """
    s = schedule.num_inference_steps - 1 - step_idx
    alpha_next = jnp.asarray(schedule.alpha_t)[s]       # alphas_cumprod[t]
    alpha_cur = jnp.asarray(schedule.alpha_prev)[s]     # alphas_cumprod[t-ratio]
    sample = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    pred_x0 = (sample - jnp.sqrt(1.0 - alpha_cur) * eps) / jnp.sqrt(alpha_cur)
    direction = jnp.sqrt(1.0 - alpha_next) * eps
    return jnp.sqrt(alpha_next) * pred_x0 + direction


def add_noise(schedule: DDIMSchedule, sample, noise, timestep: int):
    """q-sample: sqrt(a_t) x0 + sqrt(1-a_t) eps (diffusers add_noise)."""
    alpha = jnp.asarray(schedule.alphas_cumprod)[timestep]
    return (jnp.sqrt(alpha) * sample.astype(jnp.float32)
            + jnp.sqrt(1.0 - alpha) * noise.astype(jnp.float32))


def scale_model_input(sample, timestep=None):
    """DDIM does not rescale model inputs; identity for API parity."""
    del timestep
    return sample

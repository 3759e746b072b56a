#!/usr/bin/env python
"""Probe: what makes a serialized pipeline executable 300+ MB?

Cold start on this runtime is bytes-limited: `deserialize_and_load` ships
the serialized executable through the ~20-35 MB/s device tunnel, so every
program megabyte is ~30-50 ms of fresh-process first-edit latency
(PERFORMANCE.md "Cold start"). This probe compiles the REAL SD-2 ddim_loop
(one batch-1 U-Net forward in a 50-step scan — the smallest pipeline
program with the full U-Net) under flag/structure variants and prints
serialized size + a short on-device timing, to find which knob carries the
bytes.

Usage: python scripts/probe_aotsize.py [variant ...]
  variants: base, nodouble, taps_off, flash_off, scan1
"""

import os
import pathlib
import sys
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("DIFFHANDLES_AOT_DIR", "")   # no store writes

VARIANT_FLAGS = {
    "base": "",
    "nodouble": ("--xla_tpu_enable_while_loop_double_buffering=false"),
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    extra = VARIANT_FLAGS.get(variant, "")
    if extra:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " " + extra)
    import jax
    import jax.numpy as jnp

    from diffusionhandles_tpu.config import GuidedDiffuserConfig
    from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
    from diffusionhandles_tpu.inverter import StableNullInverter

    conf = GuidedDiffuserConfig()
    if variant == "taps_off":
        conf.pallas_conv = False
    if variant == "flash_off":
        conf.flash_attention = False
    diffuser = GuidedStableDiffuser(conf, variant="sd2")
    inv = StableNullInverter(diffuser)

    model = diffuser
    unet = model.unet_fast
    schedule = model.schedule
    timesteps = jnp.asarray(schedule.timesteps, jnp.int32)
    from diffusionhandles_tpu.models.unet import maybe_prepare_unet_params
    from diffusionhandles_tpu.scheduler import ddim_next_step

    S = 1 if variant == "scan1" else schedule.num_inference_steps

    def run(unet_params, latent0, depth64, cond_emb):
        unet_params = maybe_prepare_unet_params(unet_params)

        def step(latent, i):
            t = timesteps[S - 1 - i]
            model_in = model._unet_in(latent, depth64)
            eps, _, _ = unet.apply(unet_params, model_in, t, cond_emb)
            nxt = ddim_next_step(schedule, eps, i, latent)
            return nxt, nxt

        final, traj = jax.lax.scan(step, latent0, jnp.arange(S))
        return jnp.concatenate([latent0[None], traj], axis=0)

    r = model.latent_res
    latent0 = jnp.zeros((1, r, r, 4), jnp.float32)
    depth64 = jnp.zeros((1, r, r, 1), jnp.float32)
    cond = jnp.zeros((1, 77, 1024), jnp.float32)

    t0 = time.perf_counter()
    lowered = jax.jit(run).lower(model.models.unet_params, latent0,
                                 depth64, cond)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()

    from jax.experimental.serialize_executable import serialize
    payload, _, _ = serialize(compiled)
    print(f"[{variant}] trace+lower {t1 - t0:.1f}s, compile {t2 - t1:.1f}s, "
          f"serialized {len(payload) / 1e6:.1f} MB", flush=True)

    # quick on-device timing (amortized over the scan; jit-call overhead
    # ~2 ms is noise at 50x8.5 ms)
    out = compiled(model.models.unet_params, latent0, depth64, cond)
    float(jnp.sum(out[-1]))
    t3 = time.perf_counter()
    out = compiled(model.models.unet_params, latent0, depth64, cond)
    float(jnp.sum(out[-1]))
    t4 = time.perf_counter()
    print(f"[{variant}] scan wall {t4 - t3:.3f}s "
          f"({(t4 - t3) / S * 1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-shape probe of the fused GN+SiLU+conv3x3 kernel (ops/gn_conv.py)
against the unfused row-major reference, on the real SD-2 resnet shapes.
Bypasses the VMEM eligibility gate — this is how the gate's ceiling gets
calibrated: shapes that fail to compile or run slower stay gated out.

Usage: python scripts/probe_gn_conv.py [--grad]
"""
import os
import pathlib
import sys
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.ops.gn_conv import (gn_silu_conv3x3,
                                              gn_silu_conv3x3_ref)

# (h, ci, co) for every distinct SD-2-depth resnet half at batch 1
SHAPES = [
    (64, 320, 320), (64, 640, 320), (64, 960, 320),
    (32, 320, 640), (32, 640, 640), (32, 960, 640), (32, 1280, 640),
    (32, 1920, 640),
    (16, 640, 1280), (16, 1280, 1280), (16, 1920, 1280), (16, 2560, 1280),
    (8, 1280, 1280), (8, 2560, 1280),
]
GROUPS = 32
STEPS = 30


def timed(fn, *args):
    out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / 5 / STEPS * 1e6  # us/op


def main():
    grad = "--grad" in sys.argv
    for h, ci, co in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, h, h, ci), jnp.bfloat16)
        g = jnp.asarray(1 + 0.1 * rng.randn(ci), jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(ci), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.02, jnp.float32)

        def mk(op):
            if grad:
                def loss(xx):
                    def step(c, _):
                        y = op(xx * c, g, b, w, GROUPS, 1e-5)
                        return c + 1e-6 * jnp.mean(
                            y.astype(jnp.float32)), None
                    c, _ = jax.lax.scan(step, jnp.float32(1.0), None,
                                        length=STEPS)
                    return c
                return jax.jit(jax.grad(lambda xx: loss(xx)))
            def run(xx):
                def step(c, _):
                    y = op(xx * c, g, b, w, GROUPS, 1e-5)
                    return c + 1e-6 * jnp.mean(y.astype(jnp.float32)), None
                c, _ = jax.lax.scan(step, jnp.float32(1.0), None,
                                    length=STEPS)
                return c
            return jax.jit(run)

        arg = x if not grad else x
        try:
            t_f = timed(mk(gn_silu_conv3x3), arg)
            ok = "ok"
        except Exception as e:
            t_f, ok = float("nan"), type(e).__name__
        t_r = timed(mk(gn_silu_conv3x3_ref), arg)
        tag = "grad" if grad else "fwd"
        print(f"{tag} h={h:3d} ci={ci:5d} co={co:5d}: "
              f"fused {t_f:8.1f} us  ref {t_r:8.1f} us  "
              f"({ok}{'' if ok != 'ok' else f', {t_r / t_f:.2f}x'})",
              flush=True)


if __name__ == "__main__":
    main()

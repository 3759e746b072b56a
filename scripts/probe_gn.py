#!/usr/bin/env python
"""Per-shape probe of the standalone fused GN(+SiLU) Pallas kernel
(ops/groupnorm.py) against the fp32 flax-GroupNorm composition, on every
distinct SD-2-depth GroupNorm site shape. Motivated by the round-4
fwd+bwd scan trace: XLA's GN stat fusions total ~2 ms/step and run ~6x
off HBM roofline (93 us at [4096, 320] vs a ~16 us r+w bound).

Two harnesses per shape:
  bare     — y = gn_silu(x)                      (kernel in isolation)
  sandwich — y = conv3x3_taps(gn_silu(x))        (realistic consumer: the
             tap matmuls XLA would otherwise overlap the stats with —
             the round-3 gn_conv megakernel lost exactly this overlap)

Usage: python scripts/probe_gn.py [--grad] [--bare]
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

from diffusionhandles_tpu.ops.conv import conv3x3_taps
from diffusionhandles_tpu.ops.groupnorm import gn_ok, gn_silu, gn_silu_ref

# (batch, h, ci, act) for every distinct GN site at the real operating
# point: resnet norm1/norm2 (act=silu) + attention GroupNorm (act=none)
SHAPES = [
    (1, 64, 320, True), (1, 64, 640, True), (1, 64, 960, True),
    (1, 32, 320, True), (1, 32, 640, True), (1, 32, 960, True),
    (1, 32, 1280, True), (1, 32, 1920, True),
    (1, 16, 640, True), (1, 16, 1280, True), (1, 16, 1920, True),
    (1, 16, 2560, True),
    (1, 8, 1280, True), (1, 8, 2560, True),
    (1, 64, 320, False), (1, 32, 640, False), (1, 16, 1280, False),
    (2, 64, 320, True), (2, 64, 960, True),   # CFG batch
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
    bare = "--bare" in sys.argv
    for bsz, h, ci, act in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(bsz, h, h, ci), jnp.bfloat16)
        g = jnp.asarray(1 + 0.1 * rng.randn(ci), jnp.float32)
        b = jnp.asarray(0.1 * rng.randn(ci), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, ci, ci) * 0.02, jnp.bfloat16)
        eps = 1e-5 if act else 1e-6

        def mk(op):
            def apply(xx):
                y = op(xx, g, b, GROUPS, eps, act, jnp.bfloat16)
                if not bare:
                    y = conv3x3_taps(y, w)
                return jnp.mean(y.astype(jnp.float32))

            def body(xx):
                def step(c, _):
                    return c + 1e-6 * apply(xx * c), None
                c, _ = jax.lax.scan(step, jnp.float32(1.0), None,
                                    length=STEPS)
                return c
            if grad:
                return jax.jit(jax.grad(body))
            return jax.jit(body)

        try:
            t_p = timed(mk(gn_silu), x)
            ok = "ok"
        except Exception as e:
            t_p, ok = float("nan"), type(e).__name__
        t_r = timed(mk(gn_silu_ref), x)
        tag = ("grad" if grad else "fwd") + ("/bare" if bare else "/sand")
        gate = "" if gn_ok(x.shape, GROUPS) else "  [GATED OUT]"
        print(f"{tag} b={bsz} h={h:3d} c={ci:5d} act={int(act)}: "
              f"pallas {t_p:8.1f} us  xla {t_r:8.1f} us  "
              f"({ok}{'' if ok != 'ok' else f', {t_r / t_p:.2f}x'}){gate}",
              flush=True)


if __name__ == "__main__":
    main()

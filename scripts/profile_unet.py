#!/usr/bin/env python
"""Capture a device trace of the batch-1 U-Net fwd and fwd+bwd, print the
top ops (utils/xplane parser). Perf-lever discovery for the <10 s target."""
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

from diffusionhandles_tpu.models.unet import (UNet2DCondition, UNetConfig,
                                              init_unet_params)
from diffusionhandles_tpu.utils.xplane import report


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    pc = True if "--pallas" in sys.argv else (
        "taps" if "--taps" in sys.argv else False)
    cfg = UNetConfig(in_channels=5, dtype=jnp.bfloat16,
                     param_dtype=jnp.bfloat16, flash_attention=True,
                     remat=False, pallas_conv=pc)
    unet, params = init_unet_params(cfg, seed=0)
    x1 = jnp.asarray(np.random.randn(1, 64, 64, 5), jnp.float32)
    ctx1 = jnp.asarray(np.random.randn(1, 77, 1024), jnp.float32)
    t = jnp.int32(500)

    if what == "fwd":
        fn = jax.jit(lambda p, x, c: unet.apply(p, x, t, c)[0])
        args = (params, x1, ctx1)
    else:
        def loss_ctx(c, p, x):
            eps, _, _ = unet.apply(p, x, t, c)
            return jnp.mean(eps.astype(jnp.float32) ** 2)
        fn = jax.jit(jax.value_and_grad(loss_ctx))
        args = (ctx1, params, x1)

    out = fn(*args)
    jax.block_until_ready(out)

    trace_dir = f"/tmp/trace_{what}" + (
        "_pallas" if "--pallas" in sys.argv else
        "_taps" if "--taps" in sys.argv else "")
    with jax.profiler.trace(trace_dir):
        for _ in range(8):
            out = fn(*args)
        jax.block_until_ready(out)
    print(report(trace_dir, top=40))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbenchmark the SD2 U-Net forward / fwd+bwd costs on the live device.

Used to pick perf levers for the <10 s end-to-end target (VERDICT item 3).
"""
import os
import pathlib
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.models.unet import (UNet2DCondition, UNetConfig,
                                              init_unet_params)


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(np.asarray, out)  # host sync (block_until_ready can lie
    t0 = time.perf_counter()       # on this device runtime)
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / n


def main():
    cfg = UNetConfig(in_channels=5, dtype=jnp.bfloat16,
                     param_dtype=jnp.bfloat16, flash_attention=True,
                     remat=False)
    unet, params = init_unet_params(cfg, seed=0)
    cfg_dense = dataclasses.replace(cfg, flash_attention=False)
    unet_dense = UNet2DCondition(cfg_dense)

    x1 = jnp.asarray(np.random.randn(1, 64, 64, 5), jnp.float32)
    x2 = jnp.concatenate([x1, x1], 0)
    ctx1 = jnp.asarray(np.random.randn(1, 77, 1024), jnp.float32)
    ctx2 = jnp.concatenate([ctx1, ctx1], 0)
    t = jnp.int32(500)

    fwd_flash = jax.jit(lambda p, x, c: unet.apply(p, x, t, c)[0])
    fwd_dense = jax.jit(lambda p, x, c: unet_dense.apply(p, x, t, c)[0])

    def loss_ctx(c, p, x):
        eps, _, _ = unet.apply(p, x, t, c)
        return jnp.mean(eps.astype(jnp.float32) ** 2)

    def loss_ctx_dense(c, p, x):
        eps, _, _ = unet_dense.apply(p, x, t, c)
        return jnp.mean(eps.astype(jnp.float32) ** 2)

    def loss_lat(x, p, c):
        eps, _, _ = unet.apply(p, x, t, c)
        return jnp.mean(eps.astype(jnp.float32) ** 2)

    vg_ctx_flash = jax.jit(jax.value_and_grad(loss_ctx))
    vg_ctx_dense = jax.jit(jax.value_and_grad(loss_ctx_dense))
    vg_lat_flash = jax.jit(jax.value_and_grad(loss_lat))

    import sys
    todo = [
        ("fwd_flash_b1", fwd_flash, (params, x1, ctx1)),
        ("fwd_flash_b2", fwd_flash, (params, x2, ctx2)),
        ("vg_ctx_flash_b1", vg_ctx_flash, (ctx1, params, x1)),
        ("vg_lat_flash_b1", vg_lat_flash, (x1, params, ctx1)),
    ]
    if "--dense" in sys.argv:
        todo += [("fwd_dense_b1", fwd_dense, (params, x1, ctx1)),
                 ("vg_ctx_dense_b1", vg_ctx_dense, (ctx1, params, x1))]
    print("compiling...", flush=True)
    for name, fn, args in todo:
        t0 = time.perf_counter()
        v = timeit(fn, *args)
        print(f"{name:>20}: {v * 1e3:8.2f} ms  "
              f"(incl compile {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

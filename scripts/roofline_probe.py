#!/usr/bin/env python
"""Measure the device's actual matmul and HBM rooflines (sanity check for
perf work — is the chip delivering v5e-class rates through this runtime?)"""
import os
import pathlib
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    # fn must reduce to a SCALAR on device: a full-array np.asarray would
    # measure the host tunnel, not the chip.
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n


def main():
    n = 8192
    a = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: jnp.sum((a @ b).astype(jnp.float32)))
    t = timeit(mm, a, b)
    fl = 2 * n ** 3
    print(f"matmul {n}^3 bf16: {t*1e3:.2f} ms -> {fl/t/1e12:.1f} TF/s",
          flush=True)

    big = jnp.asarray(np.random.randn(512, 1024, 1024), jnp.bfloat16)  # 1GB
    cp = jax.jit(lambda x: jnp.sum((x * 1.000001).astype(jnp.float32)))
    t = timeit(cp, big)
    byts = big.size * 2 * 2
    print(f"elementwise 1GiB bf16: {t*1e3:.2f} ms -> "
          f"{byts/t/1e9:.0f} GB/s r+w", flush=True)

    # skinny conv-like matmul (the U-Net shape class): [4096,2880]@[2880,320]
    x = jnp.asarray(np.random.randn(4096, 2880), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(2880, 320), jnp.bfloat16)
    t = timeit(jax.jit(lambda x, w: jnp.sum((x @ w).astype(jnp.float32))), x, w)
    fl = 2 * 4096 * 2880 * 320
    print(f"skinny conv-matmul: {t*1e3:.3f} ms -> {fl/t/1e12:.1f} TF/s",
          flush=True)

    # chained small matmuls (op-overhead probe): 100 x [4096,320]@[320,320]
    w2 = jnp.asarray(np.random.randn(320, 320), jnp.bfloat16)
    def chain(x, w):
        h = x[:, :320]
        for _ in range(100):
            h = h @ w
        return jnp.sum(h.astype(jnp.float32))
    t = timeit(jax.jit(chain), x, w2)
    print(f"100-chain [4096,320]@[320,320]: {t*1e3:.2f} ms -> "
          f"{t*1e6/100:.1f} us/matmul "
          f"(roofline ~{2*4096*320*320/197e12*1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()

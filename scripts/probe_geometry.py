#!/usr/bin/env python
"""Decompose transform_depth's ~580 ms (probe_step3 finding): scatter-min
splat, morphology, poisson CG (iteration count + wall), host transfers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_geometry.py
"""
import os
import pathlib
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import bench
    from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
    from diffusionhandles_tpu.geometry.transform import transform_depth
    from diffusionhandles_tpu.ops.morphology import binary_dilation_iter
    from diffusionhandles_tpu.ops.poisson import (masked_poisson_cg,
                                                  solve_laplacian_depth)

    res = 512
    sample = bench.make_sample(res)
    intr = GuidedStableDiffuser.get_depth_intrinsics()

    # step 2 equivalent (pipeline.set_foreground) without model init
    depth2d = sample["depth"].reshape(res, res)
    bg2d = sample["bg_depth"].reshape(res, res)
    mask2d = sample["fg_mask"].reshape(res, res) > 0.5
    t0 = time.perf_counter()
    dil = binary_dilation_iter(mask2d, 15)
    bg_depth = np.asarray(solve_laplacian_depth(depth2d, bg2d, dil))[
        None, None]
    print(f"set_foreground (dilate+CG): {(time.perf_counter()-t0)*1e3:.1f}"
          " ms (first call, incl compile)", flush=True)
    t = timeit(lambda: np.asarray(solve_laplacian_depth(
        depth2d, bg2d, dil)), n=3)
    print(f"solve_laplacian_depth: {t*1e3:.1f} ms", flush=True)
    t = timeit(lambda: np.asarray(binary_dilation_iter(mask2d, 15)), n=3)
    print(f"binary_dilation_iter(15): {t*1e3:.1f} ms", flush=True)

    args = dict(depth=sample["depth"], bg_depth=bg_depth,
                fg_mask=sample["fg_mask"], intrinsics=intr,
                rot_angle=20.0, rot_axis=np.array([0.0, 1.0, 0.0]),
                translation=np.array([0.0, 0.0, 0.1]))

    t = timeit(lambda: transform_depth(**args)[0], n=5)
    print(f"transform_depth total: {t*1e3:.1f} ms", flush=True)

    # Poisson alone on a representative disocclusion band (ring mask).
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    cx = cy = res / 2
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    band = (r > 80) & (r < 96)
    img = jnp.asarray(np.random.rand(res, res), jnp.float32)
    bandj = jnp.asarray(band)

    for maxiter in (2000, 500, 128):
        t = timeit(lambda mi=maxiter: masked_poisson_cg(img, bandj,
                                                        maxiter=mi), n=5)
        print(f"poisson CG band mask maxiter={maxiter}: {t*1e3:.1f} ms",
              flush=True)

    # Big-hole mask (step 2's shape class: dilated fg box).
    hole = (yy > res // 3) & (yy < 2 * res // 3) & \
           (xx > res // 3) & (xx < 2 * res // 3)
    holej = jnp.asarray(hole)
    for maxiter in (2000, 500):
        t = timeit(lambda mi=maxiter: masked_poisson_cg(img, holej,
                                                        maxiter=mi), n=3)
        print(f"poisson CG big hole maxiter={maxiter}: {t*1e3:.1f} ms",
              flush=True)

    # How many iterations does CG actually run? (instrumented copy)
    from diffusionhandles_tpu.ops.poisson import _neighbor_sum

    @jax.jit
    def cg_iters(image, mask, maxiter=2000, tol=1e-6):
        image = jnp.asarray(image, jnp.float32)
        m = jnp.asarray(mask, jnp.float32)
        known = image * (1.0 - m)
        matvec = lambda x: m * (4.0 * x - _neighbor_sum(m * x))
        b = m * _neighbor_sum(known)
        x0 = jnp.zeros_like(image)
        r0 = b - matvec(x0)
        rs0 = jnp.vdot(r0, r0)
        thresh = tol * rs0

        def cond(s):
            i, _, _, _, rs = s
            return jnp.logical_and(i < maxiter, rs > thresh)

        def body(s):
            i, x, r, p, rs = s
            ap = matvec(p)
            alpha = rs / (jnp.vdot(p, ap) + 1e-30)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.vdot(r, r)
            beta = rs_new / (rs + 1e-30)
            p = r + beta * p
            return i + 1, x, r, p, rs_new

        i, *_ = jax.lax.while_loop(cond, body,
                                   (jnp.int32(0), x0, r0, r0, rs0))
        return i

    print(f"CG iterations band: {int(cg_iters(img, bandj))}", flush=True)
    print(f"CG iterations big hole: {int(cg_iters(img, holej))}", flush=True)

    # while-loop per-iteration overhead at this shape: fixed 512 iters.
    @jax.jit
    def fixed_iters(image, mask):
        m = jnp.asarray(mask, jnp.float32)
        matvec = lambda x: m * (4.0 * x - _neighbor_sum(m * x))

        def body(s, _):
            x, p = s
            ap = matvec(p)
            a = jnp.vdot(p, ap)
            x = x + 1e-3 * a * p
            return (x, ap), ()
        (x, _), _ = jax.lax.scan(body, (image, image), None, length=512)
        return x
    t = timeit(lambda: fixed_iters(img, bandj), n=5)
    print(f"512 fixed scan CG-like iters: {t*1e3:.1f} ms "
          f"({t/512*1e6:.0f} us/iter)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the step-3 depth-transform + correspondence path: host binning
(transform_depth_pc + guidance.process_correspondences — pulls the splat's
per-point u/v/visible fields through the device tunnel) vs the device-fused
path (transform_depth_pc_processed + process_correspondences_device).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_corr.py
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


def sync(tree):
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "devices"):
            float(jnp.sum(jnp.abs(leaf.ravel()[:1].astype(jnp.float32))))


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn())
    return (time.perf_counter() - t0) / n


def main():
    import bench
    from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
    from diffusionhandles_tpu.geometry.transform import (
        transform_depth_pc, transform_depth_pc_processed)
    from diffusionhandles_tpu.guidance import process_correspondences

    res = 512
    sample = bench.make_sample(res)
    K = GuidedStableDiffuser.get_depth_intrinsics()
    args = dict(depth=sample["depth"], bg_depth=sample["bg_depth"],
                fg_mask=sample["fg_mask"], intrinsics=K,
                rot_angle=20.0, rot_axis=np.array([0.0, 1.0, 0.0]),
                translation=np.array([0.0, 0.0, 0.1]))

    def host_path():
        disp, corr = transform_depth_pc(**args)
        pc = process_correspondences(corr, img_res=res, max_corr=16384)
        return disp, pc

    def device_path():
        return transform_depth_pc_processed(max_corr=16384, **args)

    t_host = timeit(host_path)
    print(f"host-binned transform+process: {t_host*1e3:.1f} ms", flush=True)
    t_dev = timeit(device_path)
    print(f"device-fused transform+process: {t_dev*1e3:.1f} ms", flush=True)
    print(f"saving per edit: {(t_host-t_dev)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

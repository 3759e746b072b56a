#!/usr/bin/env python
"""Probe: conv-mode (taps vs XLA) warm latency vs serialized program bytes.

Round-5 size anatomy: every U-Net program compiled with taps convs
serializes ~3-5x larger than its XLA-conv twin (ddim_loop 324 MB taps vs
the VAE's 65 MB xla programs; guided_batched is small because its large
CFG batches fall back to XLA convs via conv3x3_ok). Cold start is
bytes-limited (~20-50 MB/s through the device tunnel), so the conv mode is
a direct warm-latency vs cold-start trade. This probe runs the full edit
in both modes in one process and prints step timings; sizes land in the
AOT store (read them with the store listing).

Usage: python scripts/probe_convmode.py [taps|xla ...]
"""
import os
import pathlib
import sys
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    modes = sys.argv[1:] or ["xla"]
    from bench import make_sample, run_edit
    from diffusionhandles_tpu.config import DiffusionHandlesConfig
    from diffusionhandles_tpu.pipeline import DiffusionHandles

    for mode in modes:
        conf = DiffusionHandlesConfig()
        if mode == "xla":
            conf.guided_diffuser.pallas_conv = False
        handles = DiffusionHandles(conf)
        sample = make_sample(handles.img_res)
        t0 = time.perf_counter()
        run_edit(handles, sample)
        warm = time.perf_counter() - t0
        times = [run_edit(handles, sample) for _ in range(2)]
        best = min(times, key=lambda t: t["total"])
        print(f"[conv_mode={mode}] warmup {warm:.1f}s, best total "
              f"{best['total']:.2f}s (step1 {best['step1_invert_record']:.2f}"
              f" step2 {best['step2_foreground']:.2f}"
              f" step3 {best['step3_guided_edit']:.2f})", flush=True)


if __name__ == "__main__":
    main()

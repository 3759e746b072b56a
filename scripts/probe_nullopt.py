#!/usr/bin/env python
"""Probe: null-text optimization inner-loop structure A/B on hardware.

Round-5 restructured the `while` inner loop (jax.vjp forward + backward
under lax.cond, trailing no-step iteration doubles as the post-loop uncond
forward) to cut one U-Net code instance from null_opt's serialized
executable (cold-start bytes). The first round-5 bench then measured
step1 6.12 -> 8.23 s. This probe times invert_input_image under each
inner-loop mode in ONE process so the regression can be attributed to the
loop structure, not environment noise.

Usage: python scripts/probe_nullopt.py [while|scan both]
"""
import os
import pathlib
import sys
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    modes = sys.argv[1:] or ["while", "scan"]
    from bench import make_sample
    from diffusionhandles_tpu.config import DiffusionHandlesConfig
    from diffusionhandles_tpu.pipeline import DiffusionHandles

    for mode in modes:
        conf = DiffusionHandlesConfig()
        conf.guided_diffuser.null_opt_inner_loop = mode
        handles = DiffusionHandles(conf)
        sample = make_sample(handles.img_res)
        prompt = "a toy cube on a table"

        def run():
            t0 = time.perf_counter()
            null_text_emb, init_noise = handles.invert_input_image(
                sample["img"], sample["depth"], prompt)
            out = handles.generate_input_image(
                sample["depth"], prompt, null_text_emb, init_noise)
            # drain device work (see bench._block)
            np.asarray(out[1])
            import jax
            for leaf in jax.tree.leaves(out[2]):
                np.asarray(leaf.ravel()[:1])
            return time.perf_counter() - t0

        warm = run()
        times = [run() for _ in range(2)]
        print(f"[null_opt inner_loop={mode}] warmup {warm:.1f}s, "
              f"step1 best {min(times):.2f}s (runs: "
              f"{', '.join(f'{t:.2f}' for t in times)})", flush=True)


if __name__ == "__main__":
    main()

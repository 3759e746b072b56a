#!/usr/bin/env python
"""Batched-editing benchmark: N transforms of one inverted image as ONE
batched guided denoise (parallel/batch.py). Refreshes the PERFORMANCE.md
batch-amortization number."""
import os
import pathlib
import sys
import time

_CACHE = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np


def main():
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from bench import make_sample
    from diffusionhandles_tpu.config import DiffusionHandlesConfig
    from diffusionhandles_tpu.parallel.batch import edit_batch
    from diffusionhandles_tpu.pipeline import DiffusionHandles

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    handles = DiffusionHandles(DiffusionHandlesConfig())
    sample = make_sample(512)
    prompt = "a toy cube on a table"

    null_text_emb, init_noise = handles.invert_input_image(
        sample["img"], sample["depth"], prompt)
    null_text_emb, init_noise, activations, _ = \
        handles.generate_input_image(sample["depth"], prompt,
                                     null_text_emb, init_noise)
    bg_depth = handles.set_foreground(sample["depth"], sample["fg_mask"],
                                      sample["bg_depth"])
    transforms = [dict(rotation_angle=10.0 * (i + 1),
                       rotation_axis=[0.0, 1.0, 0.0],
                       translation=[0.0, 0.0, 0.02 * i])
                  for i in range(batch)]

    def run():
        out = edit_batch(handles, sample["depth"], prompt,
                         sample["fg_mask"], bg_depth, null_text_emb,
                         init_noise, activations, transforms)
        np.asarray(out)
        return out

    run()  # compile
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(f"batched edit: batch={batch}  total={dt:.2f}s  "
          f"per-edit={dt / batch:.2f}s", flush=True)


if __name__ == "__main__":
    main()

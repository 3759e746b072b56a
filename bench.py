#!/usr/bin/env python
"""Benchmark: full DiffusionHandles edit at the reference operating point.

Measures the end-to-end wall clock of one full first-time edit of a 512x512
image at the reference's fixed operating point (50 DDIM steps, CFG 7.5,
<=3 guidance opt steps/denoising step through step 38, <=5 null-text inner
steps — reference: diffhandles/config/default.yaml, BASELINE.md):

  step 1  invert_input_image   (DDIM inversion + null-text optimization)
  step 1b generate_input_image (recording reconstruction)
  step 2  set_foreground       (Laplacian depth harmonization)
  step 3  transform_foreground (3D transform + guided denoising)

Reference baseline: ~84 s on one CUDA GPU (46 + 2 + 36,
reference: webapp/webapps/diffhandles_pipeline_webapp.py:811-813).

Weights are seeded-random at the real SD-2-depth architecture shapes
(wall-clock is weight-value independent); compile time is excluded via a
warmup edit.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
"""

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

# Persistent XLA compilation cache: the big scan/grad graphs take minutes to
# compile; cache them across runs.
_CACHE = pathlib.Path(__file__).resolve().parent / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

BASELINE_SECONDS = 84.0  # reference full first-time edit (see BASELINE.md)


def make_sample(res: int):
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.5 * yy / res).astype(np.float32)
    fg = ((yy >= res // 3) & (yy < 2 * res // 3)
          & (xx >= res // 3) & (xx < 2 * res // 3))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, res, res).astype(np.float32)
    return dict(img=img, depth=depth_fg[None, None],
                bg_depth=depth[None, None],
                fg_mask=fg.astype(np.float32)[None, None])


def _block(*trees):
    """Drain pending device work before reading a phase timer. The facade
    returns unrealized device arrays (production stays async); without this
    barrier step 1's device work drains inside step 2's timer and the phase
    table is noise (timing-only — the production path is untouched).
    jax.block_until_ready can lie through the axon device tunnel (verified
    round 2), so sync by reducing each device leaf to a scalar and pulling
    it; a full np.asarray would time the ~35 MB/s tunnel instead."""
    import jax
    import jax.numpy as jnp
    vals = [leaf.ravel()[:1].astype(jnp.float32)
            for tree in trees
            for leaf in jax.tree.leaves(tree) if hasattr(leaf, "devices")]
    if vals:
        # ONE combined scalar pull (still an ordering barrier on every
        # leaf): per-leaf pulls cost a tunnel round trip each
        float(jnp.sum(jnp.abs(jnp.concatenate(vals))))


def run_edit(handles, sample, prompt="a toy cube on a table"):
    t0 = time.perf_counter()
    null_text_emb, init_noise = handles.invert_input_image(
        sample["img"], sample["depth"], prompt)
    null_text_emb, init_noise, activations, latent_image = \
        handles.generate_input_image(sample["depth"], prompt, null_text_emb,
                                     init_noise)
    _block(null_text_emb, init_noise, activations, latent_image)
    t1 = time.perf_counter()
    bg_depth = handles.set_foreground(sample["depth"], sample["fg_mask"],
                                      sample["bg_depth"])
    _block(bg_depth)
    t2 = time.perf_counter()
    edited_img, edited_disparity = handles.transform_foreground(
        depth=sample["depth"], prompt=prompt, fg_mask=sample["fg_mask"],
        bg_depth=bg_depth, null_text_emb=null_text_emb,
        init_noise=init_noise, activations=activations,
        rot_angle=20.0, rot_axis=np.array([0.0, 1.0, 0.0]),
        translation=np.array([0.0, 0.0, 0.1]))
    np.asarray(edited_img)  # block on device work
    t3 = time.perf_counter()
    try:
        from diffusionhandles_tpu.utils.aot import AotStore
        print(f"aot-stats: {AotStore.default().stats}", flush=True)
    except Exception:
        pass
    return dict(step1_invert_record=t1 - t0, step2_foreground=t2 - t1,
                step3_guided_edit=t3 - t2, total=t3 - t0)


def bench_batched_edits(handles, sample, batch: int,
                        prompt="a toy cube on a table"):
    """Secondary metric: batched multi-transform editing throughput
    (sec/edit at batch N; no reference counterpart — the reference loops
    transforms serially)."""
    from diffusionhandles_tpu.parallel.batch import edit_batch
    null_text_emb, init_noise = handles.invert_input_image(
        sample["img"], sample["depth"], prompt)
    null_text_emb, init_noise, activations, _ = \
        handles.generate_input_image(sample["depth"], prompt, null_text_emb,
                                     init_noise)
    transforms = [{"rotation_angle": 5.0 * i,
                   "rotation_axis": [0.0, 1.0, 0.0],
                   "translation": [0.02 * i, 0.0, 0.0]}
                  for i in range(batch)]
    # compile
    edit_batch(handles, sample["depth"], prompt, sample["fg_mask"],
               sample["bg_depth"], null_text_emb, init_noise, activations,
               transforms)
    t0 = time.perf_counter()
    imgs = edit_batch(handles, sample["depth"], prompt, sample["fg_mask"],
                      sample["bg_depth"], null_text_emb, init_noise,
                      activations, transforms)
    np.asarray(imgs)
    dt = time.perf_counter() - t0
    print(f"  batched guided edit x{batch}: {dt:.2f}s total, "
          f"{dt / batch:.2f}s/edit", file=sys.stderr)
    return dt / batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="sd2",
                        choices=["sd2", "tiny"])
    parser.add_argument("--repeats", type=int, default=1)
    parser.add_argument("--skip-warmup", action="store_true")
    parser.add_argument("--batched", type=int, default=8,
                        help="also benchmark batched editing at this batch "
                             "(0 disables); the per-edit number rides the "
                             "JSON line as batched_edit_s_per_edit")
    args = parser.parse_args()

    if not args.skip_warmup:
        # Steady-state timing must never route through the XLA-conv cold
        # twin (dual-mode routing is opt-in via DIFFHANDLES_COLD_START=1;
        # see pipeline.py): pin it off so the warmup compiles/loads the
        # hot programs and the timed runs measure them. `--skip-warmup`
        # respects the environment — that run IS the fresh-process
        # first-edit (cold start) measurement in whichever mode is set.
        os.environ["DIFFHANDLES_COLD_START"] = "0"

    from diffusionhandles_tpu.pipeline import DiffusionHandles

    handles = DiffusionHandles(variant=args.variant)
    sample = make_sample(handles.img_res)

    if not args.skip_warmup:
        warm = run_edit(handles, sample)
        print(f"warmup (incl. compile): {warm['total']:.1f}s",
              file=sys.stderr)

    times = [run_edit(handles, sample) for _ in range(args.repeats)]
    best = min(t["total"] for t in times)
    detail = min(times, key=lambda t: t["total"])
    for k, v in detail.items():
        print(f"  {k}: {v:.2f}s", file=sys.stderr)

    extra = {}
    if args.batched:
        try:
            per_edit = bench_batched_edits(handles, sample, args.batched)
            extra = {"batched_edit_s_per_edit": round(per_edit, 3),
                     "batched_batch": args.batched}
        except Exception as e:  # never let the secondary metric kill the run
            print(f"  batched bench failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "end-to-end 512^2 edit (50-step inversion + recording "
                  "recon + guided denoise), seconds",
        "value": round(best, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / best, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Generate synthetic demo samples in the photogen/webapp data layout.

Parity with the reference's sample directories (reference: webapp/data/*,
test/data/photogen/* — per-sample: input.png, mask.png, prompt.txt,
fg_prompt.txt, transforms.json, depth.exr, bg_depth.exr, bg.png; some
samples add a config.yaml with per-sample overrides,
reference: webapp/data/car_2/config.yaml). The reference ships real images;
this repo generates geometric scenes so the full harness runs offline.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffusionhandles_tpu.utils.image_io import save_depth, save_image


def make_sample(out_dir: pathlib.Path, name: str, res: int = 512,
                seed: int = 0, with_config: bool = False):
    rng = np.random.RandomState(seed)
    d = out_dir / name
    d.mkdir(parents=True, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")

    # a ground plane receding in depth + a floating box as the foreground
    bg_depth = 2.0 + 3.0 * (yy / res)
    cx, cy, half = (rng.randint(res // 3, 2 * res // 3),
                    rng.randint(res // 3, 2 * res // 3), res // 8)
    fg = ((np.abs(xx - cx) < half) & (np.abs(yy - cy) < half))
    depth = bg_depth.copy()
    depth[fg] = bg_depth[cy, cx] - 1.0

    # simple shaded image: albedo by region + depth shading
    img = np.zeros((3, res, res), np.float32)
    base = rng.rand(3) * 0.5 + 0.25
    obj = rng.rand(3) * 0.5 + 0.4
    shade = 1.0 - 0.4 * (depth - depth.min()) / (np.ptp(depth) + 1e-9)
    for c in range(3):
        img[c] = np.where(fg, obj[c], base[c]) * shade
    bg_img = np.zeros_like(img)
    bg_shade = 1.0 - 0.4 * (bg_depth - bg_depth.min()) / (np.ptp(bg_depth)
                                                          + 1e-9)
    for c in range(3):
        bg_img[c] = base[c] * bg_shade

    save_image(img, d / "input.png")
    save_image(bg_img, d / "bg.png")
    save_image(np.repeat(fg[None].astype(np.float32), 3, 0), d / "mask.png")
    save_depth(depth[None].astype(np.float32), d / "depth.exr")
    save_depth(bg_depth[None].astype(np.float32), d / "bg_depth.exr")
    (d / "prompt.txt").write_text(f"a box on a plane ({name})\n")
    (d / "fg_prompt.txt").write_text("box\n")
    with open(d / "transforms.json", "w") as f:
        json.dump({
            "edit_000": {"translation": [0.3, 0.0, 0.0],
                         "rotation_axis": [0.0, 1.0, 0.0],
                         "rotation_angle": 0.0},
            "edit_001": {"translation": [0.0, 0.0, 0.5],
                         "rotation_axis": [0.0, 1.0, 0.0],
                         "rotation_angle": 25.0},
            "edit_002": {"translation": [0.0, -0.2, 0.0],
                         "rotation_axis": [1.0, 0.0, 0.0],
                         "rotation_angle": -15.0},
        }, f, indent=2)
    if with_config:
        # per-sample override schema (reference: webapp/data/car_2/config.yaml)
        (d / "config.yaml").write_text(
            "fg_removal_dilation: 5\nfg_weight: 1.5\nbg_weight: 1.25\n")


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="data/demo")
    parser.add_argument("--num_samples", type=int, default=3)
    parser.add_argument("--res", type=int, default=512)
    args = parser.parse_args()
    out = pathlib.Path(args.out_dir)
    manifest = {}
    for i in range(args.num_samples):
        name = f"box_{i:02d}"
        make_sample(out, name, res=args.res, seed=i, with_config=(i == 0))
        manifest[name] = ["edit_000", "edit_001", "edit_002"]
    with open(out / "demo.json", "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"wrote {args.num_samples} samples to {out}")


if __name__ == "__main__":
    main()

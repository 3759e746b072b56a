#!/usr/bin/env python
"""Interactive-style transform visualizer (CLI).

Parity with the reference's transform_visualizer notebook
(reference: test/transform_visualizer.ipynb): renders the 3D depth transform
of a sample WITHOUT running any diffusion — writes the edited disparity and
an rgb correspondence-warp preview for a sweep of transform parameters.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
from diffusionhandles_tpu.geometry.transform import transform_depth
from diffusionhandles_tpu.utils.image_io import (load_depth, load_image,
                                                 save_image)


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--sample_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--mode", default="pc", choices=["pc", "mesh"])
    args = parser.parse_args()
    d = pathlib.Path(args.sample_dir)
    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    img = load_image(d / "input.png")[None]
    mask = load_image(d / "mask.png")[:1][None]
    depth = load_depth(d / "depth.exr")[None]
    bg_depth = load_depth(d / "bg_depth.exr")[None]
    with open(d / "transforms.json") as f:
        transforms = json.load(f)

    K = GuidedStableDiffuser.get_depth_intrinsics()
    for name, tr in transforms.items():
        disp, corr = transform_depth(
            depth, bg_depth, mask, K,
            rot_angle=tr.get("rotation_angle"),
            rot_axis=np.asarray(tr.get("rotation_axis", [0, 1, 0]),
                                np.float32),
            translation=np.asarray(tr.get("translation", [0, 0, 0]),
                                   np.float32),
            depth_transform_mode=args.mode)
        disp = np.asarray(disp)[0]
        lo, hi = disp.min(), disp.max()
        save_image(np.repeat((disp - lo) / max(hi - lo, 1e-9), 3, 0),
                   out / f"{name}_disparity.png")
        warped = img[0].copy()
        if len(corr):
            ox, oy, tx, ty = corr.T
            warped[:, ty, tx] = img[0][:, oy, ox]
        save_image(warped, out / f"{name}_warp.png")
        print(f"{name}: {len(corr)} correspondences")


if __name__ == "__main__":
    main()

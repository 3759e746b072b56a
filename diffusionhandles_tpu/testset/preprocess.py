"""Sample preprocessing CLIs.

Parity with the reference's per-model scripts:
  estimate_depth    (reference: test/estimate_depth.py — ZoeDepth -> .exr)
  remove_foreground (reference: test/remove_foreground.py — LaMa -> bg.png)
  estimate_foreground (reference: test/estimate_foreground.py — LangSAM ->
                       mask.png)
"""

from __future__ import annotations

import pathlib

import numpy as np

from diffusionhandles_tpu.utils.image_io import (load_image, save_depth,
                                                 save_image)


def estimate_depth(img_path: str, depth_path: str, estimator=None) -> None:
    """Image -> metric depth EXR (reference: estimate_depth.py:11-32)."""
    if estimator is None:
        from diffusionhandles_tpu.models.zoedepth import ZoeDepthEstimator
        estimator = ZoeDepthEstimator()
    img = load_image(img_path)[None]
    depth = estimator.estimate_depth(img)
    save_depth(depth[0], depth_path)


def remove_foreground(img_path: str, fg_mask_path: str, bg_path: str,
                      dilation: int = 3, remover=None) -> None:
    """Inpaint the (dilated) fg mask (reference: remove_foreground.py:11-42,
    which dilates the mask before LaMa)."""
    if remover is None:
        from diffusionhandles_tpu.models.lama import LamaInpainter
        remover = LamaInpainter()
    img = load_image(img_path)[None]
    mask = load_image(fg_mask_path)[:1][None]
    bg = remover.remove_foreground(img, mask, dilation=dilation)
    save_image(bg[0], bg_path)


def estimate_foreground(img_path: str, prompt: str, mask_path: str,
                        selector=None,
                        sam_checkpoint: str = None) -> None:
    """Text-prompted fg mask (reference: estimate_foreground.py:11-42).

    With `sam_checkpoint`, runs the LangSAM-parity two-stage pipeline
    (CLIP grounding -> released-weights SAM); otherwise the CLIP-similarity
    segmenter alone."""
    if selector is None:
        if sam_checkpoint is not None:
            from diffusionhandles_tpu.models.segmenter import (
                LangSamSegmenter)
            selector = LangSamSegmenter(sam_checkpoint=sam_checkpoint)
        else:
            from diffusionhandles_tpu.models.segmenter import CLIPSegmenter
            selector = CLIPSegmenter()
    img = load_image(img_path)[None]
    mask = selector.select_foreground(img, prompt)
    save_image(np.repeat(mask[0], 3, axis=0), mask_path)


def main():
    import argparse
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("estimate_depth")
    p1.add_argument("--img_path", required=True)
    p1.add_argument("--depth_path", required=True)
    p2 = sub.add_parser("remove_foreground")
    p2.add_argument("--img_path", required=True)
    p2.add_argument("--fg_mask_path", required=True)
    p2.add_argument("--bg_path", required=True)
    p2.add_argument("--dilation", type=int, default=3)
    p3 = sub.add_parser("estimate_foreground")
    p3.add_argument("--img_path", required=True)
    p3.add_argument("--prompt", required=True)
    p3.add_argument("--mask_path", required=True)
    p3.add_argument("--sam_checkpoint", default=None,
                    help="released sam_vit_h .pth for the two-stage "
                         "LangSAM-parity pipeline")
    args = parser.parse_args()
    if args.cmd == "estimate_depth":
        estimate_depth(args.img_path, args.depth_path)
    elif args.cmd == "remove_foreground":
        remove_foreground(args.img_path, args.fg_mask_path, args.bg_path,
                          args.dilation)
    else:
        estimate_foreground(args.img_path, args.prompt, args.mask_path,
                            sam_checkpoint=args.sam_checkpoint)


if __name__ == "__main__":
    main()

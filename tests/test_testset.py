"""Test-set driver end-to-end on synthetic photogen-format data with tiny
models: manifest ingestion, input synthesis, identity caching, skip-existing,
HTML gallery."""

import json
import pathlib

import numpy as np
import pytest

from diffusionhandles_tpu.config import (DiffusionHandlesConfig,
                                         GuidedDiffuserConfig)
from diffusionhandles_tpu.pipeline import DiffusionHandles
from diffusionhandles_tpu.testset.driver import \
    test_diffusion_handles as run_test_set
from diffusionhandles_tpu.utils.image_io import save_depth, save_image


@pytest.fixture(scope="module")
def handles():
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=3, num_optsteps=1, guidance_max_step=2,
            dtype="float32", remat_guidance=False))
    return DiffusionHandles(conf, variant="tiny")


def _make_sample(d: pathlib.Path, res: int):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    img = rng.rand(3, res, res).astype(np.float32)
    save_image(img, d / "input.png")
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    fg = ((yy >= res // 3) & (yy < 2 * res // 3)
          & (xx >= res // 3) & (xx < 2 * res // 3))
    save_image(np.repeat(fg[None].astype(np.float32), 3, 0), d / "mask.png")
    depth = (2.0 + 0.002 * yy).astype(np.float32)
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    save_depth(depth_fg[None], d / "depth.exr")
    save_depth(depth[None], d / "bg_depth.exr")
    (d / "prompt.txt").write_text("a toy cube on a table\n")
    (d / "fg_prompt.txt").write_text("toy cube\n")
    with open(d / "transforms.json", "w") as f:
        json.dump({
            "edit_000": {"translation": [0.1, 0.0, 0.0],
                         "rotation_axis": [0.0, 1.0, 0.0],
                         "rotation_angle": 0.0},
            "edit_001": {"translation": [0.0, 0.0, 0.0],
                         "rotation_axis": [0.0, 1.0, 0.0],
                         "rotation_angle": 15.0},
        }, f)


def test_driver_end_to_end(handles, tmp_path):
    res = handles.img_res
    input_dir = tmp_path / "inputs"
    out_dir = tmp_path / "results"
    _make_sample(input_dir / "cube", res)
    manifest = tmp_path / "set.json"
    with open(manifest, "w") as f:
        json.dump({"cube": ["edit_000", "edit_001"]}, f)

    run_test_set(
        test_set_path=str(manifest), input_dir=str(input_dir),
        output_dir=str(out_dir), handles=handles, img_res=res,
        cache_input_image_identity=True)

    sdir = out_dir / "cube"
    for fname in ["input.png", "mask.png", "disparity.png", "recon.png",
                  "edit_000.png", "edit_001.png", "edit_000_disparity.png"]:
        assert (sdir / fname).exists(), fname
    # gallery
    html = (out_dir / "set_summary.html").read_text()
    assert "edit_000.png" in html and "cube" in html
    assert (out_dir / "config.yaml").exists()
    assert (out_dir / "set.json").exists()

    # identity cache file in reference format
    import tempfile
    ident = (pathlib.Path(tempfile.gettempdir()) / "diffhandles" / "set"
             / "cube" / "input_image_identity.npz")
    assert ident.exists()
    data = np.load(ident)
    assert set(data.files) == {"null_text_emb", "init_noise",
                               "activations1", "activations2",
                               "activations3", "latent_image"}

    # skip_existing: second run should not recompute (fast)
    import time
    t0 = time.time()
    run_test_set(
        test_set_path=str(manifest), input_dir=str(input_dir),
        output_dir=str(out_dir), handles=handles, img_res=res,
        skip_existing=True)
    assert time.time() - t0 < 30

    # metrics.json exists and covers the sample
    with open(out_dir / "metrics.json") as f:
        metrics = json.load(f)
    assert set(metrics["samples"]) == {"cube"}
    assert metrics["samples"]["cube"]["recon_psnr_db"] is not None

    # resumed run (--skip_existing) with one NEW sample: skipped samples
    # never reach the metrics pass, so the artifact must merge the prior
    # run's entries — means over the FULL output set, not just new work
    _make_sample(input_dir / "cube2", res)
    with open(manifest, "w") as f:
        json.dump({"cube": ["edit_000", "edit_001"],
                   "cube2": ["edit_000"]}, f)
    run_test_set(
        test_set_path=str(manifest), input_dir=str(input_dir),
        output_dir=str(out_dir), handles=handles, img_res=res,
        skip_existing=True)
    with open(out_dir / "metrics.json") as f:
        merged = json.load(f)
    assert set(merged["samples"]) == {"cube", "cube2"}
    assert merged["num_samples"] == 2
    assert (merged["samples"]["cube"]["recon_psnr_db"]
            == metrics["samples"]["cube"]["recon_psnr_db"])

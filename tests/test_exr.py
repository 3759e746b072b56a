"""Native EXR library tests: roundtrips + decoding the reference test data's
PIZ-compressed half-float depth maps."""

import pathlib

import numpy as np
import pytest

from diffusionhandles_tpu.utils.exr import read_exr, write_exr

REF = pathlib.Path("/root/reference/test/data/photogen")


def test_roundtrip_float_zip(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(37, 53) * 10).astype(np.float32)
    p = tmp_path / "t.exr"
    write_exr(p, img, half=False, compression="zip")
    np.testing.assert_array_equal(read_exr(p), img)


def test_roundtrip_half(tmp_path):
    rng = np.random.RandomState(1)
    img = (rng.rand(64, 64) * 100).astype(np.float32)
    p = tmp_path / "t.exr"
    write_exr(p, img, half=True, compression="zip")
    back = read_exr(p)
    assert np.abs(back - img).max() / img.max() < 1e-3  # half precision


def test_roundtrip_multichannel(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.rand(31, 17, 3).astype(np.float32)
    p = tmp_path / "rgb.exr"
    write_exr(p, img, half=False, compression="zip",
              channel_names=["R", "G", "B"])
    back = read_exr(p, channel_order=["R", "G", "B"])
    assert back.shape == (31, 17, 3)
    np.testing.assert_array_equal(back, img)
    # file order is alphabetical (EXR spec)
    back_file_order = read_exr(p)
    np.testing.assert_array_equal(back_file_order[..., 0], img[..., 2])


def test_roundtrip_none_compression(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.rand(16, 16).astype(np.float32)
    p = tmp_path / "n.exr"
    write_exr(p, img, half=False, compression="none")
    np.testing.assert_array_equal(read_exr(p), img)


@pytest.mark.skipif(not REF.exists(), reason="reference data not mounted")
def test_read_reference_piz_depth():
    d = read_exr(REF / "car" / "depth.exr")
    assert d.shape == (512, 512)
    assert np.isfinite(d).all()
    # plausible metric depths from ZoeDepth
    assert 0.1 < d.min() < d.max() < 1000.0


@pytest.mark.skipif(not REF.exists(), reason="reference data not mounted")
def test_read_all_reference_exrs():
    files = sorted(REF.glob("*/*.exr"))
    assert len(files) > 20
    for f in files:
        d = read_exr(f)
        assert d.shape == (512, 512), f
        assert np.isfinite(d).all(), f
        assert (d > 0).all(), f

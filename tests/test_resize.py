"""Resize parity vs torch.nn.functional.interpolate (the reference's resizer,
e.g. diffhandles/guided_stable_diffuser.py:115-120, losses.py:8-9)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from diffusionhandles_tpu.ops.resize import resize_nchw


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("in_size,out_size", [
    (512, 64),   # depth -> latent grid (bicubic in reference init_depth)
    (32, 64),    # activation upsample in losses
    (64, 64),    # identity
    (17, 40),    # odd sizes
])
def test_matches_torch_interpolate(mode, in_size, out_size):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, in_size, in_size).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(out_size, out_size),
                         mode=mode, align_corners=False).numpy()
    got = np.asarray(resize_nchw(jnp.asarray(x), (out_size, out_size), mode))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_nonsquare_resize():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 30, 50).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(11, 23),
                         mode="bilinear", align_corners=False).numpy()
    got = np.asarray(resize_nchw(jnp.asarray(x), (11, 23), "bilinear"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

"""Guidance-loss parity vs an independent torch oracle.

The oracle re-implements the reference's loss formulas
(reference: diffhandles/losses.py) directly in torch with explicit
correspondence lists (including duplicates); our fixed-shape weighted
implementation must match to fp32 tolerance for patch sizes 1 and 3 and
both background loss types.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from diffusionhandles_tpu.guidance import (ProcessedCorrespondences,
                                           background_loss, foreground_loss,
                                           process_correspondences)
from diffusionhandles_tpu.utils.correspondences import pack_correspondences

RES = 16  # latent grid for the test (reference uses 64)


def _oracle_local_avg(f1, f2, x1, y1, x2, y2, patch):
    w1 = torch.zeros(f1.shape[-2], f1.shape[-1])
    w2 = torch.zeros(f2.shape[-2], f2.shape[-1])
    w1[y1, x1] = 1
    w2[y2, x2] = 1
    pool = torch.nn.AvgPool2d(patch, stride=1, padding=patch // 2)
    f1a = pool(w1[None, None] * f1[None]) / (pool(w1[None, None]) + 1e-10)
    f2a = pool(w2[None, None] * f2[None]) / (pool(w2[None, None]) + 1e-10)
    loss = (f1a[0, :, y1, x1] - f2a[0, :, y2, x2]).abs()
    return loss.mean(dim=-1).mean()


def _oracle_global_avg(f1, f2, x1, y1, x2, y2):
    a = f1[..., y1, x1].mean(dim=-1)
    b = f2[..., y2, x2].mean(dim=-1)
    return (a - b).abs().mean()


def _random_setup(seed, n_entries=40, channels=6, act_hw=8):
    rng = np.random.RandomState(seed)
    # correspondences at "image" res = RES*8 so //8 gives the latent grid
    img_res = RES * 8
    ox = rng.randint(0, img_res, n_entries)
    oy = rng.randint(0, img_res, n_entries)
    tx = rng.randint(0, img_res, n_entries)
    ty = rng.randint(0, img_res, n_entries)
    # inject duplicates (they must weight the mean like the reference)
    ox[5:10] = ox[0]
    oy[5:10] = oy[0]
    tx[5:10] = tx[0]
    ty[5:10] = ty[0]
    corr = pack_correspondences(ox, oy, tx, ty)
    acts = rng.randn(act_hw, act_hw, channels).astype(np.float32)
    acts_orig = rng.randn(act_hw, act_hw, channels).astype(np.float32)
    return corr, acts, acts_orig, img_res


@pytest.mark.parametrize("patch", [1, 3])
def test_foreground_loss_matches_oracle(patch):
    corr, acts, acts_orig, img_res = _random_setup(0)
    pc = process_correspondences(corr, img_res=img_res, max_corr=256,
                                 latent_res=RES)
    got = float(foreground_loss(jnp.asarray(acts), jnp.asarray(acts_orig),
                                pc, patch, (RES, RES)))

    # oracle: torch bilinear resize to (RES, RES) + per-entry local-avg L1
    f_orig = F.interpolate(torch.from_numpy(acts_orig).permute(
        2, 0, 1)[None], (RES, RES), mode="bilinear")[0]
    f_cur = F.interpolate(torch.from_numpy(acts).permute(
        2, 0, 1)[None], (RES, RES), mode="bilinear")[0]
    ox, oy, tx, ty = corr.T
    scale = img_res // RES
    want = _oracle_local_avg(f_orig, f_cur,
                             torch.from_numpy(ox // scale),
                             torch.from_numpy(oy // scale),
                             torch.from_numpy(tx // scale),
                             torch.from_numpy(ty // scale), patch)
    np.testing.assert_allclose(got, float(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("loss_type", ["global_avg", "local_avg"])
def test_background_loss_matches_oracle(loss_type):
    corr, acts, acts_orig, img_res = _random_setup(1)
    pc = process_correspondences(corr, img_res=img_res, max_corr=256,
                                 latent_res=RES)
    got = float(background_loss(jnp.asarray(acts), jnp.asarray(acts_orig),
                                pc, 3, (RES, RES), loss_type))

    f_orig = F.interpolate(torch.from_numpy(acts_orig).permute(
        2, 0, 1)[None], (RES, RES), mode="bilinear")[0]
    f_cur = F.interpolate(torch.from_numpy(acts).permute(
        2, 0, 1)[None], (RES, RES), mode="bilinear")[0]
    ox, oy, tx, ty = corr.T
    scale = img_res // RES
    bg_orig = np.ones((RES, RES), bool)
    bg_orig[oy // scale, ox // scale] = False
    bg_trans = np.ones((RES, RES), bool)
    bg_trans[ty // scale, tx // scale] = False
    if loss_type == "global_avg":
        y1, x1 = np.nonzero(bg_orig)
        y2, x2 = np.nonzero(bg_trans)
        want = _oracle_global_avg(f_orig, f_cur,
                                  torch.from_numpy(x1),
                                  torch.from_numpy(y1),
                                  torch.from_numpy(x2),
                                  torch.from_numpy(y2))
    else:
        y, x = np.nonzero(bg_orig & bg_trans)
        want = _oracle_local_avg(f_orig, f_cur, torch.from_numpy(x),
                                 torch.from_numpy(y), torch.from_numpy(x),
                                 torch.from_numpy(y), 3)
    np.testing.assert_allclose(got, float(want), rtol=2e-4, atol=2e-5)


def test_bg_erosion_matches_scipy():
    import scipy.ndimage
    corr, _, _, img_res = _random_setup(2, n_entries=80)
    pc = process_correspondences(corr, img_res=img_res, max_corr=256,
                                 latent_res=RES, bg_erosion=2)
    ox, oy, tx, ty = corr.T
    scale = img_res // RES
    bg_orig = np.ones((RES, RES), bool)
    bg_orig[oy // scale, ox // scale] = False
    want = scipy.ndimage.binary_erosion(bg_orig, iterations=2)
    np.testing.assert_array_equal(np.asarray(pc.bg_mask_orig) > 0.5, want)

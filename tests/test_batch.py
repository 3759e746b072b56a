"""Batched guided inference: batch-of-transforms equals per-transform runs,
and shards over a 'data' mesh axis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionhandles_tpu.config import (DiffusionHandlesConfig,
                                         GuidedDiffuserConfig)
from diffusionhandles_tpu.parallel.batch import edit_batch
from diffusionhandles_tpu.parallel.mesh import make_mesh
from diffusionhandles_tpu.pipeline import DiffusionHandles


@pytest.fixture(scope="module")
def setup():
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=3, num_optsteps=1, guidance_max_step=2,
            dtype="float32", remat_guidance=False,
            activation_store_dtype="float32"))
    h = DiffusionHandles(conf, variant="tiny")
    res = h.img_res
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.002 * yy).astype(np.float32)
    fg = ((yy >= res // 3) & (yy < 2 * res // 3)
          & (xx >= res // 3) & (xx < 2 * res // 3))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    sample = dict(depth=depth_fg[None, None], bg_depth=depth[None, None],
                  fg_mask=fg.astype(np.float32)[None, None])
    prompt = "a toy cube"
    null_text_emb, init_noise, activations, _ = h.generate_input_image(
        sample["depth"], prompt, None, None)
    return h, sample, prompt, null_text_emb, init_noise, activations


TRANSFORMS = [
    {"rotation_angle": 0.0, "rotation_axis": [0, 1, 0],
     "translation": [0.05, 0.0, 0.0]},
    {"rotation_angle": 10.0, "rotation_axis": [0, 1, 0],
     "translation": [0.0, 0.0, 0.0]},
    {"rotation_angle": -5.0, "rotation_axis": [1, 0, 0],
     "translation": [0.0, 0.02, 0.0]},
    {"rotation_angle": 3.0, "rotation_axis": [0, 0, 1],
     "translation": [0.0, 0.0, 0.05]},
]


def test_batch_matches_sequential(setup):
    """Batched and sequential paths are mathematically identical but batch
    differently, so XLA accumulation order differs; with random weights each
    DDIM step amplifies fp32 noise by ~1/sqrt(alpha_t) (~12x at t=830), so
    the cross-path check is correlation + loose tolerance, while *identical
    transforms within one batch* must agree bitwise."""
    h, sample, prompt, null_text_emb, init_noise, activations = setup
    # intra-batch determinism: same transform twice -> identical rows
    twin = edit_batch(h, sample["depth"], prompt, sample["fg_mask"],
                      sample["bg_depth"], null_text_emb, init_noise,
                      activations, [TRANSFORMS[0], TRANSFORMS[0]])
    np.testing.assert_array_equal(twin[0], twin[1])

    batch_imgs = edit_batch(h, sample["depth"], prompt, sample["fg_mask"],
                            sample["bg_depth"], null_text_emb, init_noise,
                            activations, TRANSFORMS[:2])
    assert batch_imgs.shape[0] == 2
    for i, tr in enumerate(TRANSFORMS[:2]):
        img, _ = h.transform_foreground(
            depth=sample["depth"], prompt=prompt,
            fg_mask=sample["fg_mask"], bg_depth=sample["bg_depth"],
            null_text_emb=null_text_emb, init_noise=init_noise,
            activations=activations,
            rot_angle=tr["rotation_angle"],
            rot_axis=np.asarray(tr["rotation_axis"], np.float32),
            translation=np.asarray(tr["translation"], np.float32))
        a, b = batch_imgs[i].ravel(), np.asarray(img[0]).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.999, corr
        assert np.abs(a - b).max() < 0.1


def test_batch_sharded_over_mesh(setup):
    h, sample, prompt, null_text_emb, init_noise, activations = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4, model_parallel=1)
    imgs = edit_batch(h, sample["depth"], prompt, sample["fg_mask"],
                      sample["bg_depth"], null_text_emb, init_noise,
                      activations, TRANSFORMS, mesh=mesh)
    assert imgs.shape[0] == 4
    assert np.isfinite(imgs).all()

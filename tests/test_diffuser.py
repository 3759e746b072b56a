"""Integration tests of the diffuser + inverter on tiny models (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusionhandles_tpu.config import GuidedDiffuserConfig
from diffusionhandles_tpu.diffuser import GuidedStableDiffuser
from diffusionhandles_tpu.inverter import StableNullInverter
from diffusionhandles_tpu.guidance import (build_guidance_weight_schedule,
                                           process_correspondences)
from diffusionhandles_tpu.utils.correspondences import pack_correspondences


@pytest.fixture(scope="module")
def tiny_diffuser():
    conf = GuidedDiffuserConfig(num_timesteps=6, num_optsteps=2,
                                guidance_max_step=4, dtype="float32",
                                remat_guidance=False)
    return GuidedStableDiffuser(conf, variant="tiny")


def _depth(res=32):
    y = np.linspace(1.0, 3.0, res)
    return np.tile(y[:, None], (1, res))[None, None]  # [1,1,H,W]


def test_initial_inference_shapes(tiny_diffuser):
    d = tiny_diffuser
    acts, latents, uncond, init_latents = d.initial_inference(
        None, _depth(d.image_res), None, "a cat")
    T = d.conf.num_timesteps
    r = d.latent_res
    assert latents.shape == (1, r, r, 4)
    assert init_latents.shape == (1, r, r, 4)
    assert uncond.shape[0] == T
    assert len(acts) == 3
    assert acts[0].shape[0] == T
    assert acts[0].shape[1:] == (r // 2, r // 2,
                                 d.models.unet_config.block_out_channels[2])
    assert acts[2].shape[1:] == (r, r,
                                 d.models.unet_config.block_out_channels[0])
    assert np.isfinite(np.asarray(latents)).all()


def test_initial_inference_deterministic(tiny_diffuser):
    d = tiny_diffuser
    _, lat1, _, init1 = d.initial_inference(None, _depth(d.image_res), None,
                                            "a cat")
    _, lat2, _, init2 = d.initial_inference(None, _depth(d.image_res), None,
                                            "a cat")
    np.testing.assert_array_equal(np.asarray(init1), np.asarray(init2))
    np.testing.assert_array_equal(np.asarray(lat1), np.asarray(lat2))


def test_guided_inference_runs(tiny_diffuser):
    d = tiny_diffuser
    res = d.image_res
    acts, latents, uncond, init_latents = d.initial_inference(
        None, _depth(res), None, "a cat")
    # A small synthetic correspondence set: shift a square right by 4 px.
    ys, xs = np.meshgrid(np.arange(8, 16), np.arange(8, 16), indexing="ij")
    corr = pack_correspondences(xs.ravel(), ys.ravel(), xs.ravel() + 4,
                                ys.ravel())
    img = d.guided_inference(
        latents=init_latents, depth=_depth(res), uncond_embeddings=uncond,
        prompt="a cat", activations_orig=acts, correspondences=corr)
    assert img.shape == (1, res, res, 3)
    out = np.asarray(img)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_guided_inference_guidance_changes_output(tiny_diffuser):
    """With zero fg/bg weight the guided pass must equal the plain CFG pass;
    with nonzero weights it must differ."""
    d = tiny_diffuser
    res = d.image_res
    acts, latents, uncond, init_latents = d.initial_inference(
        None, _depth(res), None, "a cat")
    ys, xs = np.meshgrid(np.arange(8, 16), np.arange(8, 16), indexing="ij")
    corr = pack_correspondences(xs.ravel(), ys.ravel(), xs.ravel() + 4,
                                ys.ravel())
    common = dict(latents=init_latents, depth=_depth(res),
                  uncond_embeddings=uncond, prompt="a cat",
                  activations_orig=acts, correspondences=corr)
    img0 = np.asarray(d.guided_inference(fg_weight=0.0, bg_weight=0.0,
                                         **common))
    img1 = np.asarray(d.guided_inference(fg_weight=1.5, bg_weight=1.25,
                                         **common))
    assert np.abs(img0 - img1).max() > 1e-6


def test_inverter_roundtrip_shapes(tiny_diffuser):
    d = tiny_diffuser
    inv = StableNullInverter(d)
    res = d.image_res
    rng = np.random.RandomState(0)
    img = rng.rand(1, res, res, 3).astype(np.float32)
    (tgt, recon), init_noise, uncond_seq = inv.invert(
        img, _depth(res), "a cat", num_inner_steps=2)
    T = d.conf.num_timesteps
    assert init_noise.shape == (1, d.latent_res, d.latent_res, 4)
    assert uncond_seq.shape[0] == T
    assert recon.shape == (1, res, res, 3)
    assert np.isfinite(np.asarray(init_noise)).all()
    assert np.isfinite(np.asarray(uncond_seq)).all()


def test_weight_schedule_matches_reference_oracle():
    """Oracle: direct re-derivation of StepGuidanceWeightSchedule
    (reference: guided_stable_diffuser.py:335-373,622-665)."""
    fg_w, bg_w = 1.5, 1.25
    gms, T, opt = 5, 8, 3
    fgw, bgw = build_guidance_weight_schedule(fg_w, bg_w, gms, T, opt,
                                              "constant")
    cyc_fg = {0: [0, 0, 7.5], 1: [0, 5.0, 0], 2: [0, 5.0, 7.5]}
    cyc_bg = {0: [0, 0, 1.5], 1: [0, 1.5, 0], 2: [0, 1.5, 1.5]}
    opt_fg = [[2.5] * 3, [1.25] * 3, [1.25] * 3]
    opt_bg = [[1.25] * 3, [2.5] * 3, [1.25] * 3]
    for t in range(T):
        for it in range(opt):
            if t < gms:
                efg = [c * fg_w * 30 * o
                       for c, o in zip(cyc_fg[t % 3], opt_fg[it])]
                ebg = [c * bg_w * 30 * o
                       for c, o in zip(cyc_bg[t % 3], opt_bg[it])]
            else:
                efg = [0.0] * 3
                ebg = [0.0] * 3
            np.testing.assert_allclose(np.asarray(fgw[t, it]), efg,
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(bgw[t, it]), ebg,
                                       rtol=1e-6)


def test_weight_schedule_falloffs():
    fgw_lin, _ = build_guidance_weight_schedule(1.0, 1.0, 10, 12, 3,
                                                "linear")
    # linear falloff reaches 0 at the last guided step
    assert np.asarray(fgw_lin[9]).max() == 0.0
    fgw_quad, _ = build_guidance_weight_schedule(1.0, 1.0, 10, 12, 3,
                                                 "quadratic")
    # quadratic decays faster than linear in the middle
    assert np.asarray(fgw_quad[5]).max() < np.asarray(fgw_lin[5]).max()


def test_process_correspondences_dedup_and_masks():
    # 512-res coords, two entries in the same latent cell pair -> weight 2.
    corr = pack_correspondences(
        np.array([8, 9, 100, 600]),   # ox (600 px out of range via tx below)
        np.array([8, 9, 100, 100]),
        np.array([16, 17, 500, 600]),  # tx: 600 out of range -> dropped
        np.array([16, 17, 100, 100]))
    pc = process_correspondences(corr, img_res=512, max_corr=64)
    w = np.asarray(pc.corr_w)
    assert w.sum() == 3  # 3 visible entries total
    # entries (8,8)->(16,16) and (9,9)->(17,17) share latent cells (1,1)->(2,2)
    assert w.max() == 2
    bg_orig = np.asarray(pc.bg_mask_orig)
    assert bg_orig[1, 1] == 0 and bg_orig[12, 12] == 0  # 100//8
    assert bg_orig.sum() == 64 * 64 - 2
    bg_trans = np.asarray(pc.bg_mask_trans)
    assert bg_trans[2, 2] == 0 and bg_trans[12, 62] == 0  # 500//8
    assert bg_trans.sum() == 64 * 64 - 2


def test_null_opt_scan_matches_while():
    """null_opt_inner_loop='scan' (masked fixed-trip) computes the same
    null-text embeddings as the reference-semantics while_loop — the scan
    variant only trades the on-device early-stop for better scheduling.
    Down-scaled weights keep the comparison out of the chaotic regime
    (two differently-scheduled XLA programs legitimately differ at fp32
    rounding level; default random init amplifies that through Adam —
    same phenomenon as the pipeline-oracle rig)."""
    import jax

    conf = GuidedDiffuserConfig(num_timesteps=3, dtype="float32",
                                param_dtype="float32",
                                activation_store_dtype="float32",
                                flash_attention=False, pallas_conv=False)
    d = GuidedStableDiffuser(conf, variant="tiny")
    scale = lambda tree: jax.tree.map(lambda a: a * 0.05, tree)
    d.models.unet_params = scale(d.models.unet_params)
    d.models.text_params = scale(d.models.text_params)
    d.models.vae_params = scale(d.models.vae_params)

    inv = StableNullInverter(d)
    rng = np.random.RandomState(3)
    res = d.image_res
    img = rng.rand(1, res, res, 3).astype(np.float32)
    disparity = rng.rand(res, res).astype(np.float32) * 255.0

    d.conf.null_opt_inner_loop = "while"
    _, noise_w, uncond_w = inv.invert(img, disparity, "a cube",
                                      num_inner_steps=3,
                                      early_stop_epsilon=-1.0)
    inv2 = StableNullInverter(d)
    d.conf.null_opt_inner_loop = "scan"
    _, noise_s, uncond_s = inv2.invert(img, disparity, "a cube",
                                       num_inner_steps=3,
                                       early_stop_epsilon=-1.0)
    np.testing.assert_allclose(np.asarray(noise_s), np.asarray(noise_w),
                               rtol=1e-6, atol=1e-6)
    scale_u = np.abs(np.asarray(uncond_w)).max()
    np.testing.assert_allclose(np.asarray(uncond_s), np.asarray(uncond_w),
                               rtol=1e-3, atol=1e-4 * scale_u)

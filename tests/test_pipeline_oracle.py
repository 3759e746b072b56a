"""Full-pipeline composition parity vs the independent torch oracle.

Runs inversion -> recording recon -> guided denoise through BOTH the JAX
pipeline (tiny variant, fp32, converted weights) and a clean-room torch
DiffusionHandles (torch_oracle_pipeline.py) and asserts latent-trajectory
and final-image parity. This is the composition-level check the per-model
oracles cannot give: scheduler prev/next indexing, CFG combination order,
null-text fresh-Adam semantics, activation recording timing,
guidance-weight composition, and the guidance descent loop
(reference: diffhandles/diffusion_handles.py:36-166).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusionhandles_tpu.config import (DiffusionHandlesConfig,
                                         GuidedDiffuserConfig)
from diffusionhandles_tpu.geometry.transform import transform_depth
from diffusionhandles_tpu.pipeline import DiffusionHandles

torch = pytest.importorskip("torch")

from torch_oracle_pipeline import OracleDiffusionHandles  # noqa: E402
from torch_oracle_sd import (OracleCLIPText, OracleUNet, OracleVAE,  # noqa: E402
                             tiny_oracle_clip_config,
                             tiny_oracle_unet_config,
                             tiny_oracle_vae_config)

T = 6               # denoising steps (exercises the t%3 cyclic weights)
GMS = 4             # guidance_max_step (both scan segments non-empty)
PROMPT = "a toy cube on a table"


def _normalize_depth(d):
    """reference depth_transform.py:15-28: scale to [0, 255]."""
    return 255.0 * (d - d.min()) / (d.max() - d.min())


@pytest.fixture(scope="module")
def rig():
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=T, num_optsteps=3, guidance_max_step=GMS,
            dtype="float32", param_dtype="float32",
            activation_store_dtype="float32", flash_attention=False,
            pallas_conv=False, remat_guidance=False))
    handles = DiffusionHandles(conf, variant="tiny")

    # Independent torch stack; weights converted INTO the JAX models.
    from diffusionhandles_tpu.models.weights import (convert_text_encoder,
                                                     convert_unet,
                                                     convert_vae)
    torch.manual_seed(7)
    o_unet = OracleUNet(tiny_oracle_unet_config()).eval()
    o_vae = OracleVAE(tiny_oracle_vae_config()).eval()
    o_clip = OracleCLIPText(tiny_oracle_clip_config()).eval()
    # Small-scale weights keep the random network well-conditioned so the
    # two implementations' fp32 trajectories stay comparable: with the
    # torch default init the net amplifies fp32 noise ~100x per forward
    # (measured via an fp64 crosscheck) and Adam's g/sqrt(v) normalization
    # then turns noise-level gradient differences into O(lr) embedding
    # drift — chaos, not a composition bug. Same device as the
    # GroundingDINO assembled-graph oracle.
    gen = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for mod in (o_unet, o_vae, o_clip):
            for p in mod.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    def np_state(sd):
        return {k: v.detach().numpy() for k, v in sd.items()}

    m = handles.diffuser.models
    m.unet_params = convert_unet(np_state(o_unet.state_dict()))
    m.vae_params = convert_vae(np_state(o_vae.state_dict()))
    conv_clip = convert_text_encoder(o_clip.state_dict_prefixed())
    m.text_params = {"params": {
        k: (v.detach().numpy() if hasattr(v, "detach") else v)
        for k, v in conv_clip["params"].items()}}

    gconf = handles.conf.guided_diffuser
    oracle = OracleDiffusionHandles(
        o_unet, o_vae, o_clip,
        cond_ids=m.tokenizer([PROMPT]), uncond_ids=m.tokenizer([""]),
        conf=dict(num_timesteps=T, guidance_scale=gconf.guidance_scale,
                  guidance_lr=gconf.guidance_lr,
                  num_optsteps=gconf.num_optsteps, guidance_max_step=GMS,
                  fg_weight=gconf.fg_weight, bg_weight=gconf.bg_weight,
                  fg_patch_size=gconf.fg_patch_size,
                  bg_patch_size=gconf.bg_patch_size,
                  bg_loss_type=gconf.bg_loss_type,
                  guidance_schedule_type=gconf.guidance_schedule_type,
                  bg_erosion=gconf.bg_erosion,
                  scaling=m.vae_config.scaling_factor))

    res = handles.img_res
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.01 * yy).astype(np.float32)
    fg = ((yy >= res // 3) & (yy < 2 * res // 3)
          & (xx >= res // 3) & (xx < 2 * res // 3))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, res, res).astype(np.float32)
    sample = dict(img=img, depth=depth_fg[None, None],
                  bg_depth=depth[None, None],
                  fg_mask=fg.astype(np.float32)[None, None])
    return handles, oracle, sample


def _close(got, want, what, rtol):
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape, (what, got.shape, want.shape)
    scale = max(np.abs(want).max(), 1e-6)
    maxdiff = np.abs(got - want).max()
    assert maxdiff < rtol * scale, \
        f"{what}: maxdiff {maxdiff:.3e} vs scale {scale:.3e} (rtol {rtol})"


def test_full_pipeline_composition_parity(rig):
    handles, oracle, sample = rig

    # ---- step 1: inversion (ddim loop + null-text optimization)
    null_text_emb, init_noise = handles.invert_input_image(
        sample["img"], sample["depth"], PROMPT)

    disparity = _normalize_depth(1.0 / sample["depth"])
    img_t = torch.from_numpy(sample["img"])
    disp_t = torch.from_numpy(disparity.astype(np.float32))
    uncond_seq_t, init_noise_t, _ = oracle.invert(img_t, disp_t,
                                                  num_inner_steps=5,
                                                  epsilon=1e-5)

    _close(init_noise, init_noise_t.numpy(), "init_noise", 2e-4)
    _close(null_text_emb, uncond_seq_t.numpy(), "null_text_emb", 2e-3)

    # ---- step 2: recording reconstruction
    null2, init2, activations, latent_image = handles.generate_input_image(
        sample["depth"], PROMPT, null_text_emb, init_noise)
    acts_t, latents_t = oracle.initial_inference(init_noise_t, disp_t,
                                                 uncond_seq_t)
    _close(latent_image, latents_t.numpy(), "recon latents", 1e-3)
    assert len(activations) == 3
    for k in range(3):
        _close(activations[k], acts_t[k].numpy(), f"activations[{k}]",
               1e-3)

    # ---- steps 3+4: depth harmonization + guided denoise
    bg_depth = handles.set_foreground(sample["depth"], sample["fg_mask"],
                                      sample["bg_depth"])
    edited_img, edited_disparity = handles.transform_foreground(
        depth=sample["depth"], prompt=PROMPT, fg_mask=sample["fg_mask"],
        bg_depth=bg_depth, null_text_emb=null_text_emb,
        init_noise=init_noise, activations=activations,
        rot_angle=10.0, rot_axis=np.array([0.0, 1.0, 0.0]),
        translation=np.array([0.0, 0.0, 0.0]))

    # identical host-side geometry (deterministic; oracle consumes the
    # same disparity + correspondences the pipeline computed internally)
    disp2, correspondences = transform_depth(
        depth=sample["depth"], bg_depth=bg_depth,
        fg_mask=sample["fg_mask"],
        intrinsics=handles.diffuser.get_depth_intrinsics(),
        rot_angle=10.0, rot_axis=np.array([0.0, 1.0, 0.0]),
        translation=np.array([0.0, 0.0, 0.0]),
        use_input_depth_normalization=False,
        depth_transform_mode=handles.conf.depth_transform_mode)
    np.testing.assert_allclose(np.asarray(disp2), edited_disparity,
                               rtol=1e-5, atol=1e-5)

    img_o, latents_o = oracle.guided_inference(
        init_noise_t, torch.from_numpy(np.asarray(disp2, np.float32)),
        uncond_seq_t, acts_t, np.asarray(correspondences),
        img_res=handles.img_res)
    _close(edited_img, img_o.numpy(), "edited image", 5e-3)


def test_null_optimization_full_adam_trajectory(rig):
    """epsilon=-1 disables the early stop on both sides, forcing all 5
    fresh-Adam inner iterations per timestep — the small-weight default-
    epsilon path stops after 1 iteration, which would leave the Adam
    moment/bias-correction semantics unexercised."""
    handles, oracle, sample = rig

    disparity = _normalize_depth(1.0 / sample["depth"])
    img_nhwc = np.moveaxis(sample["img"], 1, -1)
    _, init_noise_j, uncond_seq_j = handles.inverter.invert(
        img_nhwc, disparity, PROMPT, num_inner_steps=5,
        early_stop_epsilon=-1.0)

    uncond_seq_t, init_noise_t, _ = oracle.invert(
        torch.from_numpy(sample["img"]),
        torch.from_numpy(disparity.astype(np.float32)),
        num_inner_steps=5, epsilon=-1.0)

    _close(np.moveaxis(np.asarray(init_noise_j), -1, 1),
           init_noise_t.numpy(), "init_noise", 2e-4)
    _close(uncond_seq_j, uncond_seq_t.numpy(),
           "null_text_emb (5 Adam iters)", 2e-3)

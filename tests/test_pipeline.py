"""End-to-end pipeline test on the tiny model variant (CPU).

Exercises the full 4-step public API (reference contract:
diffhandles/diffusion_handles.py) plus identity checkpoint roundtrip.
"""

import numpy as np
import pytest

from diffusionhandles_tpu.checkpoint import (load_identity, save_identity,
                                             to_nchw, to_nhwc)
from diffusionhandles_tpu.config import DiffusionHandlesConfig, \
    GuidedDiffuserConfig
from diffusionhandles_tpu.pipeline import DiffusionHandles


@pytest.fixture(scope="module")
def handles():
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=4, num_optsteps=2, guidance_max_step=3,
            dtype="float32", remat_guidance=False))
    return DiffusionHandles(conf, variant="tiny")


@pytest.fixture(scope="module")
def sample(handles):
    res = handles.img_res
    yy, xx = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    depth = (2.0 + 0.002 * yy).astype(np.float32)
    fg = ((yy >= res // 3) & (yy < 2 * res // 3)
          & (xx >= res // 3) & (xx < 2 * res // 3))
    depth_fg = depth.copy()
    depth_fg[fg] -= 0.4
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, res, res).astype(np.float32)
    return dict(img=img, depth=depth_fg[None, None],
                bg_depth=depth[None, None],
                fg_mask=fg.astype(np.float32)[None, None])


def test_full_pipeline(handles, sample, tmp_path):
    h = handles
    prompt = "a toy cube on a table"

    null_text_emb, init_noise = h.invert_input_image(
        sample["img"], sample["depth"], prompt)
    T = h.conf.guided_diffuser.num_timesteps
    assert null_text_emb.shape[0] == T and null_text_emb.shape[1] == 1
    assert init_noise.shape == (1, 4, h.diffuser.latent_res,
                                h.diffuser.latent_res)

    null_text_emb, init_noise, activations, latent_image = \
        h.generate_input_image(sample["depth"], prompt, null_text_emb,
                               init_noise)
    assert len(activations) == 3
    assert activations[0].shape[0] == T
    # torch-layout on the API surface: [T, C, H, W]
    assert activations[0].shape[1] == \
        h.diffuser.models.unet_config.block_out_channels[2]

    # identity checkpoint roundtrip (reference npz field parity)
    ident_path = tmp_path / "input_image_identity.npz"
    save_identity(ident_path, null_text_emb,
                  to_nhwc(init_noise),
                  [to_nhwc(a) for a in activations],
                  to_nhwc(latent_image))
    loaded = np.load(ident_path)
    assert set(loaded.files) == {"null_text_emb", "init_noise",
                                 "activations1", "activations2",
                                 "activations3", "latent_image"}
    ident = load_identity(ident_path)
    np.testing.assert_allclose(to_nchw(ident["init_noise"]), init_noise,
                               rtol=1e-6)

    bg_depth = h.set_foreground(sample["depth"], sample["fg_mask"],
                                sample["bg_depth"])
    assert bg_depth.shape == sample["depth"].shape
    assert np.isfinite(bg_depth).all()
    # outside the dilated mask the input depth is preserved
    assert np.allclose(bg_depth[0, 0, 0, 0], sample["depth"][0, 0, 0, 0])

    edited_img, edited_disparity = h.transform_foreground(
        depth=sample["depth"], prompt=prompt, fg_mask=sample["fg_mask"],
        bg_depth=bg_depth, null_text_emb=null_text_emb,
        init_noise=init_noise, activations=activations,
        rot_angle=10.0, rot_axis=np.array([0.0, 1.0, 0.0]),
        translation=np.array([0.0, 0.0, 0.0]))
    res = h.img_res
    assert edited_img.shape == (1, 3, res, res)
    assert edited_disparity.shape == (1, 1, res, res)
    assert np.isfinite(edited_img).all()
    assert edited_img.min() >= 0.0 and edited_img.max() <= 1.0


def test_fused_recording_matches_standalone(handles, sample):
    """The activations/latents captured during inversion (fused recording,
    config.fused_recording) must match the standalone recording-
    reconstruction scan: both evaluate the cond-row U-Net on the identical
    CFG roll-forward trajectory."""
    h = handles
    prompt = "a toy cube on a table"

    null_text_emb, init_noise = h.invert_input_image(
        sample["img"], sample["depth"], prompt)
    assert getattr(h, "_recording", None) is not None

    n1, i1, acts1, lat1 = h.generate_input_image(
        sample["depth"], prompt, null_text_emb, init_noise)
    # Drop the capture to force the standalone recording scan.
    h._recording = None
    n2, i2, acts2, lat2 = h.generate_input_image(
        sample["depth"], prompt, null_text_emb, init_noise)

    np.testing.assert_allclose(np.asarray(n1, np.float32),
                               np.asarray(n2, np.float32), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(i1, np.float32),
                               np.asarray(i2, np.float32), rtol=1e-6)
    # Both paths compute the same math but with different batch packing
    # (batch-1 cond pass vs batch-2 CFG pass); the random-init tiny net
    # amplifies that fp32-epsilon difference ~100x per forward, so the
    # rolled trajectory drifts at the percent level over the 4 steps. A
    # real capture bug (wrong row / wrong timestep / wrong latent) would
    # show O(1) differences.
    np.testing.assert_allclose(np.asarray(lat1, np.float32),
                               np.asarray(lat2, np.float32),
                               rtol=5e-2, atol=1e-3)
    for a, b in zip(acts1, acts2):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # step-0 stacks are computed at the identical init latent — only
        # batch packing + bf16 storage rounding differ
        np.testing.assert_allclose(a[0], b[0], rtol=1e-2, atol=1e-3)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2 * scale)

    # A mismatched input (different prompt) must NOT be served from the
    # capture — it falls back to the standalone scan.
    h2_null, h2_noise = h.invert_input_image(
        sample["img"], sample["depth"], prompt)
    assert h._recording is not None
    n3, _, _, _ = h.generate_input_image(
        sample["depth"], "a different prompt", h2_null, h2_noise)
    assert n3.shape == h2_null.shape


def test_inverter_inherits_configured_guidance_scale():
    """Regression: the pipeline's inverter must roll forward at the SAME
    CFG scale the guided diffuser replays with — a custom
    guidance_scale left the inverter at its 7.5 default, so the null-text
    embeddings (and fused-recording capture) described a different
    trajectory than steps 2-3 denoise on."""
    conf = DiffusionHandlesConfig(
        guided_diffuser=GuidedDiffuserConfig(
            num_timesteps=2, num_optsteps=1, guidance_max_step=1,
            guidance_scale=3.25, dtype="float32", remat_guidance=False))
    h = DiffusionHandles(conf, variant="tiny")
    assert h.inverter.guidance_scale == 3.25


def test_init_depth_accepts_all_documented_layouts(handles):
    """init_depth advertises [H,W], [1,H,W], [1,1,H,W] and [1,H,W,1]; the
    NHWC layout used to crash (reshape(W, 1))."""
    d = handles.diffuser
    res = handles.img_res
    rng = np.random.RandomState(0)
    base = (2.0 + rng.rand(res, res)).astype(np.float32)
    ref = np.asarray(d.init_depth(base))
    for layout in (base[None], base[None, None], base[None, ..., None]):
        np.testing.assert_array_equal(np.asarray(d.init_depth(layout)), ref)


def test_correspondences_processed_at_depth_resolution(handles, sample):
    """Regression: guided_inference must bin correspondences in the DEPTH
    map's pixel space (reference: img_res=depth.shape[-1]), not the
    model's native resolution — a larger depth map used to silently drop
    points beyond the native res and bin the rest into wrong cells."""
    from unittest import mock

    import diffusionhandles_tpu.diffuser as diffuser_mod

    d = handles.diffuser
    res2 = handles.img_res * 2
    depth_big = np.ones((1, 1, res2, res2), np.float32)
    corr = np.array([[res2 - 1, res2 - 1, 0, 0]], np.int64)
    acts, _, _, _ = d.initial_inference(None, depth_big, None, "x")
    seen = {}
    real_pc = diffuser_mod.process_correspondences

    def spy(*args, **kwargs):
        seen.update(kwargs)
        return real_pc(*args, **kwargs)

    uncond = np.asarray(d.encode_prompt(""))
    with mock.patch.object(diffuser_mod, "process_correspondences", spy):
        d.guided_inference(
            latents=np.zeros((1, d.latent_res, d.latent_res, 4),
                             np.float32),
            depth=depth_big, uncond_embeddings=uncond, prompt="x",
            activations_orig=acts, correspondences=corr)
    assert seen["img_res"] == res2


# ----------------------------------------------------------------------
# Cold-start routing (round 5): serve the first edit from the XLA-conv
# twin while the hot taps programs deserialize (pipeline._stack).
# ----------------------------------------------------------------------

def test_program_names_match_builder_registrations(handles):
    """The facade's name helpers and the builders' AotStore.wrap names are
    the same strings — prefetch order / routing checks can't drift from
    what the store actually holds."""
    d, inv = handles.diffuser, handles.inverter
    d.encode_latent_image(np.zeros((1, handles.img_res, handles.img_res, 3),
                                   np.float32))
    assert (d._jit_cache["vae_encode"].aot_name
            == d.vae_encode_program_name())
    d.decode_latent_image(np.zeros(
        (1, d.latent_res, d.latent_res, 4), np.float32))
    assert (d._jit_cache["vae_decode"].aot_name
            == d.vae_decode_program_name())
    assert (inv._build_ddim_loop().aot_name
            == inv.ddim_loop_program_name())
    assert (inv._build_null_optimization(5, record=True).aot_name
            == inv.null_opt_program_name(5, record=True))
    emit = handles.conf.guided_diffuser.save_denoising_steps
    runner = d._build_guided_inference(
        d.conf.bg_loss_type, d.conf.fg_patch_size, d.conf.bg_patch_size,
        d.conf.num_optsteps, d.conf.guidance_max_step, emit)
    assert runner.aot_name == d.guided_program_name(emit)
    assert (d._build_initial_inference().aot_name
            == d.initial_program_name())


def test_cold_start_routing(handles, monkeypatch):
    """_stack picks the cold twin only while hot programs are not yet
    resident AND the full cold set is stored; the twin shares parameter
    arrays with the hot stack."""
    from diffusionhandles_tpu.utils.aot import AotStore
    store = AotStore.default()
    hot = handles._program_names(handles.diffuser, handles.inverter)[1:]

    # routing off (CPU default): always hot
    assert handles._stack(*hot) == (handles.diffuser, handles.inverter)

    monkeypatch.setattr(handles, "_cold_start", True)
    # cold set not stored -> hot (on-demand load/compile, never a cold
    # compile stall)
    monkeypatch.setattr(handles, "_cold_ok", False)
    assert handles._stack(*hot) == (handles.diffuser, handles.inverter)

    # cold stored, hot not resident -> cold twin (shared params)
    monkeypatch.setattr(handles, "_cold_ok", True)
    cold_d, cold_i = handles._stack(*hot)
    assert cold_d is not handles.diffuser
    assert cold_d.models.unet_params is handles.diffuser.models.unet_params
    assert cold_d.models.unet_config.pallas_conv is False
    assert cold_i.model is cold_d
    # the twin's names carry its own conv tag (on TPU the hot tag is
    # "taps:taps:xla" and every name differs; on this CPU host both
    # stacks already compile XLA convs, so only the tag equality holds)
    cold_names = handles._program_names(cold_d, cold_i)[1:]
    assert all(cold_d.conv_mode_tag in c for c in cold_names
               if not c.startswith("text_apply"))

    # hot resident -> hot again
    monkeypatch.setattr(store, "name_loaded", lambda prefix: True)
    assert handles._stack(*hot) == (handles.diffuser, handles.inverter)

"""SAM converter parity vs an independent torch oracle.

Validates that models/sam.py + models/weights_sam.py reproduce the
published segment-anything graph (the mask backbone of the reference's
LangSAM dependency, reference: test/estimate_foreground.py:6-42): exact
bijection of the release key families and logit-level parity of mask and
IoU outputs for point, box and mask-input prompts.
"""

import numpy as np
import pytest

from diffusionhandles_tpu.models.sam import (SamModel, tiny_sam_config,
                                             PromptableSegmenter)
from diffusionhandles_tpu.models.weights_sam import (convert_sam,
                                                     load_sam_checkpoint,
                                                     validate_sam_bijection)

torch = pytest.importorskip("torch")

from torch_oracle_sam import Sam  # noqa: E402


def _tiny_oracle(seed=0):
    cfg = tiny_sam_config()
    gen = torch.Generator().manual_seed(seed)
    oracle = Sam(img_size=cfg.img_size, patch_size=cfg.patch_size,
                 embed_dim=cfg.embed_dim, depth=cfg.depth,
                 num_heads=cfg.num_heads,
                 global_attn_indexes=cfg.global_attn_indexes,
                 window_size=cfg.window_size,
                 prompt_dim=cfg.prompt_embed_dim,
                 decoder_mlp_dim=cfg.decoder_mlp_dim)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        g = oracle.prompt_encoder.pe_layer
        g.positional_encoding_gaussian_matrix.copy_(
            torch.randn(g.positional_encoding_gaussian_matrix.shape,
                        generator=gen))
    oracle.eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    return cfg, oracle, state


def _inputs(cfg, with_box=False, with_mask=False, seed=1):
    rng = np.random.RandomState(seed)
    s = cfg.img_size
    img = rng.randn(1, 3, s, s).astype(np.float32)
    pts = np.array([[[17.0, 41.0], [52.0, 9.0], [0.0, 0.0]]], np.float32)
    lbl = np.array([[1, 0, -1]], np.int32)
    box = (np.array([[[8.0, 12.0], [50.0, 58.0]]], np.float32)
           if with_box else None)
    mask = (rng.randn(1, 1, s // 4, s // 4).astype(np.float32)
            if with_mask else None)
    return img, pts, lbl, box, mask


def _compare(cfg, oracle, state, with_box=False, with_mask=False, tol=2e-5):
    import jax

    variables = convert_sam(state)
    model = SamModel(cfg)
    img, pts, lbl, box, mask = _inputs(cfg, with_box, with_mask)

    with torch.no_grad():
        t_masks, t_iou = oracle(
            torch.from_numpy(img), torch.from_numpy(pts),
            torch.from_numpy(lbl),
            None if box is None else torch.from_numpy(box),
            None if mask is None else torch.from_numpy(mask))

    j_masks, j_iou = model.apply(
        variables, np.moveaxis(img, 1, -1), pts, lbl,
        None if box is None else box,
        None if mask is None else np.moveaxis(mask, 1, -1))

    np.testing.assert_allclose(np.asarray(j_masks), t_masks.numpy(),
                               atol=tol, rtol=0)
    np.testing.assert_allclose(np.asarray(j_iou), t_iou.numpy(),
                               atol=tol, rtol=0)


def test_point_prompt_parity():
    cfg, oracle, state = _tiny_oracle()
    _compare(cfg, oracle, state)


def test_box_prompt_parity():
    cfg, oracle, state = _tiny_oracle(seed=3)
    _compare(cfg, oracle, state, with_box=True)


def test_box_only_prompt_parity():
    """Box-only prompt: NO point tokens at all (the published PromptEncoder
    emits just the 2 box-corner embeddings when points is None — the
    GroundingDINO->SAM handoff path used by LangSamSegmenter)."""
    cfg, oracle, state = _tiny_oracle(seed=7)
    variables = convert_sam(state)
    model = SamModel(cfg)
    img, _, _, box, _ = _inputs(cfg, with_box=True)
    pts0 = np.zeros((1, 0, 2), np.float32)
    lbl0 = np.zeros((1, 0), np.int32)

    with torch.no_grad():
        t_masks, t_iou = oracle(
            torch.from_numpy(img), torch.from_numpy(pts0),
            torch.from_numpy(lbl0), torch.from_numpy(box), None)
    j_masks, j_iou = model.apply(
        variables, np.moveaxis(img, 1, -1), pts0, lbl0, box, None)
    np.testing.assert_allclose(np.asarray(j_masks), t_masks.numpy(),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(j_iou), t_iou.numpy(),
                               atol=2e-5, rtol=0)


def test_predict_box_only_emits_no_point_tokens():
    """PromptableSegmenter.predict(boxes=...) without points must produce
    the same logits as the explicit zero-point decode (regression: a dummy
    not_a_point token used to be injected on this path)."""
    import jax.numpy as jnp

    cfg = tiny_sam_config()
    seg = PromptableSegmenter(cfg, seed=11)
    rng = np.random.RandomState(2)
    img = rng.rand(1, 3, 72, 64).astype(np.float32)
    box = [6.0, 8.0, 40.0, 52.0]

    mask, iou = seg.predict(img, boxes=box)
    x, _, scale = seg._preprocess(img)
    emb = seg._embed(seg.params, x)
    box_s = np.asarray(box, np.float32).reshape(1, 2, 2) * scale
    masks2, iou2 = seg._decode_box(
        seg.params, emb, jnp.zeros((1, 0, 2), jnp.float32),
        jnp.zeros((1, 0), jnp.int32), jnp.asarray(box_s))
    best = 1 + int(np.argmax(np.asarray(iou2)[0, 1:]))
    assert np.isclose(iou, float(np.asarray(iou2)[0, best]))


def test_mask_input_parity():
    cfg, oracle, state = _tiny_oracle(seed=4)
    _compare(cfg, oracle, state, with_mask=True)


def test_checkpoint_file_roundtrip(tmp_path):
    cfg, oracle, state = _tiny_oracle(seed=5)
    path = tmp_path / "sam_tiny.pth"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in state.items()}, path)
    variables = load_sam_checkpoint(path, cfg)

    seg = PromptableSegmenter(cfg, params=variables)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 96, 80).astype(np.float32)
    mask, iou = seg.predict(img, points=[[40, 48]], labels=[1])
    assert mask.shape == (1, 1, 96, 80)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert np.isfinite(iou)


def test_bijection_fails_loudly():
    import jax
    import jax.numpy as jnp

    cfg, _, state = _tiny_oracle(seed=6)
    state.pop("mask_decoder.iou_token.weight")
    model = SamModel(cfg)
    s = cfg.img_size
    init = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, 2, 2), jnp.float32),
            jnp.zeros((1, 2), jnp.int32),
            jnp.zeros((1, 2, 2), jnp.float32),
            jnp.zeros((1, s // 4, s // 4, 1), jnp.float32)),
        jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unassigned"):
        validate_sam_bijection(convert_sam(state), init)


def test_vit_h_key_mapping_covers_release_families():
    """Every release key family (vit_h naming) maps without error on
    shape-faked entries — guards the converter against the full-size
    checkpoint layout without materializing 2.4 GB."""
    from diffusionhandles_tpu.models.weights_sam import (
        _map_image_encoder, _map_prompt_encoder, _map_mask_decoder)

    conv_keys = ("patch_embed.proj.weight", "neck.0.weight",
                 "neck.2.weight", "mask_downscaling.0.weight",
                 "mask_downscaling.6.weight", "output_upscaling.0.weight",
                 "output_upscaling.3.weight")

    def fake(k):
        return (np.zeros((2, 2, 2, 2), np.float32) if k in conv_keys
                else np.zeros((2, 2), np.float32))

    keys = [
        "pos_embed", "patch_embed.proj.weight", "patch_embed.proj.bias",
        "blocks.31.norm1.weight", "blocks.31.attn.qkv.weight",
        "blocks.31.attn.qkv.bias", "blocks.31.attn.proj.weight",
        "blocks.31.attn.rel_pos_h", "blocks.31.attn.rel_pos_w",
        "blocks.31.mlp.lin1.weight", "blocks.31.mlp.lin2.bias",
        "neck.0.weight", "neck.1.weight", "neck.2.weight", "neck.3.bias",
    ]
    for k in keys:
        path, _ = _map_image_encoder(k, fake(k))
        assert path is not None, k
    for k in ["pe_layer.positional_encoding_gaussian_matrix",
              "point_embeddings.0.weight", "point_embeddings.3.weight",
              "not_a_point_embed.weight", "no_mask_embed.weight",
              "mask_downscaling.0.weight", "mask_downscaling.1.bias",
              "mask_downscaling.6.weight"]:
        path, _ = _map_prompt_encoder(k, fake(k))
        assert path is not None, k
    for k in ["iou_token.weight", "mask_tokens.weight",
              "transformer.layers.0.self_attn.q_proj.weight",
              "transformer.layers.1.cross_attn_image_to_token.out_proj.bias",
              "transformer.layers.1.norm4.weight",
              "transformer.layers.0.mlp.lin1.weight",
              "transformer.final_attn_token_to_image.v_proj.weight",
              "transformer.norm_final_attn.bias",
              "output_upscaling.0.weight", "output_upscaling.1.weight",
              "output_upscaling.3.weight",
              "output_hypernetworks_mlps.3.layers.2.weight",
              "iou_prediction_head.layers.0.bias"]:
        path, _ = _map_mask_decoder(k, fake(k))
        assert path is not None, k

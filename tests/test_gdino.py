"""GroundingDINO: functional tests + converter bijection on a synthetic
release-named state dict (tiny config).

The release-checkpoint simulator below enumerates the
`groundingdino_swint_ogc.pth` key families from config arithmetic; the
converter must consume every key (incl. skipping buffers and verifying the
top-level bbox_embed aliases) and exactly cover the Flax init tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionhandles_tpu.models.groundingdino import (GroundingDinoModel,
                                                       tiny_gdino_config)
from diffusionhandles_tpu.models.weights_gdino import (
    convert_gdino, validate_gdino_bijection)


def _release_state(cfg, rng):
    """Synthetic release-named state dict for `cfg` (random values)."""
    sd = {}

    def add(k, *shape):
        sd[k] = rng.randn(*shape).astype(np.float32) * 0.05

    sw = cfg.swin
    e = sw.embed_dim
    add("backbone.0.patch_embed.proj.weight", e, 3, sw.patch_size,
        sw.patch_size)
    add("backbone.0.patch_embed.proj.bias", e)
    add("backbone.0.patch_embed.norm.weight", e)
    add("backbone.0.patch_embed.norm.bias", e)
    for i, depth in enumerate(sw.depths):
        dim = sw.stage_dim(i)
        for j in range(depth):
            p = f"backbone.0.layers.{i}.blocks.{j}"
            add(f"{p}.norm1.weight", dim)
            add(f"{p}.norm1.bias", dim)
            add(f"{p}.attn.relative_position_bias_table",
                (2 * sw.window_size - 1) ** 2, sw.num_heads[i])
            sd[f"{p}.attn.relative_position_index"] = np.zeros(
                (sw.window_size ** 2, sw.window_size ** 2), np.int64)
            add(f"{p}.attn.qkv.weight", 3 * dim, dim)
            add(f"{p}.attn.qkv.bias", 3 * dim)
            add(f"{p}.attn.proj.weight", dim, dim)
            add(f"{p}.attn.proj.bias", dim)
            add(f"{p}.norm2.weight", dim)
            add(f"{p}.norm2.bias", dim)
            hidden = int(dim * sw.mlp_ratio)
            add(f"{p}.mlp.fc1.weight", hidden, dim)
            add(f"{p}.mlp.fc1.bias", hidden)
            add(f"{p}.mlp.fc2.weight", dim, hidden)
            add(f"{p}.mlp.fc2.bias", dim)
        if i < len(sw.depths) - 1:
            add(f"backbone.0.layers.{i}.downsample.reduction.weight",
                2 * dim, 4 * dim)
            add(f"backbone.0.layers.{i}.downsample.norm.weight", 4 * dim)
            add(f"backbone.0.layers.{i}.downsample.norm.bias", 4 * dim)
    for i in sw.out_indices:
        add(f"backbone.0.norm{i}.weight", sw.stage_dim(i))
        add(f"backbone.0.norm{i}.bias", sw.stage_dim(i))

    bt = cfg.bert
    add("bert.embeddings.word_embeddings.weight", bt.vocab_size,
        bt.hidden_size)
    add("bert.embeddings.position_embeddings.weight",
        bt.max_position_embeddings, bt.hidden_size)
    add("bert.embeddings.token_type_embeddings.weight",
        bt.type_vocab_size, bt.hidden_size)
    add("bert.embeddings.LayerNorm.weight", bt.hidden_size)
    add("bert.embeddings.LayerNorm.bias", bt.hidden_size)
    for i in range(bt.num_layers):
        p = f"bert.encoder.layer.{i}"
        for nm in ("attention.self.query", "attention.self.key",
                   "attention.self.value", "attention.output.dense"):
            add(f"{p}.{nm}.weight", bt.hidden_size, bt.hidden_size)
            add(f"{p}.{nm}.bias", bt.hidden_size)
        add(f"{p}.attention.output.LayerNorm.weight", bt.hidden_size)
        add(f"{p}.attention.output.LayerNorm.bias", bt.hidden_size)
        add(f"{p}.intermediate.dense.weight", bt.intermediate_size,
            bt.hidden_size)
        add(f"{p}.intermediate.dense.bias", bt.intermediate_size)
        add(f"{p}.output.dense.weight", bt.hidden_size,
            bt.intermediate_size)
        add(f"{p}.output.dense.bias", bt.hidden_size)
        add(f"{p}.output.LayerNorm.weight", bt.hidden_size)
        add(f"{p}.output.LayerNorm.bias", bt.hidden_size)
    add("bert.pooler.dense.weight", bt.hidden_size, bt.hidden_size)
    add("bert.pooler.dense.bias", bt.hidden_size)

    d = cfg.d_model
    add("feat_map.weight", d, bt.hidden_size)
    add("feat_map.bias", d)
    dims = [sw.stage_dim(i) for i in sw.out_indices]
    for i, ci in enumerate(dims):
        add(f"input_proj.{i}.0.weight", d, ci, 1, 1)
        add(f"input_proj.{i}.0.bias", d)
        add(f"input_proj.{i}.1.weight", d)
        add(f"input_proj.{i}.1.bias", d)
    add(f"input_proj.{len(dims)}.0.weight", d, dims[-1], 3, 3)
    add(f"input_proj.{len(dims)}.0.bias", d)
    add(f"input_proj.{len(dims)}.1.weight", d)
    add(f"input_proj.{len(dims)}.1.bias", d)

    add("transformer.level_embed", cfg.num_levels, d)
    sd["transformer.tgt_embed.weight"] = rng.randn(
        cfg.num_queries, d).astype(np.float32) * 0.05
    HLP = cfg.num_heads * cfg.num_levels * cfg.num_points
    for i in range(cfg.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        add(f"{p}.self_attn.sampling_offsets.weight", HLP * 2, d)
        add(f"{p}.self_attn.sampling_offsets.bias", HLP * 2)
        add(f"{p}.self_attn.attention_weights.weight", HLP, d)
        add(f"{p}.self_attn.attention_weights.bias", HLP)
        add(f"{p}.self_attn.value_proj.weight", d, d)
        add(f"{p}.self_attn.value_proj.bias", d)
        add(f"{p}.self_attn.output_proj.weight", d, d)
        add(f"{p}.self_attn.output_proj.bias", d)
        for nm, a, bdim in (("norm1", d, d), ("norm2", d, d)):
            add(f"{p}.{nm}.weight", a)
            add(f"{p}.{nm}.bias", bdim)
        add(f"{p}.linear1.weight", cfg.ffn_dim, d)
        add(f"{p}.linear1.bias", cfg.ffn_dim)
        add(f"{p}.linear2.weight", d, cfg.ffn_dim)
        add(f"{p}.linear2.bias", d)

        p = f"transformer.encoder.text_layers.{i}"
        add(f"{p}.self_attn.in_proj_weight", 3 * d, d)
        add(f"{p}.self_attn.in_proj_bias", 3 * d)
        add(f"{p}.self_attn.out_proj.weight", d, d)
        add(f"{p}.self_attn.out_proj.bias", d)
        add(f"{p}.linear1.weight", cfg.text_layer_ffn, d)
        add(f"{p}.linear1.bias", cfg.text_layer_ffn)
        add(f"{p}.linear2.weight", d, cfg.text_layer_ffn)
        add(f"{p}.linear2.bias", d)
        add(f"{p}.norm1.weight", d)
        add(f"{p}.norm1.bias", d)
        add(f"{p}.norm2.weight", d)
        add(f"{p}.norm2.bias", d)

        p = f"transformer.encoder.fusion_layers.{i}"
        add(f"{p}.gamma_v", d)
        add(f"{p}.gamma_l", d)
        add(f"{p}.layer_norm_v.weight", d)
        add(f"{p}.layer_norm_v.bias", d)
        add(f"{p}.layer_norm_l.weight", d)
        add(f"{p}.layer_norm_l.bias", d)
        for nm in ("v_proj", "l_proj", "values_v_proj", "values_l_proj"):
            add(f"{p}.attn.{nm}.weight", cfg.fusion_dim, d)
            add(f"{p}.attn.{nm}.bias", cfg.fusion_dim)
        for nm in ("out_v_proj", "out_l_proj"):
            add(f"{p}.attn.{nm}.weight", d, cfg.fusion_dim)
            add(f"{p}.attn.{nm}.bias", d)

    for i in range(cfg.dec_layers):
        p = f"transformer.decoder.layers.{i}"
        add(f"{p}.cross_attn.sampling_offsets.weight", HLP * 2, d)
        add(f"{p}.cross_attn.sampling_offsets.bias", HLP * 2)
        add(f"{p}.cross_attn.attention_weights.weight", HLP, d)
        add(f"{p}.cross_attn.attention_weights.bias", HLP)
        add(f"{p}.cross_attn.value_proj.weight", d, d)
        add(f"{p}.cross_attn.value_proj.bias", d)
        add(f"{p}.cross_attn.output_proj.weight", d, d)
        add(f"{p}.cross_attn.output_proj.bias", d)
        for nm in ("self_attn", "ca_text"):
            add(f"{p}.{nm}.in_proj_weight", 3 * d, d)
            add(f"{p}.{nm}.in_proj_bias", 3 * d)
            add(f"{p}.{nm}.out_proj.weight", d, d)
            add(f"{p}.{nm}.out_proj.bias", d)
        for nm in ("norm1", "norm2", "norm3", "catext_norm"):
            add(f"{p}.{nm}.weight", d)
            add(f"{p}.{nm}.bias", d)
        add(f"{p}.linear1.weight", cfg.ffn_dim, d)
        add(f"{p}.linear1.bias", cfg.ffn_dim)
        add(f"{p}.linear2.weight", d, cfg.ffn_dim)
        add(f"{p}.linear2.bias", d)

    def add_mlp(prefix, dims):
        for j, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            add(f"{prefix}.layers.{j}.weight", b, a)
            add(f"{prefix}.layers.{j}.bias", b)

    for i in range(cfg.dec_layers):
        add_mlp(f"transformer.decoder.bbox_embed.{i}", [d, d, d, 4])
        # top-level alias (shared module in the release checkpoint)
        for j in range(3):
            sd[f"bbox_embed.{i}.layers.{j}.weight"] = \
                sd[f"transformer.decoder.bbox_embed.{i}.layers.{j}.weight"]
            sd[f"bbox_embed.{i}.layers.{j}.bias"] = \
                sd[f"transformer.decoder.bbox_embed.{i}.layers.{j}.bias"]
    add_mlp("transformer.decoder.ref_point_head", [2 * d, d, d])
    add("transformer.decoder.norm.weight", d)
    add("transformer.decoder.norm.bias", d)
    add("transformer.enc_output.weight", d, d)
    add("transformer.enc_output.bias", d)
    add("transformer.enc_output_norm.weight", d)
    add("transformer.enc_output_norm.bias", d)
    add_mlp("transformer.enc_out_bbox_embed", [d, d, d, 4])
    return sd


def _init_tree(cfg):
    model = GroundingDinoModel(cfg)
    return model, jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 64, 64, 3), jnp.float32),
                             jnp.zeros((1, 16), jnp.int32),
                             jnp.ones((1, 16), bool)),
        jax.random.PRNGKey(0))


def test_converter_bijection_and_run():
    cfg = tiny_gdino_config()
    sd = _release_state(cfg, np.random.RandomState(0))
    converted = convert_gdino(sd)
    model, init = _init_tree(cfg)
    validate_gdino_bijection(converted, init)

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 64, 64, 3) * 0.5, jnp.float32)
    ids = jnp.asarray(rng.randint(0, cfg.bert.vocab_size, (1, 16)),
                      jnp.int32)
    mask = jnp.asarray(np.arange(16)[None] < 10)
    logits, boxes = jax.jit(model.apply)(converted, img, ids, mask)
    assert logits.shape == (1, cfg.num_queries, cfg.max_text_len)
    assert boxes.shape == (1, cfg.num_queries, 4)
    assert bool(jnp.isfinite(boxes).all())
    assert float(boxes.min()) >= 0.0 and float(boxes.max()) <= 1.0
    # logits over masked-out text positions are -inf; over valid ones finite
    assert bool(jnp.isfinite(logits[0, :, :10]).all())
    assert bool((logits[0, :, 10:] == -jnp.inf).all())


def test_bijection_fails_on_missing_family():
    cfg = tiny_gdino_config()
    sd = _release_state(cfg, np.random.RandomState(2))
    sd.pop("transformer.level_embed")
    _, init = _init_tree(cfg)
    with pytest.raises(ValueError, match="unassigned"):
        validate_gdino_bijection(convert_gdino(sd), init)


def test_unknown_key_fails_loudly():
    cfg = tiny_gdino_config()
    sd = _release_state(cfg, np.random.RandomState(3))
    sd["transformer.decoder.layers.0.bogus.weight"] = np.zeros(
        (4, 4), np.float32)
    with pytest.raises(ValueError, match="Unmapped"):
        convert_gdino(sd)


def test_grounder_and_langsam_pipeline():
    """GroundingDINO grounder end-to-end: caption -> boxes -> SAM mask
    (tiny configs, random weights)."""
    from diffusionhandles_tpu.models.groundingdino import (
        GroundingDinoGrounder)
    from diffusionhandles_tpu.models.sam import (PromptableSegmenter,
                                                 tiny_sam_config)
    from diffusionhandles_tpu.models.segmenter import LangSamSegmenter

    grounder = GroundingDinoGrounder(tiny_gdino_config(), input_size=64)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 96, 80).astype(np.float32)
    boxes, scores = grounder.predict_boxes(img, "a small toy")
    assert boxes.shape[0] >= 1 and boxes.shape[1] == 4
    assert np.isfinite(boxes).all() and np.isfinite(scores).all()
    assert (scores[:-1] >= scores[1:]).all()     # sorted
    # deterministic
    boxes2, _ = grounder.predict_boxes(img, "a small toy")
    np.testing.assert_array_equal(boxes, boxes2)

    seg = LangSamSegmenter(grounder=grounder,
                           sam=PromptableSegmenter(tiny_sam_config()))
    mask = seg.select_foreground(img, "a small toy")
    assert mask.shape == (1, 1, 96, 80)
    assert set(np.unique(mask)) <= {0.0, 1.0}

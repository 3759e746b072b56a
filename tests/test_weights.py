"""Weight-converter mapping tests: realistic diffusers/transformers key names
must land at the correct flax param paths with correctly-transposed shapes,
and the converted trees must be loadable by the flax models."""

import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from diffusionhandles_tpu.models.weights import (convert_text_encoder,
                                                 convert_unet, convert_vae)


def test_unet_key_mapping():
    state = {
        # stem
        "conv_in.weight": np.zeros((320, 5, 3, 3), np.float32),
        "conv_in.bias": np.zeros((320,), np.float32),
        "time_embedding.linear_1.weight": np.zeros((1280, 320), np.float32),
        "time_embedding.linear_1.bias": np.zeros((1280,), np.float32),
        # a resnet
        "down_blocks.0.resnets.0.norm1.weight": np.zeros((320,), np.float32),
        "down_blocks.0.resnets.0.conv1.weight":
            np.zeros((320, 320, 3, 3), np.float32),
        "down_blocks.0.resnets.0.time_emb_proj.weight":
            np.zeros((320, 1280), np.float32),
        # a transformer block
        "down_blocks.0.attentions.0.norm.weight":
            np.zeros((320,), np.float32),
        "down_blocks.0.attentions.0.proj_in.weight":
            np.zeros((320, 320), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            np.zeros((320, 320), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight":
            np.zeros((320, 1024), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0"
        ".weight": np.zeros((320, 320), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj"
        ".weight": np.zeros((2560, 320), np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight":
            np.zeros((320, 1280), np.float32),
        "down_blocks.0.downsamplers.0.conv.weight":
            np.zeros((320, 320, 3, 3), np.float32),
        "mid_block.resnets.0.conv1.weight":
            np.zeros((1280, 1280, 3, 3), np.float32),
        "up_blocks.1.upsamplers.0.conv.weight":
            np.zeros((1280, 1280, 3, 3), np.float32),
        "up_blocks.1.resnets.0.conv_shortcut.weight":
            np.zeros((1280, 2560, 1, 1), np.float32),
        "conv_norm_out.weight": np.zeros((320,), np.float32),
        "conv_out.weight": np.zeros((4, 320, 3, 3), np.float32),
    }
    tree = flatten_dict(convert_unet(state)["params"])
    expect = {
        ("conv_in", "kernel"): (3, 3, 5, 320),
        ("conv_in", "bias"): (320,),
        ("time_embedding_linear_1", "kernel"): (320, 1280),
        ("time_embedding_linear_1", "bias"): (1280,),
        ("down_blocks_0", "resnets_0", "norm1", "scale"): (320,),
        ("down_blocks_0", "resnets_0", "conv1", "kernel"): (3, 3, 320, 320),
        ("down_blocks_0", "resnets_0", "time_emb_proj", "kernel"):
            (1280, 320),
        ("down_blocks_0", "attentions_0", "norm", "scale"): (320,),
        ("down_blocks_0", "attentions_0", "proj_in", "kernel"): (320, 320),
        ("down_blocks_0", "attentions_0", "block0", "attn1", "to_q",
         "kernel"): (320, 320),
        ("down_blocks_0", "attentions_0", "block0", "attn2", "to_k",
         "kernel"): (1024, 320),
        ("down_blocks_0", "attentions_0", "block0", "attn1", "to_out",
         "kernel"): (320, 320),
        ("down_blocks_0", "attentions_0", "block0", "ff_proj", "kernel"):
            (320, 2560),
        ("down_blocks_0", "attentions_0", "block0", "ff_out", "kernel"):
            (1280, 320),
        ("down_blocks_0", "downsamplers_0", "conv", "kernel"):
            (3, 3, 320, 320),
        ("mid_block", "resnets_0", "conv1", "kernel"): (3, 3, 1280, 1280),
        ("up_blocks_1", "upsamplers_0", "conv", "kernel"):
            (3, 3, 1280, 1280),
        ("up_blocks_1", "resnets_0", "conv_shortcut", "kernel"):
            (1, 1, 2560, 1280),
        ("conv_norm_out", "scale"): (320,),
        ("conv_out", "kernel"): (3, 3, 320, 4),
    }
    for path, shape in expect.items():
        assert path in tree, path
        assert tree[path].shape == shape, (path, tree[path].shape, shape)
    assert len(tree) == len(expect)


def test_vae_key_mapping():
    state = {
        "encoder.conv_in.weight": np.zeros((128, 3, 3, 3), np.float32),
        "encoder.down_blocks.0.resnets.0.conv1.weight":
            np.zeros((128, 128, 3, 3), np.float32),
        "encoder.down_blocks.0.downsamplers.0.conv.weight":
            np.zeros((128, 128, 3, 3), np.float32),
        "encoder.mid_block.resnets.0.norm1.weight":
            np.zeros((512,), np.float32),
        "encoder.mid_block.attentions.0.to_q.weight":
            np.zeros((512, 512), np.float32),
        "encoder.mid_block.attentions.0.to_out.0.weight":
            np.zeros((512, 512), np.float32),
        "encoder.mid_block.attentions.0.group_norm.weight":
            np.zeros((512,), np.float32),
        "decoder.up_blocks.0.resnets.1.conv2.weight":
            np.zeros((512, 512, 3, 3), np.float32),
        "decoder.up_blocks.0.upsamplers.0.conv.weight":
            np.zeros((512, 512, 3, 3), np.float32),
        "quant_conv.weight": np.zeros((8, 8, 1, 1), np.float32),
        "post_quant_conv.weight": np.zeros((4, 4, 1, 1), np.float32),
    }
    tree = flatten_dict(convert_vae(state)["params"])
    expect = {
        ("encoder", "conv_in", "kernel"): (3, 3, 3, 128),
        ("encoder", "down_0_resnets_0", "conv1", "kernel"):
            (3, 3, 128, 128),
        ("encoder", "down_0_downsample", "kernel"): (3, 3, 128, 128),
        ("encoder", "mid_resnets_0", "norm1", "scale"): (512,),
        ("encoder", "mid_attn", "to_q", "kernel"): (512, 512),
        ("encoder", "mid_attn", "to_out", "kernel"): (512, 512),
        ("encoder", "mid_attn", "group_norm", "scale"): (512,),
        ("decoder", "up_0_resnets_1", "conv2", "kernel"): (3, 3, 512, 512),
        ("decoder", "up_0_upsample", "kernel"): (3, 3, 512, 512),
        ("quant_conv", "kernel"): (1, 1, 8, 8),
        ("post_quant_conv", "kernel"): (1, 1, 4, 4),
    }
    for path, shape in expect.items():
        assert path in tree, path
        assert tree[path].shape == shape, (path, tree[path].shape)


def test_text_encoder_key_mapping():
    state = {
        "text_model.embeddings.token_embedding.weight":
            np.zeros((49408, 1024), np.float32),
        "text_model.embeddings.position_embedding.weight":
            np.zeros((77, 1024), np.float32),
        "text_model.encoder.layers.0.self_attn.q_proj.weight":
            np.zeros((1024, 1024), np.float32),
        "text_model.encoder.layers.0.self_attn.q_proj.bias":
            np.zeros((1024,), np.float32),
        "text_model.encoder.layers.0.layer_norm1.weight":
            np.zeros((1024,), np.float32),
        "text_model.encoder.layers.0.mlp.fc1.weight":
            np.zeros((4096, 1024), np.float32),
        "text_model.final_layer_norm.weight": np.zeros((1024,), np.float32),
        "text_model.final_layer_norm.bias": np.zeros((1024,), np.float32),
    }
    tree = flatten_dict(convert_text_encoder(state)["params"])
    expect = {
        ("token_embedding", "embedding"): (49408, 1024),
        ("position_embedding",): (77, 1024),
        ("layers_0", "self_attn", "q_proj", "kernel"): (1024, 1024),
        ("layers_0", "self_attn", "q_proj", "bias"): (1024,),
        ("layers_0", "layer_norm1", "scale"): (1024,),
        ("layers_0", "fc1", "kernel"): (1024, 4096),
        ("final_layer_norm", "scale"): (1024,),
        ("final_layer_norm", "bias"): (1024,),
    }
    for path, shape in expect.items():
        assert path in tree, (path, sorted(tree)[:5])
        assert tree[path].shape == shape


def test_converted_tree_matches_model_structure():
    """Every path produced by converting a synthetic full state dict for the
    tiny U-Net must exist in the model's init tree (no orphans)."""
    import jax
    import jax.numpy as jnp
    from diffusionhandles_tpu.models.unet import (init_unet_params,
                                                  tiny_unet_config)
    cfg = tiny_unet_config()
    model, params = init_unet_params(cfg, seed=0)
    flat = flatten_dict(params["params"])
    # invert our mapping: build torch-style names from flax paths
    inverse = []
    for path, value in flat.items():
        name = ".".join(path[:-1])
        name = name.replace("block0", "transformer_blocks.0")
        name = name.replace("ff_proj", "ff.net.0.proj")
        name = name.replace("ff_out", "ff.net.2")
        name = name.replace("to_out", "to_out.0")
        name = name.replace("time_embedding_linear_1",
                            "time_embedding.linear_1")
        name = name.replace("time_embedding_linear_2",
                            "time_embedding.linear_2")
        import re
        name = re.sub(r"_(\d+)(\.|$)", r".\1\2", name)
        leaf = path[-1]
        if leaf == "kernel":
            if value.ndim == 4:
                tvalue = np.transpose(value, (3, 2, 0, 1))
            else:
                tvalue = np.transpose(value, (1, 0))
            suffix = "weight"
        elif leaf == "scale":
            tvalue = np.asarray(value)
            suffix = "weight"
        else:
            tvalue = np.asarray(value)
            suffix = "bias"
        inverse.append((f"{name}.{suffix}", tvalue))
    state = dict(inverse)
    assert len(state) == len(flat)
    converted = flatten_dict(convert_unet(state)["params"])
    assert set(converted) == set(flat)
    for path in flat:
        assert converted[path].shape == flat[path].shape, path
        np.testing.assert_array_equal(converted[path],
                                      np.asarray(flat[path]))

"""HF CLIPModel converter parity (vision tower + projections + the full
checkpoint loader feeding the CLIP-grounding segmenter)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionhandles_tpu.models.clip_image import (CLIPImageConfig,
                                                    CLIPImageEncoder)
from diffusionhandles_tpu.models.clip_text import tiny_clip_config
from diffusionhandles_tpu.models.weights_clip import (convert_clip_vision,
                                                      load_clip_checkpoint)

torch = pytest.importorskip("torch")

from torch_oracle_clip import OracleCLIPVision  # noqa: E402
from torch_oracle_sd import (OracleCLIPText,  # noqa: E402
                             tiny_oracle_clip_config)

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _tiny_vision(seed=0):
    cfg = CLIPImageConfig(image_size=32, patch_size=8, hidden_size=32,
                          num_layers=2, num_heads=2, projection_dim=32)
    gen = torch.Generator().manual_seed(seed)
    oracle = OracleCLIPVision(image_size=32, patch_size=8, d=32, layers=2,
                              heads=2, proj=32)
    proj = torch.randn(32, 32, generator=gen) * 0.05
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    oracle.eval()
    state = dict(oracle.state_dict_prefixed())
    state["visual_projection.weight"] = proj
    return cfg, oracle, proj, {k: np.asarray(v) for k, v in state.items()}


def test_vision_parity_pooled_and_patches():
    cfg, oracle, proj, state = _tiny_vision()
    params = convert_clip_vision(state)
    model = CLIPImageEncoder(cfg)

    rng = np.random.RandomState(1)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    pooled, patches = model.apply(params, jnp.asarray(img))

    with torch.no_grad():
        x = torch.from_numpy(
            np.moveaxis((img - _MEAN) / _STD, -1, 1).astype(np.float32))
        toks = oracle(x)
        t_pooled = (toks[:, 0] @ proj.T).numpy()
        n = oracle.n
        t_patches = (toks[:, 1:] @ proj.T).reshape(1, n, n, -1).numpy()

    np.testing.assert_allclose(np.asarray(pooled), t_pooled,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(patches), t_patches,
                               atol=2e-5, rtol=1e-4)


def test_full_checkpoint_loader_and_eot_pooling(tmp_path):
    cfg, _, _, state = _tiny_vision(seed=2)
    tcfg = tiny_clip_config()
    t_oracle = OracleCLIPText(tiny_oracle_clip_config()).eval()
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in t_oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    tproj = torch.randn(tcfg.hidden_size, 32, generator=gen) * 0.05

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    sd.update(t_oracle.state_dict_prefixed())
    sd["text_projection.weight"] = tproj.T.contiguous()  # HF stores [P, D]
    sd["logit_scale"] = torch.tensor(4.6)
    path = tmp_path / "clip.bin"
    torch.save(sd, path)

    vision, text, text_projection = load_clip_checkpoint(path, cfg, tcfg)

    from diffusionhandles_tpu.models.segmenter import CLIPSegmenter
    seg = CLIPSegmenter(image_config=cfg, text_config=tcfg,
                        image_params=vision, text_params=text,
                        text_projection=text_projection)
    rng = np.random.RandomState(4)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    sim = seg.similarity_map(img, "a cat")
    assert sim.shape == (1, 64, 64)
    assert np.isfinite(sim).all()

    # eot pooling parity against the torch text tower
    ids = np.asarray(seg.tokenizer(["a cat"]), np.int64)
    with torch.no_grad():
        hidden = t_oracle(torch.from_numpy(ids))
        eot = ids.argmax(-1)
        t_pool = (hidden[np.arange(len(eot)), eot] @ tproj).numpy()
    text_j = seg._encode_text(seg.text_params,
                              jnp.asarray(ids, jnp.int32))
    j_pool = np.asarray(
        text_j[np.arange(len(eot)), eot] @ seg.text_projection)
    np.testing.assert_allclose(j_pool, t_pool, atol=2e-5, rtol=1e-4)


def test_vision_bijection_fails_loudly():
    cfg, _, _, state = _tiny_vision(seed=5)
    state.pop("vision_model.encoder.layers.0.self_attn.q_proj.weight")
    params = convert_clip_vision(state)
    from diffusionhandles_tpu.models.weights_clip import _validate
    init = jax.eval_shape(
        lambda k: CLIPImageEncoder(cfg).init(
            k, jnp.zeros((1, 32, 32, 3), jnp.float32)),
        jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unassigned"):
        _validate(params, init, "clip-vision")

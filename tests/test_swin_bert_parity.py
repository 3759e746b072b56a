"""Swin + BERT converter parity vs independent torch oracles (the
GroundingDINO checkpoint's backbone.0.* / bert.* families)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from diffusionhandles_tpu.models.bert import BertModel, tiny_bert_config
from diffusionhandles_tpu.models.swin import (SwinTransformer,
                                              tiny_swin_config)
from diffusionhandles_tpu.models.weights_gdino import (_map_bert,
                                                       _map_swin)

torch = pytest.importorskip("torch")

from torch_oracle_swin_bert import OracleBert, OracleSwin  # noqa: E402


def _rand_init(module, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    module.eval()


def _convert(prefix_map, state, strip):
    flat = {}
    for k, v in state.items():
        assert prefix_map(flat, k[len(strip):], np.asarray(v)), k
    # rehome: keys are ('backbone'|'bert', ...) — drop the first element
    out = {}
    for key, v in flat.items():
        out[key[1:]] = v
    return {"params": unflatten_dict(out)}


def test_swin_parity_shifted_windows():
    # depths (1,1,2): the last stage has a SHIFTED block — exercises the
    # cyclic roll + attention mask path
    cfg = tiny_swin_config()
    oracle = OracleSwin()
    _rand_init(oracle, 0)
    params = _convert(_map_swin, oracle.state_dict_release(),
                      "backbone.0.")
    model = SwinTransformer(cfg)

    rng = np.random.RandomState(1)
    # non-multiple-of-window size at the last stage exercises padding
    img = rng.randn(1, 40, 48, 3).astype(np.float32)
    outs = model.apply(params, jnp.asarray(img))
    with torch.no_grad():
        t_outs = oracle(torch.from_numpy(np.moveaxis(img, -1, 1)))
    for i in outs:
        np.testing.assert_allclose(
            np.asarray(outs[i]), t_outs[i].numpy(), atol=3e-5, rtol=1e-4)


def test_bert_parity():
    cfg = tiny_bert_config()
    oracle = OracleBert()
    _rand_init(oracle, 2)
    params = _convert(_map_bert, oracle.state_dict_release(), "bert.")
    model = BertModel(cfg)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), bool)
    mask[1, 8:] = False
    hidden, pooled = model.apply(params, jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask))
    with torch.no_grad():
        t_hidden, t_pooled = oracle(torch.from_numpy(ids),
                                    torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(hidden), t_hidden.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), t_pooled.numpy(),
                               atol=2e-5, rtol=1e-4)

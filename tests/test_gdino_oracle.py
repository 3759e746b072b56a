"""End-to-end numeric oracle for the ASSEMBLED GroundingDINO graph.

The independent torch oracle (torch_oracle_gdino.py) implements the full
published architecture with release state-dict naming; its random weights
flow through models/weights_gdino.py:convert_gdino into the Flax model
(models/groundingdino.py). Box + logit parity of the assembled graphs
closes the composition gap the per-module crosschecks (deformable attn,
bi-attention, Swin, BERT) cannot cover: query selection, position
embeddings, per-phrase text masks, decoder refinement order.
(Reference capability: LangSAM grounding, test/estimate_foreground.py.)
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionhandles_tpu.models.groundingdino import (
    GroundingDinoModel, _output_proposals, tiny_gdino_config)
from diffusionhandles_tpu.models.weights_gdino import convert_gdino

torch = pytest.importorskip("torch")

from torch_oracle_gdino import OracleGroundingDino  # noqa: E402


def _tiny_cfg():
    # special ids must fit the tiny 128-word vocab
    return dataclasses.replace(tiny_gdino_config(),
                               special_token_ids=(101, 102, 119, 120))


def _oracle(cfg, seed=0):
    gen = torch.Generator().manual_seed(seed)
    oracle = OracleGroundingDino(cfg)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    oracle.eval()
    return oracle


def _caption_ids(cfg, s=12):
    """[CLS] tok tok tok . [SEP] + pads — the LangSAM caption layout."""
    ids = np.zeros((1, s), np.int64)
    ids[0, :6] = [101, 7, 8, 9, 119, 102]
    valid = ids != 0
    valid[:, 0] = True
    return ids, valid


def test_assembled_graph_logit_and_box_parity():
    cfg = _tiny_cfg()
    oracle = _oracle(cfg)
    state = {k: v.numpy() for k, v in oracle.state_dict_release().items()}
    variables = convert_gdino(state)

    rng = np.random.RandomState(3)
    img = rng.randn(1, 3, 64, 64).astype(np.float32) * 0.5
    ids, valid = _caption_ids(cfg)

    with torch.no_grad():
        t_logits, t_boxes = oracle(torch.from_numpy(img),
                                   torch.from_numpy(ids),
                                   torch.from_numpy(valid))

    model = GroundingDinoModel(cfg)
    j_logits, j_boxes = model.apply(
        variables, jnp.asarray(np.moveaxis(img, 1, -1)),
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(valid))

    np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(),
                               atol=2e-4, rtol=1e-3)
    jl = np.asarray(j_logits)
    tl = t_logits.numpy()
    finite = np.isfinite(tl)
    assert (np.isfinite(jl) == finite).all()
    np.testing.assert_allclose(jl[finite], tl[finite], atol=2e-4,
                               rtol=1e-3)


def test_assembled_graph_parity_second_seed_multi_phrase():
    """Different weights + a two-phrase caption (two '.' separators)
    exercising the per-phrase mask/position reset."""
    cfg = _tiny_cfg()
    oracle = _oracle(cfg, seed=11)
    state = {k: v.numpy() for k, v in oracle.state_dict_release().items()}
    variables = convert_gdino(state)

    rng = np.random.RandomState(5)
    img = rng.randn(1, 3, 64, 64).astype(np.float32) * 0.5
    ids = np.zeros((1, 14), np.int64)
    ids[0, :10] = [101, 7, 8, 119, 9, 10, 11, 119, 102, 0][:10]
    valid = ids != 0
    valid[:, 0] = True

    with torch.no_grad():
        t_logits, t_boxes = oracle(torch.from_numpy(img),
                                   torch.from_numpy(ids),
                                   torch.from_numpy(valid))
    model = GroundingDinoModel(cfg)
    j_logits, j_boxes = model.apply(
        variables, jnp.asarray(np.moveaxis(img, 1, -1)),
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(valid))

    np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(),
                               atol=2e-4, rtol=1e-3)
    jl = np.asarray(j_logits)
    tl = t_logits.numpy()
    finite = np.isfinite(tl)
    assert (np.isfinite(jl) == finite).all()
    np.testing.assert_allclose(jl[finite], tl[finite], atol=2e-4,
                               rtol=1e-3)


def test_output_proposals_validity_masking():
    """gen_encoder_output_proposals semantics at a fine level (64x64):
    border grid centers fall outside (0.01, 0.99) and must be masked to
    +inf; interior rows carry exact log(p/(1-p))."""
    shapes = [(64, 64), (2, 2)]
    props, valid = _output_proposals(shapes)
    props = np.asarray(props)
    valid = np.asarray(valid)

    # row 0 of the 64x64 grid: cy = 0.5/64 < 0.01 -> invalid
    assert not valid[:64].any()
    assert np.isinf(props[:64]).all()
    # an interior cell: all coords in (0.01, 0.99) -> valid, exact unsig
    idx = 10 * 64 + 20
    assert valid[idx]
    cx, cy = (20 + 0.5) / 64, (10 + 0.5) / 64
    want = np.log(np.array([cx, cy, 0.05, 0.05])
                  / (1 - np.array([cx, cy, 0.05, 0.05])))
    np.testing.assert_allclose(props[idx], want, rtol=1e-6)
    # the coarse 2x2 level is fully interior
    assert valid[64 * 64:].all()


@pytest.mark.slow
def test_assembled_graph_parity_full_swint_ogc_config():
    """Assembled-graph box+logit parity at the REAL swint_ogc configuration
    (d_model=256, 6+6 layers, 900 queries, Swin-T backbone, bert-base
    text encoder — GroundingDinoConfig's defaults ARE the release config),
    converted weights, 224x224 input. Closes the round-3 gap that the
    assembled oracle only ever ran at tiny shapes (reference capability:
    test/estimate_foreground.py:18-42)."""
    from diffusionhandles_tpu.models.groundingdino import GroundingDinoConfig

    cfg = GroundingDinoConfig()
    oracle = _oracle(cfg, seed=2)
    state = {k: v.numpy() for k, v in oracle.state_dict_release().items()}
    variables = convert_gdino(state)

    rng = np.random.RandomState(7)
    img = rng.randn(1, 3, 224, 224).astype(np.float32) * 0.5
    ids = np.zeros((1, 16), np.int64)
    ids[0, :9] = [101, 2005, 2003, 1012, 2044, 2051, 2060, 1012, 102]
    valid = ids != 0
    valid[:, 0] = True

    with torch.no_grad():
        t_logits, t_boxes = oracle(torch.from_numpy(img),
                                   torch.from_numpy(ids),
                                   torch.from_numpy(valid))
    model = GroundingDinoModel(cfg)
    j_logits, j_boxes = model.apply(
        variables, jnp.asarray(np.moveaxis(img, 1, -1)),
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(valid))

    # At random weights the encoder emits many EXACTLY-tied query-selection
    # scores, and torch.topk / lax.top_k break ties differently, so the 900
    # selected proposals come back as the same SET in a different row
    # order. Compare under the optimal row assignment (boxes + logits must
    # match under ONE permutation); deeper graph than the tiny config ->
    # slightly looser float32 budget.
    from scipy.optimize import linear_sum_assignment

    jb = np.asarray(j_boxes)[0]
    tb = t_boxes.numpy()[0]
    jl = np.asarray(j_logits)[0]
    tl = t_logits.numpy()[0]
    cost = np.linalg.norm(tb[:, None, :] - jb[None, :, :], axis=-1)
    rows, perm = linear_sum_assignment(cost)
    assert (rows == np.arange(len(tb))).all()
    np.testing.assert_allclose(jb[perm], tb, atol=1e-3, rtol=2e-3)
    finite = np.isfinite(tl)
    assert (np.isfinite(jl[perm]) == finite).all()
    np.testing.assert_allclose(jl[perm][finite], tl[finite], atol=1e-3,
                               rtol=2e-3)
    # the permutation must only deviate from identity where it is
    # score-invisible: permuted rows carry identical logits
    moved = perm != np.arange(len(perm))
    if moved.any():
        np.testing.assert_allclose(jl[moved], jl[perm][moved],
                                   atol=1e-3, rtol=2e-3)

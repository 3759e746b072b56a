"""Numeric crosschecks of GroundingDINO's novel ops against independent
torch references: multi-scale deformable attention (vs the published
pure-torch grid_sample fallback semantics) and bi-directional fusion
attention. Same weights, same inputs, logit-level agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionhandles_tpu.models.groundingdino import (BiAttention,
                                                       MSDeformAttn,
                                                       tiny_gdino_config)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _dense_t(params, name):
    k = np.asarray(params[name]["kernel"])
    b = np.asarray(params[name]["bias"])
    return torch.from_numpy(k), torch.from_numpy(b)


def test_ms_deform_attn_matches_grid_sample():
    cfg = tiny_gdino_config()
    spatial = [(8, 8), (4, 4), (2, 2), (1, 1)]
    S = sum(h * w for h, w in spatial)
    B, Q, d = 1, 5, cfg.d_model
    H, L, P = cfg.num_heads, cfg.num_levels, cfg.num_points
    hd = d // H

    rng = np.random.RandomState(0)
    query = rng.randn(B, Q, d).astype(np.float32) * 0.5
    value = rng.randn(B, S, d).astype(np.float32) * 0.5
    ref = rng.rand(B, Q, 2).astype(np.float32)

    mod = MSDeformAttn(cfg)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(query),
                      jnp.asarray(ref), jnp.asarray(value),
                      spatial)["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(query),
                               jnp.asarray(ref), jnp.asarray(value),
                               spatial))

    # torch reference with the SAME weights
    with torch.no_grad():
        tq = torch.from_numpy(query)
        tv = torch.from_numpy(value)
        wk, wb = _dense_t(params, "value_proj")
        v = (tv @ wk + wb).view(B, S, H, hd)
        ok, ob = _dense_t(params, "sampling_offsets")
        off = (tq @ ok + ob).view(B, Q, H, L, P, 2)
        ak, ab = _dense_t(params, "attention_weights")
        aw = (tq @ ak + ab).view(B, Q, H, L * P).softmax(-1).view(
            B, Q, H, L, P)
        normalizer = torch.tensor([[w, h] for (h, w) in spatial],
                                  dtype=torch.float32)
        loc = (torch.from_numpy(ref)[:, :, None, None, None, :]
               + off / normalizer[None, None, None, :, None, :])
        outs = []
        start = 0
        for lvl, (h, w) in enumerate(spatial):
            vl = v[:, start:start + h * w].permute(0, 2, 3, 1).reshape(
                B * H, hd, h, w)
            grid = loc[:, :, :, lvl] * 2 - 1          # [B, Q, H, P, 2]
            grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
            sampled = F.grid_sample(vl, grid, mode="bilinear",
                                    padding_mode="zeros",
                                    align_corners=False)  # [BH, hd, Q, P]
            outs.append(sampled.view(B, H, hd, Q, P))
            start += h * w
        stacked = torch.stack(outs, dim=-2)           # [B,H,hd,Q,L,P]
        weighted = (stacked * aw.permute(0, 2, 1, 3, 4)[:, :, None]
                    ).sum((-1, -2))                    # [B,H,hd,Q]
        out = weighted.permute(0, 3, 1, 2).reshape(B, Q, d)
        pk, pb = _dense_t(params, "output_proj")
        want = (out @ pk + pb).numpy()

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_bi_attention_matches_torch():
    cfg = tiny_gdino_config()
    B, Sv, Sl, d = 1, 10, 6, cfg.d_model
    rng = np.random.RandomState(2)
    vis = rng.randn(B, Sv, d).astype(np.float32) * 0.5
    txt = rng.randn(B, Sl, d).astype(np.float32) * 0.5
    mask = np.ones((B, Sl), bool)
    mask[0, 4:] = False

    mod = BiAttention(cfg)
    variables = mod.init(jax.random.PRNGKey(3), jnp.asarray(vis),
                         jnp.asarray(txt), jnp.asarray(mask))
    params = variables["params"]
    got_v, got_l = mod.apply(variables, jnp.asarray(vis),
                             jnp.asarray(txt), jnp.asarray(mask))

    e, H = cfg.fusion_dim, cfg.fusion_heads
    hd = e // H
    with torch.no_grad():
        def ln(name, x):
            w = torch.from_numpy(np.asarray(params[name]["scale"]))
            b = torch.from_numpy(np.asarray(params[name]["bias"]))
            return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-5)

        tvis = torch.from_numpy(vis)
        ttxt = torch.from_numpy(txt)
        vn = ln("layer_norm_v", tvis)
        lnorm = ln("layer_norm_l", ttxt)
        def proj(name, x):
            k, b = _dense_t(params, name)
            return x @ k + b
        qv = proj("v_proj", vn).view(B, Sv, H, hd) / np.sqrt(hd)
        kl = proj("l_proj", lnorm).view(B, Sl, H, hd)
        valv = proj("values_v_proj", vn).view(B, Sv, H, hd)
        vall = proj("values_l_proj", lnorm).view(B, Sl, H, hd)
        logits = torch.einsum("bvhc,blhc->bhvl", qv, kl).clamp(
            -50000, 50000)
        lmask = torch.from_numpy(mask)[:, None, None, :]
        attn_v = logits.masked_fill(~lmask, -1e9).softmax(-1)
        attn_l = logits.softmax(2)
        out_v = torch.einsum("bhvl,blhc->bvhc", attn_v, vall).reshape(
            B, Sv, e)
        out_l = torch.einsum("bhvl,bvhc->blhc", attn_l, valv).reshape(
            B, Sl, e)
        gv = torch.from_numpy(np.asarray(params["gamma_v"]))
        gl = torch.from_numpy(np.asarray(params["gamma_l"]))
        # published BiAttentionBlock residual lands on the NORMED inputs
        # (v = layer_norm_v(v); ...; v = v + gamma_v * delta_v)
        want_v = vn + gv * proj("out_v_proj", out_v)
        want_l = lnorm + gl * proj("out_l_proj", out_l)

    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_l), want_l.numpy(),
                               atol=2e-5, rtol=1e-4)


def _published_text_masks(input_ids, valid, special_ids):
    """Literal reimplementation of the published
    generate_masks_with_special_tokens_and_transfer_map sequential loop
    (GroundingDINO groundingdino.py), as the oracle for the vectorized
    builder."""
    bs, num_token = input_ids.shape
    sp = np.zeros((bs, num_token), bool)
    for sid in special_ids:
        sp |= input_ids == sid
    sp &= valid
    attn = np.eye(num_token, dtype=bool)[None].repeat(bs, axis=0)
    position_ids = np.zeros((bs, num_token), np.int64)
    for row in range(bs):
        previous_col = 0
        for col in np.nonzero(sp[row])[0]:
            if col == 0 or col == num_token - 1:
                attn[row, col, col] = True
                position_ids[row, col] = 0
            else:
                attn[row, previous_col + 1:col + 1,
                     previous_col + 1:col + 1] = True
                position_ids[row, previous_col + 1:col + 1] = np.arange(
                    0, col - previous_col)
            previous_col = col
    return attn, position_ids


def test_text_token_masks_match_published_loop():
    from diffusionhandles_tpu.models.groundingdino import (
        build_text_token_masks)

    specials = (101, 102, 1012, 1029)
    # "[CLS] a red car . [SEP]" + padding — the LangSAM caption layout
    ids = np.array([[101, 5, 6, 7, 1012, 102, 0, 0, 0],
                    [101, 8, 1012, 9, 10, 11, 1012, 102, 0]], np.int64)
    valid = ids != 0
    valid[:, 0] = True

    want_attn, want_pos = _published_text_masks(ids, valid, specials)
    got_attn, got_pos = build_text_token_masks(
        jnp.asarray(ids), jnp.asarray(valid), specials)
    got_attn = np.asarray(got_attn)
    got_pos = np.asarray(got_pos)

    # parity on real tokens (the published loop leaves padding eye-only;
    # the vectorized builder lets pads attend each other — both are masked
    # out downstream, so compare the valid x valid sub-block + pad rows'
    # diagonal reachability of real tokens)
    for row in range(ids.shape[0]):
        v = valid[row]
        np.testing.assert_array_equal(got_attn[row][v][:, v],
                                      want_attn[row][v][:, v])
        # real tokens never attend padding
        assert not got_attn[row][v][:, ~v].any()
        np.testing.assert_array_equal(got_pos[row][v], want_pos[row][v])

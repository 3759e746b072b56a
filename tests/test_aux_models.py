"""Aux model family tests (tiny configs): ZoeDepth-class DPT, LaMa-class FFC
inpainter, CLIP segmenter, text2img sampler."""

import numpy as np
import pytest

from diffusionhandles_tpu.models.zoedepth import (ZoeDepthEstimator,
                                                  tiny_zoedepth_config)
from diffusionhandles_tpu.models.lama import (LamaInpainter,
                                              tiny_lama_config)
from diffusionhandles_tpu.models.segmenter import CLIPSegmenter
from diffusionhandles_tpu.models.clip_image import tiny_clip_image_config
from diffusionhandles_tpu.models.clip_text import tiny_clip_config


def test_zoedepth_estimator():
    est = ZoeDepthEstimator(tiny_zoedepth_config())
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 48, 48).astype(np.float32)
    depth = est.estimate_depth(img)
    assert depth.shape == (1, 1, 48, 48)
    cfg = est.config
    assert (depth >= cfg.min_depth).all() and (depth <= cfg.max_depth).all()
    # deterministic
    np.testing.assert_array_equal(depth, est.estimate_depth(img))


def test_lama_inpainter_preserves_known_pixels():
    inp = LamaInpainter(tiny_lama_config())
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32)
    mask = np.zeros((1, 1, 32, 32), np.float32)
    mask[..., 10:20, 10:20] = 1.0
    out = inp.remove_foreground(img, mask)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    # pixels outside the mask are untouched (compositing)
    outside = mask[0, 0] == 0
    np.testing.assert_allclose(out[0, :, outside], img[0, :, outside],
                               atol=1e-6)
    # masked region was generated (in [0,1] from sigmoid)
    inside = mask[0, 0] == 1
    assert (out[0, :, inside] >= 0).all() and (out[0, :, inside] <= 1).all()


def test_lama_dilation_expands_mask():
    inp = LamaInpainter(tiny_lama_config())
    rng = np.random.RandomState(1)
    img = rng.rand(1, 3, 32, 32).astype(np.float32)
    mask = np.zeros((1, 1, 32, 32), np.float32)
    mask[..., 15:17, 15:17] = 1.0
    out0 = inp.remove_foreground(img, mask, dilation=0)
    out5 = inp.remove_foreground(img, mask, dilation=5)
    # with dilation, pixels near the mask change too
    assert np.abs(out5[0, :, 12, 15] - img[0, :, 12, 15]).max() > 0
    np.testing.assert_allclose(out0[0, :, 12, 15], img[0, :, 12, 15],
                               atol=1e-6)


def test_clip_segmenter():
    seg = CLIPSegmenter(
        image_config=tiny_clip_image_config(
            image_size=32, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=2, projection_dim=32),
        text_config=tiny_clip_config(hidden_size=32, intermediate_size=64,
                                     num_heads=2, num_layers=2))
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    mask = seg.select_foreground(img, "a red toy car")
    assert mask.shape == (1, 1, 64, 64)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    sim = seg.similarity_map(img, "a red toy car")
    assert sim.shape == (1, 64, 64)
    assert np.isfinite(sim).all()


def test_text2img_tiny():
    from diffusionhandles_tpu.config import GuidedDiffuserConfig
    from diffusionhandles_tpu.models.text2img import StableText2Img
    conf = GuidedDiffuserConfig(use_depth=False, num_timesteps=3,
                                dtype="float32", remat_guidance=False)
    t2i = StableText2Img(conf, variant="tiny")
    img = t2i.generate("a castle at sunset", seed=7)
    res = t2i.diffuser.image_res
    assert img.shape == (1, 3, res, res)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    np.testing.assert_array_equal(img, t2i.generate("a castle at sunset",
                                                    seed=7))


def test_sam_promptable_segmenter():
    from diffusionhandles_tpu.models.sam import PromptableSegmenter
    seg = PromptableSegmenter()
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 96, 96).astype(np.float32)
    mask = seg.segment(img, points=[[48, 48]], labels=[1])
    assert mask.shape == (1, 1, 96, 96)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # deterministic + prompt-dependent
    np.testing.assert_array_equal(mask, seg.segment(img, [[48, 48]], [1]))
    mask2 = seg.segment(img, points=[[10, 80]], labels=[1])
    assert mask2.shape == mask.shape


def test_lpips_metric():
    from diffusionhandles_tpu.models.lpips import LPIPSMetric
    m = LPIPSMetric()
    rng = np.random.RandomState(0)
    a = rng.rand(3, 48, 48).astype(np.float32)
    b = rng.rand(3, 48, 48).astype(np.float32)
    assert m(a, a) < 1e-6                 # identity -> 0
    d_ab = m(a, b)
    assert d_ab > 0
    # small perturbation < big perturbation
    eps = a + 0.01 * rng.randn(3, 48, 48).astype(np.float32)
    assert m(a, np.clip(eps, 0, 1)) < d_ab


def test_langsam_two_stage_segmenter():
    from diffusionhandles_tpu.models.sam import (PromptableSegmenter,
                                                 tiny_sam_config)
    from diffusionhandles_tpu.models.segmenter import LangSamSegmenter

    seg = LangSamSegmenter(sam=PromptableSegmenter(tiny_sam_config()))
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 96, 96).astype(np.float32)
    mask = seg.select_foreground(img, "a red cube")
    assert mask.shape == (1, 1, 96, 96)
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_wordpiece_tokenizer_real_vocab(tmp_path):
    from diffusionhandles_tpu.models.bert import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "red", "cu", "##be",
             "toy", ".", "un", "##know", "##able"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab))
    tok = WordPieceTokenizer(str(p))
    ids, mask = tok(["A red cube."], max_length=16)
    # [CLS] a red cu ##be . [SEP]
    assert ids[0, :7].tolist() == [2, 4, 5, 6, 7, 9, 3]
    assert mask[0, :7].all() and not mask[0, 7:].any()
    ids2, _ = tok(["unknowable zzz"], max_length=16)
    assert ids2[0, 1:4].tolist() == [10, 11, 12]   # un ##know ##able
    assert ids2[0, 4] == 1                          # zzz -> [UNK]
    # loud refusal on a missing vocab path
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        WordPieceTokenizer(str(tmp_path / "missing.txt"))

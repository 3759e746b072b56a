"""big-lama converter parity vs an independent torch oracle.

Validates that models/lama.py + models/weights_lama.py reproduce the
published FFCResNetGenerator (the reference's `saicinpainting.LamaInpainter`
backbone, reference: test/remove_foreground.py:7-42) bit-for-bit structure:
exact bijection of the release key families and logit-level output parity.
"""

import numpy as np
import pytest

from diffusionhandles_tpu.models.lama import (LamaConfig, LamaGenerator,
                                              LamaInpainter,
                                              tiny_lama_config)
from diffusionhandles_tpu.models.weights_lama import (convert_lama,
                                                      load_lama_checkpoint,
                                                      validate_lama_bijection)

torch = pytest.importorskip("torch")

from torch_oracle_lama import (FFCResNetGenerator,  # noqa: E402
                               randomize_batchnorm_stats)


def _oracle_and_state(ngf, n_down, n_blocks, ratio=0.75, seed=0):
    gen = torch.Generator().manual_seed(seed)
    oracle = FFCResNetGenerator(ngf=ngf, n_downsampling=n_down,
                                n_blocks=n_blocks, resnet_ratio=ratio)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        randomize_batchnorm_stats(oracle, gen)
    oracle.eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()
             if not k.endswith("num_batches_tracked")}
    return oracle, state


def _run_parity(cfg: LamaConfig, h, w, tol):
    import jax

    oracle, state = _oracle_and_state(cfg.ngf, cfg.n_downsampling,
                                      cfg.n_blocks, cfg.resnet_ratio)
    variables = convert_lama(state, cfg)

    model = LamaGenerator(cfg)
    init = jax.eval_shape(
        lambda k: model.init(k, np.zeros((1, h, w, cfg.input_nc),
                                         np.float32)),
        jax.random.PRNGKey(0))
    validate_lama_bijection(variables, init)

    rng = np.random.RandomState(1)
    x = rng.rand(1, cfg.input_nc, h, w).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    got = np.moveaxis(
        np.asarray(model.apply(variables,
                               np.moveaxis(x, 1, -1))), -1, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=tol, rtol=0)


def test_tiny_parity_nonsquare():
    # non-square input catches padding/fft axis mix-ups
    _run_parity(tiny_lama_config(), 48, 64, tol=2e-5)


@pytest.mark.slow
def test_biglama_shapes_parity():
    # full big-lama channel plan (ngf=64, 18 blocks, ratio 0.75) at a
    # reduced spatial size: exercises the last-downsample ratio switch and
    # every release key family at release shapes.
    _run_parity(LamaConfig(), 64, 64, tol=2e-4)


def test_checkpoint_file_roundtrip(tmp_path):
    cfg = tiny_lama_config()
    oracle, state = _oracle_and_state(cfg.ngf, cfg.n_downsampling,
                                      cfg.n_blocks, cfg.resnet_ratio)
    # lightning-style checkpoint: generator.* plus entries that must be
    # ignored (discriminator)
    sd = {"generator." + k: torch.from_numpy(np.asarray(v))
          for k, v in state.items()}
    sd["discriminator.model0.weight"] = torch.zeros(4, 4, 3, 3)
    path = tmp_path / "best.ckpt"
    torch.save({"state_dict": sd}, path)

    variables = load_lama_checkpoint(path, cfg)
    inp = LamaInpainter(cfg, params=variables)
    rng = np.random.RandomState(2)
    img = rng.rand(1, 3, 64, 64).astype(np.float32)
    mask = np.zeros((1, 1, 64, 64), np.float32)
    mask[:, :, 24:40, 24:40] = 1.0
    out = inp.inpaint(img, mask)

    with torch.no_grad():
        t_img = torch.from_numpy(img)
        t_mask = torch.from_numpy(mask)
        t_in = torch.cat([t_img * (1 - t_mask), t_mask], dim=1)
        t_out = oracle(t_in)
        t_res = (t_out * t_mask + t_img * (1 - t_mask)).numpy()
    np.testing.assert_allclose(out, t_res, atol=2e-5, rtol=0)


def test_bijection_fails_loudly_on_missing_key():
    cfg = tiny_lama_config()
    _, state = _oracle_and_state(cfg.ngf, cfg.n_downsampling, cfg.n_blocks,
                                 cfg.resnet_ratio)
    state.pop("model.1.ffc.convl2l.weight")
    import jax

    model = LamaGenerator(cfg)
    init = jax.eval_shape(
        lambda k: model.init(k, np.zeros((1, 16, 16, 4), np.float32)),
        jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="unassigned"):
        validate_lama_bijection(convert_lama(state, cfg), init)

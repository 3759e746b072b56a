"""LaMa inpainting (FFCResNetGenerator) in Flax — release-convertible.

Fills the role of the reference's `saicinpainting.LamaInpainter` dependency
(reference: test/remove_foreground.py:11-42 inpaints the dilated foreground
mask; webapp/webapps/lama_inpainter_webapp.py serves it over HTTP).

This is the published big-lama generator graph, re-expressed NHWC/functional
for TPU (FFTs and 1x1 convs are XLA-native and MXU/VPU friendly):

* stem: ReflectionPad(3) + 7x7 FFC(ratio 0->0) + BN + ReLU
* 3 stride-2 reflect-padded downsampling FFC convs (the last splits the
  channels 25/75 into local/global branches)
* 18 FFC residual blocks at ratio 0.75: local<->global 3x3 cross convs plus
  a SpectralTransform global path (1x1 conv -> FourierUnit (rfft2 -> 1x1
  conv over per-channel-interleaved re/im -> irfft2) -> 1x1 conv)
* 3 ConvTranspose(3, stride 2, pad 1, outpad 1) + BN + ReLU upsamples
* ReflectionPad(3) + 7x7 conv + sigmoid

Module names mirror the release checkpoint's `generator.model.<i>` sequential
indices (`m<i>`) so the weight conversion (models/weights_lama.py) is a
transparent 1:1 mapping. Weights are seeded-random unless converted from a
released big-lama checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LamaConfig:
    input_nc: int = 4           # rgb + mask
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18          # big-lama; lama-fourier uses 9
    resnet_ratio: float = 0.75  # big-lama global-branch ratio; fourier: 0.5
    max_features: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def _reflect_pad(x, p: int):
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class FourierUnit(nn.Module):
    """rfft2 -> 1x1 conv over stacked (re, im) -> irfft2.

    Matches the published FourierUnit exactly, including the per-channel
    re/im interleaving of the frequency tensor's channel axis (torch views
    [B, C, 2, H, Wf] as [B, 2C, H, Wf]).
    """

    channels: int  # in == out

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ffted = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2),
                              norm="ortho")              # [B, H, Wf, C]
        Wf = ffted.shape[2]
        f = jnp.stack([ffted.real, ffted.imag], axis=-1)  # [B, H, Wf, C, 2]
        f = f.reshape(B, H, Wf, C * 2)                    # c0_re, c0_im, ...
        f = nn.Conv(self.channels * 2, (1, 1), use_bias=False,
                    name="conv_layer")(f)
        f = nn.BatchNorm(use_running_average=True, name="bn")(f)
        f = nn.relu(f)
        f = f.reshape(B, H, Wf, self.channels, 2)
        comp = jax.lax.complex(f[..., 0].astype(jnp.float32),
                               f[..., 1].astype(jnp.float32))
        return jnp.fft.irfft2(comp, s=(H, W), axes=(1, 2), norm="ortho")


class SpectralTransform(nn.Module):
    """1x1 reduce -> FourierUnit -> 1x1 expand (enable_lfu=False, the
    big-lama setting)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        half = self.out_channels // 2
        h = nn.Conv(half, (1, 1), use_bias=False, name="conv1_conv")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=True,
                                 name="conv1_bn")(h))
        out = FourierUnit(half, name="fu")(h)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       name="conv2")(h + out)


class FFC(nn.Module):
    """Fast Fourier Convolution: local/global split with 4 cross paths.

    Absent branches (ratio 0 or 1) are represented as None; all spatial
    convs are bias-free with reflect padding (the published padding_type).
    """

    out_channels: int
    ratio_gin: float
    ratio_gout: float
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x_l, x_g):
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg

        def conv(inp, feats, name):
            h = _reflect_pad(inp, self.padding)
            return nn.Conv(feats, (self.kernel_size,) * 2,
                           strides=(self.stride,) * 2, padding="VALID",
                           use_bias=False, name=name)(h)

        out_l, out_g = None, None
        if out_cl > 0:
            out_l = conv(x_l, out_cl, "convl2l") if x_l is not None else None
            if x_g is not None:
                g2l = conv(x_g, out_cl, "convg2l")
                out_l = g2l if out_l is None else out_l + g2l
        if out_cg > 0:
            out_g = conv(x_l, out_cg, "convl2g") if x_l is not None else None
            if x_g is not None:
                g2g = SpectralTransform(out_cg, name="convg2g")(x_g)
                out_g = g2g if out_g is None else out_g + g2g
        return out_l, out_g


class FFCBnAct(nn.Module):
    out_channels: int
    ratio_gin: float
    ratio_gout: float
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x_l, x_g):
        y_l, y_g = FFC(self.out_channels, self.ratio_gin, self.ratio_gout,
                       self.kernel_size, self.stride, self.padding,
                       name="ffc")(x_l, x_g)
        if y_l is not None:
            y_l = nn.relu(nn.BatchNorm(use_running_average=True,
                                       name="bn_l")(y_l))
        if y_g is not None:
            y_g = nn.relu(nn.BatchNorm(use_running_average=True,
                                       name="bn_g")(y_g))
        return y_l, y_g


class FFCResnetBlock(nn.Module):
    channels: int
    ratio: float

    @nn.compact
    def __call__(self, x_l, x_g):
        h_l, h_g = FFCBnAct(self.channels, self.ratio, self.ratio, 3,
                            padding=1, name="conv1")(x_l, x_g)
        h_l, h_g = FFCBnAct(self.channels, self.ratio, self.ratio, 3,
                            padding=1, name="conv2")(h_l, h_g)
        return x_l + h_l, x_g + h_g


class LamaGenerator(nn.Module):
    """[B, H, W, input_nc] (masked rgb + mask) -> rgb [B, H, W, 3].

    Layer names `m<i>` mirror the release checkpoint's `generator.model.<i>`
    sequential indices (ReflectionPad/ReLU/Sigmoid/Concat layers hold no
    parameters and are inlined).
    """

    config: LamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ngf, mf = cfg.ngf, cfg.max_features

        # m0 ReflectionPad2d(3); m1 stem FFC_BN_ACT (ratio 0 -> 0)
        x = _reflect_pad(x, 3)
        h_l, h_g = FFCBnAct(ngf, 0.0, 0.0, 7, name="m1")(x, None)

        for i in range(cfg.n_downsampling):
            gout = (cfg.resnet_ratio if i == cfg.n_downsampling - 1 else 0.0)
            feats = min(mf, ngf * 2 ** (i + 1))
            h_l, h_g = FFCBnAct(feats, 0.0, gout, 3, stride=2, padding=1,
                                name=f"m{2 + i}")(h_l, h_g)

        dim = min(mf, ngf * 2 ** cfg.n_downsampling)
        for i in range(cfg.n_blocks):
            h_l, h_g = FFCResnetBlock(
                dim, cfg.resnet_ratio,
                name=f"m{2 + cfg.n_downsampling + i}")(h_l, h_g)

        # ConcatTupleLayer (index 2 + n_down + n_blocks; no params)
        h = jnp.concatenate([t for t in (h_l, h_g) if t is not None], -1)

        base = 3 + cfg.n_downsampling + cfg.n_blocks
        for i in range(cfg.n_downsampling):
            feats = min(mf, ngf * 2 ** (cfg.n_downsampling - i - 1))
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1):
            # dilated input padded (k-1-p, k-1-p+op) = (1, 2) per side.
            h = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 name=f"m{base + 3 * i}")(h)
            h = nn.relu(nn.BatchNorm(use_running_average=True,
                                     name=f"m{base + 3 * i + 1}")(h))

        # ReflectionPad2d(3) + 7x7 out conv + sigmoid
        h = _reflect_pad(h, 3)
        h = nn.Conv(cfg.output_nc, (7, 7), padding="VALID",
                    name=f"m{base + 3 * cfg.n_downsampling + 1}")(h)
        return nn.sigmoid(h)


class ForegroundRemover:
    """Service-level interface (parity with webapp/webapps/
    foreground_remover_webapp.py)."""

    def remove_foreground(self, img: np.ndarray,
                          fg_mask: np.ndarray,
                          dilation: int = 0) -> np.ndarray:
        """img [1,3,H,W] in [0,1], fg_mask [1,1,H,W] -> bg image."""
        raise NotImplementedError


class LamaInpainter(ForegroundRemover):
    """Mirrors `saicinpainting.LamaInpainter.inpaint` semantics:
    input = concat([img * (1 - mask), mask]); composite keeps known pixels.
    Weights convert from a released big-lama checkpoint via
    models/weights_lama.load_lama_checkpoint."""

    def __init__(self, config: Optional[LamaConfig] = None, params=None,
                 seed: int = 0, checkpoint_path: Optional[str] = None):
        self.config = config or LamaConfig()
        self.model = LamaGenerator(self.config)
        if checkpoint_path is not None:
            from diffusionhandles_tpu.models.weights_lama import (
                load_lama_checkpoint)
            params = load_lama_checkpoint(checkpoint_path, self.config)
        if params is None:
            x = jnp.zeros((1, 64, 64, self.config.input_nc), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def inpaint(self, image, mask):
        """image [1,3,H,W] in [0,1], mask [1,1,H,W] binary -> [1,3,H,W]."""
        x = jnp.moveaxis(jnp.asarray(image, jnp.float32), 1, -1)
        m = jnp.moveaxis(jnp.asarray(mask, jnp.float32), 1, -1)
        masked = x * (1.0 - m)
        out = self._apply(self.params,
                          jnp.concatenate([masked, m], axis=-1))
        out = out * m + x * (1.0 - m)
        return np.moveaxis(np.asarray(out), -1, 1)

    def remove_foreground(self, img, fg_mask, dilation: int = 0):
        """img [1,3,H,W] in [0,1], fg_mask [1,1,H,W] -> bg image
        (reference: test/remove_foreground.py:34-40)."""
        from diffusionhandles_tpu.ops.morphology import binary_dilation_iter
        img = np.asarray(img, np.float32)
        mask = np.asarray(fg_mask, np.float32).reshape(1, 1, img.shape[-2],
                                                       img.shape[-1])
        if dilation > 0:
            mask = np.asarray(
                binary_dilation_iter(mask[0, 0] > 0.5, dilation),
                np.float32)[None, None]
        return self.inpaint(img, mask)


def tiny_lama_config(**overrides) -> LamaConfig:
    base = dict(ngf=8, n_downsampling=2, n_blocks=2)
    base.update(overrides)
    return LamaConfig(**base)

"""Image inpainting with Fast Fourier Convolutions (LaMa-class) in Flax.

Fills the role of the reference's LaMa dependency
(reference: test/remove_foreground.py:11-42 inpaints the dilated foreground
mask; webapp/webapps/lama_inpainter_webapp.py serves it).

Architecture: the LaMa generator — reflection-padded downsampling convs, a
stack of FFC residual blocks whose global branch mixes features in the
Fourier domain (rfft2 -> 1x1 conv over stacked real/imag -> irfft2; FFTs and
1x1 convs are XLA-native and MXU/VPU friendly), and transposed-conv
upsampling. Weights are random unless converted from a released LaMa
checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LamaConfig:
    base_channels: int = 64
    num_down: int = 3
    num_ffc_blocks: int = 9
    global_ratio: float = 0.5  # fraction of channels in the global branch
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class SpectralTransform(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] -> FFT over H, W
        h = nn.Conv(self.channels // 2, (1, 1), use_bias=False,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, name="bn1")(h)
        h = nn.relu(h)

        freq = jnp.fft.rfft2(h, axes=(1, 2), norm="ortho")
        f = jnp.concatenate([freq.real, freq.imag], axis=-1)
        f = nn.Conv(self.channels, (1, 1), use_bias=False,
                    name="fu_conv")(f)
        f = nn.BatchNorm(use_running_average=True, name="fu_bn")(f)
        f = nn.relu(f)
        re, im = jnp.split(f, 2, axis=-1)
        spatial = jnp.fft.irfft2(jax.lax.complex(re, im), axes=(1, 2),
                                 s=(x.shape[1], x.shape[2]), norm="ortho")

        out = nn.Conv(self.channels, (1, 1), use_bias=False,
                      name="conv2")(h + spatial)
        return out


class FFC(nn.Module):
    """Fast Fourier Convolution: local/global split with cross terms."""

    channels: int
    global_ratio: float

    @nn.compact
    def __call__(self, x_l, x_g):
        cg = int(self.channels * self.global_ratio)
        cl = self.channels - cg
        conv = lambda c, k, name: nn.Conv(c, (k, k), padding=k // 2,
                                          use_bias=False, name=name)
        l2l = conv(cl, 3, "l2l")(x_l)
        g2l = conv(cl, 3, "g2l")(x_g)
        l2g = conv(cg, 3, "l2g")(x_l)
        g2g = SpectralTransform(cg, name="g2g")(x_g)
        out_l = nn.relu(nn.BatchNorm(use_running_average=True,
                                     name="bn_l")(l2l + g2l))
        out_g = nn.relu(nn.BatchNorm(use_running_average=True,
                                     name="bn_g")(l2g + g2g))
        return out_l, out_g


class FFCResBlock(nn.Module):
    channels: int
    global_ratio: float

    @nn.compact
    def __call__(self, x_l, x_g):
        h_l, h_g = FFC(self.channels, self.global_ratio, name="ffc1")(
            x_l, x_g)
        h_l, h_g = FFC(self.channels, self.global_ratio, name="ffc2")(
            h_l, h_g)
        return x_l + h_l, x_g + h_g


class LamaGenerator(nn.Module):
    """[B, H, W, 4] (rgb + mask) -> inpainted rgb [B, H, W, 3]."""

    config: LamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        c = cfg.base_channels
        h = nn.Conv(c, (7, 7), padding=3, name="stem")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=True,
                                 name="stem_bn")(h))
        for i in range(cfg.num_down):
            c *= 2
            h = nn.Conv(c, (3, 3), strides=2, padding=1,
                        name=f"down_{i}")(h)
            h = nn.relu(nn.BatchNorm(use_running_average=True,
                                     name=f"down_bn_{i}")(h))

        cg = int(c * cfg.global_ratio)
        x_l, x_g = h[..., :c - cg], h[..., c - cg:]
        for i in range(cfg.num_ffc_blocks):
            x_l, x_g = FFCResBlock(c, cfg.global_ratio,
                                   name=f"ffc_block_{i}")(x_l, x_g)
        h = jnp.concatenate([x_l, x_g], axis=-1)

        for i in range(cfg.num_down):
            c //= 2
            h = nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"up_{i}")(h)
            h = nn.relu(nn.BatchNorm(use_running_average=True,
                                     name=f"up_bn_{i}")(h))
        h = nn.Conv(3, (7, 7), padding=3, name="out_conv")(h)
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
    def __init__(self, config: LamaConfig = None, params=None,
                 seed: int = 0):
        self.config = config or LamaConfig()
        self.model = LamaGenerator(self.config)
        if params is None:
            x = jnp.zeros((1, 64, 64, 4), jnp.float32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def remove_foreground(self, img, fg_mask, dilation: int = 0):
        from diffusionhandles_tpu.ops.morphology import binary_dilation_iter
        img = np.asarray(img, np.float32)
        mask = np.asarray(fg_mask, np.float32).reshape(img.shape[-2],
                                                       img.shape[-1])
        if dilation > 0:
            mask = np.asarray(binary_dilation_iter(mask > 0.5, dilation),
                              np.float32)
        x = np.moveaxis(img, -3, -1)  # [1, H, W, 3]
        masked = x * (1.0 - mask[None, ..., None])
        inp = np.concatenate([masked, mask[None, ..., None]], axis=-1)
        out = np.asarray(self._apply(self.params, jnp.asarray(inp)))
        # composite: keep known pixels
        out = out * mask[None, ..., None] + x * (1 - mask[None, ..., None])
        return np.moveaxis(out, -1, -3)


def tiny_lama_config(**overrides) -> LamaConfig:
    base = dict(base_channels=8, num_down=2, num_ffc_blocks=2)
    base.update(overrides)
    return LamaConfig(**base)

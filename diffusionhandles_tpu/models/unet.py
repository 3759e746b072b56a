"""Depth-conditioned Stable Diffusion 2 U-Net in Flax (NHWC, TPU-native).

Functional re-design of the reference's forked diffusers U-Net
(reference: diffhandles/model/unet_2d_condition.py) — where the reference
threads `save_activations` / `save_attentions` flags through every block to
smuggle intermediate tensors out of a stateful forward, this U-Net simply
*returns* them: `__call__` yields `(eps, activations, attn_probs)` where
`activations` are the hidden states after each of the three cross-attention
up-blocks (reference capture points: unet_2d_condition.py:1146-1161; for the
SD-2-depth configuration these are [B,32,32,1280], [B,64,64,640],
[B,64,64,320]) and `attn_probs` (optional) are the cross-attention
probability maps (reference: attention_processor.py:1234-1262).

Layout is NHWC throughout (TPU convs want channels-last); weights convert
from the HF torch checkpoint via models/weights.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusionhandles_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-2-depth defaults (HF stabilityai/stable-diffusion-2-depth unet).

    in_channels=5 = 4 latent channels + 1 depth channel
    (reference: guided_stable_diffuser.py:193,219).
    """

    sample_size: int = 64
    in_channels: int = 5
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D")
    layers_per_block: int = 2
    # diffusers' `attention_head_dim` for SD2 actually stores the number of
    # heads per block (head dim is channels // heads = 64 everywhere).
    num_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # False | True (full block recompute) | 'dots' (save matmul outputs,
    # recompute elementwise chains — see the remat wiring below).
    remat: Any = False
    # Use the Pallas flash-attention kernel for long self-attention
    # sequences (>=512 tokens); short cross-attention stays dense.
    flash_attention: bool = False
    # Run the decoder's concat-skip convs as two summed half-kernel convs
    # (identical math and parameter tree; see SplitInputConv).
    split_skip_conv: bool = False
    # Run eligible 3x3 convs through the Pallas flattened-shift kernel
    # (ops/conv.py); identical math and parameter tree. False | True |
    # 'hybrid' (XLA forward, Pallas input-gradient backward) | 'taps'
    # (row-major tap matmuls) | 'fused' (taps everywhere + each resnet
    # GN+SiLU+conv half as one Pallas kernel, ops/gn_conv.py).
    pallas_conv: Any = False
    # Run GroupNorm(+SiLU) sites through the standalone fused Pallas
    # kernel (ops/groupnorm.py) — one VMEM-resident cell per batch
    # element vs XLA's ~6x-off-roofline stat fusions. Identical parameter
    # tree; ineligible shapes fall back to the fp32 flax composition.
    pallas_gn: bool = False


def timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: int = 10000):
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(
        half, dtype=jnp.float32) / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


def _conv3_impl(mode) -> str:
    """Map a pallas_conv config mode to the Conv3x3 impl choice."""
    if mode == "fused":
        # "fused" fuses the resnet GN+SiLU+conv halves (ops/gn_conv.py);
        # every other conv stays in the row-major tap-matmul form.
        return "taps"
    if mode in ("hybrid", "taps", "mixed", "im2col"):
        return mode
    return "pallas"


class GNSiLU(nn.Module):
    """GroupNorm followed by an optional SiLU and a cast, with the same
    parameter tree as nn.GroupNorm (scale/bias). When `use_pallas` and
    the shape is eligible, runs the fused Pallas kernel
    (ops/groupnorm.py); otherwise the fp32 reference composition
    (flax-GroupNorm numerics)."""

    groups: int = 32
    eps: float = 1e-5
    act: bool = True
    out_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from diffusionhandles_tpu.ops.groupnorm import (gn_ok, gn_silu,
                                                        gn_silu_ref)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          self.param_dtype)
        if self.use_pallas and gn_ok(x.shape, self.groups):
            return gn_silu(x, scale, bias, self.groups, self.eps,
                           self.act, self.out_dtype)
        return gn_silu_ref(x, scale, bias, self.groups, self.eps,
                           self.act, self.out_dtype)


class _NormParams(nn.Module):
    """Parameter tree of nn.GroupNorm (scale/bias) without its compute —
    lets ResnetBlock route the fused GN+SiLU+conv kernel while keeping a
    checkpoint-identical parameter layout."""

    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return scale, bias


class _Conv3Params(nn.Module):
    """Parameter tree of a 3x3 nn.Conv (kernel/bias) without its compute."""

    in_features: int
    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class Conv3x3(nn.Module):
    """nn.Conv-compatible 3x3 SAME conv (same parameter tree) that runs the
    Pallas flattened-shift kernel (ops/conv.py) when eligible — avoids
    XLA's im2col staging fusions and layout copies that dominate batch-1
    device traces — and falls back to the row-major tap-matmul form
    (conv3x3_taps) otherwise, including for stride 2."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    # "pallas" | "hybrid" (XLA fwd, Pallas dx bwd) | "taps" (plain-jnp
    # shifted matmuls, autodiff-friendly: grads are themselves row-major
    # matmuls, no conv ops anywhere in the autodiff graph)
    impl: str = "pallas"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        from diffusionhandles_tpu.ops.conv import (conv3x3, conv3x3_hybrid,
                                                   conv3x3_ok,
                                                   conv3x3_taps)

        ci = x.shape[-1]
        # Pre-sliced taps (prepare_unet_params): nine [Ci, Co] matrices in
        # the compute dtype, hoisted out of the denoising scan body — XLA
        # does not move the loop-invariant w[di, dj] slices out of scans,
        # and each costs an HBM->HBM copy per step.
        taps9 = None
        if not self.is_initializing() and self.has_variable("taps", "k9"):
            taps9 = self.get_variable("taps", "k9")
        kshape = (3, 3, ci, self.features)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        xd = x.astype(self.dtype)
        take_taps = (self.impl == "taps" or self.stride != 1
                     or not conv3x3_ok(
                         xd.shape, kshape,
                         dtype_bytes=jnp.dtype(self.dtype).itemsize))
        if taps9 is not None and take_taps and self.impl != "im2col":
            return (conv3x3_taps(xd, None, self.stride, taps=taps9)
                    + bias.astype(self.dtype))
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kshape, self.param_dtype)
        kd = kernel.astype(self.dtype)
        if self.impl == "im2col":
            from diffusionhandles_tpu.ops.conv import conv3x3_im2col
            return (conv3x3_im2col(xd, kd, self.stride)
                    + bias.astype(self.dtype))
        if not take_taps:
            from diffusionhandles_tpu.ops.conv import conv3x3_mixed
            y = {"hybrid": conv3x3_hybrid,
                 "mixed": conv3x3_mixed}.get(self.impl, conv3x3)(xd, kd)
        else:
            # tap-matmul form: keeps the row-major layout (XLA's conv
            # layouts would reintroduce transpose copies around this op)
            y = conv3x3_taps(xd, kd, self.stride)
        return y + bias.astype(self.dtype)


class Conv1x1AsMatmul(nn.Module):
    """A 1x1 nn.Conv (same [1, 1, Ci, Co] parameter tree) evaluated as a
    flattened matmul — avoids conv layout assignment for pointwise ops."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        if not self.is_initializing() and self.has_variable("taps", "k1"):
            # pre-squeezed [Ci, Co] matrix (prepare_unet_params) — the
            # kernel[0, 0] slice below is otherwise re-materialized every
            # scan step
            kd = self.get_variable("taps", "k1")
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (1, 1, ci, self.features), self.param_dtype)
            kd = kernel[0, 0].astype(self.dtype)
        y = jnp.einsum("...c,cf->...f", x.astype(self.dtype), kd)
        return y + bias.astype(self.dtype)


class SplitInputConv(nn.Module):
    """An nn.Conv (same parameter tree: one [kh, kw, Cin, F] kernel) whose
    forward splits the input channels at `split_at` and runs two summed
    convolutions. Used for the decoder's concat-skip convs: the monolithic
    [3,3,2560,1280] kernels otherwise dominate per-step weight staging on
    TPU (device-trace finding, PERFORMANCE.md); two ~30 MB halves pipeline
    where one 59 MB kernel cannot."""

    features: int
    kernel_size: Tuple[int, int]
    split_at: int
    padding: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        ka = jax.lax.slice_in_dim(kernel, 0, self.split_at, axis=2)
        kb = jax.lax.slice_in_dim(kernel, self.split_at, cin, axis=2)
        xa = x[..., :self.split_at].astype(self.dtype)
        xb = x[..., self.split_at:].astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            xa.shape, ka.shape, ("NHWC", "HWIO", "NHWC"))
        pad = [(self.padding, self.padding)] * 2
        ya = jax.lax.conv_general_dilated(
            xa, ka.astype(self.dtype), (1, 1), pad, dimension_numbers=dn)
        yb = jax.lax.conv_general_dilated(
            xb, kb.astype(self.dtype), (1, 1), pad, dimension_numbers=dn)
        return ya + yb + bias.astype(self.dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    groups: int = 32
    # when >0: input is concat(trunk, skip) with the boundary at split_at;
    # conv1/conv_shortcut run as two summed convs (identical math & params)
    split_at: int = 0
    pallas_conv: Any = False
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x, temb):
        if self.pallas_conv == "fused":
            return self._fused(x, temb)
        # "mm1x1": XLA 3x3 convs but matmul-form 1x1 shortcuts (the
        # layout-churn win without the Pallas-conv grad regression)
        use_pallas3 = self.pallas_conv and self.pallas_conv != "mm1x1"
        conv3 = (functools.partial(Conv3x3, impl=_conv3_impl(self.pallas_conv))
            if use_pallas3 else functools.partial(
                nn.Conv, kernel_size=(3, 3), padding=1))
        residual = x
        if self.pallas_gn:
            h = GNSiLU(groups=self.groups, eps=1e-5, act=True,
                       out_dtype=self.dtype, param_dtype=self.param_dtype,
                       use_pallas=True, name="norm1")(x)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=jnp.float32,
                             param_dtype=self.param_dtype,
                             name="norm1")(x)
            h = nn.silu(h).astype(self.dtype)
        if self.split_at > 0 and not use_pallas3:
            h = SplitInputConv(self.out_channels, (3, 3),
                               split_at=self.split_at, padding=1,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="conv1")(h)
        else:
            h = conv3(self.out_channels,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="time_emb_proj")(nn.silu(temb).astype(self.dtype))
        h = h + t[:, None, None, :]
        if self.pallas_gn:
            h = GNSiLU(groups=self.groups, eps=1e-5, act=True,
                       out_dtype=self.dtype, param_dtype=self.param_dtype,
                       use_pallas=True, name="norm2")(h)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             dtype=jnp.float32,
                             param_dtype=self.param_dtype,
                             name="norm2")(h)
            h = nn.silu(h).astype(self.dtype)
        h = conv3(self.out_channels, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            if self.split_at > 0 and not use_pallas3:
                residual = SplitInputConv(
                    self.out_channels, (1, 1), split_at=self.split_at,
                    padding=0, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="conv_shortcut")(residual)
            elif self.pallas_conv:
                # 1x1 conv as a plain matmul (same [1,1,Ci,Co] param tree):
                # keeps the activation in the row-major [B,S,C] layout the
                # Pallas convs and attention already use, instead of
                # tempting XLA into conv-layout transposes.
                residual = Conv1x1AsMatmul(
                    self.out_channels, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="conv_shortcut")(residual)
            else:
                residual = nn.Conv(self.out_channels, (1, 1),
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="conv_shortcut")(residual)
        return h + residual

    def _fused(self, x, temb):
        """pallas_conv='fused': each GN+SiLU+conv half runs as ONE Pallas
        kernel (ops/gn_conv.py) when the shape is eligible, with an
        identical-numerics row-major fallback otherwise. The parameter tree
        matches the unfused branch exactly (checkpoint-compatible)."""
        from diffusionhandles_tpu.ops.gn_conv import (gn_silu_conv3x3,
                                                      gn_silu_conv3x3_ok,
                                                      gn_silu_conv3x3_ref)

        def half(xin, norm_name, conv_name):
            ci = xin.shape[-1]
            g_scale, g_bias = _NormParams(ci, param_dtype=self.param_dtype,
                                          name=norm_name)()
            kernel, bias = _Conv3Params(ci, self.out_channels,
                                        param_dtype=self.param_dtype,
                                        name=conv_name)()
            xd = xin.astype(self.dtype)
            fn = (gn_silu_conv3x3
                  if gn_silu_conv3x3_ok(xd.shape, kernel.shape, self.groups)
                  else gn_silu_conv3x3_ref)
            y = fn(xd, g_scale, g_bias, kernel, self.groups, 1e-5)
            return y + bias.astype(self.dtype)

        residual = x
        h = half(x, "norm1", "conv1")
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="time_emb_proj")(nn.silu(temb).astype(self.dtype))
        h = h + t[:, None, None, :]
        h = half(h, "norm2", "conv2")
        if residual.shape[-1] != self.out_channels:
            residual = Conv1x1AsMatmul(
                self.out_channels, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv_shortcut")(residual)
        return h + residual


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None."""

    num_heads: int
    head_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context=None, capture_probs: bool = False):
        is_self = context is None
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        dense = lambda feats, name, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        q = dense(inner, "to_q", False)(x)
        k = dense(inner, "to_k", False)(context)
        v = dense(inner, "to_v", False)(context)
        b, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        if capture_probs:
            out, probs = dot_product_attention(q, k, v, return_probs=True)
        else:
            out = dot_product_attention(q, k, v,
                                        use_flash=self.use_flash and is_self)
            probs = None
        out = out.reshape(b, sq, inner)
        out = dense(x.shape[-1], "to_out", True)(out)
        return out, probs


class TransformerBlock(nn.Module):
    """BasicTransformerBlock: self-attn -> cross-attn -> GEGLU FF."""

    num_heads: int
    head_dim: int
    cross_attention_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, context, capture_probs: bool = False):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)
        attn = lambda name: CrossAttention(
            self.num_heads, self.head_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, use_flash=self.use_flash,
            name=name)
        h, _ = attn("attn1")(ln("norm1")(x).astype(self.dtype))
        x = x + h
        h, probs = attn("attn2")(ln("norm2")(x).astype(self.dtype), context,
                                 capture_probs=capture_probs)
        x = x + h
        # GEGLU feed-forward.
        d = x.shape[-1]
        h = ln("norm3")(x).astype(self.dtype)
        h = nn.Dense(d * 8, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="ff_proj")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="ff_out")(h)
        return x + h, probs


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> (linear) proj -> block -> proj -> +res."""

    num_heads: int
    head_dim: int
    cross_attention_dim: int
    use_linear_projection: bool = True
    groups: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_flash: bool = False
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x, context, capture_probs: bool = False):
        b, h, w, c = x.shape
        residual = x
        if self.pallas_gn:
            hidden = GNSiLU(groups=self.groups, eps=1e-6, act=False,
                            out_dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            use_pallas=True, name="norm")(x)
        else:
            hidden = nn.GroupNorm(
                num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
                param_dtype=self.param_dtype,
                name="norm")(x).astype(self.dtype)
        hidden = hidden.reshape(b, h * w, c)
        if self.use_linear_projection:
            hidden = nn.Dense(c, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="proj_in")(hidden)
        else:
            hidden = hidden.reshape(b, h, w, c)
            hidden = nn.Conv(c, (1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="proj_in")(hidden)
            hidden = hidden.reshape(b, h * w, c)
        hidden, probs = TransformerBlock(
            self.num_heads, self.head_dim, self.cross_attention_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_flash=self.use_flash,
            name="block0")(hidden, context, capture_probs=capture_probs)
        if self.use_linear_projection:
            hidden = nn.Dense(c, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="proj_out")(hidden)
            hidden = hidden.reshape(b, h, w, c)
        else:
            hidden = hidden.reshape(b, h, w, c)
            hidden = nn.Conv(c, (1, 1), dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="proj_out")(hidden)
        return hidden + residual, probs


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    pallas_conv: Any = False

    @nn.compact
    def __call__(self, x):
        # row-major modes route the stride-2 conv through Conv3x3, which
        # always evaluates stride 2 in the taps form (the Pallas kernel is
        # stride-1 only) so the layout stays [B, S, C]; other modes keep
        # XLA's stride-2 conv
        if self.pallas_conv in ("flat", "taps", "fused", "im2col"):
            return Conv3x3(self.channels, dtype=self.dtype,
                           param_dtype=self.param_dtype, stride=2,
                           impl=_conv3_impl(self.pallas_conv),
                           name="conv")(x)
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    pallas_conv: Any = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        # "mm1x1" contract is XLA 3x3 convs (only the 1x1 shortcuts change
        # form) — routing this conv through _conv3_impl would silently give
        # it the Pallas path, corrupting that mode's A/B measurements
        use_pallas3 = self.pallas_conv and self.pallas_conv != "mm1x1"
        conv3 = (functools.partial(Conv3x3, impl=_conv3_impl(self.pallas_conv))
            if use_pallas3 else functools.partial(
                nn.Conv, kernel_size=(3, 3), padding=1))
        return conv3(self.channels, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv")(x)


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    num_heads: int = 0            # 0 => plain DownBlock2D (no attention)
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    use_flash: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    pallas_conv: Any = False
    groups: int = 32
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x, temb, context, capture_probs: bool = False):
        skips = []
        probs = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            groups=self.groups,
                            pallas_conv=self.pallas_conv,
                            pallas_gn=self.pallas_gn,
                            name=f"resnets_{i}")(x, temb)
            if self.num_heads:
                x, p = Transformer2D(
                    self.num_heads, self.out_channels // self.num_heads,
                    self.cross_attention_dim,
                    use_linear_projection=self.use_linear_projection,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    groups=self.groups, use_flash=self.use_flash,
                    pallas_gn=self.pallas_gn,
                    name=f"attentions_{i}")(x, context,
                                            capture_probs=capture_probs)
                probs.append(p)
            skips.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           pallas_conv=self.pallas_conv,
                           name="downsamplers_0")(x)
            skips.append(x)
        return x, skips, probs


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    num_heads: int = 0            # 0 => plain UpBlock2D
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    use_flash: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    split_skip_conv: bool = False
    pallas_conv: Any = False
    groups: int = 32
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x, skips, temb, context, capture_probs: bool = False):
        probs = []
        for i in range(self.num_layers):
            trunk_ch = x.shape[-1]
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = ResnetBlock(self.out_channels, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            groups=self.groups,
                            split_at=(trunk_ch if self.split_skip_conv
                                      else 0),
                            pallas_conv=self.pallas_conv,
                            pallas_gn=self.pallas_gn,
                            name=f"resnets_{i}")(x, temb)
            if self.num_heads:
                x, p = Transformer2D(
                    self.num_heads, self.out_channels // self.num_heads,
                    self.cross_attention_dim,
                    use_linear_projection=self.use_linear_projection,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    groups=self.groups, use_flash=self.use_flash,
                    pallas_gn=self.pallas_gn,
                    name=f"attentions_{i}")(x, context,
                                            capture_probs=capture_probs)
                probs.append(p)
        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         pallas_conv=self.pallas_conv,
                         name="upsamplers_0")(x)
        return x, probs


class MidBlock(nn.Module):
    channels: int
    num_heads: int
    cross_attention_dim: int = 1024
    use_linear_projection: bool = True
    use_flash: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    pallas_conv: Any = False
    groups: int = 32
    pallas_gn: bool = False

    @nn.compact
    def __call__(self, x, temb, context, capture_probs: bool = False):
        x = ResnetBlock(self.channels, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        groups=self.groups,
                        pallas_conv=self.pallas_conv,
                        pallas_gn=self.pallas_gn,
                        name="resnets_0")(x, temb)
        x, probs = Transformer2D(
            self.num_heads, self.channels // self.num_heads,
            self.cross_attention_dim,
            use_linear_projection=self.use_linear_projection,
            dtype=self.dtype, param_dtype=self.param_dtype,
            groups=self.groups, use_flash=self.use_flash,
            pallas_gn=self.pallas_gn,
            name="attentions_0")(x, context, capture_probs=capture_probs)
        x = ResnetBlock(self.channels, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        groups=self.groups,
                        pallas_conv=self.pallas_conv,
                        pallas_gn=self.pallas_gn,
                        name="resnets_1")(x, temb)
        return x, [probs]


class UNet2DCondition(nn.Module):
    """The denoising U-Net. Inputs NHWC; returns (eps, activations, attn)."""

    config: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 capture_attention: bool = False):
        """Args:
          sample: [B, H, W, C_in] latent (+ depth channel) in compute dtype.
          timesteps: scalar or [B] training timestep(s).
          encoder_hidden_states: [B, 77, cross_attention_dim] text context.
          capture_attention: also return cross-attn probability maps
            (parity with reference `save_attentions`).

        Returns:
          eps: [B, H, W, out_channels] (float32)
          activations: tuple of 3 decoder hidden states (after each
            cross-attn up block, upsampler included) — float32.
          attn: dict with 'down', 'mid', 'up' lists of prob maps, or None.
        """
        cfg = self.config
        dtype = cfg.dtype
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        temb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                                  cfg.flip_sin_to_cos, cfg.freq_shift)
        time_dim = cfg.block_out_channels[0] * 4
        temb = nn.Dense(time_dim, dtype=dtype, param_dtype=cfg.param_dtype,
                        name="time_embedding_linear_1")(temb.astype(dtype))
        temb = nn.Dense(time_dim, dtype=dtype, param_dtype=cfg.param_dtype,
                        name="time_embedding_linear_2")(nn.silu(temb))

        context = encoder_hidden_states.astype(dtype)
        sample = sample.astype(dtype)

        if cfg.pallas_conv in ("flat", "taps", "fused", "im2col"):
            x = Conv3x3(cfg.block_out_channels[0], dtype=dtype,
                        param_dtype=cfg.param_dtype,
                        impl=_conv3_impl(cfg.pallas_conv),
                        name="conv_in")(sample)
        else:
            x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                        dtype=dtype, param_dtype=cfg.param_dtype,
                        name="conv_in")(sample)

        if cfg.remat:
            # remat='dots' saves matmul outputs and recomputes the
            # elementwise chains (GN/SiLU/adds) in the backward — under
            # the taps conv mode the graph is all matmuls, so this trades
            # a little VPU recompute for the stored-intermediate HBM
            # traffic the backward otherwise rereads. remat=True is the
            # classic full-block recompute (memory floor, measured ~3x
            # fwd instead of ~2.2x).
            policy = (jax.checkpoint_policies.dots_saveable
                      if cfg.remat == "dots" else None)
            down_cls = nn.remat(DownBlock, static_argnums=(4,),
                                policy=policy)
            up_cls = nn.remat(UpBlock, static_argnums=(5,), policy=policy)
        else:
            down_cls, up_cls = DownBlock, UpBlock

        skips = [x]
        attn_down = []
        num_blocks = len(cfg.block_out_channels)
        for i, block_type in enumerate(cfg.down_block_types):
            is_cross = block_type == "CrossAttnDownBlock2D"
            x, block_skips, probs = down_cls(
                out_channels=cfg.block_out_channels[i],
                num_layers=cfg.layers_per_block,
                add_downsample=i < num_blocks - 1,
                num_heads=cfg.num_heads[i] if is_cross else 0,
                cross_attention_dim=cfg.cross_attention_dim,
                use_linear_projection=cfg.use_linear_projection,
                use_flash=cfg.flash_attention,
                pallas_conv=cfg.pallas_conv, groups=cfg.norm_num_groups,
                pallas_gn=cfg.pallas_gn,
                dtype=dtype, param_dtype=cfg.param_dtype,
                name=f"down_blocks_{i}")(x, temb, context, capture_attention)
            skips.extend(block_skips)
            if is_cross:
                attn_down.append(probs)

        x, attn_mid = MidBlock(
            channels=cfg.block_out_channels[-1],
            num_heads=cfg.num_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            use_flash=cfg.flash_attention,
            pallas_conv=cfg.pallas_conv, groups=cfg.norm_num_groups,
            pallas_gn=cfg.pallas_gn,
            dtype=dtype, param_dtype=cfg.param_dtype,
            name="mid_block")(x, temb, context, capture_attention)

        activations = []
        attn_up = []
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_heads))
        for i, block_type in enumerate(cfg.up_block_types):
            is_cross = block_type == "CrossAttnUpBlock2D"
            num_layers = cfg.layers_per_block + 1
            block_skips = skips[-num_layers:]
            skips = skips[:-num_layers]
            x, probs = up_cls(
                out_channels=rev_channels[i],
                num_layers=num_layers,
                add_upsample=i < num_blocks - 1,
                num_heads=rev_heads[i] if is_cross else 0,
                cross_attention_dim=cfg.cross_attention_dim,
                use_linear_projection=cfg.use_linear_projection,
                use_flash=cfg.flash_attention,
                split_skip_conv=cfg.split_skip_conv,
                pallas_conv=cfg.pallas_conv, groups=cfg.norm_num_groups,
                pallas_gn=cfg.pallas_gn,
                dtype=dtype, param_dtype=cfg.param_dtype,
                name=f"up_blocks_{i}")(x, block_skips, temb, context,
                                       capture_attention)
            if is_cross:
                # Decoder feature capture — the reference appends `sample`
                # after every cross-attn up block
                # (unet_2d_condition.py:1146-1161).
                activations.append(x.astype(jnp.float32))
                attn_up.append(probs)

        if cfg.pallas_gn:
            x = GNSiLU(groups=cfg.norm_num_groups, eps=1e-5, act=True,
                       out_dtype=dtype, param_dtype=cfg.param_dtype,
                       use_pallas=True, name="conv_norm_out")(x)
        else:
            x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                             dtype=jnp.float32, param_dtype=cfg.param_dtype,
                             name="conv_norm_out")(x)
            x = nn.silu(x).astype(dtype)
        if cfg.pallas_conv in ("flat", "taps", "fused", "im2col"):
            eps = Conv3x3(cfg.out_channels, dtype=jnp.float32,
                          param_dtype=cfg.param_dtype,
                          impl=_conv3_impl(cfg.pallas_conv),
                          name="conv_out")(x)
        else:
            eps = nn.Conv(cfg.out_channels, (3, 3), padding=1,
                          dtype=jnp.float32, param_dtype=cfg.param_dtype,
                          name="conv_out")(x)

        attn = ({"down": attn_down, "mid": attn_mid, "up": attn_up}
                if capture_attention else None)
        return eps.astype(jnp.float32), tuple(activations), attn


def prepare_unet_params(variables, dtype=jnp.bfloat16):
    """Hoist scan-invariant weight slicing out of the denoising loops.

    Returns a Flax variables dict {'params': <unchanged>, 'taps': <mirror
    tree>} where every 3x3 conv kernel contributes nine pre-sliced
    [Ci, Co] tap matrices ('k9') and every 1x1 conv kernel its squeezed
    [Ci, Co] matrix ('k1'), all in the compute dtype. XLA does not apply
    loop-invariant code motion through lax.scan/while bodies, so the
    in-body `w[di, dj]` / `w[0, 0]` slices otherwise cost an HBM->HBM
    copy per denoising step (~0.8 ms/step of slice-done time in the
    fwd+bwd device trace). Call INSIDE the jitted program, before the
    scan: the slicing then runs once per program call and the scan body
    consumes the slices as separate loop constants.

    The canonical parameter tree (checkpoints, converters, oracles) is
    unchanged; Conv3x3/Conv1x1AsMatmul fall back to in-body slicing when
    the 'taps' collection is absent. Autodiff needs no transposed-kernel
    copies either: the tap matmuls are einsums, whose cotangents contract
    the other dim of the SAME tap matrices.
    """
    if "params" in variables and isinstance(variables["params"], dict):
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
    else:
        params, extra = variables, {}

    def walk(d):
        out = {}
        for key, val in d.items():
            if not isinstance(val, dict):
                continue
            sub = walk(val)
            k = val.get("kernel")
            if k is not None and getattr(k, "ndim", 0) == 4:
                if k.shape[:2] == (3, 3):
                    kd = k.astype(dtype)
                    sub = dict(sub)
                    sub["k9"] = tuple(kd[i, j] for i in range(3)
                                      for j in range(3))
                elif k.shape[:2] == (1, 1):
                    sub = dict(sub)
                    sub["k1"] = k[0, 0].astype(dtype)
            if sub:
                out[key] = sub
        return out

    taps = walk(params)
    out = {"params": params, **extra}
    if taps:
        out["taps"] = taps
    return out


def maybe_prepare_unet_params(variables, dtype=jnp.bfloat16):
    """prepare_unet_params gated by DIFFHANDLES_PREP_TAPS=1 (default OFF).

    Measured round 4 on v5e: pre-slicing is a NO-OP inside the denoising
    scans — fwd 8.51 vs 8.52 ms/step, fwd+bwd 19.38 vs 19.40 — because
    XLA already hoists the loop-invariant kernel slices out of
    lax.scan/while bodies; the ~0.8 ms/step of slice-done time that
    motivated it came from a trace of the UNBATCHED single-call program,
    where the slices really do run per call. Kept as a gated mode (with
    the bitwise parity test) so the A/B stays reproducible; default off
    to avoid the ~2x conv-weight HBM footprint of the tap copies next to
    the batched runner."""
    import os
    if os.environ.get("DIFFHANDLES_PREP_TAPS") == "1":
        return prepare_unet_params(variables, dtype)
    return variables


def init_unet_params(config: UNetConfig, seed: int = 0):
    """Initialize U-Net parameters (random; real weights via models/weights)."""
    model = UNet2DCondition(config)
    sample = jnp.zeros((1, config.sample_size, config.sample_size,
                        config.in_channels), config.dtype)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, config.cross_attention_dim), config.dtype)
    # jit the init: one compiled program instead of thousands of eagerly
    # dispatched ops (the eager path costs minutes over a remote device).
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), sample, t, ctx)
    return model, params


def tiny_unet_config(**overrides) -> UNetConfig:
    """A miniature config for unit tests (same topology, tiny widths)."""
    base = dict(
        sample_size=8, in_channels=5, out_channels=4,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        num_heads=(2, 2, 2, 2),
        cross_attention_dim=32,
        dtype=jnp.float32,
    )
    base.update(overrides)
    return UNetConfig(**base)

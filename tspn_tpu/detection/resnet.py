"""ResNet (C4-split) backbone for Faster R-CNN, in flax.

The reference consumes detectron2's model-zoo ResNet-101-C4
(/root/reference/detectron/trainer.py:24-28); this is the same topology
as explicit JAX: bottleneck residual stages, stem + res2-res4 as the
stride-16 feature extractor (1024 channels) and res5 as the RoI head
(2048 channels). Normalization is frozen-BN style (trainable scale/bias,
fixed statistics) — detectron2's FrozenBatchNorm2d — which maps to a
simple per-channel affine and fuses into the convs under XLA.

Convs use NHWC (TPU-native layout) and bfloat16-friendly init.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# stage depths (26 = one bottleneck per stage, for tests/smoke)
RESNET_DEPTHS = {
    26: (1, 1, 1, 1),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenAffine(nn.Module):
    """Per-channel scale + bias (FrozenBatchNorm equivalent)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride,
                use_bias=False, dtype=self.dtype, name="shortcut",
            )(x)
            shortcut = FrozenAffine(dtype=self.dtype, name="shortcut_norm")(shortcut)
        y = nn.Conv(self.bottleneck_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(FrozenAffine(dtype=self.dtype, name="norm1")(y))
        # explicit (1,1) padding = torch Conv2d(pad=1); XLA "SAME" at
        # stride 2 pads (0,1), shifting windows vs pretrained torch weights
        y = nn.Conv(self.bottleneck_channels, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(FrozenAffine(dtype=self.dtype, name="norm2")(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenAffine(dtype=self.dtype, name="norm3")(y)
        return nn.relu(shortcut + y)


class ResStage(nn.Module):
    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    first_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = Bottleneck(
                self.out_channels, self.bottleneck_channels,
                stride=self.first_stride if i == 0 else 1,
                dtype=self.dtype, name=f"block{i}",
            )(x)
        return x


class ResNetC4Backbone(nn.Module):
    """stem + res2..res4 -> (H/16, W/16, 1024) feature map."""

    depth: int = 101
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        d2, d3, d4, _ = RESNET_DEPTHS[self.depth]
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(images)
        x = nn.relu(FrozenAffine(dtype=self.dtype, name="stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = ResStage(d2, 256, 64, first_stride=1, dtype=self.dtype, name="res2")(x)
        x = ResStage(d3, 512, 128, dtype=self.dtype, name="res3")(x)
        x = ResStage(d4, 1024, 256, dtype=self.dtype, name="res4")(x)
        return x


class Res5Head(nn.Module):
    """res5 on RoI features: (R, 14, 14, 1024) -> (R, 2048) via stride-2
    stage + global average pool (the C4 box head)."""

    depth: int = 101
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        d5 = RESNET_DEPTHS[self.depth][3]
        x = ResStage(d5, 2048, 512, first_stride=2, dtype=self.dtype, name="res5")(
            roi_feats
        )
        return jnp.mean(x, axis=(1, 2))

"""Appearance (re-identification) embedding network.

Replaces the reference's TF1 frozen-graph encoder (mars-small128.pb,
/root/reference/deep_sort/tools/generate_detections.py:71-95 and the
cosine-metric network in tools/freeze_model.py) with a small flax
convnet of the same contract: batches of (128, 64, 3) person patches ->
L2-normalized 128-d appearance vectors. The mars-small128 weights are
not redistributable; this net is trained (or used feature-random) with
the same interface, and `extract_patches` reproduces the aspect-ratio-
correcting crop (generate_detections.py:24-68).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

PATCH_SHAPE = (128, 64)  # H, W
EMBED_DIM = 128


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.elu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype)(x)
        return nn.elu(x + y)


class AppearanceEncoder(nn.Module):
    """Small residual convnet -> unit-norm EMBED_DIM appearance vector."""

    embed_dim: int = EMBED_DIM
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """patches (B, 128, 64, 3) in [0, 1] -> (B, embed_dim)."""
        x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(patches)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.elu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for features, stride in ((32, 1), (64, 2), (64, 1), (128, 2), (128, 1)):
            x = ResidualBlock(features, stride, dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def extract_patches(image: np.ndarray, boxes_tlwh: np.ndarray) -> np.ndarray:
    """Crop + aspect-correct + resize box patches from one frame (host).

    Semantics of generate_detections.extract_image_patch
    (generate_detections.py:24-68): widen the box to the target aspect
    ratio, clip to the image, resize to PATCH_SHAPE; degenerate boxes
    yield zeros instead of the reference's random noise (deterministic).
    """
    h_t, w_t = PATCH_SHAPE
    out = np.zeros((len(boxes_tlwh), h_t, w_t, 3), np.float32)
    img_h, img_w = image.shape[:2]
    for i, (x, y, w, h) in enumerate(boxes_tlwh):
        target_aspect = w_t / h_t
        new_w = target_aspect * h
        x = x + (w - new_w) / 2
        x0, y0 = int(max(0, x)), int(max(0, y))
        x1, y1 = int(min(img_w, x + new_w)), int(min(img_h, y + h))
        if x1 <= x0 or y1 <= y0:
            continue
        crop = image[y0:y1, x0:x1].astype(np.float32)
        if crop.max() > 1.5:
            crop = crop / 255.0
        # nearest-neighbor resize without cv2
        ys = (np.linspace(0, crop.shape[0] - 1, h_t)).astype(int)
        xs = (np.linspace(0, crop.shape[1] - 1, w_t)).astype(int)
        out[i] = crop[ys][:, xs]
    return out

"""Image transforms for detection inputs.

Counterpart of /root/reference/lib/dataset/transforms/ (Resize with
min/max-size logic, flips, ColorJitter, Normalize with BGR255 —
transforms.py:9-122). Pure NumPy functions over (H, W, 3) arrays plus a
Compose; horizontal flips exist but — like the reference, which
deliberately comments them out (transforms/build.py:38-39) — are NOT in
the default pipeline because spatial relation predicates ("left",
"right") are orientation-sensitive.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, image, boxes=None):
        for t in self.transforms:
            image, boxes = t(image, boxes)
        return image, boxes


class Resize:
    """Scale so the short side hits min_size without the long side
    exceeding max_size (transforms.py Resize.get_size semantics)."""

    def __init__(self, min_size: int, max_size: int):
        self.min_size = min_size
        self.max_size = max_size

    def target_size(self, h: int, w: int) -> Tuple[int, int]:
        short, long = min(h, w), max(h, w)
        scale = self.min_size / short
        if long * scale > self.max_size:
            scale = self.max_size / long
        return int(round(h * scale)), int(round(w * scale))

    def __call__(self, image, boxes=None):
        h, w = image.shape[:2]
        nh, nw = self.target_size(h, w)
        ys = np.clip((np.arange(nh) * h / nh).astype(int), 0, h - 1)
        xs = np.clip((np.arange(nw) * w / nw).astype(int), 0, w - 1)
        out = image[ys][:, xs]
        if boxes is not None:
            boxes = np.asarray(boxes, np.float32) * np.array(
                [nw / w, nh / h, nw / w, nh / h], np.float32
            )
        return out, boxes


class RandomHorizontalFlip:
    """Kept for API parity; excluded from default pipelines (see module
    docstring)."""

    def __init__(self, prob: float = 0.5, rng: Optional[np.random.RandomState] = None):
        self.prob = prob
        self.rng = rng or np.random.RandomState(0)

    def __call__(self, image, boxes=None):
        if self.rng.rand() >= self.prob:
            return image, boxes
        w = image.shape[1]
        image = image[:, ::-1]
        if boxes is not None:
            boxes = np.asarray(boxes, np.float32).copy()
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        return image, boxes


class ColorJitter:
    def __init__(self, brightness=0.0, contrast=0.0,
                 rng: Optional[np.random.RandomState] = None):
        self.brightness = brightness
        self.contrast = contrast
        self.rng = rng or np.random.RandomState(0)

    def __call__(self, image, boxes=None):
        img = np.asarray(image, np.float32)
        if self.brightness:
            img = img * self.rng.uniform(1 - self.brightness, 1 + self.brightness)
        if self.contrast:
            mean = img.mean()
            img = (img - mean) * self.rng.uniform(
                1 - self.contrast, 1 + self.contrast
            ) + mean
        return np.clip(img, 0.0, 1.0 if img.max() <= 1.5 else 255.0), boxes


class Normalize:
    """Mean/std normalization; to_bgr255 reproduces the reference's
    detectron-style input convention (transforms.py Normalize)."""

    def __init__(self, mean, std, to_bgr255: bool = False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr255 = to_bgr255

    def __call__(self, image, boxes=None):
        img = np.asarray(image, np.float32)
        if self.to_bgr255:
            img = img[..., ::-1] * 255.0
        return (img - self.mean) / self.std, boxes


def build_transforms(min_size=600, max_size=1000, is_train=True,
                     brightness=0.0, contrast=0.0):
    """Default detection pipeline (flips intentionally absent)."""
    ts: List = []
    if is_train and (brightness or contrast):
        ts.append(ColorJitter(brightness, contrast))
    ts.append(Resize(min_size, max_size))
    return Compose(ts)

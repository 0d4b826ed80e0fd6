"""Port torchvision-style ResNet weights into the flax C4 backbone.

The reference initializes its detector from detectron2's COCO
checkpoint (/root/reference/detectron/trainer.py:27-28). No checkpoint
files ship in this environment, but production use needs the porting
path: this module maps a torchvision ResNet state_dict (the standard
`conv1/bn1/layer{1..4}.{i}.conv{j}/bn{j}/downsample` naming) onto
ResNetC4Backbone + Res5Head parameters, folding each BatchNorm into the
frozen per-channel affine:

    scale = gamma / sqrt(running_var + eps)
    bias  = beta - running_mean * scale

so the flax forward equals the torch eval-mode forward exactly
(verified numerically in tests/test_torch_weights.py against a live
torch model).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from tspn_tpu.detection.resnet import RESNET_DEPTHS

BN_EPS = 1e-5


def fold_bn(gamma, beta, mean, var, eps: float = BN_EPS):
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    bias = np.asarray(beta) - np.asarray(mean) * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _conv(weight) -> dict:
    """torch OIHW -> flax HWIO kernel."""
    return {"kernel": np.transpose(np.asarray(weight), (2, 3, 1, 0)).astype(np.float32)}


def _affine(sd, prefix: str) -> dict:
    scale, bias = fold_bn(
        sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
        sd[f"{prefix}.running_mean"], sd[f"{prefix}.running_var"],
    )
    return {"scale": scale, "bias": bias}


def _block(sd, prefix: str) -> dict:
    out = {}
    for j in (1, 2, 3):
        out[f"conv{j}"] = _conv(sd[f"{prefix}.conv{j}.weight"])
        out[f"norm{j}"] = _affine(sd, f"{prefix}.bn{j}")
    if f"{prefix}.downsample.0.weight" in sd:
        out["shortcut"] = _conv(sd[f"{prefix}.downsample.0.weight"])
        out["shortcut_norm"] = _affine(sd, f"{prefix}.downsample.1")
    return out


def convert_torch_resnet(
    state_dict: Dict[str, "np.ndarray"], depth: int = 101
) -> Tuple[dict, dict]:
    """-> (backbone_params, res5_params) matching ResNetC4Backbone /
    Res5Head parameter trees (plug into the FasterRCNN params under
    'backbone' and 'res5')."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    depths = RESNET_DEPTHS[depth]

    backbone = {
        "stem_conv": _conv(sd["conv1.weight"]),
        "stem_norm": _affine(sd, "bn1"),
    }
    for stage, num_blocks in zip((2, 3, 4), depths[:3]):
        layer = f"layer{stage - 1}"
        backbone[f"res{stage}"] = {
            f"block{i}": _block(sd, f"{layer}.{i}") for i in range(num_blocks)
        }
    res5 = {
        "res5": {
            f"block{i}": _block(sd, f"layer4.{i}") for i in range(depths[3])
        }
    }
    return backbone, res5


def load_into_faster_rcnn_params(params: dict, state_dict: dict, depth: int = 101) -> dict:
    """Return a copy of FasterRCNN params with backbone + res5 replaced."""
    import jax

    backbone, res5 = convert_torch_resnet(state_dict, depth)
    out = jax.tree_util.tree_map(lambda x: x, params)
    out["backbone"] = jax.tree_util.tree_map(np.asarray, backbone)
    out["res5"] = jax.tree_util.tree_map(np.asarray, res5)
    return out

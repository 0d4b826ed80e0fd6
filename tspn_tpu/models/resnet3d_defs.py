"""Stage-depth table shared by 2-D and inflated 3-D ResNets (re-exported
from the detection backbone — single source of truth)."""

from tspn_tpu.detection.resnet import RESNET_DEPTHS  # noqa: F401

"""Evaluation library (host-side NumPy, metric-parity with the reference).

Mirrors /root/reference/lib/evaluation/__init__.py:1-3 exports.
"""

from tspn_tpu.evaluation.action import evaluate as eval_action  # noqa: F401
from tspn_tpu.evaluation.object import evaluate as eval_video_object  # noqa: F401
from tspn_tpu.evaluation.relation import evaluate as eval_visual_relation  # noqa: F401
from tspn_tpu.evaluation.common import iou, viou, voc_ap  # noqa: F401

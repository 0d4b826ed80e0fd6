from tspn_tpu.ops.temporal import (  # noqa: F401
    decode_spans,
    encode_spans,
    interval_iou,
    nms_1d,
)

from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN  # noqa: F401

from tspn_tpu.tracking.tracker import TrackerConfig, TrackerState, track_video  # noqa: F401

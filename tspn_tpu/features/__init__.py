from tspn_tpu.features.extraction import (  # noqa: F401
    assemble_pair_features,
    extract_segment_artifacts,
)

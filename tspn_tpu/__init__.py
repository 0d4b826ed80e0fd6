"""tspn_tpu — a TPU-native framework for Video Visual Relation Detection.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
sangminwoo/Temporal-Span-Proposal-Network-VidVRD ("What and When to Look?:
Temporal Span Proposal Network for Video Visual Relation Detection",
arXiv:2107.07154).

Pipeline (file-mediated stage contracts preserved from the reference):

    video (.mp4/.jpg frames)
      -> object detection   (tspn_tpu.detection: JAX Faster R-CNN R101-C4)
      -> multi-object track (tspn_tpu.tracking: batched Kalman + gated
                             assignment as one lax.scan device program)
      -> per-segment tracklet-pair relation features (tspn_tpu.data)
      -> TSPN relation model (tspn_tpu.models: PPN + DPN + classifier,
                              fixed-shape, pjit over a device mesh)
      -> greedy cross-segment association (tspn_tpu.association)
      -> prediction JSON -> relation mAP / R@K eval (tspn_tpu.evaluation)

Unlike the reference (PyTorch/CUDA + detectron2 + dlib + TF1), every
device-side computation here is expressed as fixed-shape JAX programs so XLA
can compile one program per shape bucket, with Pallas kernels on the hot
paths and `jax.sharding`-based data parallelism instead of NCCL DDP.
"""

__version__ = "0.1.0"

from tspn_tpu.config import Config, get_default_config  # noqa: F401

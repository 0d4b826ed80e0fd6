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

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the detector train step takes
    ~6 min to compile over a tunneled dev TPU; caching to disk makes
    every re-run after the first warm. Opt out with
    TSPN_NO_COMPILE_CACHE=1; cache dir override via JAX_COMPILATION_CACHE_DIR.

    On anything but a definite real-TPU platform the cache is OPT-IN
    (TSPN_COMPILE_CACHE=1): the experimental 'axon' remote-compile
    backend was observed to hang specific programs during executable
    serialization (the fused Pallas inference path), and CPU AOT
    artifacts are machine-feature-sensitive (a cache populated before
    an XLA-flag or CPU-feature change can deserialize stale
    executables). The platform is read from jax.config (which callers
    like demo_clip --cpu set BEFORE importing tspn_tpu) with the
    JAX_PLATFORMS env as fallback.
    """
    if _os.environ.get("TSPN_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        platforms = (
            getattr(jax.config, "jax_platforms", None)
            or _os.environ.get("JAX_PLATFORMS", "")
            or ""
        )
        if "tpu" not in platforms and not _os.environ.get(
            "TSPN_COMPILE_CACHE"
        ):
            return

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/tspn_tpu/xla_cache"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes noticeable compile time; the
        # default threshold (1s) skips mid-sized programs that still
        # cost ~minutes over the remote-compile tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_enable_compilation_cache()

from tspn_tpu.config import Config, get_default_config  # noqa: F401, E402

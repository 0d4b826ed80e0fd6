from tspn_tpu.data.annotations import AnnotationDataset, VidOR, VidVRD  # noqa: F401

# Reference-compatible aliases (/root/reference/lib/dataset/__init__.py:1-2)
BaseVidVRD = VidVRD
BaseVidOR = VidOR

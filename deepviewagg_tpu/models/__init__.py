"""Task models: sparse-voxel and multimodal semantic segmentation."""

from . import segmentation  # noqa: F401

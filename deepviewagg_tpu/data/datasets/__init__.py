"""Dataset machinery: preprocessing caches, sphere/cylinder samplers, and the
S3DIS / ScanNet / KITTI-360 multimodal loaders."""

from .base import AreaCache, SphereDataset, BatchLoader  # noqa: F401

"""Host-side data engine: geometric features, mapping factory, batching,
synthetic fixtures, and the S3DIS / ScanNet / KITTI-360 dataset machinery."""

"""DeepViewAgg-TPU: a TPU-native multimodal 2D+3D semantic-segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
drprojects/DeepViewAgg (CVPR'22): occlusion-aware point<->pixel mappings,
learned multi-view aggregation (attention over views per 3D point), sparse
voxel 3D UNets, and the S3DIS / ScanNet / KITTI-360 dataset machinery.

Design stance (not a port):
  * static-shape data contract — batches are padded/bucketed host-side;
  * mappings are flat arrays (segment ids + validity masks), not objects;
  * sparse 3D conv is gather-GEMM-scatter over host-precomputed kernel maps;
  * data parallelism via ``jax.sharding`` meshes + jit, bf16 matmuls, remat.
"""

__version__ = "0.1.0"

from . import core  # noqa: E402,F401
from . import ops  # noqa: E402,F401

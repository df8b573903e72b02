"""Flax neural modules: norms, sparse-conv blocks, the Res16UNet family."""

from . import norm  # noqa: F401
from . import sparse_blocks  # noqa: F401
from . import res16unet  # noqa: F401
from . import pointnet2  # noqa: F401
from . import kpconv  # noqa: F401
from . import randlanet  # noqa: F401
from . import rsconv  # noqa: F401
from . import pvcnn  # noqa: F401
from . import pointcnn  # noqa: F401

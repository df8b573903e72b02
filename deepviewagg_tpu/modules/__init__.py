"""Multimodal neural modules: view pooling (the DeepViewAgg attention),
fusion, image towers, and the unimodal branch composition."""

from . import pooling  # noqa: F401
from . import fusion  # noqa: F401
from . import branch  # noqa: F401
from . import gather  # noqa: F401
from . import image_encoders  # noqa: F401
from . import multibucket  # noqa: F401

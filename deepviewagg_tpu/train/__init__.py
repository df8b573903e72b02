"""Training orchestration: state, optimizers, steps, trainer loop."""

from . import checkpoint  # noqa: F401
from . import optimizers  # noqa: F401
from . import step  # noqa: F401
from . import trainer  # noqa: F401

"""YAML config system: model zoo grammar + run configuration."""

from .zoo import MODEL_ZOO, get_model_spec, resolve_spec_from_cfg  # noqa: F401
from .run import load_run_config, RunConfig  # noqa: F401

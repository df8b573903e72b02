"""Device meshes, sharding, and the data-parallel step transform."""

from . import mesh  # noqa: F401

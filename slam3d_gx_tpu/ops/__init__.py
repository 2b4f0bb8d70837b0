from . import lie, pointcloud  # noqa: F401

from . import boxes, geometry, coder, nms, matching  # noqa: F401

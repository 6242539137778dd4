from . import pipeline, nuscenes, padding  # noqa: F401

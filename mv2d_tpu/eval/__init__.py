from . import nuscenes_eval, results  # noqa: F401

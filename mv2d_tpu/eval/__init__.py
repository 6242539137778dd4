from . import nuscenes_eval, results, runner  # noqa: F401

from . import correlation, detector2d, mv2d  # noqa: F401

from . import losses, detector2d_loss, optim  # noqa: F401

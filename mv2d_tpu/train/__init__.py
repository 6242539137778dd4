from . import losses, detector2d_loss, optim, train_step  # noqa: F401

from . import roi_align, attention, focal_loss, grid_mask  # noqa: F401

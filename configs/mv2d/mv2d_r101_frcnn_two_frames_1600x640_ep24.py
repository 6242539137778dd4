# MV2D-T R101 two-frame 1600x640, 24 epochs (stretch recipe: the reference's
# R101 detector base, configs/mv2d/detectors/maskrcnn_r101.py, at the higher
# resolution; head hyperparameters identical to the R50 two-frame recipe)
_base_ = ['../_base_/nuscenes_two_frames.py', '../_base_/schedule.py']

model = dict(
    preset='mv2d_t_r101',
    overrides=dict(),
)
data = dict(
    train=dict(final_dim=(640, 1600)),
    val=dict(final_dim=(640, 1600)),
)
total_epochs = 24
evaluation = dict(interval=3)

# MV2D-S R50 single-frame (RoI-level correlation), 24 epochs
_base_ = ['../_base_/nuscenes_single_frame.py', '../_base_/schedule.py']

model = dict(
    preset='mv2d_s_r50',
    overrides=dict(),
)
total_epochs = 24
evaluation = dict(interval=3)

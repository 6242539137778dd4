# MV2D-T R50 two-frame 1408x512, 24 epochs
# (mirrors /root/reference/configs/mv2d/exp/mv2d_r50_frcnn_two_frames_1408x512_ep24.py)
_base_ = ['../_base_/nuscenes_two_frames.py', '../_base_/schedule.py']

model = dict(
    preset='mv2d_t_r50',
    overrides=dict(),
)
total_epochs = 24
evaluation = dict(interval=3)

# MV2D-T R50 two-frame 1408x512, 72 epochs (reference headline recipe:
# mAP 0.453 / NDS 0.543)
_base_ = ['mv2d_r50_frcnn_two_frames_1408x512_ep24.py']

total_epochs = 72
evaluation = dict(interval=6)

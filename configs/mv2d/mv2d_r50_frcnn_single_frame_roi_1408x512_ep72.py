# MV2D-S R50 single-frame, 72 epochs (reference: mAP 0.398 / NDS 0.470)
_base_ = ['mv2d_r50_frcnn_single_frame_roi_1408x512_ep24.py']

total_epochs = 72
evaluation = dict(interval=6)

# AdamW + cosine annealing, mirrors ..._ep24.py:168-192
optimizer = dict(
    lr=2e-4,
    weight_decay=0.01,
    backbone_lr_mult=0.25,
    clip_norm=35.0,
)
lr_config = dict(
    policy='cosine',
    warmup_iters=500,
    warmup_ratio=1.0 / 3,
    min_lr_ratio=1e-3,
)
log_interval = 50
checkpoint_interval = 1   # epochs

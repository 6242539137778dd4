data_root = 'data/nuscenes/'
data = dict(
    samples_per_device=1,
    workers=5,
    train=dict(
        info_path=data_root + 'mmdet3d_nuscenes_30f_infos_train.pkl',
        ann2d_path=data_root + 'nuscenes_infos_train_mono3d.coco.json',
        data_root=data_root,
        num_frames=1,
        final_dim=(512, 1408),
        test_mode=False,
    ),
    val=dict(
        info_path=data_root + 'mmdet3d_nuscenes_30f_infos_val.pkl',
        ann2d_path=data_root + 'nuscenes_infos_val_mono3d.coco.json',
        data_root=data_root,
        num_frames=1,
        final_dim=(512, 1408),
        test_mode=True,
    ),
)

"""SODA-A Point Teacher (OBB, centre points).

Mirror of OBB_TOD/configs/point teacher/sodaa_fcos_pointteacher_1x.py.
Unlike the HBB config, images are ImageNet-normalised (mean/std, to_rgb) in
the data pipeline; the backbone is pytorch-style with trainable BN affine.
"""
from point_teacher_tpu.train.config import config_sodaa

cfg = dict(
    pt=config_sodaa(),
    rotated=True,
    dataset=dict(
        type="SODAADataset",
        # SODAADataset takes the per-patch annotation FOLDERS of the divData
        # layout plus the raw (undivided) val annotations for the patch-merge
        # eval — mirrors OBB_TOD/configs/_base_/datasets/sodaa.py:36-48
        # (ann_file=divData/<split>/Annotations/, ori_ann_file=rawData/...)
        train_ann="data/SODA-A/divData/train/Annotations/",
        train_img_prefix="data/SODA-A/divData/train/Images/",
        val_ann="data/SODA-A/divData/val/Annotations/",
        val_img_prefix="data/SODA-A/divData/val/Images/",
        ori_val_ann="data/SODA-A/rawData/val/Annotations",
        img_norm=dict(mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
                      to_rgb=True),
    ),
    model=dict(num_classes=9, depth=50, backbone_style="pytorch"),
    work_dir="work_dirs/sodaa_point_teacher_1x",
)

"""AI-TOD-v2 RFLA-FCOS baseline (multi-level, receptive-field assignment).

The reference registers RFLA_FCOSHead
(HBB_TOD/mmdet/models/dense_heads/rfla_fcos_head.py:30) but ships no config
for it; this config exercises the capability end to end with the head's own
defaults (HieAssigner kl / topk (2,1), fpn_layer='p3', fraction=1/3).
"""
from point_teacher_tpu.train.config import config_0pct

cfg = dict(
    pt=config_0pct(),
    trainer="rfla_fcos",
    dataset=dict(
        type="AITODDataset",
        train_ann="data/AI-TOD-v2/annotations/aitodv2_train.json",
        train_img_prefix="data/AI-TOD-v2/train/",
        val_ann="data/AI-TOD-v2/annotations/aitodv2_val.json",
        val_img_prefix="data/AI-TOD-v2/val/",
    ),
    model=dict(num_classes=8, depth=50, backbone_style="caffe"),
    work_dir="work_dirs/aitodv2_rfla_fcos_1x",
)

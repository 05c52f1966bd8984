"""Box-supervised FCOS baseline on AI-TOD-v2 (the upper bound in table1).

Mirror of HBB_TOD/configs/baselines/aitodv2_fcos_r50_1x.py.
Select with: tools/train.py --cfg-options via trainer=fcos (read by tools).
"""
from point_teacher_tpu.train.config import config_0pct

cfg = dict(
    pt=config_0pct(),
    trainer="fcos",
    dataset=dict(
        type="AITODDataset",
        train_ann="data/AI-TOD-v2/annotations/aitodv2_train.json",
        train_img_prefix="data/AI-TOD-v2/train/",
        val_ann="data/AI-TOD-v2/annotations/aitodv2_val.json",
        val_img_prefix="data/AI-TOD-v2/val/",
    ),
    model=dict(num_classes=8, depth=50, backbone_style="caffe"),
    work_dir="work_dirs/aitodv2_fcos_r50_1x",
)

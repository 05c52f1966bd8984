"""AI-TOD-v2 Point Teacher, partially random points (m=30%).

Mirror of HBB_TOD/configs/point_teacher/aitodv2_point_teacher_30%.py:
_point_ 0.3, lamda 0.5, 75 training GTs, wider proposal-bag grids.
"""
from point_teacher_tpu.train.config import config_noisy

cfg = dict(
    pt=config_noisy(position=0.3),
    dataset=dict(
        type="AITODDataset",
        train_ann="data/AI-TOD-v2/annotations/aitodv2_train.json",
        train_img_prefix="data/AI-TOD-v2/train/",
        val_ann="data/AI-TOD-v2/annotations/aitodv2_val.json",
        val_img_prefix="data/AI-TOD-v2/val/",
    ),
    model=dict(num_classes=8, depth=50, backbone_style="caffe"),
    work_dir="work_dirs/aitodv2_point_teacher_30",
)

"""AI-TOD-v2 Point Teacher, centre points (m=0%).

Mirror of HBB_TOD/configs/point_teacher/aitodv2_point_teacher_0%.py:
burn_in 4000, lamda 1.0, _point_ 0.0, top_k 1, beta 0.25,
alpha (0.01, 0.25), 100 training GTs, filter_score 0.0.
"""
from point_teacher_tpu.train.config import config_0pct

cfg = dict(
    pt=config_0pct(),
    dataset=dict(
        type="AITODDataset",
        train_ann="data/AI-TOD-v2/annotations/aitodv2_train.json",
        train_img_prefix="data/AI-TOD-v2/train/",
        val_ann="data/AI-TOD-v2/annotations/aitodv2_val.json",
        val_img_prefix="data/AI-TOD-v2/val/",
    ),
    model=dict(num_classes=8, depth=50, backbone_style="caffe"),
    work_dir="work_dirs/aitodv2_point_teacher_0",
)

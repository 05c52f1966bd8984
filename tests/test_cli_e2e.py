"""End-to-end CLI tests: train -> checkpoint -> resume -> evaluate, driven as
real subprocesses over a tiny on-disk dataset.

Capability target: the reference's primary UX
(/root/reference/README.md:64-93) — `python tools/train.py <cfg>` producing
epochs/checkpoints/logs (mmdet/apis/train.py:37-171), then
`python tools/test.py <cfg> <ckpt> --eval bbox`. Every piece below is
unit-tested elsewhere; these tests prove the PROCESS surface: config loading,
dataset reading from disk, the train loop writing work_dir artifacts,
EvalHook-analog validation, checkpoint resume, and the eval CLI.

The fixtures mirror the reference's dataset layouts exactly:
- HBB: one COCO json + image files (mmdet/datasets/coco.py expectations);
- rotated: the SODA-A divData per-patch layout (per-patch json folders with
  `poly`/`category_id` annotations + rawData original-image annotations), as
  in OBB_TOD/configs/_base_/datasets/sodaa.py:36-48 and
  OBB_TOD/mmrotate/datasets/sodaa.py:59-145.
"""
import json
import math
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

HBB_CLASSES = (
    "airplane", "bridge", "storage-tank", "ship",
    "swimming-pool", "vehicle", "person", "wind-mill",
)


def _run(args, timeout=1800):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # don't inherit a forced host device count
    proc = subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert proc.returncode == 0, f"{' '.join(args)} failed:\n{proc.stdout[-4000:]}"
    return proc.stdout


def _paint_boxes(img, boxes):
    """Draw filled bright rectangles so the scene is non-degenerate."""
    for (x0, y0, x1, y1) in boxes.astype(int):
        img[max(y0, 0):max(y1, 0), max(x0, 0):max(x1, 0)] = (220, 60, 60)
    return img


def _write_hbb_dataset(root, n_images=6, size=64, seed=0):
    """COCO-json dataset in the AITODDataset layout."""
    r = np.random.RandomState(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        name = f"img{i:03d}.png"
        img = r.randint(0, 80, (size, size, 3)).astype(np.uint8)
        n_gt = r.randint(2, 4)
        cxy = r.uniform(14, size - 14, (n_gt, 2))
        wh = r.uniform(6, 14, (n_gt, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        _paint_boxes(img, boxes)
        Image.fromarray(img).save(os.path.join(img_dir, name))
        images.append(dict(id=i + 1, file_name=name, width=size, height=size))
        for b in boxes:
            x0, y0, x1, y1 = [float(v) for v in b]
            annotations.append(dict(
                id=ann_id, image_id=i + 1,
                category_id=int(r.randint(1, len(HBB_CLASSES) + 1)),
                bbox=[x0, y0, x1 - x0, y1 - y0],
                area=float((x1 - x0) * (y1 - y0)), iscrowd=0,
            ))
            ann_id += 1
    ann = dict(
        images=images, annotations=annotations,
        categories=[dict(id=i + 1, name=n) for i, n in enumerate(HBB_CLASSES)],
    )
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path, img_dir


def _write_hbb_config(root, ann_path, img_dir, work_dir):
    cfg_path = os.path.join(root, "tiny_hbb_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(f"""
from point_teacher_tpu.core.proposals import FineProposalCfg
from point_teacher_tpu.train.config import PointTeacherConfig

cfg = dict(
    pt=PointTeacherConfig(
        num_classes=8, img_size=64, max_gt=4, batch_size=2,
        num_training_burninstep1=4, num_training_burninstep2=4,
        fine_proposal_cfg=(FineProposalCfg(base_ratios=(1.0,), shake_ratio=None,
                                           min_scale=0.0, gen_num_neg=8),),
        fine_proposal_extensive_cfg=(FineProposalCfg(base_ratios=(1.0, 1.2, 0.8),
                                                     shake_ratio=None, min_scale=4.0),),
    ),
    dataset=dict(
        type="AITODDataset",
        train_ann={ann_path!r}, train_img_prefix={img_dir!r},
        val_ann={ann_path!r}, val_img_prefix={img_dir!r},
    ),
    model=dict(num_classes=8, depth=18, backbone_style="caffe"),
    work_dir={work_dir!r},
)
""")
    return cfg_path


def _rect_poly(cx, cy, w, h, ang):
    c, s = math.cos(ang), math.sin(ang)
    pts = []
    for dx, dy in ((-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2), (-w / 2, h / 2)):
        pts += [cx + dx * c - dy * s, cy + dx * s + dy * c]
    return [float(v) for v in pts]


def _write_sodaa_dataset(root, size=64, seed=0):
    """SODA-A divData layout: 2 original images x 2 patches each (side by
    side), per-patch jsons + rawData original annotations."""
    r = np.random.RandomState(seed)
    div_ann = os.path.join(root, "divData", "Annotations")
    div_img = os.path.join(root, "divData", "Images")
    raw_ann = os.path.join(root, "rawData", "Annotations")
    for d in (div_ann, div_img, raw_ann):
        os.makedirs(d, exist_ok=True)
    for ori in ("00001", "00002"):
        ori_annos = []
        for px in (0, size):  # two patches, side by side in the original
            patch = f"{ori}__{size}__{px}___0"
            img = r.randint(0, 80, (size, size, 3)).astype(np.uint8)
            annos = []
            for _ in range(int(r.randint(2, 4))):
                cx, cy = r.uniform(16, size - 16, 2)
                w, h = r.uniform(8, 14, 2)
                ang = r.uniform(-math.pi / 4, math.pi / 4)
                x0, y0 = int(cx - w / 2), int(cy - h / 2)
                img[max(y0, 0):int(cy + h / 2), max(x0, 0):int(cx + w / 2)] = (220, 60, 60)
                label = int(r.randint(0, 9))
                annos.append(dict(poly=_rect_poly(cx, cy, w, h, ang),
                                  category_id=label))
                ori_annos.append(dict(poly=_rect_poly(cx + px, cy, w, h, ang),
                                      category_id=label))
            Image.fromarray(img).save(os.path.join(div_img, patch + ".jpg"))
            with open(os.path.join(div_ann, patch + ".json"), "w") as f:
                json.dump(dict(annotations=annos), f)
        with open(os.path.join(raw_ann, ori + ".json"), "w") as f:
            json.dump(dict(annotations=ori_annos), f)
    return div_ann, div_img, raw_ann


def _write_sodaa_config(root, div_ann, div_img, raw_ann, work_dir):
    cfg_path = os.path.join(root, "tiny_sodaa_cfg.py")
    with open(cfg_path, "w") as f:
        f.write(f"""
from point_teacher_tpu.core.proposals import FineProposalCfg
from point_teacher_tpu.train.config import PointTeacherConfig

cfg = dict(
    pt=PointTeacherConfig(
        num_classes=9, img_size=64, max_gt=4, batch_size=2,
        num_training_burninstep1=4, num_training_burninstep2=4,
        fine_proposal_cfg=(FineProposalCfg(base_ratios=(1.0,), shake_ratio=None,
                                           min_scale=0.0, gen_num_neg=8),),
        fine_proposal_extensive_cfg=(FineProposalCfg(base_ratios=(1.0, 1.2, 0.8),
                                                     shake_ratio=None, min_scale=4.0),),
    ),
    rotated=True,
    dataset=dict(
        type="SODAADataset",
        train_ann={div_ann!r}, train_img_prefix={div_img!r},
        val_ann={div_ann!r}, val_img_prefix={div_img!r},
        ori_val_ann={raw_ann!r},
        img_norm=dict(mean=(123.675, 116.28, 103.53),
                      std=(58.395, 57.12, 57.375), to_rgb=True),
    ),
    model=dict(num_classes=9, depth=18, backbone_style="pytorch"),
    work_dir={work_dir!r},
)
""")
    return cfg_path


def _read_log(work_dir):
    path = os.path.join(work_dir, "train_log.jsonl")
    assert os.path.exists(path), "train_log.jsonl missing"
    with open(path) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert lines, "train_log.jsonl empty"
    return lines


def test_cli_train_resume_eval_hbb(tmp_path):
    root = str(tmp_path)
    work_dir = os.path.join(root, "wd")
    ann_path, img_dir = _write_hbb_dataset(root)
    cfg = _write_hbb_config(root, ann_path, img_dir, work_dir)

    # train 4 steps with the EvalHook analog on
    out = _run(["tools/train.py", cfg, "--cpu", "--max-steps", "4",
                "--val-interval", "1", "--work-dir", work_dir])
    assert "training done at step 4" in out
    latest = os.path.join(work_dir, "latest.ckpt")
    assert os.path.exists(latest)
    log = _read_log(work_dir)
    losses = [l for l in log if "total_loss" in l]
    assert losses and all(np.isfinite(l["total_loss"]) for l in losses)
    vals = [l for l in log if "val_mAP" in l]
    assert vals and np.isfinite(vals[-1]["val_mAP"])

    # resume from the checkpoint and continue to step 6
    out = _run(["tools/train.py", cfg, "--cpu", "--max-steps", "6",
                "--resume-from", latest, "--work-dir", work_dir])
    assert f"resumed from {latest} at step 4" in out
    assert "training done at step 6" in out
    with open(latest + ".meta.json") as f:
        assert json.load(f)["step"] == 6

    # evaluate the checkpoint via the eval CLI
    out = _run(["tools/test.py", cfg, latest, "--cpu", "--eval", "bbox"])
    assert "AI-TOD COCO-style metrics" in out
    map_lines = [l for l in out.splitlines() if "mAP" in l]
    assert map_lines, out[-2000:]


def test_cli_train_eval_rotated(tmp_path):
    root = str(tmp_path)
    work_dir = os.path.join(root, "wd")
    div_ann, div_img, raw_ann = _write_sodaa_dataset(root)
    cfg = _write_sodaa_config(root, div_ann, div_img, raw_ann, work_dir)

    out = _run(["tools/train.py", cfg, "--cpu", "--max-steps", "2",
                "--val-interval", "1", "--work-dir", work_dir])
    assert "training done at step 2" in out
    latest = os.path.join(work_dir, "latest.ckpt")
    assert os.path.exists(latest)
    log = _read_log(work_dir)
    losses = [l for l in log if "total_loss" in l]
    assert losses and all(np.isfinite(l["total_loss"]) for l in losses)
    vals = [l for l in log if "val_mAP" in l]
    assert vals and np.isfinite(vals[-1]["val_mAP"])

    # the patch-merge eval path end-to-end (divData patches -> original imgs)
    out = _run(["tools/test.py", cfg, latest, "--cpu", "--eval", "bbox"])
    assert "SODA-A rotated metrics" in out

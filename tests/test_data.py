"""Dataset + pipeline tests with temp-file fixtures
(the reference's tests/test_data/test_datasets pattern)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from point_teacher_tpu.data.coco import AITODDataset, CocoDetDataset
from point_teacher_tpu.data.loader import EvalLoader, TrainLoader
from point_teacher_tpu.data.pipeline import pad_gts, preprocess, resize_keep_ratio


@pytest.fixture
def coco_fixture(tmp_path):
    imgs = []
    anns = []
    for i in range(4):
        name = f"im{i}.png"
        arr = np.random.RandomState(i).randint(0, 255, (60 + i * 10, 80, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
        imgs.append(dict(id=i, file_name=name, width=80, height=60 + i * 10))
        anns.append(dict(id=i * 2, image_id=i, category_id=1,
                         bbox=[10, 10, 20, 15], iscrowd=0, area=300))
        anns.append(dict(id=i * 2 + 1, image_id=i, category_id=2,
                         bbox=[40, 20, 8, 8], iscrowd=0, area=64))
    # image 3 gets only a degenerate (sub-pixel) box -> should filter if empty
    coco = dict(
        images=imgs,
        annotations=anns,
        categories=[dict(id=1, name="airplane"), dict(id=2, name="ship")],
    )
    p = tmp_path / "ann.json"
    with open(p, "w") as f:
        json.dump(coco, f)
    return str(p), str(tmp_path)


def test_coco_dataset_loading(coco_fixture):
    ann, prefix = coco_fixture
    ds = CocoDetDataset(ann, prefix)
    assert len(ds) == 4
    a = ds.get_ann(0)
    assert a["boxes"].shape == (2, 4)
    assert np.allclose(a["boxes"][0], [10, 10, 30, 25])  # xywh -> xyxy
    assert a["labels"].tolist() == [0, 1]


def test_class_subset_mapping(coco_fixture):
    ann, prefix = coco_fixture
    ds = CocoDetDataset(ann, prefix, classes=["ship"])
    a = ds.get_ann(0)
    assert a["labels"].tolist() == [0]
    assert len(a["boxes"]) == 1


def test_preprocess_fixed_canvas(coco_fixture):
    ann, prefix = coco_fixture
    ds = CocoDetDataset(ann, prefix)
    img, boxes, scale = preprocess(ds.image_path(0), ds.get_ann(0)["boxes"], canvas=128)
    assert img.shape == (128, 128, 3)
    # keep_ratio: 80x60 -> scale 1.6 -> 128x96 padded to 128x128
    assert np.isclose(scale[0], 1.6)
    assert np.allclose(boxes[0], np.asarray([10, 10, 30, 25]) * 1.6)
    # padding region is zero
    assert img[100:, :, :].max() == 0


def test_pad_gts():
    b, l, v = pad_gts(np.ones((3, 4), np.float32), np.ones(3, np.int64), 5)
    assert b.shape == (5, 4) and v.tolist() == [True] * 3 + [False] * 2


def test_train_loader_batches(coco_fixture):
    ann, prefix = coco_fixture
    ds = AITODDataset(ann, prefix)
    loader = TrainLoader(ds, batch_size=2, max_gt=6, canvas=128, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == 2
    b = batches[0]
    assert b.image.shape == (2, 128, 128, 3)
    assert b.gt_boxes.shape == (2, 6, 4)
    assert b.gt_valid.sum() == 4  # 2 gts per image
    assert b.image_ids.dtype == np.int32


def test_eval_loader_pads_tail(coco_fixture):
    ann, prefix = coco_fixture
    ds = AITODDataset(ann, prefix)
    loader = EvalLoader(ds, batch_size=3, canvas=128)
    chunks = list(loader)
    assert len(chunks) == 2
    idxs, imgs, scales, shapes = chunks[-1]
    assert len(idxs) == 1 and imgs.shape[0] == 3  # padded to full batch
    assert shapes.shape == (3, 2)
    # img_shape is the resized pre-padding extent: never exceeds the canvas
    assert (shapes <= 128).all() and (shapes > 0).all()


def test_resize_keep_ratio_upscale():
    img = np.zeros((50, 100, 3), np.float32)
    out, scale = resize_keep_ratio(img, (200, 200))
    assert out.shape == (100, 200, 3)
    assert np.isclose(scale[0], 2.0)

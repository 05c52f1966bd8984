"""Shared eval runner (tools/test.py + EvalHook backend).

Pins two round-2 verdict items:
- a NORMALIZED HBB dataset must evaluate identically through the plain path
  (EvalLoader) and the TTA single-view path (make_tta_views) — the plain path
  previously dropped `img_norm` (evalx/runner.py), which identity-norm AI-TOD
  masked but SODA-D/VisDrone would not;
- the TTA branch must honor --out / --show-dir (it used to return early).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from point_teacher_tpu.evalx.runner import evaluate_detector
from point_teacher_tpu.inference import build_inference_fn
from point_teacher_tpu.models.detector import StudentFCOS
from point_teacher_tpu.train.config import InferenceCfg, PointTeacherConfig

IMG = 64


@pytest.fixture(scope="module")
def tiny_model():
    model = StudentFCOS(num_classes=2, dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)),
                        jnp.zeros((1, 7, 7, 256)), method=StudentFCOS.init_all)
    return model, params


@pytest.fixture
def norm_dataset(tmp_path):
    """Tiny on-disk COCO val set with a NON-identity img_norm config."""
    imgs, anns = [], []
    for i in range(4):
        name = f"im{i}.png"
        arr = np.random.RandomState(i).randint(0, 255, (60, 64, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
        imgs.append(dict(id=i, file_name=name, width=64, height=60))
        anns.append(dict(id=i * 2, image_id=i, category_id=1,
                         bbox=[10, 10, 20, 15], iscrowd=0, area=300))
        anns.append(dict(id=i * 2 + 1, image_id=i, category_id=2,
                         bbox=[40, 20, 8, 8], iscrowd=0, area=64))
    coco = dict(images=imgs, annotations=anns,
                categories=[dict(id=1, name="a"), dict(id=2, name="b")])
    ann = tmp_path / "ann.json"
    with open(ann, "w") as f:
        json.dump(coco, f)
    return dict(dataset=dict(
        val_ann=str(ann), val_img_prefix=str(tmp_path),
        img_norm=dict(mean=[103.5, 116.3, 123.7], std=[57.4, 57.1, 58.4]),
    ))


def test_plain_matches_tta_single_view_on_normalized_dataset(
        tiny_model, norm_dataset, tmp_path):
    model, params = tiny_model
    pt = PointTeacherConfig(
        num_classes=2, img_size=IMG, batch_size=2,
        test=InferenceCfg(nms_pre=200, max_per_img=50),
    )

    infer = build_inference_fn(model, pt.test, IMG)
    ap_plain, stats_plain = evaluate_detector(
        infer, params, pt, norm_dataset, quiet=True)

    out_path = str(tmp_path / "dets.npz")
    show_dir = str(tmp_path / "shown")
    os.makedirs(show_dir, exist_ok=True)
    ap_tta, stats_tta = evaluate_detector(
        None, params, pt, norm_dataset, quiet=True,
        out=out_path, show_dir=show_dir,
        tta=dict(model=model, scales=(IMG,), flip=False),
    )

    # same normalization on both paths -> same detections -> same metrics
    assert ap_plain == pytest.approx(ap_tta, abs=1e-6)
    for k in stats_plain:
        assert stats_plain[k] == pytest.approx(stats_tta[k], abs=1e-6), k

    # the TTA branch must honor --out / --show-dir (used to return early)
    assert os.path.exists(out_path)
    saved = np.load(out_path)
    assert len(saved.files) == 4
    assert len(os.listdir(show_dir)) == 4

"""Test-time augmentation (aug_test / MultiScaleFlipAug analog).

Oracle targets: bbox_mapping_back/bbox_flip (mmdet transforms.py:5-55) and
aug_test_bboxes merge semantics (dense_test_mixins.py:38-110).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.inference import (
    build_inference_fn, build_tta_inference_fn, map_back_boxes,
)
from point_teacher_tpu.models.detector import StudentFCOS
from point_teacher_tpu.train.config import InferenceCfg

IMG = 64


def _np_mapping_back(boxes, img_shape, scale_factor, flipped):
    """numpy oracle: clamp (decode max_shape) -> bbox_flip -> / scale."""
    h, w = img_shape
    b = boxes.copy()
    b[:, 0::2] = np.clip(b[:, 0::2], 0, w)
    b[:, 1::2] = np.clip(b[:, 1::2], 0, h)
    if flipped:
        b = np.stack([w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], -1)
    return b / np.asarray(scale_factor)[None]


def test_map_back_boxes_oracle():
    r = np.random.RandomState(0)
    boxes = np.sort(r.uniform(-10, 80, (32, 4)).astype(np.float32), axis=-1)[
        :, [0, 1, 2, 3]]
    boxes = np.stack([boxes[:, 0], boxes[:, 1],
                      boxes[:, 0] + r.uniform(1, 30, 32).astype(np.float32),
                      boxes[:, 1] + r.uniform(1, 30, 32).astype(np.float32)], -1)
    shp = np.asarray([60.0, 52.0], np.float32)
    sf = np.asarray([0.8, 0.8, 0.8, 0.8], np.float32)
    for flipped in (False, True):
        got = np.asarray(map_back_boxes(
            jnp.asarray(boxes), jnp.asarray(shp), jnp.asarray(sf),
            jnp.asarray(flipped)))
        want = _np_mapping_back(boxes, (60.0, 52.0), sf, flipped)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    model = StudentFCOS(num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)),
                        jnp.zeros((1, 7, 7, 256)), method=StudentFCOS.init_all)
    return model, params


def _views(img, canvases, flip):
    from point_teacher_tpu.data.pipeline import pad_to_canvas, resize_keep_ratio
    out = []
    for s in canvases:
        resized, scale = resize_keep_ratio(img, (s, s))
        nh, nw = resized.shape[:2]
        for flipped in ((False, True) if flip else (False,)):
            v = resized[:, ::-1] if flipped else resized
            out.append({
                "image": jnp.asarray(pad_to_canvas(np.ascontiguousarray(v), s)[None]),
                "img_shape": jnp.asarray([[nh, nw]], jnp.float32),
                "scale_factor": jnp.asarray(scale[None]),
                "flipped": jnp.asarray([flipped]),
            })
    return out


def test_single_view_tta_matches_simple_test(tiny_model):
    """One unflipped view at the native scale == the simple_test path."""
    model, params = tiny_model
    cfg = InferenceCfg(nms_pre=200, max_per_img=50)
    r = np.random.RandomState(1)
    img = r.randint(0, 255, (IMG, IMG, 3)).astype(np.float32)

    simple = build_inference_fn(model, cfg, IMG)
    d0, l0, v0 = simple(params, jnp.asarray(img[None]),
                        jnp.ones((1, 4), jnp.float32))

    tta = build_tta_inference_fn(model, cfg, [IMG])
    d1, l1, v1 = tta(params, _views(img, [IMG], flip=False))

    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d0)[np.asarray(v0)],
                               np.asarray(d1)[np.asarray(v1)],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(l0)[np.asarray(v0)],
                                  np.asarray(l1)[np.asarray(v1)])


def test_multi_scale_flip_tta_runs_and_is_sane(tiny_model):
    """2 scales x flip = 4 views merge into finite, in-bounds detections in
    ORIGINAL image coordinates."""
    model, params = tiny_model
    cfg = InferenceCfg(nms_pre=100, max_per_img=40)
    r = np.random.RandomState(2)
    oh, ow = 48, 64  # non-square: exercises keep-ratio + flip-axis handling
    img = r.randint(0, 255, (oh, ow, 3)).astype(np.float32)

    tta = build_tta_inference_fn(model, cfg, [IMG, 32])
    dets, labels, valid = tta(params, _views(img, [IMG, 32], flip=True))
    dets = np.asarray(dets[0])[np.asarray(valid[0])]
    labels = np.asarray(labels[0])[np.asarray(valid[0])]
    assert np.isfinite(dets).all()
    assert (labels >= 0).all() and (labels < 4).all()
    # mapped back to original coordinates: inside the original image
    assert (dets[:, 0] >= -1e-3).all() and (dets[:, 2] <= ow + 1e-3).all()
    assert (dets[:, 1] >= -1e-3).all() and (dets[:, 3] <= oh + 1e-3).all()
    assert (dets[:, 2] >= dets[:, 0] - 1e-5).all()

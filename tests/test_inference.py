import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.inference import build_inference_fn
from point_teacher_tpu.models.detector import StudentFCOS
from point_teacher_tpu.train.config import InferenceCfg


def test_inference_shapes_and_validity():
    model = StudentFCOS(num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    img = jnp.ones((1, 64, 64, 3)) * 100.0
    rois = jnp.zeros((1, 7, 7, 256))
    params = model.init(rng, img, rois, method=StudentFCOS.init_all)
    cfg = InferenceCfg(nms_pre=32, score_thr=0.001, nms_iou=0.5, max_per_img=16)
    infer = build_inference_fn(model, cfg, img_size=64)
    imgs = jax.random.uniform(rng, (2, 64, 64, 3)) * 255
    sf = jnp.ones((2, 4))
    dets, labels, valid = infer(params, imgs, sf)
    assert dets.shape == (2, 16, 5)
    assert labels.shape == (2, 16)
    d = np.asarray(dets)
    v = np.asarray(valid)
    # valid detections have ordered corners and scores in (0, 1]
    assert (d[v][:, 4] > 0).all()
    assert (d[v][:, 2] >= d[v][:, 0]).all()
    assert np.isfinite(d).all()


def test_inference_rescale_divides_boxes():
    model = StudentFCOS(num_classes=4, dtype=jnp.float32)
    rng = jax.random.PRNGKey(1)
    img = jnp.ones((1, 64, 64, 3)) * 100.0
    rois = jnp.zeros((1, 7, 7, 256))
    params = model.init(rng, img, rois, method=StudentFCOS.init_all)
    cfg = InferenceCfg(nms_pre=32, score_thr=0.001, nms_iou=0.5, max_per_img=8)
    infer = build_inference_fn(model, cfg, img_size=64)
    imgs = jax.random.uniform(rng, (1, 64, 64, 3)) * 255
    d1, _, v1 = infer(params, imgs, jnp.ones((1, 4)))
    d2, _, v2 = infer(params, imgs, jnp.ones((1, 4)) * 2.0)
    np.testing.assert_allclose(
        np.asarray(d1)[0, :, :4] / 2.0, np.asarray(d2)[0, :, :4], atol=1e-4
    )

"""High-level inference API.

Capability target: mmdet/apis/inference.py — init_detector(config, ckpt) +
inference_detector(model, img) (used by demo/image_demo.py). Returns per-class
numpy arrays like the reference's bbox2result.
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class Detector:
    """Bundles model/params/inference fn behind a simple callable API."""

    def __init__(self, model, params, infer_fn, classes, img_size: int,
                 rotated: bool = False, test_cfg=None):
        self.model = model
        self.params = params
        self.infer_fn = infer_fn
        self.CLASSES = classes
        self.img_size = img_size
        self.rotated = rotated
        self._test_cfg = test_cfg  # InferenceCfg, used by the TTA path
        self._tta_key = None
        self._tta_fn = None


def init_detector(config_path: str, checkpoint: Optional[str] = None,
                  use_teacher: bool = True) -> Detector:
    import jax
    import jax.numpy as jnp

    from .config_io import load_config
    from .inference import build_inference_fn, build_rotated_inference_fn
    from .models.detector import StudentFCOS
    from .models.rotated_detector import StudentRotatedFCOS

    cfg = load_config(config_path)
    pt = cfg["pt"]
    rotated = bool(cfg.get("rotated", False))
    model_cls = StudentRotatedFCOS if rotated else StudentFCOS
    model = model_cls(
        num_classes=pt.num_classes, num_stages=pt.num_stages, dtype=jnp.bfloat16,
        **{k: v for k, v in cfg.get("model", {}).items()
           if k in ("depth", "backbone_style")},
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((1, pt.img_size, pt.img_size, 3)),
        jnp.zeros((1, 7, 7, 256)), method=model_cls.init_all,
    )
    if checkpoint:
        from .train.optim import make_optimizer
        from .train.state import create_train_state
        from .utils.checkpoint import load_checkpoint, load_meta

        tx = make_optimizer(params, pt.optim)
        meta = load_meta(checkpoint)
        template = create_train_state(params, tx, num_images=int(meta.get("num_images", 1)),
                                      max_gt=pt.max_gt, rng=rng)
        state = load_checkpoint(template, checkpoint)
        params = state.teacher_params if use_teacher else state.params

    build = build_rotated_inference_fn if rotated else build_inference_fn
    infer = build(model, pt.test, pt.img_size, pt.stride)
    try:
        from .data.sodaa import SODAADataset
        from .data.coco import AITODDataset
        classes = (SODAADataset.CLASSES if rotated else AITODDataset.CLASSES)
    except Exception:
        classes = tuple(str(i) for i in range(pt.num_classes))
    return Detector(model, params, infer, classes, pt.img_size, rotated,
                    test_cfg=pt.test)


def inference_detector_tta(
    detector: Detector,
    img: Union[str, np.ndarray],
    scales=None,
    flip: bool = True,
) -> List[np.ndarray]:
    """Multi-scale + flip test-time augmentation (the MultiScaleFlipAug
    analog: each scale is resized keep-ratio, optionally an extra
    horizontally-flipped copy is added, every view's top-k detections are
    mapped back and merged by one NMS).

    Capability target: aug_test (fcos_p2b_teacher_student.py:300-329) with
    the MultiScaleFlipAug pipeline (mmdet/datasets/pipelines/test_time_aug.py).
    `scales`: iterable of square canvas sizes; defaults to the detector's
    train/test size.
    """
    import jax.numpy as jnp

    from .data.pipeline import load_image, make_tta_views

    if detector.rotated:
        raise NotImplementedError(
            "TTA covers the HBB path (the reference's rotated configs run "
            "single-scale, flip=False)")
    if isinstance(img, str):
        img = load_image(img)
    img = np.asarray(img, np.float32)
    scales = tuple(int(s) for s in (scales or (detector.img_size,)))

    views = [
        {k: jnp.asarray(v) for k, v in view.items()}
        for view in make_tta_views(img, scales, flip)
    ]

    if detector._test_cfg is None:
        # Detector built directly without a test_cfg: fall back to defaults
        # (init_detector always sets one from the config's pt.test)
        from .train.config import InferenceCfg

        detector._test_cfg = InferenceCfg()

    tta_key = (scales, flip)
    if getattr(detector, "_tta_key", None) != tta_key:
        from .inference import build_tta_inference_fn
        detector._tta_fn = build_tta_inference_fn(
            detector.model, detector._test_cfg, [v["image"].shape[1] for v in views])
        detector._tta_key = tta_key

    dets, labels, valid = detector._tta_fn(detector.params, views)
    dets, labels, valid = np.asarray(dets[0]), np.asarray(labels[0]), np.asarray(valid[0])
    dets = dets[valid]
    labels = labels[valid]
    num_classes = len(detector.CLASSES)
    return [dets[labels == c].reshape(-1, 5) for c in range(num_classes)]


def inference_detector(detector: Detector, img: Union[str, np.ndarray]) -> List[np.ndarray]:
    """Run one image; returns per-class [K, 5] (xyxy+score) or [K, 6]
    (cx,cy,w,h,a,score) arrays, mirroring bbox2result/rbbox2result."""
    import jax.numpy as jnp

    from .data.pipeline import load_image, pad_to_canvas, resize_keep_ratio

    if isinstance(img, str):
        img = load_image(img)
    img = np.asarray(img, np.float32)
    img, scale = resize_keep_ratio(img, (detector.img_size, detector.img_size))
    shape = np.asarray(img.shape[:2], np.float32)
    img = pad_to_canvas(img, detector.img_size)

    if detector.rotated:
        dets, labels, valid = detector.infer_fn(
            detector.params, jnp.asarray(img[None]), jnp.asarray(scale[None])
        )
    else:
        dets, labels, valid = detector.infer_fn(
            detector.params, jnp.asarray(img[None]), jnp.asarray(scale[None]),
            jnp.asarray(shape[None]),
        )
    dets, labels, valid = np.asarray(dets[0]), np.asarray(labels[0]), np.asarray(valid[0])
    dets = dets[valid]
    labels = labels[valid]
    num_classes = len(detector.CLASSES)
    width = dets.shape[1] if len(dets) else (6 if detector.rotated else 5)
    return [dets[labels == c].reshape(-1, width) for c in range(num_classes)]

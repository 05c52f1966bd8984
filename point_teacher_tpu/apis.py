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
                 rotated: bool = False):
        self.model = model
        self.params = params
        self.infer_fn = infer_fn
        self.CLASSES = classes
        self.img_size = img_size
        self.rotated = rotated


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
    return Detector(model, params, infer, classes, pt.img_size, rotated)


def inference_detector(detector: Detector, img: Union[str, np.ndarray]) -> List[np.ndarray]:
    """Run one image; returns per-class [K, 5] (xyxy+score) or [K, 6]
    (cx,cy,w,h,a,score) arrays, mirroring bbox2result/rbbox2result."""
    import jax.numpy as jnp

    from .data.pipeline import load_image, pad_to_canvas, resize_keep_ratio

    if isinstance(img, str):
        img = load_image(img)
    img = np.asarray(img, np.float32)
    img, scale = resize_keep_ratio(img, (detector.img_size, detector.img_size))
    img = pad_to_canvas(img, detector.img_size)

    dets, labels, valid = detector.infer_fn(
        detector.params, jnp.asarray(img[None]), jnp.asarray(scale[None])
    )
    dets, labels, valid = np.asarray(dets[0]), np.asarray(labels[0]), np.asarray(valid[0])
    dets = dets[valid]
    labels = labels[valid]
    num_classes = len(detector.CLASSES)
    width = dets.shape[1] if len(dets) else (6 if detector.rotated else 5)
    return [dets[labels == c].reshape(-1, width) for c in range(num_classes)]

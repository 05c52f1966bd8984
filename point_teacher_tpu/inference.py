"""Test-time inference: teacher forward -> top-k -> decode -> multiclass NMS.

Capability targets:
- TS_P2B_FCOS.simple_test (fcos_p2b_teacher_student.py:276-298): inference
  runs the TEACHER.
- TS_P2BFCOSHead.get_bboxes/_get_bboxes (fcos_head_p2b_ts.py:796-1005):
  per-level sigmoid scores, nms_pre top-k by max(score * centerness), decode
  with distance2bbox clamped to the image, multiclass NMS
  (score_thr .05, iou .5, max_per_img 3000 — config test_cfg).

Single stride-8 level on the Point-Teacher path. Returns fixed-shape padded
detections (dets [max_per_img, 5], labels, valid) per image.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .models.detector import StudentFCOS
from .ops.boxes import distance2bbox, grid_points
from .ops.nms import multiclass_nms
from .train.config import InferenceCfg

Array = jnp.ndarray


def get_bboxes_single(
    cls_logits: Array,   # [P, C]
    bbox_pred: Array,    # [P, 4] (l,t,r,b pixels)
    centerness: Array,   # [P]
    points: Array,       # [P, 2]
    img_hw,
    scale_factor: Array,  # [4] (w,h,w,h) resize factor; boxes are divided by it
    cfg: InferenceCfg,
    rescale: bool = True,
    img_shape: Array | None = None,  # [2] (nh, nw) resized unpadded shape
):
    """The reference clamps decoded boxes to `img_shape` — the RESIZED,
    pre-padding extent of this image (fcos_head_p2b_ts.py _get_bboxes
    max_shape) — not the padded canvas. Pass `img_shape` for exact parity on
    non-square images; when None the static canvas `img_hw` is used (exact
    whenever the resized image fills the canvas)."""
    scores = jax.nn.sigmoid(cls_logits)
    ctr = jax.nn.sigmoid(centerness)
    p = scores.shape[0]
    nms_pre = min(cfg.nms_pre, p)
    max_scores = (scores * ctr[:, None]).max(-1)
    _, topk = jax.lax.top_k(max_scores, nms_pre)
    scores_k = scores[topk]
    ctr_k = ctr[topk]
    if img_shape is None:
        boxes_k = distance2bbox(points[topk], bbox_pred[topk], max_shape=img_hw)
    else:
        boxes_k = distance2bbox(points[topk], bbox_pred[topk])
        h = img_shape[0].astype(boxes_k.dtype)
        w = img_shape[1].astype(boxes_k.dtype)
        boxes_k = jnp.stack(
            [jnp.clip(boxes_k[:, 0], 0, w), jnp.clip(boxes_k[:, 1], 0, h),
             jnp.clip(boxes_k[:, 2], 0, w), jnp.clip(boxes_k[:, 3], 0, h)], -1)
    if rescale:
        boxes_k = boxes_k / scale_factor[None, :]
    return multiclass_nms(
        boxes_k, scores_k, cfg.score_thr, cfg.nms_iou, cfg.max_per_img,
        score_factors=ctr_k,
    )


def build_rotated_inference_fn(model, cfg: InferenceCfg, img_size: int, stride: int = 8):
    """Rotated test path: teacher forward -> topk -> DistanceAnglePointCoder
    decode -> rotated multiclass NMS (iou_thr 0.1 in the SODA-A config).

    Capability target: rotated_fcos_head_p2rb_ts.py get_bboxes/_get_bboxes
    (:1000-1090) + multiclass_nms_rotated. Returns (dets [B,N,6]
    (cx,cy,w,h,a,score), labels, valid).
    """
    from .ops.nms import multiclass_nms_rotated
    from .ops.rotated import distance_angle_decode

    points = grid_points(img_size // stride, img_size // stride, stride)

    @jax.jit
    def infer(params, images, scale_factors):
        outs, _ = model.apply(params, images)
        cls_score, bbox_pred, angle_pred, centerness = outs
        b = cls_score.shape[0]
        cls_f = cls_score.reshape(b, -1, cls_score.shape[-1])
        pred5 = jnp.concatenate(
            [bbox_pred.reshape(b, -1, 4), angle_pred.reshape(b, -1, 1)], -1
        )
        ctr_f = centerness.reshape(b, -1)

        def single(cl, p5, ct, sf):
            return get_rbboxes_single(cl, p5, ct, points, sf, cfg)

        return jax.vmap(single)(cls_f, pred5, ctr_f, scale_factors)

    return infer


def get_rbboxes_single(
    cls_logits: Array,   # [P, C]
    pred5: Array,        # [P, 5] (l,t,r,b,angle)
    centerness: Array,   # [P]
    points: Array,       # [P, 2]
    scale_factor: Array,  # [4] (w,h,w,h); (cx,cy,w,h) are divided by it
    cfg: InferenceCfg,
):
    """Single-image rotated decode+NMS chain
    (rotated_fcos_head_p2rb_ts.py _get_bboxes_single :998-1090)."""
    from .ops.nms import multiclass_nms_rotated
    from .ops.rotated import distance_angle_decode

    scores = jax.nn.sigmoid(cls_logits)
    nms_pre = min(cfg.nms_pre, scores.shape[0])
    # rotated quirks vs the HBB path (both caught by the chain differential
    # test): (1) nms_pre ranks by the RAW max class score — the
    # centerness-weighted line is commented out in the reference
    # (rotated_fcos_head_p2rb_ts.py:1052-1053); (2) NMS runs with
    # score_factors=ones (:1087-1090) — centerness never weights the rotated
    # detection scores. `centerness` is accepted for signature symmetry.
    max_scores = scores.max(-1)
    _, topk = jax.lax.top_k(max_scores, nms_pre)
    rb = distance_angle_decode(points[topk], pred5[topk])
    rb = rb.at[..., :4].set(rb[..., :4] / scale_factor[None, :])
    return multiclass_nms_rotated(
        rb, scores[topk], cfg.score_thr, cfg.nms_iou, cfg.max_per_img,
        score_factors=None,
    )


def map_back_boxes(boxes: Array, img_shape: Array, scale_factor: Array,
                   flipped: Array) -> Array:
    """bbox_mapping_back: clamp to the view's resized shape, undo the
    horizontal flip (MultiScaleFlipAug flips BEFORE Pad, so the flip axis is
    the resized width), rescale to original-image coordinates.

    Capability target: mmdet/core/bbox/transforms.py:46-55 (bbox_mapping_back)
    + :5-31 (bbox_flip, horizontal).
    boxes [K,4] xyxy (view pixels); img_shape [2] (nh,nw) resized unpadded;
    scale_factor [4]; flipped scalar bool.
    """
    h = img_shape[0].astype(boxes.dtype)
    w = img_shape[1].astype(boxes.dtype)
    x1 = jnp.clip(boxes[:, 0], 0, w)
    y1 = jnp.clip(boxes[:, 1], 0, h)
    x2 = jnp.clip(boxes[:, 2], 0, w)
    y2 = jnp.clip(boxes[:, 3], 0, h)
    fx1 = jnp.where(flipped, w - x2, x1)
    fx2 = jnp.where(flipped, w - x1, x2)
    return jnp.stack([fx1, y1, fx2, y2], axis=-1) / scale_factor[None, :]


def _build_raw_view_fn(model: StudentFCOS, cfg: InferenceCfg, canvas: int,
                       stride: int = 8):
    """One TTA view program: forward -> per-image top-k -> decode -> map back
    to original-image coordinates. No NMS (the with_nms=False branch of
    get_bboxes, dense_test_mixins.py:75-88)."""
    points = grid_points(canvas // stride, canvas // stride, stride)

    @jax.jit
    def raw(params, images, img_shapes, scale_factors, flipped):
        outs, _ = model.apply(params, images)
        cls_score, bbox_pred, centerness = outs
        b = cls_score.shape[0]
        cls_f = cls_score.reshape(b, -1, cls_score.shape[-1])
        bbox_f = bbox_pred.reshape(b, -1, 4)
        ctr_f = centerness.reshape(b, -1)

        def single(cl, bb, ct, shp, sf, fl):
            scores = jax.nn.sigmoid(cl)
            ctr = jax.nn.sigmoid(ct)
            nms_pre = min(cfg.nms_pre, scores.shape[0])
            max_scores = (scores * ctr[:, None]).max(-1)
            _, topk = jax.lax.top_k(max_scores, nms_pre)
            boxes = distance2bbox(points[topk], bb[topk])
            boxes = map_back_boxes(boxes, shp, sf, fl)
            return boxes, scores[topk], ctr[topk]

        return jax.vmap(single)(cls_f, bbox_f, ctr_f, img_shapes,
                                scale_factors, flipped)

    return raw


def build_tta_inference_fn(model: StudentFCOS, cfg: InferenceCfg,
                           canvases, stride: int = 8):
    """Test-time augmentation: multi-scale + flip views merged by one NMS.

    Capability target: aug_test (fcos_p2b_teacher_student.py:300-329) +
    aug_test_bboxes/merge_aug_bboxes (dense_test_mixins.py:38-199): each view
    contributes its nms_pre top-k decoded boxes mapped back to original-image
    coordinates; the union runs one multiclass NMS with merged centerness
    score factors. `canvases` is the static tuple of view canvas sizes (one
    per view; a flipped view repeats its size). Returns
    infer(params, views) where views is a sequence of dicts with keys
    image [B,c,c,3], img_shape [B,2], scale_factor [B,4], flipped [B].
    """
    raw_fns = {c: _build_raw_view_fn(model, cfg, c, stride)
               for c in sorted(set(int(c) for c in canvases))}

    def infer(params, views):
        outs = [
            raw_fns[int(v["image"].shape[1])](
                params, v["image"], v["img_shape"], v["scale_factor"],
                v["flipped"],
            )
            for v in views
        ]
        boxes = jnp.concatenate([o[0] for o in outs], axis=1)
        scores = jnp.concatenate([o[1] for o in outs], axis=1)
        ctr = jnp.concatenate([o[2] for o in outs], axis=1)
        return jax.vmap(
            lambda b, s, f: multiclass_nms(
                b, s, cfg.score_thr, cfg.nms_iou, cfg.max_per_img,
                score_factors=f,
            )
        )(boxes, scores, ctr)

    return infer


def build_rfla_inference_fn(model, cfg: InferenceCfg, img_size: int):
    """Multi-level FCOS test path for the RFLA baseline.

    Capability target: the standard FCOS get_bboxes the RFLA head inherits
    (rfla_fcos_head.py get_bboxes -> _get_bboxes_single): PER-LEVEL nms_pre
    top-k ranked by max(score * centerness), distance2bbox decode clamped to
    the image, concat over levels, one multiclass NMS with centerness score
    factors. Signature matches build_inference_fn so the shared eval runner
    can drive it.
    """
    import math as _math

    level_points = [
        grid_points(int(_math.ceil(img_size / s)), int(_math.ceil(img_size / s)), s)
        for s in model.strides
    ]
    hw = (img_size, img_size)

    @jax.jit
    def infer(params, images, scale_factors, img_shapes=None):
        outs = model.apply(params, images)
        b = outs[0][0].shape[0]
        # per-level flattened pytree [L] of ([B,P_l,C], [B,P_l,4], [B,P_l])
        per_level = [
            (cl.reshape(b, -1, cl.shape[-1]), bb.reshape(b, -1, 4),
             ct.reshape(b, -1))
            for cl, bb, ct in outs
        ]

        def single(lvls, sf, shp):
            boxes_l, scores_l, ctr_l = [], [], []
            for (cl, bb, ct), pts in zip(lvls, level_points):
                scores = jax.nn.sigmoid(cl)
                ctr = jax.nn.sigmoid(ct)
                nms_pre = min(cfg.nms_pre, scores.shape[0])
                max_scores = (scores * ctr[:, None]).max(-1)
                _, topk = jax.lax.top_k(max_scores, nms_pre)
                boxes = distance2bbox(pts[topk], bb[topk])
                h = hw[0] if shp is None else shp[0].astype(boxes.dtype)
                w = hw[1] if shp is None else shp[1].astype(boxes.dtype)
                boxes = jnp.stack(
                    [jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
                     jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)], -1)
                boxes_l.append(boxes / sf[None, :])
                scores_l.append(scores[topk])
                ctr_l.append(ctr[topk])
            return multiclass_nms(
                jnp.concatenate(boxes_l), jnp.concatenate(scores_l),
                cfg.score_thr, cfg.nms_iou, cfg.max_per_img,
                score_factors=jnp.concatenate(ctr_l),
            )

        if img_shapes is None:
            return jax.vmap(lambda lvls, sf: single(lvls, sf, None))(
                per_level, scale_factors)
        return jax.vmap(single)(per_level, scale_factors, img_shapes)

    return infer


def build_inference_fn(model: StudentFCOS, cfg: InferenceCfg, img_size: int, stride: int = 8):
    """Returns jitted infer(params, images [B,H,W,3], scale_factors [B,4])
    -> (dets [B,N,5], labels [B,N], valid [B,N]). Run with the teacher params
    for reference-equivalent behavior."""
    points = grid_points(img_size // stride, img_size // stride, stride)
    hw = (img_size, img_size)

    @jax.jit
    def infer(params, images, scale_factors, img_shapes=None):
        outs, _ = model.apply(params, images)
        cls_score, bbox_pred, centerness = outs
        b = cls_score.shape[0]
        cls_f = cls_score.reshape(b, -1, cls_score.shape[-1])
        bbox_f = bbox_pred.reshape(b, -1, 4)
        ctr_f = centerness.reshape(b, -1)
        if img_shapes is None:
            return jax.vmap(
                lambda c, bb, ct, sf: get_bboxes_single(c, bb, ct, points, hw, sf, cfg)
            )(cls_f, bbox_f, ctr_f, scale_factors)
        return jax.vmap(
            lambda c, bb, ct, sf, shp: get_bboxes_single(
                c, bb, ct, points, hw, sf, cfg, img_shape=shp)
        )(cls_f, bbox_f, ctr_f, scale_factors, img_shapes)

    return infer

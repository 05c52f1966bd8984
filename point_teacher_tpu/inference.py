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
):
    scores = jax.nn.sigmoid(cls_logits)
    ctr = jax.nn.sigmoid(centerness)
    p = scores.shape[0]
    nms_pre = min(cfg.nms_pre, p)
    max_scores = (scores * ctr[:, None]).max(-1)
    _, topk = jax.lax.top_k(max_scores, nms_pre)
    scores_k = scores[topk]
    ctr_k = ctr[topk]
    boxes_k = distance2bbox(points[topk], bbox_pred[topk], max_shape=img_hw)
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
            scores = jax.nn.sigmoid(cl)
            ctr = jax.nn.sigmoid(ct)
            nms_pre = min(cfg.nms_pre, scores.shape[0])
            max_scores = (scores * ctr[:, None]).max(-1)
            _, topk = jax.lax.top_k(max_scores, nms_pre)
            rb = distance_angle_decode(points[topk], p5[topk])
            rb = rb.at[..., :4].set(rb[..., :4] / sf[0])  # square scale factor
            return multiclass_nms_rotated(
                rb, scores[topk], cfg.score_thr, cfg.nms_iou, cfg.max_per_img,
                score_factors=ctr[topk],
            )

        return jax.vmap(single)(cls_f, pred5, ctr_f, scale_factors)

    return infer


def build_inference_fn(model: StudentFCOS, cfg: InferenceCfg, img_size: int, stride: int = 8):
    """Returns jitted infer(params, images [B,H,W,3], scale_factors [B,4])
    -> (dets [B,N,5], labels [B,N], valid [B,N]). Run with the teacher params
    for reference-equivalent behavior."""
    points = grid_points(img_size // stride, img_size // stride, stride)
    hw = (img_size, img_size)

    @jax.jit
    def infer(params, images, scale_factors):
        outs, _ = model.apply(params, images)
        cls_score, bbox_pred, centerness = outs
        b = cls_score.shape[0]
        cls_f = cls_score.reshape(b, -1, cls_score.shape[-1])
        bbox_f = bbox_pred.reshape(b, -1, 4)
        ctr_f = centerness.reshape(b, -1)
        return jax.vmap(
            lambda c, bb, ct, sf: get_bboxes_single(c, bb, ct, points, hw, sf, cfg)
        )(cls_f, bbox_f, ctr_f, scale_factors)

    return infer

"""Loss functions (pure JAX).

Parity targets in the reference (semantics, not code):
- sigmoid focal loss: HBB_TOD/mmdet/models/losses/focal_loss.py (py_sigmoid_focal_loss)
- DIoU: HBB_TOD/mmdet/models/losses/iou_loss.py:339-393 (diou_loss)
- DN-DIoU (3x3 corner-perturbation bank, min over bank, averaged with base):
  HBB_TOD/mmdet/models/losses/iou_loss.py:395-466 (DN_diou_loss)
- gfocal bag loss: fcos_head_p2b_ts.py:1074-1078 (gfocal_loss)
- centerness target: fcos_head_p2b_ts.py:1019-1038
- binary CE with logits (centerness loss): mmdet CrossEntropyLoss(use_sigmoid=True)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def weight_reduce(loss: Array, weight=None, avg_factor=None, reduction: str = "mean") -> Array:
    """mmdet-style weighted reduction."""
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if avg_factor is None:
        if reduction == "mean":
            return loss.mean()
        return loss.sum()
    return loss.sum() / avg_factor


def sigmoid_focal_loss(
    logits: Array,
    targets_onehot: Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> Array:
    """Element-wise sigmoid focal loss; `targets_onehot` in {0,1}, same shape as logits."""
    p = jax.nn.sigmoid(logits)
    t = targets_onehot
    ce = _bce_with_logits(logits, t)
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    return ce * alpha_t * jnp.power(1 - p_t, gamma)


def focal_loss_from_labels(
    logits: Array,
    labels: Array,
    num_classes: int,
    weight=None,
    avg_factor=None,
    alpha: float = 0.25,
    gamma: float = 2.0,
    loss_weight: float = 1.0,
) -> Array:
    """Focal loss with integer labels; background = `num_classes` (all-zero one-hot row)."""
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    loss = sigmoid_focal_loss(logits, onehot, alpha, gamma).sum(-1)
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    # numerically stable: max(x,0) - x*t + log(1 + exp(-|x|))
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def binary_cross_entropy(logits: Array, targets: Array, weight=None, avg_factor=None) -> Array:
    loss = _bce_with_logits(logits, targets)
    return weight_reduce(loss, weight, avg_factor)


def smooth_l1(pred: Array, target: Array, beta: float = 1.0, weight=None, avg_factor=None) -> Array:
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce(loss, weight, avg_factor)


def _diou_elem(pred: Array, target: Array, eps: float = 1e-7) -> Array:
    """Element-wise DIoU loss (1 - DIoU) on aligned xyxy boxes [..., 4] -> [...]."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = ap + ag - overlap + eps
    ious = overlap / union

    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:4], target[..., 2:4])
    enc_wh = jnp.clip(enc_rb - enc_lt, 0, None)
    c2 = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps

    rho2 = ((target[..., 0] + target[..., 2]) - (pred[..., 0] + pred[..., 2])) ** 2 / 4 + (
        (target[..., 1] + target[..., 3]) - (pred[..., 1] + pred[..., 3])
    ) ** 2 / 4
    return 1 - (ious - rho2 / c2)


def diou_loss(pred: Array, target: Array, weight=None, avg_factor=None,
              eps: float = 1e-6, loss_weight: float = 1.0) -> Array:
    return loss_weight * weight_reduce(_diou_elem(pred, target, eps), weight, avg_factor)


def dn_diou_loss(
    pred: Array,
    target: Array,
    weight=None,
    avg_factor=None,
    hyper: float = 0.2,
    eps: float = 1e-6,
    loss_weight: float = 1.0,
    base_valid=None,
) -> Array:
    """Denoising DIoU: min over a 3x3 bank of corner-perturbed targets, averaged
    with the base DIoU. Perturbation indexed by (i, j) in {-1,0,1}^2:
      x1 -= a*w*i ; y1 -= a*h*i ; x2 += a*w*j ; y2 += a*h*j,  a = hyper/2.

    Reference quirk preserved (iou_loss.py:398-466): the base term is
    `diou_loss(pred, targets)` through the @weighted_loss wrapper with its
    DEFAULT 'mean' reduction — i.e. a SCALAR unweighted mean over every row
    the reference passes, added to the per-element bank minimum. With padded
    tensors, `base_valid` marks the rows the reference would have passed
    (positives on the dense path, real-GT bag rows on the MIL path); rows
    outside it contribute neither to the scalar base nor (via zero weight)
    to the reduction. Defaults to all rows.
    """
    base_elem = _diou_elem(pred, target, eps)
    if base_valid is None:
        base = base_elem.mean()
    else:
        m = base_valid.reshape(base_elem.shape).astype(base_elem.dtype)
        base = (base_elem * m).sum() / jnp.maximum(m.sum(), 1.0)
    a = hyper / 2
    w = target[..., 2] - target[..., 0]
    h = target[..., 3] - target[..., 1]
    shifts = jnp.array([-1.0, 0.0, 1.0])
    # bank: [9, ..., 4]
    ii, jj = jnp.meshgrid(shifts, shifts, indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    def one(i, j):
        return jnp.stack(
            [
                target[..., 0] - a * w * i,
                target[..., 1] - a * h * i,
                target[..., 2] + a * w * j,
                target[..., 3] + a * h * j,
            ],
            axis=-1,
        )

    bank = jax.vmap(one)(ii, jj)  # [9, ..., 4]
    bank_loss = _diou_elem(pred[None], bank, eps)  # [9, ...]
    loss = (base + bank_loss.min(axis=0)) / 2
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def gfocal_loss(p: Array, q: Array, w=1.0, eps: float = 1e-6) -> Array:
    """Bag-level generalised-focal loss used by the MIL head.

    p: predicted bag score (post-sigmoid/normalised), q: soft target, both [..., C].
    Returns per-bag loss summed over classes [...].
    """
    l1 = (p - q) ** 2
    l2 = q * jnp.log(p + eps) + (1 - q) * jnp.log(1 - p + eps)
    return -(l1 * l2 * w).sum(axis=-1)


def giou_loss(pred: Array, target: Array, weight=None, avg_factor=None,
              eps: float = 1e-6, loss_weight: float = 1.0) -> Array:
    """GIoULoss (iou_loss.py:763): 1 - GIoU on aligned xyxy boxes."""
    from .boxes import bbox_overlaps

    loss = 1 - bbox_overlaps(pred, target, mode="giou", is_aligned=True, eps=eps)
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def _iou_aligned(pred, target, eps):
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    return overlap / (ap + ag - overlap + eps)


def ciou_loss(pred: Array, target: Array, weight=None, avg_factor=None,
              eps: float = 1e-7, loss_weight: float = 1.0) -> Array:
    """CIoULoss (iou_loss.py:468-540): DIoU + aspect-ratio consistency term."""
    base = _diou_elem(pred, target, eps)  # 1 - diou
    ious = _iou_aligned(pred, target, eps)
    w1 = pred[..., 2] - pred[..., 0]
    h1 = jnp.maximum(pred[..., 3] - pred[..., 1], eps)
    w2 = target[..., 2] - target[..., 0]
    h2 = jnp.maximum(target[..., 3] - target[..., 1], eps)
    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.maximum(1 - ious + v, eps))
    loss = base + alpha * v
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def iou_loss(pred: Array, target: Array, weight=None, avg_factor=None,
             mode: str = "log", eps: float = 1e-6, loss_weight: float = 1.0) -> Array:
    """IoULoss (iou_loss.py): -log(IoU) / 1-IoU / 1-IoU^2 on aligned xyxy."""
    ious = jnp.clip(_iou_aligned(pred, target, eps), eps, None)
    if mode == "linear":
        loss = 1 - ious
    elif mode == "square":
        loss = 1 - ious ** 2
    else:
        loss = -jnp.log(ious)
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def rotated_iou_loss(pred5: Array, target5: Array, weight=None, avg_factor=None,
                     mode: str = "log", eps: float = 1e-6, loss_weight: float = 1.0) -> Array:
    """RotatedIoULoss (OBB_TOD/mmrotate/models/losses/rotated_iou_loss.py:149):
    -log(IoU) (default), 1-IoU (linear) or 1-IoU^2 (square) on aligned rotated
    boxes, with the differentiable rotated IoU (diff_iou_rotated_2d replaced by
    our polygon-clip rbox_iou)."""
    from .rotated import rbox_iou

    ious = jnp.clip(rbox_iou(pred5, target5, aligned=True), eps, None)
    if mode == "linear":
        loss = 1 - ious
    elif mode == "square":
        loss = 1 - ious ** 2
    else:
        loss = -jnp.log(ious)
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def dn_rotated_iou_loss(pred5: Array, target5: Array, weight=None, avg_factor=None,
                        hyper: float = 0.2, mode: str = "log", eps: float = 1e-6,
                        loss_weight: float = 1.0) -> Array:
    """DN_IoULoss (rotated_iou_loss.py:105-147,229): min over a 3x3 bank of
    w/h-perturbed rotated targets (w -= a*w*i, h -= a*h*j), averaged with the
    base rotated-IoU loss."""
    from .rotated import rbox_iou

    def elem(t):
        ious = jnp.clip(rbox_iou(pred5, t, aligned=True), eps, None)
        if mode == "linear":
            return 1 - ious
        if mode == "square":
            return 1 - ious ** 2
        return -jnp.log(ious)

    base = elem(target5)
    a = hyper / 2
    w = target5[..., 2]
    h = target5[..., 3]
    shifts = jnp.array([-1.0, 0.0, 1.0])
    ii, jj = jnp.meshgrid(shifts, shifts, indexing="ij")

    def one(i, j):
        return jnp.stack(
            [target5[..., 0], target5[..., 1], target5[..., 2] - a * w * i,
             target5[..., 3] - a * h * j, target5[..., 4]], axis=-1,
        )

    bank = jax.vmap(one)(ii.reshape(-1), jj.reshape(-1))  # [9, ..., 5]
    bank_loss = jax.vmap(elem)(bank)
    loss = (base + bank_loss.min(axis=0)) / 2
    return loss_weight * weight_reduce(loss, weight, avg_factor)


def centerness_target(bbox_targets_ltrb: Array) -> Array:
    """FCOS centerness from (l, t, r, b) targets; min clamp 0.01 as in the reference."""
    lr = bbox_targets_ltrb[..., [0, 2]]
    tb = bbox_targets_ltrb[..., [1, 3]]
    c = (jnp.clip(lr.min(-1), 0.01, None) / jnp.maximum(lr.max(-1), 1e-12)) * (
        jnp.clip(tb.min(-1), 0.01, None) / jnp.maximum(tb.max(-1), 1e-12)
    )
    return jnp.sqrt(c)

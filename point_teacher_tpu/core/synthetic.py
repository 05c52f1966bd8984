"""Device-side synthetic "black paper" image generation.

Capability target: generate_black_paper (syn_images_generator_v2.py:591-690)
and its orchestration genrate_syn (fcos_p2b_teacher_student.py:469-502).

The reference bounces every training image to the host (cv2.fillPoly) each
iteration; here the whole thing — box sampling, rotated-NMS de-overlap,
rasterisation — runs inside the jitted train step on device.

Semantics preserved:
- one candidate rotated box per GT: centre ~ U[50, S-50]^2, log-normal-ish
  w/h from per-class priors (shape_list), random angle in [-pi/2, pi/2),
  centre clipped so the rotated box stays inside;
- "occupied" boxes at the real GT locations (fixed 0.7 * prior size, angle 0,
  score 1) join the rotated NMS (IoU 0.05) so synthetic boxes avoid real
  objects, then are dropped (score < 1 filter);
- up to 2 adjacency chains (5 boxes for dense classes, 3 otherwise) fired
  with probability 0.2 per GT under a budget of 2 (the reference decrements
  `adjboost` sequentially; we fire on the first two Bernoulli successes —
  same marginal budget, order-free);
- boxes whose axis-aligned cover leaves [0, S-1] are dropped;
- masked pixels are painted 255.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.masks import rasterize_rboxes
from ..ops.nms import nms_rotated
from ..ops.rotated import obb2xyxy

Array = jnp.ndarray

CHAIN_LEN_DENSE = 5
CHAIN_LEN_SPARSE = 3
NUM_CHAINS = 2
CHAIN_SLOTS = NUM_CHAINS * CHAIN_LEN_DENSE


class SynCfg(NamedTuple):
    shape_list: tuple  # ((w, h, dw, dr), ...) per synthetic class
    imgsize: int = 800


def _sample_boxes(key, gt_cxcywh, gt_valid, cls_ids, prior, imgsize):
    """One candidate rotated box per GT slot. Returns [G, 7] (cx,cy,w,h,a,score,cls)."""
    g = gt_cxcywh.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    base_scale = jax.random.uniform(k1, (g,)) * 2.0 + 0.5
    xy = jax.random.uniform(k2, (g, 2)) * (imgsize - 100) + 50.0
    dw = prior[cls_ids, 2]
    w = jnp.clip(jax.random.normal(k3, (g,)) * 0.4, -1, 1) * dw
    w = base_scale * jnp.exp(w)
    dr = prior[cls_ids, 3]
    r = jnp.clip(jax.random.normal(k4, (g,)) * 0.4, -1, 1) * dr
    h = w * jnp.exp(r)
    w = w * prior[cls_ids, 0]
    h = h * prior[cls_ids, 1]
    a = jax.random.uniform(k5, (g,)) * jnp.pi - jnp.pi / 2
    x = jnp.clip(xy[:, 0], 0.71 * w, imgsize - 1 - 0.71 * w)
    y = jnp.clip(xy[:, 1], 0.71 * h, imgsize - 1 - 0.71 * h)
    score = (w * h) / (imgsize * imgsize) + 0.1
    return jnp.stack([x, y, w, h, a, score, cls_ids.astype(w.dtype)], -1)


def _adjacency_chains(key, boxes, gt_valid, dense_cls_max):
    """Up to NUM_CHAINS chains extending the first Bernoulli-fired boxes.

    boxes [G, 7] -> chains [CHAIN_SLOTS, 7], chain_valid [CHAIN_SLOTS].
    """
    g = boxes.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    fired = (jax.random.uniform(k1, (g,)) < 0.2) & gt_valid
    order = jnp.cumsum(fired) - 1  # fired rank, 0-based
    slots = []
    valids = []
    itv_dense = jax.random.uniform(k2, (NUM_CHAINS,)) * 4 + 2
    dev_dense = jax.random.uniform(k3, (NUM_CHAINS,)) * 8 - 4
    itv_sparse = jax.random.uniform(k2, (NUM_CHAINS,)) * 40 + 10

    for c in range(NUM_CHAINS):
        is_cth = fired & (order == c)
        has = is_cth.any()
        idx = jnp.argmax(is_cth)  # first (only) index, or 0 if none
        b = boxes[idx]
        x, y, w, h, a, s, cls = (b[i] for i in range(7))
        dense = cls < dense_cls_max
        itv = jnp.where(dense, itv_dense[c], itv_sparse[c])
        dev = jnp.where(dense, dev_dense[c], 0.0)
        ofx = (h + itv) * jnp.sin(-a) + dev * jnp.cos(a)
        ofy = (h + itv) * jnp.cos(a) + dev * jnp.sin(a)
        ks = jnp.arange(1, CHAIN_LEN_DENSE + 1, dtype=boxes.dtype)
        chain = jnp.stack(
            [x + ks * ofx, y + ks * ofy, jnp.full_like(ks, w), jnp.full_like(ks, h),
             jnp.full_like(ks, a), s - 0.001 * ks, jnp.full_like(ks, cls)], -1
        )
        chain_len = jnp.where(dense, CHAIN_LEN_DENSE, CHAIN_LEN_SPARSE)
        cvalid = has & (jnp.arange(CHAIN_LEN_DENSE) < chain_len)
        slots.append(chain)
        valids.append(cvalid)
    return jnp.concatenate(slots, 0), jnp.concatenate(valids, 0)


@partial(jax.jit, static_argnames=("cfg", "fill_value"))
def generate_black_paper_batch(
    key: Array,
    images: Array,
    gt_boxes_xyxy: Array,
    gt_valid: Array,
    cfg: SynCfg,
    fill_value: float = 255.0,
):
    """images [B,H,W,3]; gt_boxes [B,G,4] xyxy (HBB) or [B,G,5] rotated (OBB —
    centres are all that is used); gt_valid [B,G].

    Returns (img_syn [B,H,W,3], syn_boxes_xyxy [B,S,4], syn_rboxes [B,S,5],
    syn_valid [B,S]) with S = G + CHAIN_SLOTS slots. The HBB path trains on
    the axis-aligned covers (genrate_syn converts via obb2poly -> min/max,
    fcos_p2b_teacher_student.py:487-492); the OBB path trains on the rotated
    boxes directly (rotated_fcos_teacher_student.py:391-405).
    """
    b, h, w, _ = images.shape
    g = gt_boxes_xyxy.shape[1]
    prior = jnp.asarray(cfg.shape_list, dtype=images.dtype)
    n_cls = prior.shape[0]
    dense_cls_max = n_cls // 2  # dense_cls = range(len(pattern)/2)

    def one(key, img, gts, valid):
        k_cls, k_box, k_chain = jax.random.split(key, 3)
        cls_ids = jax.random.randint(k_cls, (g,), 0, n_cls)
        if gts.shape[-1] == 5:  # rotated gts: centres stored directly
            cxy = gts[:, :2]
        else:
            cxy = (gts[:, :2] + gts[:, 2:4]) * 0.5
        occ_size = prior[cls_ids, 0] * 0.7
        occupied = jnp.stack(
            [cxy[:, 0], cxy[:, 1], occ_size, occ_size, jnp.zeros(g, img.dtype),
             jnp.ones(g, img.dtype), cls_ids.astype(img.dtype)], -1
        )
        cand = _sample_boxes(k_box, gts, valid, cls_ids, prior, cfg.imgsize)
        chains, chain_valid = _adjacency_chains(k_chain, cand, valid, dense_cls_max)

        allb = jnp.concatenate([occupied, cand, chains], 0)  # [S_all, 7]
        allv = jnp.concatenate([valid, valid, chain_valid], 0)
        keep = nms_rotated(allb[:, :5], allb[:, 5], 0.05, valid=allv)
        keep = keep & (allb[:, 5] < 1.0)  # drop occupied markers
        xyxy = obb2xyxy(allb[:, :5])
        inside = (xyxy.min(-1) >= 0) & (xyxy.max(-1) <= cfg.imgsize - 1)
        keep = keep & inside

        mask = rasterize_rboxes(allb[:, :5], keep, h, w)
        img_syn = jnp.where(mask[:, :, None], jnp.asarray(fill_value, img.dtype), img)
        # drop the occupied slots entirely (they can never be kept)
        return img_syn, xyxy[g:], allb[g:, :5], keep[g:]

    keys = jax.random.split(key, b)
    return jax.vmap(one)(keys, images, gt_boxes_xyxy, gt_valid)


def generate_synthesis_batch(key, images, gt_boxes, gt_valid, cfg: SynCfg):
    """`generate_sythesis` equivalent (syn_images_generator_v2.py:426-557):
    the textured-synthesis variant. As shipped, the reference multiplies the
    pattern to zero (`p_randn = randint*0`, :554) and stamps black rectangles;
    the same box-sampling/NMS pipeline applies, so this is the black-paper
    generator with fill 0."""
    return generate_black_paper_batch(key, images, gt_boxes, gt_valid, cfg,
                                      fill_value=0.0)

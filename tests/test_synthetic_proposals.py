"""Synthetic black-paper generator + proposal-bag generation tests."""
import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.core.proposals import (
    FineProposalCfg, delta_decode, fine_proposals, negative_proposals,
    point_proposals,
)
from point_teacher_tpu.core.synthetic import SynCfg, generate_black_paper_batch

SHAPES = ((20, 20, 0.5, 0.5), (10, 20, 0.5, 0.5), (30, 40, 0.5, 0.5))


def _batch(b=2, g=6, size=128, seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randint(0, 255, (b, size, size, 3)).astype(np.float32))
    cxy = rng.uniform(30, size - 30, (b, g, 2))
    wh = rng.uniform(6, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
                        dtype=jnp.float32)
    return img, boxes, jnp.ones((b, g), bool)


def test_black_paper_masks_pixels_white():
    img, boxes, valid = _batch()
    cfg = SynCfg(shape_list=SHAPES, imgsize=128)
    out, syn_xyxy, syn_rb, syn_valid = generate_black_paper_batch(
        jax.random.PRNGKey(0), img, boxes, valid, cfg
    )
    assert out.shape == img.shape
    n_valid = int(syn_valid.sum())
    assert n_valid > 0
    # masked pixels are exactly 255 and some pixels changed
    changed = np.asarray(out != img).any(-1)
    assert changed.any()
    assert np.all(np.asarray(out)[changed] == 255.0)


def test_black_paper_boxes_inside_image():
    img, boxes, valid = _batch(seed=3)
    cfg = SynCfg(shape_list=SHAPES, imgsize=128)
    _, syn_xyxy, syn_rb, syn_valid = generate_black_paper_batch(
        jax.random.PRNGKey(1), img, boxes, valid, cfg
    )
    v = np.asarray(syn_valid)
    xy = np.asarray(syn_xyxy)
    assert (xy[v] >= 0).all() and (xy[v] <= 127).all()
    rb = np.asarray(syn_rb)
    assert (rb[v][:, 2] > 0).all() and (rb[v][:, 3] > 0).all()


def test_black_paper_avoids_real_objects_mostly():
    # occupied markers join the NMS, so synthetic boxes rarely cover real GTs
    img, boxes, valid = _batch(seed=5)
    cfg = SynCfg(shape_list=SHAPES, imgsize=128)
    _, syn_xyxy, _, syn_valid = generate_black_paper_batch(
        jax.random.PRNGKey(2), img, boxes, valid, cfg
    )
    from point_teacher_tpu.ops.boxes import bbox_overlaps

    iou = np.asarray(bbox_overlaps(syn_xyxy[0], boxes[0]))
    v = np.asarray(syn_valid[0])
    if v.any():
        assert iou[v].max() < 0.5


def test_fine_proposals_ratio_grid():
    boxes = jnp.asarray([[10.0, 10.0, 20.0, 30.0]])
    cfg = FineProposalCfg(base_ratios=(1.0, 0.5), shake_ratio=None, min_scale=0.0)
    props, valid = fine_proposals(boxes, cfg, (64, 64))
    assert props.shape == (1, 4, 4)  # 2x2 ratio combos
    # first combo is (1.0, 1.0): identity
    assert np.allclose(np.asarray(props)[0, 0], [10, 10, 20, 30])
    # combos scale w and h independently
    whs = np.asarray(props)[0, :, 2:] - np.asarray(props)[0, :, :2]
    assert sorted(np.round(whs[:, 0]).tolist()) == [5, 5, 10, 10]


def test_fine_proposals_shake_and_min_scale():
    boxes = jnp.asarray([[30.0, 30.0, 32.0, 32.0]])  # tiny 2x2 box
    cfg = FineProposalCfg(base_ratios=(1.0,), shake_ratio=(0.1,), min_scale=4.0)
    props, valid = fine_proposals(boxes, cfg, (64, 64))
    assert props.shape == (1, 5, 4)  # 1 ratio x (1 + 4 shakes)
    whs = np.asarray(props)[0, :, 2:] - np.asarray(props)[0, :, :2]
    assert np.allclose(whs, 4.0)  # min_scale clamps 2 -> 4


def test_fine_proposals_validity_iof():
    boxes = jnp.asarray([[-10.0, -10.0, 5.0, 5.0], [20.0, 20.0, 30.0, 30.0]])
    cfg = FineProposalCfg(base_ratios=(1.0,), shake_ratio=None)
    props, valid = fine_proposals(boxes, cfg, (64, 64))
    v = np.asarray(valid)
    assert not v[0, 0]  # mostly outside -> iof < 0.7
    assert v[1, 0]


def test_negative_proposals_weights():
    key = jax.random.PRNGKey(0)
    pos = jnp.asarray([[[10.0, 10.0, 60.0, 60.0]]])  # big box in a small image
    neg, w = negative_proposals(key, pos[0], jnp.ones((1, 1), bool), 64, (64, 64))
    assert neg.shape == (64, 4)
    from point_teacher_tpu.ops.boxes import bbox_overlaps

    iou = np.asarray(bbox_overlaps(neg, pos[0].reshape(-1, 4)))
    assert ((iou.max(1) < 0.3) == np.asarray(w)).all()


def test_point_proposals_define_mode():
    pts = jnp.asarray([[32.0, 32.0]])
    props, valid = point_proposals(pts, (4, 8), (1.0, 2.0), 0.1, (64, 64))
    # 2 scales x 2 ratios x 5 shake positions
    assert props.shape == (1, 20, 4)
    assert np.asarray(valid).all()


def test_delta_decode_identity_and_shift():
    props = jnp.asarray([[10.0, 10.0, 20.0, 30.0]])
    zero = delta_decode(props, jnp.zeros((1, 4)), (64, 64))
    assert np.allclose(np.asarray(zero), np.asarray(props), atol=1e-5)
    shifted = delta_decode(props, jnp.asarray([[0.5, 0.0, 0.0, 0.0]]), (64, 64))
    assert np.isclose(float(shifted[0, 0] - props[0, 0]), 5.0)  # dx * w

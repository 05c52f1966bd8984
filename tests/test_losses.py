import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops import losses as L


def _torch_focal(logits, labels, num_classes, alpha=0.25, gamma=2.0):
    import torch
    import torch.nn.functional as F

    logits = torch.tensor(np.asarray(logits))
    labels_t = torch.tensor(np.asarray(labels))
    onehot = torch.zeros_like(logits)
    fg = labels_t < num_classes
    onehot[fg] = F.one_hot(labels_t[fg], num_classes).float()
    p = logits.sigmoid()
    ce = F.binary_cross_entropy_with_logits(logits, onehot, reduction="none")
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return (ce * a_t * (1 - p_t) ** gamma).sum(-1).numpy()


def test_focal_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 8).astype(np.float32)
    labels = rng.randint(0, 9, size=(16,))  # 8 == background
    ours = L.focal_loss_from_labels(jnp.array(logits), jnp.array(labels), 8, avg_factor=1.0)
    ref = _torch_focal(logits, labels, 8).sum()
    assert np.isclose(float(ours), ref, rtol=1e-4)


def test_diou_perfect_box_zero():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    loss = L.diou_loss(b, b, avg_factor=1.0)
    assert float(loss) < 1e-5


def test_dn_diou_leq_diou_for_shifted_targets():
    pred = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    # target slightly larger: some bank member should match better
    target = jnp.array([[-0.5, -0.5, 10.5, 10.5]])
    dn = float(L.dn_diou_loss(pred, target, avg_factor=1.0, hyper=0.2))
    base = float(L.diou_loss(pred, target, avg_factor=1.0))
    assert dn <= base + 1e-6


def test_dn_diou_matches_reference_formula():
    # hand-rolled bank computation vs the vectorised one
    rng = np.random.RandomState(1)
    pred = np.abs(rng.randn(5, 2)) * 10
    pred = np.concatenate([pred, pred + np.abs(rng.randn(5, 2)) * 10 + 1], -1).astype(np.float32)
    tgt = np.abs(rng.randn(5, 2)) * 10
    tgt = np.concatenate([tgt, tgt + np.abs(rng.randn(5, 2)) * 10 + 1], -1).astype(np.float32)
    hyper = 0.3
    a = hyper / 2
    w = tgt[:, 2] - tgt[:, 0]
    h = tgt[:, 3] - tgt[:, 1]
    bank = []
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            t = tgt.copy()
            t[:, 0] -= a * w * i
            t[:, 1] -= a * h * i
            t[:, 2] += a * w * j
            t[:, 3] += a * h * j
            bank.append(np.asarray(L._diou_elem(jnp.array(pred), jnp.array(t), 1e-6)))
    # the base term is the SCALAR mean over rows (the reference calls the
    # @weighted_loss-decorated diou_loss with default 'mean' reduction inside
    # DN_diou_loss — pinned differentially in test_reference_parity.py)
    base = np.asarray(L._diou_elem(jnp.array(pred), jnp.array(tgt), 1e-6)).mean()
    expected = (base + np.min(np.stack(bank), axis=0)) / 2
    ours_sum = float(L.dn_diou_loss(jnp.array(pred), jnp.array(tgt), avg_factor=1.0, hyper=hyper))
    assert np.isclose(ours_sum, expected.sum(), rtol=1e-4)


def test_centerness_target():
    t = jnp.array([[2.0, 2.0, 2.0, 2.0], [1.0, 1.0, 4.0, 4.0]])
    c = L.centerness_target(t)
    assert np.isclose(c[0], 1.0, atol=1e-5)
    assert np.isclose(c[1], 0.25, atol=1e-5)


def test_gfocal_zero_when_match():
    p = jnp.array([[0.9, 0.1]])
    q = jnp.array([[0.9, 0.1]])
    assert float(L.gfocal_loss(p, q).sum()) < 1e-6


def test_bce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    x = rng.randn(32).astype(np.float32)
    t = rng.rand(32).astype(np.float32)
    ours = float(L.binary_cross_entropy(jnp.array(x), jnp.array(t), avg_factor=1.0))
    ref = F.binary_cross_entropy_with_logits(torch.tensor(x), torch.tensor(t), reduction="sum")
    assert np.isclose(ours, float(ref), rtol=1e-4)


def test_giou_ciou_iou_losses():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    for fn in (L.giou_loss, L.ciou_loss, L.iou_loss):
        assert float(fn(b, b, avg_factor=1.0)) < 1e-3, fn.__name__
    shifted = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    assert float(L.giou_loss(b, shifted, avg_factor=1.0)) > 0.5
    assert float(L.ciou_loss(b, shifted, avg_factor=1.0)) > 0.5
    assert float(L.iou_loss(b, shifted, avg_factor=1.0, mode="linear")) > 0.5


def test_new_match_costs():
    from point_teacher_tpu.core import costs as C

    logits = jnp.array([[2.0, -1.0], [-1.0, 2.0]])
    labels = jnp.array([0, 1])
    cc = np.asarray(C.classification_cost(logits, labels))
    assert cc[0, 0] < cc[0, 1]
    boxes = jnp.array([[0.0, 0.0, 4.0, 4.0]])
    gts = jnp.array([[0.0, 0.0, 4.0, 4.0], [10.0, 10.0, 14.0, 14.0]])
    ic = np.asarray(C.iou_cost(boxes, gts))
    assert ic[0, 0] < ic[0, 1]
    l1 = np.asarray(C.bbox_l1_cost(boxes, gts))
    assert l1[0, 0] == 0.0 and l1[0, 1] == 40.0
    hp = np.asarray(C.h_point_cost(boxes, gts))
    assert hp[0, 0] == 0.0 and np.isclose(hp[0, 1], 20.0)
    ctr = np.asarray(C.centerness_cost(jnp.array([0.5, 0.9]), jnp.array([1.0])))
    assert np.isclose(ctr[0, 0], 0.5) and np.isclose(ctr[1, 0], 0.1)
    ce = np.asarray(C.cross_entropy_cost(logits, jnp.array([[1.0, 0.0]])))
    assert ce.shape == (2, 1) and ce[0, 0] < ce[1, 0]

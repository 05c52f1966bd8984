"""Differential parity: SODA-A evaluator vs the reference's OWN SODAAeval
(OBB_TOD/mmrotate/datasets/sodaa_eval/sodaa_eval.py — a pycocotools-style
evaluator, loaded standalone with mmcv's box_iou_rotated bridged to the cv2
rotated-intersection oracle).

Identical GT/DT inputs -> the full stats table (AP over [.5:.95], AP50/75,
eS/rS/gS/Normal buckets, AR@20000) must agree. This exercises the IoU
geometry, greedy matching, accumulate interpolation and bucket slicing end to
end. nproc=0 selects the reference's sequential path (its nproc==1 branch
calls evaluateImgPartial with unpacked args — a latent reference bug).
"""
import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _ref_stubs import setup  # noqa: E402

REF = setup()


def _pairwise_riou_cv2(a, b):
    import cv2

    a = a.detach().cpu().numpy() if torch.is_tensor(a) else np.asarray(a)
    b = b.detach().cpu().numpy() if torch.is_tensor(b) else np.asarray(b)
    out = np.zeros((a.shape[0], b.shape[0]), np.float32)
    for i in range(a.shape[0]):
        r1 = ((float(a[i, 0]), float(a[i, 1])),
              (float(a[i, 2]), float(a[i, 3])), float(np.degrees(a[i, 4])))
        for j in range(b.shape[0]):
            r2 = ((float(b[j, 0]), float(b[j, 1])),
                  (float(b[j, 2]), float(b[j, 3])), float(np.degrees(b[j, 4])))
            ret, pts = cv2.rotatedRectangleIntersection(r1, r2)
            inter = float(cv2.contourArea(pts)) if pts is not None else 0.0
            union = float(a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3]) - inter
            out[i, j] = inter / max(union, 1e-6)
    return torch.from_numpy(out)


@pytest.fixture(scope="module")
def sodaa_eval_mod():
    # the reference predates NumPy 2's removal of the np.float/np.int aliases
    for name, py in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, py)
    sys.modules["mmcv.ops"].box_iou_rotated = _pairwise_riou_cv2
    spec = importlib.util.spec_from_file_location(
        "ref_sodaa_eval",
        "/root/reference/OBB_TOD/mmrotate/datasets/sodaa_eval/sodaa_eval.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_scene(seed, n_imgs=5, cats=9):
    """Random rotated GTs across the size buckets + detections = jittered GTs
    with random scores, plus background noise dets.

    The FIRST GT of image 0 is a decoy in a far corner that no detection
    matches: the reference evaluator stores gt['id'] in dtMatches and tests
    "matched" as > 0, but its insId starts at 0 — a detection matched to the
    dataset's first annotation is miscounted as a false positive (a REAL
    reference bug, sodaa_eval.py:418/_prepare:116; upstream pycocotools is
    immune because COCO ann ids start at 1). The decoy keeps gt id 0 unmatched
    in both evaluators so the differential compares the intended semantics.
    """
    r = np.random.RandomState(seed)
    annotations, dets_ours, results_ref = [], [], []
    for i in range(n_imgs):
        g = r.randint(8, 16)
        cx = r.uniform(40, 760, g)
        cy = r.uniform(40, 760, g)
        # spread areas across eS/rS/gS/Normal
        side = r.uniform(4, 44, g)
        ar = r.uniform(0.5, 2.0, g)
        w = side * np.sqrt(ar)
        h = side / np.sqrt(ar)
        ang = r.uniform(-np.pi / 2, np.pi / 2 - 1e-3, g)
        gts = np.stack([cx, cy, w, h, ang], -1).astype(np.float32)
        labels = r.randint(0, cats, g).astype(np.int64)
        if i == 0:
            decoy = np.array([[3.0, 3.0, 4.0, 4.0, 0.0]], np.float32)
            ann_gts = np.concatenate([decoy, gts])
            ann_labels = np.concatenate([[0], labels]).astype(np.int64)
        else:
            ann_gts, ann_labels = gts, labels
        annotations.append(dict(bboxes=ann_gts, labels=ann_labels))

        # detections: jittered copies (some dropped) + noise
        keep = r.uniform(0, 1, g) > 0.15
        jit = gts[keep].copy()
        jit[:, :2] += r.uniform(-2, 2, (keep.sum(), 2))
        jit[:, 2:4] *= r.uniform(0.85, 1.15, (keep.sum(), 2))
        jit[:, 4] += r.uniform(-0.08, 0.08, keep.sum())
        jlab = labels[keep]
        jscore = r.uniform(0.3, 0.99, keep.sum())
        nn = r.randint(4, 10)
        noise = np.stack([r.uniform(40, 760, nn), r.uniform(40, 760, nn),
                          r.uniform(6, 30, nn), r.uniform(5, 25, nn),
                          r.uniform(-1.5, 1.5, nn)], -1)
        nlab = r.randint(0, cats, nn)
        nscore = r.uniform(0.05, 0.6, nn)

        boxes = np.concatenate([jit, noise]).astype(np.float32)
        scores = np.concatenate([jscore, nscore]).astype(np.float32)
        labs = np.concatenate([jlab, nlab]).astype(np.int64)
        dets_ours.append((boxes, scores, labs))
        per_cat = []
        for c in range(cats):
            m = labs == c
            per_cat.append(
                np.concatenate([boxes[m], scores[m, None]], -1).astype(
                    np.float32))
        results_ref.append(per_cat)
    return annotations, dets_ours, results_ref


@pytest.mark.parametrize("seed", [0, 3])
def test_sodaa_eval_matches_reference(sodaa_eval_mod, capsys, seed):
    from point_teacher_tpu.evalx.sodaa import SODAA_AREA_RNGS, sodaa_evaluate

    cats = 9
    annotations, dets_ours, results_ref = _make_scene(seed)

    ref = sodaa_eval_mod.SODAAeval(annotations, results_ref, numCats=cats,
                                   nproc=0)
    ref.evaluate()
    ref.accumulate()
    prec = ref.eval["precision"][..., 0]  # [T, R, K, A]
    rec = ref.eval["recall"][..., 0]      # [T, K, A]

    def ref_ap(ti=None, ai=0):
        s = prec[:, :, :, ai] if ti is None else prec[ti:ti + 1, :, :, ai]
        v = s[s > -1]
        return float(v.mean()) if v.size else -1.0

    def ref_ar(ai=0):
        v = rec[:, :, ai][rec[:, :, ai] > -1]
        return float(v.mean()) if v.size else -1.0

    gt = dict(
        img_ids=list(range(len(annotations))),
        classes=[str(c) for c in range(cats)],
        annotations=[dict(boxes=a["bboxes"], labels=a["labels"].astype(np.int32))
                     for a in annotations],
    )
    stats = sodaa_evaluate(gt, dets_ours)

    names = [a for a, _, _ in SODAA_AREA_RNGS]
    checks = {
        "AP": ref_ap(),
        "AP_50": ref_ap(ti=0),
        "AP_75": ref_ap(ti=5),
        "AP_eS": ref_ap(ai=names.index("eS")),
        "AP_rS": ref_ap(ai=names.index("rS")),
        "AP_gS": ref_ap(ai=names.index("gS")),
        "AP_Normal": ref_ap(ai=names.index("Normal")),
        "AR@20000": ref_ar(0),
        "AR_eS@20000": ref_ar(names.index("eS")),
        "AR_rS@20000": ref_ar(names.index("rS")),
        "AR_gS@20000": ref_ar(names.index("gS")),
        "AR_Normal@20000": ref_ar(names.index("Normal")),
    }
    for k, want in checks.items():
        assert stats[k] == pytest.approx(want, abs=2e-4), (
            f"{k}: ours {stats[k]} vs reference {want}")
    # non-vacuity
    assert stats["AP"] > 0.1 and stats["AR@20000"] > 0.1

import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops import rotated as R


def _shapely_iou(rb1, rb2):
    # reference rotated IoU via corner polygons + numpy polygon clipping
    # (exact for convex quads); used as golden oracle.
    def poly(rb):
        cx, cy, w, h, a = rb
        c, s = np.cos(a), np.sin(a)
        pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
        rot = pts @ np.array([[c, s], [-s, c]])
        return rot + np.array([cx, cy])

    def clip(subject, cp1, cp2):
        out = []
        n = len(subject)
        for i in range(n):
            cur, nxt = subject[i], subject[(i + 1) % n]
            sc = (cp2[0] - cp1[0]) * (cur[1] - cp1[1]) - (cp2[1] - cp1[1]) * (cur[0] - cp1[0])
            sn = (cp2[0] - cp1[0]) * (nxt[1] - cp1[1]) - (cp2[1] - cp1[1]) * (nxt[0] - cp1[0])
            if sc >= 0:
                out.append(cur)
            if (sc >= 0) != (sn >= 0):
                t = sc / (sc - sn)
                out.append(cur + t * (nxt - cur))
        return out

    def area(p):
        p = np.array(p)
        if len(p) < 3:
            return 0.0
        x, y = p[:, 0], p[:, 1]
        return abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2

    p1, p2 = poly(rb1), poly(rb2)
    # ensure ccw winding of the clipper
    if area(p2) > 0 and np.cross(p2[1] - p2[0], p2[2] - p2[1]) < 0:
        p2 = p2[::-1]
    sub = list(p1)
    for i in range(4):
        sub = clip(sub, p2[i], p2[(i + 1) % 4])
        if not sub:
            break
    inter = area(sub) if sub else 0.0
    u = rb1[2] * rb1[3] + rb2[2] * rb2[3] - inter
    return inter / u


def test_obb2poly_axis_aligned():
    rb = jnp.array([[10.0, 20.0, 4.0, 2.0, 0.0]])
    poly = np.asarray(R.obb2poly(rb)).reshape(4, 2)
    assert np.allclose(sorted(poly[:, 0]), [8, 8, 12, 12])
    assert np.allclose(sorted(poly[:, 1]), [19, 19, 21, 21])


def test_obb2xyxy_rotated():
    rb = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
    xyxy = np.asarray(R.obb2xyxy(rb))[0]
    d = np.sqrt(2)
    assert np.allclose(xyxy, [-d, -d, d, d], atol=1e-5)


def test_rbox_iou_identity():
    rb = jnp.array([[5.0, 5.0, 4.0, 2.0, 0.3]])
    iou = np.asarray(R.rbox_iou(rb, rb))
    assert np.isclose(iou[0, 0], 1.0, atol=1e-4)


def test_rbox_iou_axis_aligned_matches_hbb():
    rb1 = jnp.array([[5.0, 5.0, 10.0, 10.0, 0.0]])
    rb2 = jnp.array([[10.0, 10.0, 10.0, 10.0, 0.0]])
    iou = float(R.rbox_iou(rb1, rb2)[0, 0])
    assert np.isclose(iou, 25.0 / 175.0, atol=1e-4)


def test_rbox_iou_random_vs_oracle():
    rng = np.random.RandomState(3)
    rbs1 = np.stack(
        [rng.uniform(20, 80, 20), rng.uniform(20, 80, 20), rng.uniform(5, 30, 20),
         rng.uniform(5, 30, 20), rng.uniform(-np.pi / 2, np.pi / 2, 20)], -1
    ).astype(np.float32)
    rbs2 = np.stack(
        [rng.uniform(20, 80, 20), rng.uniform(20, 80, 20), rng.uniform(5, 30, 20),
         rng.uniform(5, 30, 20), rng.uniform(-np.pi / 2, np.pi / 2, 20)], -1
    ).astype(np.float32)
    ours = np.asarray(R.rbox_iou(jnp.array(rbs1), jnp.array(rbs2)))
    for i in range(20):
        for j in range(0, 20, 5):
            golden = _shapely_iou(rbs1[i], rbs2[j])
            assert np.isclose(ours[i, j], golden, atol=2e-3), (i, j, ours[i, j], golden)


def test_points_in_rbox():
    pts = jnp.array([[5.0, 5.0], [11.0, 5.0], [5.0, 8.0]])
    rb = jnp.array([[5.0, 5.0, 10.0, 4.0, 0.0]])
    inside = np.asarray(R.points_in_rbox(pts, rb))[:, 0]
    assert inside.tolist() == [True, False, False]


def test_rbox_iou_differentiable():
    import jax

    def f(wh):
        rb1 = jnp.concatenate([jnp.array([5.0, 5.0]), wh, jnp.array([0.2])])[None]
        rb2 = jnp.array([[5.0, 5.0, 4.0, 4.0, 0.0]])
        return R.rbox_iou(rb1, rb2, aligned=True)[0]

    g = jax.grad(f)(jnp.array([3.0, 3.0]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.abs(np.asarray(g)) > 0)

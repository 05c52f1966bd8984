"""Differential parity: strong augmentation vs the reference's own
strong_augmentation (syn_images_generator_v2.py:24-130).

The reference samples its flip direction / scale with python random +
np.random inside the function; we monkeypatch those to force each branch and
compare against our deterministic _flip/_rescale pieces — coordinates exactly,
the warped image to the rounding boundary.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_teacher_tpu.core.augment import _flip, _rescale  # noqa: E402

from _ref_stubs import setup  # noqa: E402

REF = setup()

H = W = 64
DIRS = ["horizontal", "vertical", "diagonal", "None"]


def _case(seed, g=6):
    r = np.random.RandomState(seed)
    img = r.randint(0, 255, (1, 3, H, W)).astype(np.float32)
    gp = r.uniform(5, 59, (g, 2)).astype(np.float32)
    pp = r.uniform(5, 59, (g, 2)).astype(np.float32)
    cx = r.uniform(10, 54, g)
    cy = r.uniform(10, 54, g)
    bw = r.uniform(4, 16, g)
    bh = r.uniform(4, 16, g)
    pb = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                  -1).astype(np.float32)
    labels = r.randint(0, 8, g).astype(np.int64)
    return img, gp, pp, pb, labels


def _run_reference(img, gp, pp, pb, labels, direction, scale, monkeypatch):
    mod = REF.syn_gen
    monkeypatch.setattr(mod.random, "choice", lambda seq: direction)
    monkeypatch.setattr(mod.np.random, "uniform",
                        lambda lo, hi: float(scale))
    with torch.no_grad():
        out = mod.strong_augmentation(
            torch.from_numpy(img), [torch.from_numpy(gp)],
            [torch.from_numpy(labels)], [torch.from_numpy(pp)],
            [torch.from_numpy(labels)], [torch.from_numpy(pb)])
    img_aug, _, gt_points, _, ps_points, _, ps_bboxes = out
    return (img_aug.numpy()[0], gt_points[0].numpy(), ps_points[0].numpy(),
            ps_bboxes[0].numpy())


@pytest.mark.parametrize("direction", DIRS)
@pytest.mark.parametrize("scale", [0.8, 0.9, 1.0, 1.1, 1.2])
def test_strong_augmentation_matches_reference(direction, scale, monkeypatch):
    img, gp, pp, pb, labels = _case(3)
    t_img, t_gp, t_pp, t_pb = _run_reference(
        img, gp, pp, pb, labels, direction, scale, monkeypatch)

    jimg = jnp.asarray(img[0].transpose(1, 2, 0))
    fimg, (fgp, fpp), fpb = _flip(
        jimg, [jnp.asarray(gp), jnp.asarray(pp)], jnp.asarray(pb),
        jnp.asarray(DIRS.index(direction)), H, W)
    rimg, (rgp, rpp), rpb, (in_g, in_p) = _rescale(
        fimg, [fgp, fpp], fpb, jnp.asarray(float(scale)), H, W)

    # coordinate laws: exact. On upscale the reference drops out-of-frame
    # rows; our inframe mask marks the same set.
    np.testing.assert_allclose(np.asarray(rgp)[np.asarray(in_g)], t_gp,
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rpp)[np.asarray(in_p)], t_pp,
                               rtol=1e-5, atol=1e-3)
    # pseudo boxes: the reference keeps rows by the POINT insider test and
    # re-canonicalises (min-corner/abs-wh) after the shift
    sel = np.asarray(in_p)
    ours_pb = np.asarray(rpb)[sel]
    x = np.minimum(ours_pb[:, 0], ours_pb[:, 2])
    y = np.minimum(ours_pb[:, 1], ours_pb[:, 3])
    w_ = np.abs(ours_pb[:, 0] - ours_pb[:, 2])
    h_ = np.abs(ours_pb[:, 1] - ours_pb[:, 3])
    ours_canon = np.stack([x, y, x + w_, y + h_], -1)
    np.testing.assert_allclose(ours_canon, t_pb, rtol=1e-5, atol=1e-3)

    # image: same bilinear law + round; allow the f32 rounding boundary
    ours_img = np.asarray(rimg)
    ref_img = t_img.transpose(1, 2, 0)
    diff = np.abs(ours_img - ref_img)
    assert diff.max() <= 1.0 + 1e-6, diff.max()
    assert (diff > 0.5).mean() < 2e-3, (diff > 0.5).mean()


# ---------------- rotated (OBB fork) strong augmentation ----------------

def _load_obb_syn_gen():
    import importlib

    return importlib.import_module(
        "refobb.models.detectors.syn_images_generator_v2")


def _rcase(seed, g=6):
    r = np.random.RandomState(seed)
    img = r.randint(0, 255, (1, 3, H, W)).astype(np.float32)
    gp = r.uniform(5, 59, (g, 2)).astype(np.float32)
    pp = r.uniform(5, 59, (g, 2)).astype(np.float32)
    rb = np.stack([r.uniform(12, 52, g), r.uniform(12, 52, g),
                   r.uniform(6, 18, g), r.uniform(4, 14, g),
                   r.uniform(-np.pi / 2, np.pi / 2 - 1e-3, g)],
                  -1).astype(np.float32)
    labels = r.randint(0, 9, g).astype(np.int64)
    return img, gp, pp, rb, labels


@pytest.mark.parametrize("direction", DIRS)
@pytest.mark.parametrize("scale,angle", [(0.8, 3), (1.0, 11), (1.2, 19)])
def test_rotated_strong_augmentation_matches_reference(direction, scale, angle,
                                                       monkeypatch):
    """Coordinate/rbox laws of the OBB strong_augmentation (:223-360):
    polygon flip + R(-angle) rotation + insider filters + rescale +
    poly2obb_le90 canonicalisation vs our analytic _flip_rboxes /
    _rotate_coords / _canon_le90 pipeline. (The image path needs torchvision,
    which is absent — TF.rotate is stubbed to identity on the torch side and
    the image is not compared here; the coordinate law it must follow is the
    one asserted.)"""
    from point_teacher_tpu.core.raugment import (
        _canon_le90, _flip_points, _flip_rboxes, _rotate_coords)
    from point_teacher_tpu.core.augment import rescale_offsets
    from point_teacher_tpu.ops.rotated import rbox_iou

    mod = _load_obb_syn_gen()
    monkeypatch.setattr(mod.random, "choice", lambda seq: direction)
    monkeypatch.setattr(mod.np.random, "uniform", lambda lo, hi: float(scale))
    monkeypatch.setattr(mod.np.random, "randint", lambda lo, hi: int(angle))
    monkeypatch.setattr(mod.TF, "rotate", lambda im, a, fill=0: im,
                        raising=False)

    img, gp, pp, rb, labels = _rcase(7)
    with torch.no_grad():
        out = mod.strong_augmentation(
            torch.from_numpy(img), [torch.from_numpy(gp)],
            [torch.from_numpy(labels)], [torch.from_numpy(pp)],
            [torch.from_numpy(labels)], [torch.from_numpy(rb)], "le90")
    _, _, t_gp, _, t_pp, _, t_rb = out
    t_gp, t_pp, t_rb = t_gp[0].numpy(), t_pp[0].numpy(), t_rb[0].numpy()

    d = jnp.asarray(DIRS.index(direction))
    jgp = _flip_points(jnp.asarray(gp), d, H, W)
    jpp = _flip_points(jnp.asarray(pp), d, H, W)
    jrb = _flip_rboxes(jnp.asarray(rb), d, H, W)
    rad = -float(angle) * np.pi / 180.0
    jgp = _rotate_coords(jgp, rad, H, W)
    jpp = _rotate_coords(jpp, rad, H, W)
    jrb = jnp.concatenate(
        [_rotate_coords(jrb[..., :2], rad, H, W), jrb[..., 2:4],
         (jrb[..., 4] + rad)[..., None]], -1)
    in_g = np.asarray((jgp[:, 0] >= 0) & (jgp[:, 0] < W)
                      & (jgp[:, 1] >= 0) & (jgp[:, 1] < H))
    in_p = np.asarray((jpp[:, 0] >= 0) & (jpp[:, 0] < W)
                      & (jpp[:, 1] >= 0) & (jpp[:, 1] < H))
    s = jnp.asarray(float(scale))
    _, _, off_y, off_x = rescale_offsets(s, H, W)
    off = jnp.stack([off_x, off_y])
    jgp = jgp * s + off
    jpp = jpp * s + off
    jrb = jrb.at[..., :4].multiply(s).at[..., :2].add(off)
    jrb = _canon_le90(jrb)
    in_g = in_g & np.asarray((jgp[:, 0] >= 0) & (jgp[:, 0] < W)
                             & (jgp[:, 1] >= 0) & (jgp[:, 1] < H))
    in_p = in_p & np.asarray((jpp[:, 0] >= 0) & (jpp[:, 0] < W)
                             & (jpp[:, 1] >= 0) & (jpp[:, 1] < H))

    np.testing.assert_allclose(np.asarray(jgp)[in_g], t_gp, rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(jpp)[in_p], t_pp, rtol=1e-4,
                               atol=1e-3)
    ours_rb = np.asarray(jrb)[in_p]
    assert ours_rb.shape == t_rb.shape
    # same rectangle set: compare via aligned rotated IoU == 1 (the le90
    # canonical (w,h,angle) triple can differ by the exact-square tie only)
    iou = np.asarray(rbox_iou(jnp.asarray(ours_rb), jnp.asarray(t_rb),
                              aligned=True))
    np.testing.assert_allclose(iou, 1.0, atol=2e-3)
    np.testing.assert_allclose(ours_rb[:, :2], t_rb[:, :2], atol=1e-3)
    np.testing.assert_allclose(np.sort(ours_rb[:, 2:4], -1),
                               np.sort(t_rb[:, 2:4], -1), rtol=1e-4, atol=1e-3)


def test_rotate_image_follows_coordinate_law():
    """The image warp must be the inverse of the coordinate law: a bright
    pixel placed at p lands (NEAREST) where _rotate_coords maps p, and
    out-of-frame sources are fill-0 — the torchvision TF.rotate contract the
    reference relies on (syn_images_generator_v2.py OBB :265)."""
    from point_teacher_tpu.core.raugment import (_rotate_coords,
                                                 _rotate_image_nearest)

    h = w = 64
    rng = np.random.RandomState(11)
    for angle in (3.0, 11.0, 19.0):
        rad = -angle * np.pi / 180.0  # coordinate law rotation
        img = np.zeros((h, w, 3), np.float32)
        pts = np.stack([rng.uniform(12, 52, 6) // 1 * 1, 
                        rng.uniform(12, 52, 6) // 1 * 1],
                       -1).astype(np.float32)
        # paint 3x3 blocks: a lone pixel can legitimately vanish under a
        # NEAREST inverse warp (no dest sample rounds into it), a block can't
        for i, (x, y) in enumerate(pts):
            img[int(y) - 1:int(y) + 2, int(x) - 1:int(x) + 2] = 100.0 + i
        out = np.asarray(_rotate_image_nearest(jnp.asarray(img), -rad, h, w))
        moved = np.asarray(_rotate_coords(jnp.asarray(pts + 0.5), rad, h, w))
        for i, (mx, my) in enumerate(moved):
            xi, yi = int(np.floor(mx)), int(np.floor(my))
            patch = out[max(yi - 2, 0):yi + 3, max(xi - 2, 0):xi + 3]
            assert (np.abs(patch - (100.0 + i)) < 1e-6).any(), (angle, i)
        # fill-0 corners appear once rotation uncovers them
        assert (out[0, :6].sum(-1) == 0).any() or (out[:6, 0].sum(-1) == 0).any()

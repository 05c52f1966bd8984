"""Strong-augmentation tests: the single-warp rescale must match the
reference's two-step resize + centre pad/crop for every discrete scale."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.core.augment import (
    AugBatch, SCALES, strong_augment, warp_rescale_image, random_point_in_boxes,
)


def _reference_rescale(img, s):
    """Two-step semantics from the reference (syn_images_generator_v2.py:63-111)."""
    h, w, c = img.shape
    sh, sw = int(h * s + 1e-4), int(w * s + 1e-4)
    # antialias=False: torch F.interpolate(mode='bilinear') semantics — the
    # reference does NOT antialias on downscale
    resized = jax.image.resize(img, (sh, sw, c), method="bilinear", antialias=False)
    if s < 1.0:
        by, bx = (h - sh) // 2, (w - sw) // 2
        out = jnp.zeros_like(img)
        out = jax.lax.dynamic_update_slice(out, resized, (by, bx, 0))
    elif s > 1.0:
        by, bx = (sh - h) // 2, (sw - w) // 2
        out = jax.lax.dynamic_slice(resized, (by, bx, 0), (h, w, c))
    else:
        out = resized
    return jnp.round(out)


@pytest.mark.parametrize("s", SCALES)
def test_warp_matches_two_step_rescale(s):
    rng = np.random.RandomState(int(s * 10))
    img = jnp.asarray(rng.randint(0, 255, (64, 64, 3)).astype(np.float32))
    ref = np.asarray(_reference_rescale(img, s))
    ours = np.asarray(warp_rescale_image(img, jnp.float32(s)))
    # round() can flip on exact .5 boundaries from fp noise; allow tiny mismatch
    mism = np.abs(ours - ref) > 1.0
    assert mism.mean() < 1e-3, (s, mism.mean())


def test_strong_augment_shapes_and_validity():
    key = jax.random.PRNGKey(0)
    b, h, g = 4, 64, 5
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (b, h, h, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(5, 59, (b, g, 2)).astype(np.float32))
    boxes = jnp.concatenate([pts - 3, pts + 3], -1)
    batch = AugBatch(img, pts, jnp.ones((b, g), bool), pts, boxes,
                     jnp.ones((b, g), bool))
    out = strong_augment(key, batch)
    assert out.image.shape == img.shape
    # valid points stay in frame
    p = np.asarray(out.gt_points)
    v = np.asarray(out.gt_valid)
    assert (p[v] >= 0).all() and (p[v] < h).all()
    # boxes stay ordered
    bb = np.asarray(out.pseudo_boxes)
    assert (bb[..., 2] >= bb[..., 0]).all() and (bb[..., 3] >= bb[..., 1]).all()


def test_random_point_in_boxes_center_and_full():
    key = jax.random.PRNGKey(1)
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 20.0]])
    c = random_point_in_boxes(key, boxes, 0.0)
    assert np.allclose(np.asarray(c), [[20.0, 15.0]])
    full = np.asarray(random_point_in_boxes(key, jnp.repeat(boxes, 512, 0), 1.0))
    assert (full[:, 0] >= 10).all() and (full[:, 0] <= 30).all()
    assert (full[:, 1] >= 10).all() and (full[:, 1] <= 20).all()
    # spread should cover most of the box
    assert full[:, 0].std() > 3.0


def test_rotated_strong_augment():
    from point_teacher_tpu.core.raugment import RAugBatch, strong_augment_rotated

    key = jax.random.PRNGKey(2)
    b, h, g = 2, 64, 4
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randint(0, 255, (b, h, h, 3)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(10, 54, (b, g, 2)).astype(np.float32))
    rb = jnp.concatenate([pts, jnp.full((b, g, 2), 8.0),
                          jnp.asarray(rng.uniform(-1.5, 1.5, (b, g, 1)), dtype=jnp.float32)], -1)
    out = strong_augment_rotated(key, RAugBatch(img, pts, jnp.ones((b, g), bool),
                                                pts, rb, jnp.ones((b, g), bool)))
    assert out.image.shape == img.shape
    r = np.asarray(out.pseudo_rboxes)
    assert (r[..., 2] > 0).all() and (r[..., 3] > 0).all()
    assert np.isfinite(r).all()


def test_rotate_images_nearest_matches_per_image():
    """The batch-flattened rotate gather (perf restructure) is bit-identical
    to the per-image law the coordinate tests pin."""
    import jax

    from point_teacher_tpu.core.raugment import (
        _rotate_image_nearest, rotate_images_nearest)

    rng = np.random.RandomState(0)
    b, s = 3, 96
    imgs = jnp.asarray(rng.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    rads = jnp.asarray([0.05, -0.31, 0.33], jnp.float32)
    got = rotate_images_nearest(imgs, rads)
    want = jax.vmap(lambda im, r: _rotate_image_nearest(im, r, s, s))(imgs, rads)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

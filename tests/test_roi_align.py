import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops.roi_align import roi_align, roi_align_rotated


def test_roi_align_constant_feature():
    feat = jnp.ones((16, 16, 4))
    rois = jnp.array([[8.0, 8.0, 64.0, 64.0]])  # image coords, scale 1/8 -> feat 1..8
    out = roi_align(feat, rois, out_size=7, spatial_scale=1.0 / 8)
    assert out.shape == (1, 7, 7, 4)
    assert np.allclose(out, 1.0, atol=1e-5)


def _numpy_roi_align(feat_hwc, rois, out=7, scale=1 / 8, s=2):
    """Aligned RoIAlign oracle (torchvision aligned=True semantics)."""
    h, w, c = feat_hwc.shape

    def bilin(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, feat_hwc.dtype)
        x = min(max(x, 0.0), w - 1.0)
        y = min(max(y, 0.0), h - 1.0)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        lx, ly = x - x0, y - y0
        return (
            feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hwc[y0, x1] * (1 - ly) * lx
            + feat_hwc[y1, x0] * ly * (1 - lx)
            + feat_hwc[y1, x1] * ly * lx
        )

    outs = np.zeros((len(rois), out, out, c), feat_hwc.dtype)
    for n, (x1, y1, x2, y2) in enumerate(rois):
        rw = max((x2 - x1) * scale, 1e-6)
        rh = max((y2 - y1) * scale, 1e-6)
        bw, bh = rw / out, rh / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(c, feat_hwc.dtype)
                for ky in range(s):
                    for kx in range(s):
                        sy = y1 * scale + (i + (ky + 0.5) / s) * bh - 0.5
                        sx = x1 * scale + (j + (kx + 0.5) / s) * bw - 0.5
                        acc += bilin(sy, sx)
                outs[n, i, j] = acc / (s * s)
    return outs


def test_roi_align_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(20, 24, 3).astype(np.float32)
    rois = np.array(
        [[8.0, 8.0, 100.0, 90.0], [0.0, 0.0, 40.0, 40.0], [33.3, 21.2, 150.0, 140.7]],
        dtype=np.float32,
    )
    ref = _numpy_roi_align(feat, rois)
    ours = roi_align(jnp.array(feat), jnp.array(rois), out_size=7, spatial_scale=1 / 8,
                     sampling_ratio=2)
    assert np.allclose(np.asarray(ours), ref, atol=1e-4), np.abs(np.asarray(ours) - ref).max()


def test_roi_align_chunked_equals_unchunked():
    rng = np.random.RandomState(1)
    feat = jnp.array(rng.randn(20, 20, 8).astype(np.float32))
    rois = jnp.array(rng.uniform(0, 120, (37, 4)).astype(np.float32))
    rois = jnp.concatenate([jnp.minimum(rois[:, :2], rois[:, 2:]),
                            jnp.maximum(rois[:, :2], rois[:, 2:]) + 4], -1)
    a = roi_align(feat, rois, chunk=8)
    b = roi_align(feat, rois, chunk=1024)
    assert np.allclose(a, b, atol=1e-5)


def test_roi_align_rotated_zero_angle_matches_axis_aligned():
    rng = np.random.RandomState(2)
    feat = jnp.array(rng.randn(20, 20, 4).astype(np.float32))
    # centered box, zero angle
    rrois = jnp.array([[80.0, 80.0, 64.0, 48.0, 0.0]])
    rois = jnp.array([[80.0 - 32, 80.0 - 24, 80.0 + 32, 80.0 + 24]])
    a = roi_align_rotated(feat, rrois)
    b = roi_align(feat, rois)
    assert np.allclose(a, b, atol=1e-4)


def test_roi_align_rotated_90deg_transposes():
    rng = np.random.RandomState(3)
    feat = jnp.array(rng.randn(32, 32, 1).astype(np.float32))
    sq = jnp.array([[128.0, 128.0, 64.0, 64.0, 0.0]])
    rot = jnp.array([[128.0, 128.0, 64.0, 64.0, np.pi / 2]])
    a = np.asarray(roi_align_rotated(feat, sq))[0, :, :, 0]
    b = np.asarray(roi_align_rotated(feat, rot))[0, :, :, 0]
    # 90° rotation of the sampling grid: b[i, j] == a[j, out-1-i]
    assert np.allclose(b, np.rot90(a, k=1), atol=1e-4)


def test_roi_align_matmul_matches_gather():
    from point_teacher_tpu.ops.roi_align import roi_align_gather, roi_align_matmul

    rng = np.random.RandomState(5)
    feat = jnp.array(rng.randn(20, 24, 8).astype(np.float32))
    xy = rng.uniform(-10, 150, (23, 2)).astype(np.float32)
    wh = rng.uniform(4, 120, (23, 2)).astype(np.float32)
    rois = jnp.array(np.concatenate([xy, xy + wh], -1))
    a = roi_align_gather(feat, rois, sampling_ratio=2)
    b = roi_align_matmul(feat, rois, sampling_ratio=2)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4), \
        np.abs(np.asarray(a) - np.asarray(b)).max()


def test_roi_align_matmul_chunked():
    from point_teacher_tpu.ops.roi_align import roi_align_matmul

    rng = np.random.RandomState(6)
    feat = jnp.array(rng.randn(16, 16, 4).astype(np.float32))
    xy = rng.uniform(0, 100, (37, 2)).astype(np.float32)
    rois = jnp.array(np.concatenate([xy, xy + 20], -1))
    a = roi_align_matmul(feat, rois, chunk=8)
    b = roi_align_matmul(feat, rois, chunk=256)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_roi_align_rotated_matmul_matches_gather():
    from point_teacher_tpu.ops.roi_align import roi_align_rotated, roi_align_rotated_matmul

    rng = np.random.RandomState(9)
    feat = jnp.array(rng.randn(40, 40, 8).astype(np.float32))
    rr = np.stack([
        rng.uniform(40, 280, 17), rng.uniform(40, 280, 17),
        rng.uniform(8, 100, 17), rng.uniform(8, 100, 17),
        rng.uniform(-np.pi / 2, np.pi / 2, 17),
    ], -1).astype(np.float32)
    a = roi_align_rotated(feat, jnp.array(rr), sampling_ratio=2)
    b = roi_align_rotated_matmul(feat, jnp.array(rr), sampling_ratio=2, window=32)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
        np.abs(np.asarray(a) - np.asarray(b)).max()


def test_roi_align_rotated_matmul_chunked():
    from point_teacher_tpu.ops.roi_align import roi_align_rotated_matmul

    rng = np.random.RandomState(10)
    feat = jnp.array(rng.randn(24, 24, 4).astype(np.float32))
    rr = np.stack([
        rng.uniform(30, 160, 37), rng.uniform(30, 160, 37),
        rng.uniform(8, 60, 37), rng.uniform(8, 60, 37),
        rng.uniform(-1.5, 1.5, 37),
    ], -1).astype(np.float32)
    a = roi_align_rotated_matmul(feat, jnp.array(rr), chunk=8, window=16)
    b = roi_align_rotated_matmul(feat, jnp.array(rr), chunk=64, window=16)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)

import jax
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


def _numpy_roi_align_adaptive(feat_hwc, rois, out=7, scale=1 / 8):
    """mmcv/torchvision `sampling_ratio=0` oracle: the per-roi sample count is
    ceil(roi_extent / out) per axis (roi_align CUDA kernel semantics). This is
    the exact configuration the reference trains with
    (aitodv2_point_teacher_0%.py:70-74); our kernels fix sampling_ratio=2 to
    keep shapes static."""
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
        sx_n = max(int(np.ceil(rw / out)), 1)
        sy_n = max(int(np.ceil(rh / out)), 1)
        for i in range(out):
            for j in range(out):
                acc = np.zeros(c, feat_hwc.dtype)
                for ky in range(sy_n):
                    for kx in range(sx_n):
                        sy = y1 * scale + (i + (ky + 0.5) / sy_n) * bh - 0.5
                        sx = x1 * scale + (j + (kx + 0.5) / sx_n) * bw - 0.5
                        acc += bilin(sy, sx)
                outs[n, i, j] = acc / (sy_n * sx_n)
    return outs


def test_roi_align_adaptive_matches_mmcv_oracle_exactly():
    """sampling_ratio=0 (the mmcv default the reference trains with,
    aitodv2_point_teacher_0%.py:70-74) must reproduce adaptive sampling
    EXACTLY for every roi whose bins need <= ADAPTIVE_SMAX samples — i.e. all
    AI-TOD/MIL-bag geometry (2..200 px at stride 8, bins up to 3.6 cells)."""
    rng = np.random.RandomState(12)
    feat = rng.randn(100, 100, 4).astype(np.float32)
    cx = rng.uniform(30, 770, 64).astype(np.float32)
    cy = rng.uniform(30, 770, 64).astype(np.float32)
    wh = rng.uniform(2, 200, (2, 64)).astype(np.float32)
    rois = np.stack([cx - wh[0] / 2, cy - wh[1] / 2,
                     cx + wh[0] / 2, cy + wh[1] / 2], -1)
    ref = _numpy_roi_align_adaptive(feat, rois)
    ours = np.asarray(roi_align(jnp.array(feat), jnp.array(rois), sampling_ratio=0))
    assert np.allclose(ours, ref, atol=1e-4), np.abs(ours - ref).max()
    gat = np.asarray(
        __import__("point_teacher_tpu.ops.roi_align", fromlist=["roi_align_gather"])
        .roi_align_gather(jnp.array(feat), jnp.array(rois), sampling_ratio=0))
    assert np.allclose(gat, ref, atol=1e-4), np.abs(gat - ref).max()


def test_roi_align_adaptive_clamps_above_smax():
    """RoIs beyond ADAPTIVE_SMAX bins/cell (>224 px at stride 8) clamp the
    sample count at ADAPTIVE_SMAX; verify against the oracle with the same
    clamp and bound the deviation vs true unclamped adaptive (denser sampling
    of a smooth integrand — small)."""
    from point_teacher_tpu.ops.roi_align import ADAPTIVE_SMAX

    rng = np.random.RandomState(13)
    feat = rng.randn(100, 100, 2).astype(np.float32)
    rois = np.array([[40.0, 60.0, 440.0, 500.0], [0.0, 0.0, 780.0, 760.0]],
                    dtype=np.float32)
    ours = np.asarray(roi_align(jnp.array(feat), jnp.array(rois), sampling_ratio=0))

    def oracle(clamped):
        h, w, c = feat.shape
        out = np.zeros((len(rois), 7, 7, c), np.float32)
        for n, (x1, y1, x2, y2) in enumerate(rois):
            rw, rh = (x2 - x1) / 8, (y2 - y1) / 8
            bw, bh = rw / 7, rh / 7
            sx_n, sy_n = int(np.ceil(bw)), int(np.ceil(bh))
            if clamped:
                sx_n, sy_n = min(sx_n, ADAPTIVE_SMAX), min(sy_n, ADAPTIVE_SMAX)
            for i in range(7):
                for j in range(7):
                    acc = np.zeros(c, np.float32)
                    for ky in range(sy_n):
                        for kx in range(sx_n):
                            sy = y1 / 8 + (i + (ky + 0.5) / sy_n) * bh - 0.5
                            sx = x1 / 8 + (j + (kx + 0.5) / sx_n) * bw - 0.5
                            y0, x0 = int(np.floor(min(max(sy, 0), h - 1))), int(np.floor(min(max(sx, 0), w - 1)))
                            y0c, x0c = min(max(sy, 0), h - 1), min(max(sx, 0), w - 1)
                            y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                            ly, lx = y0c - y0, x0c - x0
                            acc += (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1i] * (1 - ly) * lx
                                    + feat[y1i, x0] * ly * (1 - lx) + feat[y1i, x1i] * ly * lx)
                    out[n, i, j] = acc / (sy_n * sx_n)
        return out

    assert np.allclose(ours, oracle(clamped=True), atol=1e-4)
    diff = np.abs(ours - oracle(clamped=False))
    assert diff.max() < 0.5, diff.max()  # sampling-density difference only


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
    # rotated kernels fix sample_num=2 (reference parity); compare like-for-like
    a = roi_align_rotated(feat, rrois)
    b = roi_align(feat, rois, sampling_ratio=2)
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


def test_roi_align_matmul_bf16_close_to_f32():
    """The training path pools bf16 features: the bf16 matmul chain (weights
    and the [N,out,W,C] intermediate rounded to bf16, f32 MXU accumulation)
    must stay within bf16 noise of the exact f32 pooling."""
    rng = np.random.RandomState(11)
    feat = rng.randn(32, 32, 8).astype(np.float32)
    rois = np.stack([
        rng.uniform(0, 180, 64), rng.uniform(0, 180, 64),
        rng.uniform(60, 250, 64), rng.uniform(60, 250, 64),
    ], -1).astype(np.float32)
    rois[:, 2:] = np.maximum(rois[:, 2:], rois[:, :2] + 6)
    exact = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois)))
    half = np.asarray(roi_align(jnp.asarray(feat, jnp.bfloat16),
                                jnp.asarray(rois))).astype(np.float32)
    scale = np.abs(exact).max()
    assert np.abs(half - exact).max() / scale < 0.01  # bf16 input rounding


def test_roi_align_window_matches_fullmap():
    """Windowed MXU RoIAlign == full-map matmul form for every roi whose
    sample support fits the window (all of AI-TOD's MIL geometry)."""
    from point_teacher_tpu.ops.roi_align import roi_align_window_matmul

    rng = np.random.RandomState(12)
    feat = jnp.asarray(rng.randn(100, 100, 8).astype(np.float32))
    x1 = rng.uniform(0, 600, 300).astype(np.float32)
    y1 = rng.uniform(0, 600, 300).astype(np.float32)
    wpx = rng.uniform(4, 200, 300).astype(np.float32)
    hpx = rng.uniform(4, 200, 300).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + wpx, y1 + hpx], -1))
    full = np.asarray(roi_align(feat, rois))
    win = np.asarray(roi_align_window_matmul(feat, rois, chunk=128, window=32))
    np.testing.assert_allclose(win, full, rtol=1e-4, atol=1e-4)


def test_roi_align_window_chunked_and_grad():
    from point_teacher_tpu.ops.roi_align import roi_align_window_matmul

    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.randn(64, 64, 4).astype(np.float32))
    x1 = rng.uniform(0, 300, 50).astype(np.float32)
    y1 = rng.uniform(0, 300, 50).astype(np.float32)
    rois = jnp.asarray(np.stack([x1, y1, x1 + 40, y1 + 60], -1))
    a = roi_align_window_matmul(feat, rois, chunk=16, window=32)
    b = roi_align_window_matmul(feat, rois, chunk=64, window=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    # feat gradient matches the full-map form's (same linear map)
    g_win = jax.grad(lambda f: roi_align_window_matmul(f, rois, window=32).sum())(feat)
    g_full = jax.grad(lambda f: roi_align(f, rois).sum())(feat)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_full),
                               rtol=1e-4, atol=1e-4)


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

"""Golden tests for the fused pallas rotated RoIAlign (interpret mode).

The TPU-compiled kernel is exercised and measured on hardware by
/tmp-style scripts (results ledgered in NOTES_r3); here the kernel runs
under the pallas interpreter against the windowed-XLA oracle
(roi_align_rotated_matmul, window=16 — itself golden-tested against the
gather-exact roi_align_rotated)."""
import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops.roi_align import roi_align_rotated_matmul
from point_teacher_tpu.ops.rroi_pallas import roi_align_rotated_pallas


def _mk(b=2, h=40, w=40, c=8, n=20, seed=0):
    r = np.random.RandomState(seed)
    feat = jnp.asarray(r.randn(b, h, w, c).astype(np.float32))
    rrois = jnp.asarray(np.concatenate([
        r.uniform(30, 8 * min(h, w) - 30, (b, n, 2)),
        r.uniform(4, 60, (b, n, 2)),
        r.uniform(-np.pi / 2, np.pi / 2, (b, n, 1))], -1).astype(np.float32))
    return feat, rrois


def _oracle(feat, rrois):
    return jax.vmap(lambda f, rr: roi_align_rotated_matmul(
        f, rr, chunk=8, window=16))(feat, rrois)


def test_fwd_matches_windowed_oracle():
    feat, rrois = _mk()
    out_p = roi_align_rotated_pallas(feat, rrois, chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(_oracle(feat, rrois)),
                               atol=1e-5)


def test_grad_matches_windowed_oracle():
    feat, rrois = _mk(seed=1)

    def lp(f):
        return (roi_align_rotated_pallas(f, rrois, chunk=8,
                                         interpret=True).astype(jnp.float32) ** 2).sum()

    def lm(f):
        return (_oracle(f, rrois).astype(jnp.float32) ** 2).sum()

    gp = jax.grad(lp)(feat)
    gm = jax.grad(lm)(feat)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gm), atol=1e-3, rtol=1e-4)


def test_roi_padding_and_channel_tiling():
    # n not a multiple of chunk; c > ctile exercises the fused (k, j) grid
    feat, rrois = _mk(n=13, c=16)
    out_p = roi_align_rotated_pallas(feat, rrois, chunk=8, ctile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(_oracle(feat, rrois)),
                               atol=1e-5)


def test_zero_size_roi_and_out_of_frame():
    feat, rrois = _mk(n=8)
    rr = np.array(rrois)
    rr[0, 0] = [0.0, 0.0, 0.0, 0.0, 0.0]          # degenerate
    rr[0, 1] = [10000.0, 10000.0, 8.0, 8.0, 0.3]  # far out of frame
    rrois = jnp.asarray(rr)
    out_p = roi_align_rotated_pallas(feat, rrois, chunk=8, interpret=True)
    out_m = _oracle(feat, rrois)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_m), atol=1e-5)
    assert np.isfinite(np.asarray(out_p)).all()

"""Fused pallas RoIAlign kernel vs the XLA matmul oracle (interpret mode).

The kernel is groundwork for the MIL hot path (see the module docstring for
the Mosaic layout constraint that currently keeps the XLA path default);
these tests pin its numerics on every backend via the pallas interpreter.
"""
import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.ops.roi_align import roi_align_matmul
from point_teacher_tpu.ops.roi_align_pallas import roi_align_batched_pallas


def _mk(B=2, H=32, W=32, C=8, N=37, seed=0):
    r = np.random.RandomState(seed)
    feat = jnp.asarray(r.randn(B, H, W, C).astype(np.float32))
    x1 = r.uniform(0, 180, (B, N)).astype(np.float32)
    y1 = r.uniform(0, 180, (B, N)).astype(np.float32)
    rois = jnp.asarray(np.stack(
        [x1, y1, x1 + r.uniform(5, 60, (B, N)), y1 + r.uniform(5, 60, (B, N))],
        -1).astype(np.float32))
    return feat, rois


def test_pallas_roi_align_matches_matmul_fwd():
    feat, rois = _mk()
    got = np.asarray(roi_align_batched_pallas(feat, rois, chunk=8, interpret=True))
    want = np.stack([np.asarray(roi_align_matmul(feat[b], rois[b]))
                     for b in range(feat.shape[0])])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_matches_matmul_bwd():
    feat, rois = _mk(seed=1)

    def loss_p(f):
        return (roi_align_batched_pallas(f, rois, chunk=8, interpret=True) ** 2).sum()

    def loss_x(f):
        return sum((roi_align_matmul(f[b], rois[b]) ** 2).sum()
                   for b in range(f.shape[0]))

    gp = np.asarray(jax.grad(loss_p)(feat))
    gx = np.asarray(jax.grad(loss_x)(feat))
    np.testing.assert_allclose(gp, gx, rtol=1e-4, atol=1e-4)

"""Pallas TPU kernel for the rotated RoIAlign MIL hot path.

Reference role: mmcv RoIAlignRotated (OBB_TOD config
`sodaa_fcos_pointteacher_1x.py:73-77`, out_size 7, sample_num 2) on the
rotated MIL bags — the r3 step bisect measured the windowed-XLA pool at
848 ms of the 1195 ms SODA-A phase-1 step (NOTES_r3 "Rotated bottleneck").

Design (tpu-first, not a translation of the CUDA gather kernel):
- Rotated bilinear sampling is not axis-separable, but every per-roi
  output bin is a fixed LINEAR functional of a window^2 feature patch:
    out[bin, c] = sum_{wy, wx} WGT[bin, wy, wx] * F[y0+wy, x0+wx, c]
  with WGT = 1/s^2 * sum_{samples in bin} hat(y)⊗hat(x) — the mmcv border
  rule, the sample validity mask and the s^2 sample mean all fold into the
  precomputed WGT (built caller-side with the exact machinery of
  ops/roi_align.roi_align_rotated_matmul, so numerics match it).
- The kernel keeps a channel tile of the WHOLE feature map resident in
  VMEM across all roi chunks of an image (grid (B, (C/CT)*NJ) with the
  roi sweep innermost, (k, j) FUSED into one grid dim — the 3-D grid
  hangs on device when C/CT > 1, same Mosaic behaviour the HBB kernel
  documented), assembles each roi's [WIN*WIN, CT] window with WIN
  row-group copies (flat row y*W+x keeps the x-window contiguous), and
  issues ONE [O^2, WIN^2] @ [WIN^2, CT] MXU dot per roi.
- HBM traffic per step: feat once per (image, channel tile) + the pooled
  weights + outputs — the per-roi window gathers and the [N, samples,
  WIN] hat intermediates of the XLA path never leave VMEM.

Backward (d/dfeat only; every MIL call site pools stop-gradient boxes —
the public wrapper stop-gradients rrois) mirrors the forward with a
revisited f32 accumulator block:  dF_window += WGT^T @ dout[roi].
The [WIN^2, O^2] transposed weights are precomputed caller-side (an
in-kernel bf16 transpose is a Mosaic relayout the HBB kernel found
unsupported; the f32-only relayout rule is inherited from it).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

WIN = 16  # window cells per axis (128px at stride 8 — covers SODA-A bags)


def _make_fwd_kernel(w: int, chunk: int, out2: int):
    def kernel(y0_ref, x0_ref, feat_ref, wgt_ref, out_ref, win_ref):
        # y0/x0 SMEM (1, CHUNK) int32; feat_ref VMEM (1, H*W, CT);
        # wgt_ref (1, CHUNK, O2, WIN*WIN); out_ref (1, CHUNK, O2, CT);
        # win_ref scratch (WIN*WIN, CT).
        def body(r, carry):
            y0 = y0_ref[0, r]
            x0 = x0_ref[0, r]
            for yy in range(WIN):
                row0 = (y0 + yy) * w + x0
                win_ref[yy * WIN:(yy + 1) * WIN, :] = feat_ref[0, pl.ds(row0, WIN), :]
            acc = jnp.dot(wgt_ref[0, r], win_ref[:, :],
                          preferred_element_type=jnp.float32)
            out_ref[0, r] = acc.astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


def _make_bwd_kernel(w: int, chunk: int, nj: int):
    def kernel(y0_ref, x0_ref, wgt_t_ref, dout_ref, dfeat_ref):
        # wgt_t_ref (1, CHUNK, WIN*WIN, O2); dout_ref (1, CHUNK, O2, CT);
        # dfeat_ref (1, H*W, CT) f32, revisited across the roi chunks.
        @pl.when(pl.program_id(1) % nj == 0)
        def _():
            dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

        def body(r, carry):
            y0 = y0_ref[0, r]
            x0 = x0_ref[0, r]
            dwin = jnp.dot(wgt_t_ref[0, r], dout_ref[0, r],
                           preferred_element_type=jnp.float32)  # [WIN*WIN, CT]
            for yy in range(WIN):
                row0 = (y0 + yy) * w + x0
                cur = dfeat_ref[0, pl.ds(row0, WIN), :]
                dfeat_ref[0, pl.ds(row0, WIN), :] = cur + dwin[yy * WIN:(yy + 1) * WIN, :]
            return carry

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pooled(feat2d, y0, x0, wgt, wgt_t, w, chunk, ctile, interpret):
    out, _ = _pooled_fwd(feat2d, y0, x0, wgt, wgt_t, w, chunk, ctile, interpret)
    return out


def _pooled_fwd(feat2d, y0, x0, wgt, wgt_t, w, chunk, ctile, interpret):
    b, hw, c = feat2d.shape
    n, out2 = wgt.shape[1], wgt.shape[2]
    ct = min(ctile, c)
    nj = n // chunk
    grid = (b, (c // ct) * nj)
    out = pl.pallas_call(
        _make_fwd_kernel(w, chunk, out2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i, t: (i, t % nj),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk), lambda i, t: (i, t % nj),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hw, ct), lambda i, t: (i, 0, t // nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, out2, WIN * WIN), lambda i, t: (i, t % nj, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, out2, ct),
                               lambda i, t: (i, t % nj, 0, t // nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, out2, c), feat2d.dtype),
        scratch_shapes=[pltpu.VMEM((WIN * WIN, ct), feat2d.dtype)],
        interpret=interpret,
    )(y0, x0, feat2d, wgt)
    # zero-byte token carrying (hw, c) and feat's dtype for the backward
    token = jnp.zeros((hw, 0, c), feat2d.dtype)
    return out, (y0, x0, wgt_t, token)


def _pooled_bwd(w, chunk, ctile, interpret, res, dout):
    y0, x0, wgt_t, token = res
    b, n = y0.shape
    hw, _, c = token.shape
    out2 = wgt_t.shape[3]
    ct = min(ctile, c)
    nj = n // chunk
    grid = (b, (c // ct) * nj)
    dfeat = pl.pallas_call(
        _make_bwd_kernel(w, chunk, nj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk), lambda i, t: (i, t % nj),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk), lambda i, t: (i, t % nj),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, WIN * WIN, out2),
                         lambda i, t: (i, t % nj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, out2, ct),
                         lambda i, t: (i, t % nj, 0, t // nj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, ct), lambda i, t: (i, 0, t // nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.float32),
        interpret=interpret,
    )(y0, x0, wgt_t, dout)
    import numpy as np
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # int inputs
    return (dfeat.astype(token.dtype), f0(y0), f0(x0),
            jnp.zeros((b, n, out2, WIN * WIN), wgt_t.dtype),
            jnp.zeros_like(wgt_t))


_pooled.defvjp(_pooled_fwd, _pooled_bwd)


def rotated_window_weights(rrois, h, w, out_size, spatial_scale, sampling_ratio,
                           dtype):
    """Per-roi window origin + pooled bin weights.

    rrois [N, 5] -> (y0 [N] int32, x0 [N] int32, wgt [N, out^2, WIN^2]).
    Identical sampling machinery to roi_align_rotated_matmul (same hat
    weights, mmcv border rule, validity fold, s^2 mean), with the sample
    dimension pre-contracted: wgt[bin, cell] = 1/s^2 sum_samples hy*hx.
    """
    n = rrois.shape[0]
    s = sampling_ratio
    ss = out_size * s

    cx = rrois[:, 0] * spatial_scale
    cy = rrois[:, 1] * spatial_scale
    bw = rrois[:, 2] * spatial_scale
    bh = rrois[:, 3] * spatial_scale
    ang = rrois[:, 4]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    offs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    bins = jnp.arange(out_size, dtype=jnp.float32)
    frac = ((bins[:, None] + offs[None, :]) / out_size - 0.5).reshape(-1)  # [ss]

    bx = frac[None, None, :] * bw[:, None, None]
    by = frac[None, :, None] * bh[:, None, None]
    sx = cos[:, None, None] * bx - sin[:, None, None] * by + cx[:, None, None] - 0.5
    sy = sin[:, None, None] * bx + cos[:, None, None] * by + cy[:, None, None] - 0.5

    wy0 = jnp.clip(jnp.floor(cy - WIN / 2), 0, max(h - WIN, 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(cx - WIN / 2), 0, max(w - WIN, 0)).astype(jnp.int32)

    valid = ((sx >= -1.0) & (sx <= w * 1.0) & (sy >= -1.0) & (sy <= h * 1.0))
    ry = jnp.clip(sy - wy0[:, None, None], 0.0, WIN - 1.0)
    rx = jnp.clip(sx - wx0[:, None, None], 0.0, WIN - 1.0)
    ry = jnp.minimum(ry, (h - 1 - wy0)[:, None, None].astype(jnp.float32))
    rx = jnp.minimum(rx, (w - 1 - wx0)[:, None, None].astype(jnp.float32))

    k = jnp.arange(WIN, dtype=jnp.float32)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - k))  # [N, ss, ss, WIN]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - k))
    hy = hy * valid[..., None]

    # contract the s^2 sub-samples into per-bin window weights
    hy5 = hy.reshape(n, out_size, s, out_size, s, WIN)
    hx5 = hx.reshape(n, out_size, s, out_size, s, WIN)
    wgt = jnp.einsum("naubvy,naubvx->nabyx", hy5, hx5) / (s * s)
    wgt = wgt.reshape(n, out_size * out_size, WIN * WIN)
    return wy0, wx0, wgt.astype(dtype)


@partial(jax.jit, static_argnames=("out_size", "spatial_scale", "sampling_ratio",
                                   "chunk", "ctile", "interpret"))
def roi_align_rotated_pallas(
    feat: Array,     # [B, H, W, C]
    rrois: Array,    # [B, N, 5] (cx, cy, w, h, a) image coords
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 2,
    chunk: int = 32,
    ctile: int = 128,
    interpret: bool = False,
) -> Array:
    """Batched rotated RoIAlign via the fused pallas kernel.

    -> [B, N, out, out, C]. Exact vs roi_align_rotated_matmul(window=16)
    to dtype rounding while the rotated sampling grid fits the 16-cell
    (128px at stride 8) window; larger rois clamp identically. Gradients
    flow to `feat` only (rrois are stop-gradiented — every rotated-MIL
    call site pools stop-gradient boxes).
    """
    b, h, w, c = feat.shape
    n = rrois.shape[1]
    rrois = jax.lax.stop_gradient(rrois)

    y0, x0, wgt = jax.vmap(
        lambda rr: rotated_window_weights(rr, h, w, out_size, spatial_scale,
                                          sampling_ratio, feat.dtype)
    )(rrois)

    pad = (-n) % chunk
    if pad:
        y0 = jnp.pad(y0, ((0, 0), (0, pad)))
        x0 = jnp.pad(x0, ((0, 0), (0, pad)))
        wgt = jnp.pad(wgt, ((0, 0), (0, pad), (0, 0), (0, 0)))

    wgt_t = jnp.swapaxes(wgt, 2, 3)  # [B, Np, WIN^2, O^2] (XLA-side transpose)
    feat2d = feat.reshape(b, h * w, c)
    out = _pooled(feat2d, y0, x0, wgt, wgt_t, w, chunk, min(ctile, c), interpret)
    out = out[:, :n].reshape(b, n, out_size, out_size, c)
    return out

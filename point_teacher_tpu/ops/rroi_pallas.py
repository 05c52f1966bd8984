"""Pallas TPU kernel for the rotated RoIAlign MIL hot path.

Reference role: mmcv RoIAlignRotated (OBB_TOD config
`sodaa_fcos_pointteacher_1x.py:73-77`, out_size 7, sample_num 2) on the
rotated MIL bags — the r3 step bisect measured the windowed-XLA pool at
848 ms of the 1195 ms SODA-A phase-1 step (NOTES_r3 "Rotated bottleneck").

Design (tpu-first, not a translation of the CUDA gather kernel):
- Rotated bilinear sampling is not axis-separable, but every per-roi
  output bin is a fixed LINEAR functional of a window feature patch:
    out[bin, c] = sum_{wy, wx} WGT[bin, wy, wx] * F[y0+wy, x0+wx, c]
  with WGT = 1/s^2 * sum_{samples in bin} hat(y)⊗hat(x) — the mmcv border
  rule, the sample validity mask and the s^2 sample mean all fold into the
  precomputed WGT (built caller-side with the exact machinery of
  ops/roi_align.roi_align_rotated_matmul, golden-tested against it).
- The kernel keeps a channel tile of the WHOLE feature map resident in
  VMEM across all roi chunks of an image (grid (B, (C/CT)*NJ) with the
  roi sweep innermost, (k, j) FUSED into one grid dim — the 3-D grid
  hangs on device when C/CT > 1, same Mosaic behaviour the HBB kernel
  documented), assembles each roi's [WIN_Y*WIN_X, CT] window with WIN_Y
  row-group copies (flat row y*Wp+x keeps the x-window contiguous), and
  issues ONE [O^2, WIN_Y*WIN_X] @ [WIN_Y*WIN_X, CT] MXU dot per roi.
- Mosaic requires the dynamic sublane offset of each window load to be
  provably 8-aligned: the feature map's W is padded to a multiple of 8
  caller-side and the x window origin is 8-aligned with a widened
  WIN_X=32 window (coverage is unchanged: [x0, x0+32] always contains
  cx±8 cells). y origins stay free — row0 = (y0+yy)*Wp + x0 is a
  multiple of 8 whenever Wp and x0 are.
- HBM traffic per step: feat once per (image, channel tile) + the pooled
  weights + outputs — the per-roi window gathers and the [N, samples,
  WIN] hat intermediates of the XLA path never leave VMEM.
- f32 inputs contract with Precision.HIGHEST (the MXU's default single
  bf16 pass loses ~1e-2 on f32 data — the exactness tests run f32);
  bf16 inputs use the plain bf16 MXU path with f32 accumulation.

Backward (d/dfeat only; every MIL call site pools stop-gradient boxes —
the public wrapper stop-gradients rrois) mirrors the forward with a
revisited f32 accumulator block:  dF_window += WGT^T @ dout[roi].
The transposed weights are precomputed caller-side (an in-kernel bf16
transpose is a Mosaic relayout the HBB kernel found unsupported; the
f32-only relayout rule is inherited from it).

STATUS (r3, measured on the v5e — NOT the shipped hot path):
- fwd compiles and is correct on hardware (bf16 vs the bf16 windowed
  path: 0.0625 max diff on randn maps = bf16 rounding between the two
  contraction orders) and times ~45 ms per 4800 rois at the SODA-A step
  geometry — only ~par with the XLA windowed w16 path (50 ms): the
  per-roi load->dot chain serializes, and an unrolled double-buffered
  variant intended to pipeline it is wrong on hardware (see kernel note).
- bwd is VMEM-infeasible at the 1200px geometry: the revisited
  (1, H*Wp, 128) f32 accumulator block is double-buffered by pallas ->
  26.7M scoped > 16M. A hybrid pallas-fwd/XLA-bwd lands at parity
  (~85 vs 87 ms fwd+bwd), so mil_stage_rotated keeps the XLA windowed
  path (train/mil.py pool) — same verdict as the HBB fused RoIAlign:
  XLA's program is already at the achievable rate for this op.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

WIN_Y = 16  # y window cells (128px at stride 8 — covers SODA-A bags)
WIN_X = 32  # x window cells; widened so the origin can be 8-aligned
WCELLS = WIN_Y * WIN_X


def _dot_precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _make_fwd_kernel(wp: int, chunk: int, nj: int, precision):
    def kernel(y0_ref, x0_ref, feat_ref, wgt_ref, out_ref, win_ref):
        # y0/x0 SMEM, UNBLOCKED [B, Np] int32 (SMEM blocks must tile by
        # (8, 128); the whole array is tiny) — indexed by program ids;
        # feat_ref VMEM (1, H*Wp, CT); wgt_ref (1, CHUNK, O2, WCELLS);
        # out_ref (1, CHUNK, O2, CT); win_ref scratch (WCELLS, CT).
        bi = pl.program_id(0)
        j = pl.program_id(1) % nj

        # NOTE an unrolled double-buffered variant (overlap roi r+1's window
        # loads with roi r's dot) was tried on hardware: it is NO faster and
        # returns wrong sums on TPU (a pipelining hazard the interpreter
        # does not model) — keep the sequential fori form.
        def body(r, carry):
            y0 = y0_ref[bi, j * chunk + r]
            x0 = x0_ref[bi, j * chunk + r]
            for yy in range(WIN_Y):
                row0 = pl.multiple_of((y0 + yy) * wp + x0, 8)
                win_ref[yy * WIN_X:(yy + 1) * WIN_X, :] = (
                    feat_ref[0, pl.ds(row0, WIN_X), :])
            acc = jnp.dot(wgt_ref[0, r], win_ref[:, :],
                          preferred_element_type=jnp.float32,
                          precision=precision)
            out_ref[0, r] = acc.astype(out_ref.dtype)
            return carry

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


def _make_bwd_kernel(wp: int, chunk: int, nj: int, precision):
    def kernel(y0_ref, x0_ref, wgt_t_ref, dout_ref, dfeat_ref):
        # y0/x0 SMEM unblocked [B, Np] (see _make_fwd_kernel);
        # wgt_t_ref (1, CHUNK, WCELLS, O2); dout_ref (1, CHUNK, O2, CT);
        # dfeat_ref (1, H*Wp, CT) f32, revisited across the roi chunks.
        bi = pl.program_id(0)
        j = pl.program_id(1) % nj

        @pl.when(j == 0)
        def _():
            dfeat_ref[0] = jnp.zeros_like(dfeat_ref[0])

        def body(r, carry):
            y0 = y0_ref[bi, j * chunk + r]
            x0 = x0_ref[bi, j * chunk + r]
            dwin = jnp.dot(wgt_t_ref[0, r],
                           dout_ref[0, r].astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=precision)  # [WCELLS, CT]
            for yy in range(WIN_Y):
                row0 = pl.multiple_of((y0 + yy) * wp + x0, 8)
                cur = dfeat_ref[0, pl.ds(row0, WIN_X), :]
                dfeat_ref[0, pl.ds(row0, WIN_X), :] = (
                    cur + dwin[yy * WIN_X:(yy + 1) * WIN_X, :])
            return carry

        jax.lax.fori_loop(0, chunk, body, 0)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _pooled(feat2d, y0, x0, wgt, wgt_t, wp, chunk, ctile, interpret):
    out, _ = _pooled_fwd(feat2d, y0, x0, wgt, wgt_t, wp, chunk, ctile, interpret)
    return out


def _pooled_fwd(feat2d, y0, x0, wgt, wgt_t, wp, chunk, ctile, interpret):
    b, hwp, c = feat2d.shape
    n, out2 = wgt.shape[1], wgt.shape[2]
    ct = min(ctile, c)
    nj = n // chunk
    grid = (b, (c // ct) * nj)
    out = pl.pallas_call(
        _make_fwd_kernel(wp, chunk, nj, _dot_precision(feat2d.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hwp, ct), lambda i, t: (i, 0, t // nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, out2, WCELLS), lambda i, t: (i, t % nj, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, out2, ct),
                               lambda i, t: (i, t % nj, 0, t // nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, out2, c), feat2d.dtype),
        scratch_shapes=[pltpu.VMEM((WCELLS, ct), feat2d.dtype)],
        interpret=interpret,
    )(y0, x0, feat2d, wgt)
    # zero-byte token carrying (hwp, c) and feat's dtype for the backward
    token = jnp.zeros((hwp, 0, c), feat2d.dtype)
    return out, (y0, x0, wgt_t, token)


def _pooled_bwd(wp, chunk, ctile, interpret, res, dout):
    y0, x0, wgt_t, token = res
    b, n = y0.shape
    hwp, _, c = token.shape
    out2 = wgt_t.shape[3]
    ct = min(ctile, c)
    nj = n // chunk
    grid = (b, (c // ct) * nj)
    dfeat = pl.pallas_call(
        _make_bwd_kernel(wp, chunk, nj, _dot_precision(token.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, WCELLS, out2),
                         lambda i, t: (i, t % nj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, out2, ct),
                         lambda i, t: (i, t % nj, 0, t // nj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hwp, ct), lambda i, t: (i, 0, t // nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hwp, c), jnp.float32),
        interpret=interpret,
    )(y0, x0, wgt_t, dout)
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # int inputs
    return (dfeat.astype(token.dtype), f0(y0), f0(x0),
            jnp.zeros((b, n, out2, WCELLS), wgt_t.dtype),
            jnp.zeros_like(wgt_t))


_pooled.defvjp(_pooled_fwd, _pooled_bwd)


def rotated_window_weights(rrois, h, w, out_size, spatial_scale, sampling_ratio,
                           dtype):
    """Per-roi aligned window origin + pooled bin weights.

    rrois [N, 5] -> (y0 [N] int32, x0 [N] int32 8-aligned,
    wgt [N, out^2, WCELLS]). Identical sampling machinery to
    roi_align_rotated_matmul (same hat weights, mmcv border rule against
    the UNPADDED w, validity fold, s^2 mean), with the sample dimension
    pre-contracted: wgt[bin, cell] = 1/s^2 sum_samples hy*hx.
    """
    n = rrois.shape[0]
    s = sampling_ratio
    wp = -(-w // 8) * 8  # padded width the kernel indexes over

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

    wy0 = jnp.clip(jnp.floor(cy - WIN_Y / 2), 0, max(h - WIN_Y, 0)).astype(jnp.int32)
    # x origin: 8-aligned, window WIN_X=32 still covers cx±8 cells
    wx0 = jnp.clip(jnp.floor(cx - 8.0), 0, max(wp - WIN_X, 0)).astype(jnp.int32)
    wx0 = (wx0 // 8) * 8

    valid = ((sx >= -1.0) & (sx <= w * 1.0) & (sy >= -1.0) & (sy <= h * 1.0))
    ry = jnp.clip(sy - wy0[:, None, None], 0.0, WIN_Y - 1.0)
    rx = jnp.clip(sx - wx0[:, None, None], 0.0, WIN_X - 1.0)
    ry = jnp.minimum(ry, (h - 1 - wy0)[:, None, None].astype(jnp.float32))
    rx = jnp.minimum(rx, (w - 1 - wx0)[:, None, None].astype(jnp.float32))

    ky = jnp.arange(WIN_Y, dtype=jnp.float32)
    kx = jnp.arange(WIN_X, dtype=jnp.float32)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - ky))  # [N, ss, ss, WIN_Y]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - kx))  # [N, ss, ss, WIN_X]
    hy = hy * valid[..., None]

    # contract the s^2 sub-samples into per-bin window weights
    hy5 = hy.reshape(n, out_size, s, out_size, s, WIN_Y)
    hx5 = hx.reshape(n, out_size, s, out_size, s, WIN_X)
    wgt = jnp.einsum("naubvy,naubvx->nabyx", hy5, hx5) / (s * s)
    wgt = wgt.reshape(n, out_size * out_size, WCELLS)
    return wy0, wx0, wgt.astype(dtype)


@partial(jax.jit, static_argnames=("out_size", "spatial_scale", "sampling_ratio",
                                   "chunk", "ctile", "interpret"))
def roi_align_rotated_pallas(
    feat: Array,     # [B, H, W, C]
    rrois: Array,    # [B, N, 5] (cx, cy, w, h, a) image coords
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 2,
    chunk: int = 16,
    ctile: int = 128,
    interpret: bool = False,
) -> Array:
    """Batched rotated RoIAlign via the fused pallas kernel.

    -> [B, N, out, out, C]. Exact vs roi_align_rotated_matmul(window=16)
    to dtype rounding while the rotated sampling grid fits the 16-cell
    (128px at stride 8) y-window / cx±8-cell x-coverage; larger rois
    clamp identically. Gradients flow to `feat` only (rrois are
    stop-gradiented — every rotated-MIL call site pools stop-gradient
    boxes).
    """
    b, h, w, c = feat.shape
    n = rrois.shape[1]
    rrois = jax.lax.stop_gradient(rrois)
    wp = -(-w // 8) * 8

    y0, x0, wgt = jax.vmap(
        lambda rr: rotated_window_weights(rr, h, w, out_size, spatial_scale,
                                          sampling_ratio, feat.dtype)
    )(rrois)

    pad = (-n) % chunk
    if pad:
        y0 = jnp.pad(y0, ((0, 0), (0, pad)))
        x0 = jnp.pad(x0, ((0, 0), (0, pad)))
        wgt = jnp.pad(wgt, ((0, 0), (0, pad), (0, 0), (0, 0)))

    wgt_t = jnp.swapaxes(wgt, 2, 3)  # [B, Np, WCELLS, O^2] (XLA-side transpose)
    if wp != w:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    feat2d = feat.reshape(b, h * wp, c)
    out = _pooled(feat2d, y0, x0, wgt, wgt_t, wp, chunk, min(ctile, c), interpret)
    out = out[:, :n].reshape(b, n, out_size, out_size, c)
    return out

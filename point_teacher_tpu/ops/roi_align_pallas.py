"""Pallas TPU kernel for the separable-matmul RoIAlign hot path.

The XLA two-einsum form (ops/roi_align.py roi_align_matmul) materialises a
[N, out, W, C] intermediate in HBM — ~360 KB per roi, ~44 GB of HBM traffic
per train step at the MIL geometry, which the step bisect showed dominating
the MIL cost. This kernel fuses the two contractions so the intermediate
lives in VMEM:

  grid (B, N/CHUNK); per image the full [H, W, C] bf16 feature map (~5 MB at
  100x100x256) stays resident in VMEM across the roi chunks; per chunk:
    tmp = Wy[CHUNK*out, H] @ F[H, W*C]           (one MXU matmul, VMEM out)
    out[n] = Wx[n] @ tmp[n]^T-arranged           (per-roi small MXU matmuls)

HBM traffic drops to feat (once per image) + weights + outputs.

The backward (d/dfeat only — roi weights are built from stop-gradient boxes
on every call site) mirrors it with a revisited-output accumulation:
    dtmp[n] = dout[n] (contract out_j with Wx[n])
    dfeat  += Wy^T[H, CHUNK*out] @ dtmp[CHUNK*out, W*C]

Weights (wy [N,out,H], wx [N,out,W]) are computed by the caller with the
exact mmcv-adaptive machinery of ops/roi_align.py, so numerics match
roi_align_matmul to bf16 rounding (golden-tested in
tests/test_roi_align_pallas.py via interpret mode).

STATUS (r3): compiles and is EXACT on the Mosaic TPU compiler (f32 fwd
bit-exact vs roi_align_matmul, grad to 2e-6; bf16 fwd bit-exact vs the bf16
matmul path). Two restructures unlocked it:
- the bf16 (CHUNK, O, H) -> (CHUNK*O, H) weight reshape is done by the
  CALLER in XLA (Mosaic rejects that cast under 16-row bf16 sublane tiling
  at O=7); every remaining in-kernel relayout runs in the r3 toolchain's
  supported set;
- the grid is channel-tiled (B, C/CTILE, N/CHUNK) with the roi sweep
  innermost, bounding VMEM blocks (the full-C feature block double-buffered
  blew the 16MB scoped limit at the 800px geometry).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _fwd_kernel(feat_ref, wy_ref, wx_ref, out_ref):
    # feat_ref [1, H, W, C]; wy_ref [1, CHUNK*O, H] (pre-flattened by the
    # caller — a bf16 in-kernel (CHUNK, O, H) -> (CHUNK*O, H) reshape is a
    # shape cast Mosaic rejects at O=7); wx_ref [1, CHUNK, O, W];
    # out_ref [1, CHUNK, O, O, C].
    # Layout rule learned on Mosaic: keep every VALUE-level relayout
    # (reshape/swapaxes across the tiled dims) in f32 — bf16 tiling
    # (16-row sublanes) rejects the odd-sized casts; bf16 enters only as
    # direct matmul input dtype.
    h = feat_ref.shape[1]
    w = feat_ref.shape[2]
    c = feat_ref.shape[3]
    chunk = wx_ref.shape[1]
    o = wx_ref.shape[2]

    f = feat_ref[0].reshape(h, w * c)
    # one MXU matmul (bf16 inputs, f32 accumulate); tmp STAYS f32 — bf16
    # relayouts (16-row sublane tiling over 7-row groups) blow the Mosaic
    # kernel stack; with the channel-tiled grid the f32 intermediate fits
    inter_t = jnp.float32
    tmp = jnp.dot(wy_ref[0], f, preferred_element_type=jnp.float32)
    tmp = tmp.reshape(chunk, o, w, c)

    # static unrolled loop: Mosaic has no dynamic_slice on values
    for n in range(chunk):
        # [O, W, C] -> [W, O*C] so the roi's x-contraction is one 2D dot;
        # the dot yields [O(j), O(i), C] — swap back to [i, j, c]
        t_n = tmp[n].swapaxes(0, 1).reshape(w, o * c)
        on = jnp.dot(wx_ref[0, n].astype(inter_t), t_n,
                     preferred_element_type=jnp.float32)
        on = on.reshape(o, o, c).swapaxes(0, 1)
        out_ref[0, n] = on.astype(out_ref.dtype)


def _make_bwd_kernel(nj: int):
    def _bwd_kernel(wy_ref, wx_ref, dout_ref, dfeat_ref):
        # wy_ref [1, CHUNK*O, H] (pre-flattened); wx_ref [1, CHUNK, O, W];
        # dout_ref [1, CHUNK, O, O, C]; dfeat_ref [1, H, W, C] (f32,
        # revisited across the roi chunks — zero-init at j = t % nj == 0).
        # Same Mosaic layout rule as _fwd_kernel: relayouts in f32 only.
        h = dfeat_ref.shape[1]
        w = dfeat_ref.shape[2]
        c = dfeat_ref.shape[3]
        chunk = wx_ref.shape[1]
        o = wx_ref.shape[2]

        @pl.when(pl.program_id(1) % nj == 0)
        def _():
            dfeat_ref[0] = jnp.zeros((h, w, c), dfeat_ref.dtype)

        # build dtmp as [CHUNK*O(i), W*C] then one accumulation matmul:
        # dtmp[n][i, w, c] = sum_j wx[n, j, w] * dout[n, i, j, c]
        # (static unrolled loop: Mosaic has no dynamic_slice on values)
        parts = []
        for n in range(chunk):
            d_n = dout_ref[0, n].astype(jnp.float32)    # [O(i), O(j), C]
            # contract j: [O(i)*C, O(j)] @ [O(j), W] -> [O(i)*C, W]
            d_icj = d_n.swapaxes(1, 2).reshape(o * c, o)
            wx_n = wx_ref[0, n].astype(jnp.float32)
            t = jnp.dot(d_icj, wx_n, preferred_element_type=jnp.float32)
            # [O(i), C, W] -> [O(i), W, C] -> [O(i), W*C]
            parts.append(t.reshape(o, c, w).swapaxes(1, 2).reshape(o, w * c))
        dtmp = jnp.concatenate(parts, axis=0)

        wy_t = wy_ref[0].astype(jnp.float32).swapaxes(0, 1)  # [H, CHUNK*O]
        upd = jnp.dot(wy_t, dtmp, preferred_element_type=jnp.float32)
        dfeat_ref[0] = dfeat_ref[0] + upd.reshape(h, w, c).astype(dfeat_ref.dtype)

    return _bwd_kernel


def _pad_rois(x, chunk):
    n = x.shape[1]
    pad = (-n) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    return x


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pooled(feat, wy, wx, chunk, interpret):
    return _pooled_fwd(feat, wy, wx, chunk, interpret)[0]


def _run_fwd(feat, wy, wx, chunk, interpret, ctile=128):
    # wy [B, N*O, H] pre-flattened; wx [B, N, O, W].
    # Channel-tiled grid (B, C/CTILE, N/CHUNK): the y/x contractions are
    # per-channel independent, so tiling C bounds the VMEM-resident feature
    # block (the full [H, W, C] block double-buffered blows the 16MB scoped
    # limit at the 800px geometry). The roi sweep is the INNERMOST grid dim
    # so the feature tile stays resident across all roi chunks of an image.
    b, h, w, c = feat.shape
    n = wx.shape[1]
    o = wx.shape[2]
    ct = min(ctile, c)
    nj = n // chunk
    # (k, j) fused into ONE grid dim (k = channel tile outer, j = roi chunk
    # inner): the equivalent 3-D grid hangs on device when c//ct > 1 (Mosaic
    # runtime; single-tile 3-D runs fine), while 2-D grids with index-map
    # arithmetic behave.
    grid = (b, (c // ct) * nj)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, ct), lambda i, t: (i, 0, 0, t // nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk * o, h), lambda i, t: (i, t % nj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, o, w), lambda i, t: (i, t % nj, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, o, o, ct),
                               lambda i, t: (i, t % nj, 0, 0, t // nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, o, o, c), feat.dtype),
        interpret=interpret,
    )(feat, wy, wx)


def _pooled_fwd(feat, wy, wx, chunk, interpret):
    out = _run_fwd(feat, wy, wx, chunk, interpret)
    # residuals must be arrays: carry feat's dtype/channels via an empty token
    token = jnp.zeros((0, feat.shape[3]), feat.dtype)
    return out, (wy, wx, token)


def _pooled_bwd(chunk, interpret, res, dout):
    wy, wx, token = res
    b = wy.shape[0]
    h = wy.shape[2]
    w = wx.shape[3]
    c = token.shape[1]
    feat_dtype = token.dtype
    n = wx.shape[1]
    o = wx.shape[2]
    ct = min(128, c)
    nj = n // chunk
    grid = (b, (c // ct) * nj)  # fused (k, j) — see _run_fwd
    dfeat = pl.pallas_call(
        _make_bwd_kernel(nj),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk * o, h), lambda i, t: (i, t % nj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, o, w), lambda i, t: (i, t % nj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, o, o, ct), lambda i, t: (i, t % nj, 0, 0, t // nj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, ct), lambda i, t: (i, 0, 0, t // nj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        interpret=interpret,
    )(wy, wx, dout)
    return dfeat.astype(feat_dtype), jnp.zeros_like(wy), jnp.zeros_like(wx)


_pooled.defvjp(_pooled_fwd, _pooled_bwd)


def roi_align_batched_pallas(
    feat: Array,    # [B, H, W, C]
    rois: Array,    # [B, N, 4] xyxy image coords
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 8,
    interpret: bool = False,
) -> Array:
    """Batched RoIAlign via the fused pallas kernel -> [B, N, out, out, C].

    Gradients flow to `feat` only (every MIL call site pools stop-gradient
    boxes). Numerics: identical hat weights to roi_align_matmul; contraction
    in bf16 with f32 MXU accumulation (same as the XLA bf16 path).
    """
    from .roi_align import _axis_weights

    b, h, w, c = feat.shape
    n = rois.shape[1]

    def weights_one(rr):
        x1 = rr[:, 0] * spatial_scale
        y1 = rr[:, 1] * spatial_scale
        x2 = rr[:, 2] * spatial_scale
        y2 = rr[:, 3] * spatial_scale
        bin_w = jnp.maximum(x2 - x1, 1e-6) / out_size
        bin_h = jnp.maximum(y2 - y1, 1e-6) / out_size
        wy = _axis_weights(y1, bin_h, out_size, h, sampling_ratio, jnp.float32)
        wx = _axis_weights(x1, bin_w, out_size, w, sampling_ratio, jnp.float32)
        return wy.astype(feat.dtype), wx.astype(feat.dtype)

    wy, wx = jax.vmap(weights_one)(rois)
    wy = _pad_rois(wy, chunk)
    wx = _pad_rois(wx, chunk)
    # flatten wy outside the kernel (XLA reshape is free; the in-kernel bf16
    # (CHUNK, O, H) -> (CHUNK*O, H) cast is one Mosaic rejects at O=7)
    wy = wy.reshape(b, -1, wy.shape[-1])
    out = _pooled(feat, wy, wx, chunk, interpret)
    return out[:, :n]

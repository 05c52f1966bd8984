"""RoIAlign (horizontal + rotated) as XLA gather kernels.

Replaces mmcv-full's CUDA `RoIAlign` / `RoIAlignRotated` (the reference builds
them via SingleRoIExtractor, config aitodv2_point_teacher_0%.py:70-74 and
rotated_fcos_head_p2rb_ts.py:112-120). Single feature level (stride 8),
output 7x7 — the only configuration on the Point-Teacher path.

Design notes (TPU):
- All sample coordinates are computed analytically for a static (out, out, s, s)
  grid, then resolved with one batched bilinear gather over the flattened
  feature map. Gathers are HBM-bandwidth bound; rois are processed in chunks
  to bound live memory. A Pallas double-buffered variant can slot in later
  behind the same signature.
- The HBB extractor uses mmcv's default `aligned=True, sampling_ratio=0`
  (adaptive: ceil(roi_extent/out) samples per axis). Dynamic sample counts
  would be dynamic shapes, but in the matmul formulation the sample count only
  changes the hat WEIGHTS, never a shape — so `sampling_ratio=0` here computes
  masked sample grids of up to `ADAPTIVE_SMAX` per-roi samples and reproduces
  mmcv adaptive semantics exactly for bins up to ADAPTIVE_SMAX cells
  (56*ADAPTIVE_SMAX px rois at stride 8; larger rois clamp to ADAPTIVE_SMAX
  samples). The rotated extractor is configured with `sample_num=2`
  (rotated_fcos_head_p2rb_ts.py:114-118), so the rotated kernels keep a fixed
  ratio of 2 — exact parity.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _bilinear_gather(feat_flat: Array, h: int, w: int, x: Array, y: Array) -> Array:
    """feat_flat [H*W, C]; x, y [...] sample coords (pixel units) -> [..., C]."""
    # mmcv border rule: samples with y < -1 or y > H (resp. x) contribute 0.
    valid = (x >= -1.0) & (x <= w * 1.0) & (y >= -1.0) & (y <= h * 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    lx = x - x0
    ly = y - y0
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    def g(yy, xx):
        return jnp.take(feat_flat, yy * w + xx, axis=0)

    out = (
        g(y0i, x0i) * ((1 - ly) * (1 - lx))[..., None]
        + g(y0i, x1i) * ((1 - ly) * lx)[..., None]
        + g(y1i, x0i) * (ly * (1 - lx))[..., None]
        + g(y1i, x1i) * (ly * lx)[..., None]
    )
    return jnp.where(valid[..., None], out, 0.0)


def _hat_weights(coords: Array, size: int) -> Array:
    """Bilinear interpolation as dense 'hat' weights over an axis.

    coords [..., S] absolute (continuous) feature coords -> [..., size] weights
    averaged over the S samples. Matches the gather-based bilinear exactly:
    mmcv border rule (|coord| beyond [-1, size] contributes 0), clamp-to-border
    inside that range.
    """
    valid = (coords >= -1.0) & (coords <= size * 1.0)
    c = jnp.clip(coords, 0.0, size - 1.0)
    k = jnp.arange(size, dtype=coords.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - k))  # [..., S, size]
    w = w * valid[..., None]
    return w.mean(axis=-2)  # average the S samples of each bin


ADAPTIVE_SMAX = 4  # exact adaptive sampling for bins up to 4 cells (224px rois)


def _axis_weights(start: Array, bin_sz: Array, out_size: int, size: int,
                  sampling_ratio: int, dtype) -> Array:
    """Per-roi hat-weight matrix [N, out_size, size] for one axis.

    sampling_ratio > 0: fixed sample count (all rois share the grid).
    sampling_ratio == 0: mmcv adaptive — sn = ceil(bin cells) per roi, realised
    as a masked [ADAPTIVE_SMAX] sample grid (weights change, shapes don't).
    """
    if sampling_ratio > 0:
        s = sampling_ratio
        offs = (jnp.arange(s, dtype=dtype) + 0.5) / s  # [s]
        bins = jnp.arange(out_size, dtype=dtype)
        frac = bins[:, None] + offs[None, :]  # [out, s]
        coords = start[:, None, None] + frac[None] * bin_sz[:, None, None] - 0.5
        return _hat_weights(coords, size)
    smax = ADAPTIVE_SMAX
    # mmcv: roi_bin_grid = ceil(roi_extent / pooled_size) = ceil(bin cells)
    sn = jnp.clip(jnp.ceil(bin_sz), 1, smax).astype(dtype)  # [N]
    k = jnp.arange(smax, dtype=dtype)
    offs = (k[None, :] + 0.5) / sn[:, None]  # [N, smax]
    mask = k[None, :] < sn[:, None]  # [N, smax]
    bins = jnp.arange(out_size, dtype=dtype)
    frac = bins[None, :, None] + offs[:, None, :]  # [N, out, smax]
    coords = start[:, None, None] + frac * bin_sz[:, None, None] - 0.5
    valid = (coords >= -1.0) & (coords <= size * 1.0) & mask[:, None, :]
    c = jnp.clip(coords, 0.0, size - 1.0)
    cells = jnp.arange(size, dtype=dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - cells))  # [N, out, smax, size]
    w = w * valid[..., None]
    return w.sum(axis=-2) / sn[:, None, None]


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale", "chunk"))
def roi_align_matmul(
    feat: Array,
    rois: Array,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 256,
) -> Array:
    """RoIAlign as two separable MXU matmuls (TPU hot path).

    Bilinear sampling is axis-separable, so pooling a roi is
    out = Wy @ feat @ Wx^T with per-roi 'hat' weight matrices [out, H]/[out, W]
    that fold the per-bin sample average. Numerically identical to the
    gather-based version (same border rules) but runs on the MXU instead of
    scattering gathers across HBM: ~50 GFLOP for 2500 rois on a 100x100x256
    map vs ~2M row-gathers. sampling_ratio=0 (default) reproduces mmcv's
    adaptive sampling exactly (see module docstring).
    """
    h, w, c = feat.shape
    n = rois.shape[0]

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1e-6) / out_size
    bin_h = jnp.maximum(y2 - y1, 1e-6) / out_size

    # Hat weights are built in f32 (sample-coordinate math), then the big
    # einsums run in the FEATURE dtype with f32 accumulation: for the bf16
    # training features this is the native MXU mode (4x the f32 rate) and
    # loses only the bf16 rounding of the weights — the pooled output is cast
    # to bf16 for the MIL towers immediately anyway. f32 features (tests,
    # oracle comparisons) keep exact f32 end to end.
    wy = _axis_weights(y1, bin_h, out_size, h, sampling_ratio, jnp.float32)  # [N, out, H]
    wx = _axis_weights(x1, bin_w, out_size, w, sampling_ratio, jnp.float32)  # [N, out, W]
    wy = wy.astype(feat.dtype)
    wx = wx.astype(feat.dtype)

    feat_c = feat

    # The [chunk, out, W, C] intermediate dominates HBM traffic (the einsums
    # are bandwidth- not FLOP-bound at this geometry): keep it in the feature
    # dtype. bf16 features: bf16 intermediate (MXU still accumulates each dot
    # in f32 before rounding); f32 features (tests/oracle): exact f32 chain.
    inter_t = jnp.float32 if feat.dtype == jnp.float32 else feat.dtype

    def one_chunk(args):
        wy_c, wx_c = args
        tmp = jnp.einsum("nih,hwc->niwc", wy_c, feat_c,
                         preferred_element_type=inter_t)
        return jnp.einsum("njw,niwc->nijc", wx_c, tmp,
                          preferred_element_type=inter_t)

    if n <= chunk:
        return one_chunk((wy, wx)).astype(feat.dtype)
    pad = (-n) % chunk
    wy_p = jnp.pad(wy, ((0, pad), (0, 0), (0, 0))).reshape(-1, chunk, out_size, h)
    wx_p = jnp.pad(wx, ((0, pad), (0, 0), (0, 0))).reshape(-1, chunk, out_size, w)
    out = jax.lax.map(one_chunk, (wy_p, wx_p))
    return out.reshape(-1, out_size, out_size, c)[:n].astype(feat.dtype)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale",
                                   "chunk", "window"))
def roi_align_window_matmul(
    feat: Array,
    rois: Array,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 128,
    window: int = 32,
) -> Array:
    """RoIAlign as separable matmuls against a per-roi `window`^2 feature
    patch instead of the full map.

    The full-map form contracts every roi against all H*W cells (~38 MFLOP per
    roi on a 100x100x256 map) although a roi's hat weights are nonzero only
    over its own extent; at the MIL geometry (7.7k rois/image) that was ~4.6
    TFLOP per train step of zeros. Windowing keeps the math identical while
    the roi's sample support fits the window: the adaptive sample grid spans
    at most out_size*ADAPTIVE_SMAX = 28 cells (224px at stride 8) plus one
    border cell each side — window=32 covers it, so every roi the full-map
    version pooled exactly is pooled exactly here too. Larger rois clamp
    their outer samples to the window edge (the same flavour of clamp the
    ADAPTIVE_SMAX cap already applies).

    MEASURED (v5p-class chip, B=8 bench geometry): 4x SLOWER end-to-end than
    roi_align_matmul — the per-roi dynamic-slice window gather and its
    scatter-add transpose serialize on TPU, dwarfing the FLOP savings. Kept
    as a reference implementation (and for gather-friendly backends); the
    training path uses the full-map matmul.
    """
    h, w, c = feat.shape
    n = rois.shape[0]
    window = min(window, h, w)

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    bin_w = jnp.maximum(x2 - x1, 1e-6) / out_size
    bin_h = jnp.maximum(y2 - y1, 1e-6) / out_size

    # window origin: one cell before the roi start (hat support), clamped
    wy0 = jnp.clip(jnp.floor(y1 - 0.5), 0, max(h - window, 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(x1 - 0.5), 0, max(w - window, 0)).astype(jnp.int32)

    def axis_rel_weights(start, bin_sz, w0, size):
        """[N, out, window] hat weights in window-relative coordinates."""
        smax = ADAPTIVE_SMAX
        if sampling_ratio > 0:
            sn = jnp.full(start.shape, float(sampling_ratio), jnp.float32)
            smax = sampling_ratio
        else:
            sn = jnp.clip(jnp.ceil(bin_sz), 1, smax).astype(jnp.float32)
        k = jnp.arange(smax, dtype=jnp.float32)
        offs = (k[None, :] + 0.5) / sn[:, None]
        mask = k[None, :] < sn[:, None]
        bins = jnp.arange(out_size, dtype=jnp.float32)
        coords = (start[:, None, None]
                  + (bins[None, :, None] + offs[:, None, :]) * bin_sz[:, None, None]
                  - 0.5)
        # mmcv border rule vs the TRUE map, then clamp into window coverage
        valid = (coords >= -1.0) & (coords <= size * 1.0) & mask[:, None, :]
        rel = jnp.clip(coords - w0[:, None, None].astype(jnp.float32),
                       0.0, window - 1.0)
        rel = jnp.minimum(rel, (size - 1 - w0)[:, None, None].astype(jnp.float32))
        cells = jnp.arange(window, dtype=jnp.float32)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - cells))
        wgt = wgt * valid[..., None]
        return (wgt.sum(axis=-2) / sn[:, None, None]).astype(feat.dtype)

    wy = axis_rel_weights(y1, bin_h, wy0, h)  # [N, out, window]
    wx = axis_rel_weights(x1, bin_w, wx0, w)

    def one_chunk(args):
        wy0_c, wx0_c, wy_c, wx_c = args

        def extract(y0, x0):
            return jax.lax.dynamic_slice(feat, (y0, x0, 0), (window, window, c))

        win = jax.vmap(extract)(wy0_c, wx0_c)  # [Nc, window, window, C]
        tmp = jnp.einsum("niy,nyxc->nixc", wy_c, win,
                         preferred_element_type=jnp.float32 if
                         feat.dtype == jnp.float32 else feat.dtype)
        return jnp.einsum("njx,nixc->nijc", wx_c, tmp,
                          preferred_element_type=jnp.float32)

    if n <= chunk:
        return one_chunk((wy0, wx0, wy, wx)).astype(feat.dtype)
    pad = (-n) % chunk
    wy0_p = jnp.pad(wy0, (0, pad)).reshape(-1, chunk)
    wx0_p = jnp.pad(wx0, (0, pad)).reshape(-1, chunk)
    wy_p = jnp.pad(wy, ((0, pad), (0, 0), (0, 0))).reshape(-1, chunk, out_size, window)
    wx_p = jnp.pad(wx, ((0, pad), (0, 0), (0, 0))).reshape(-1, chunk, out_size, window)
    out = jax.lax.map(one_chunk, (wy0_p, wx0_p, wy_p, wx_p))
    return out.reshape(-1, out_size, out_size, c)[:n].astype(feat.dtype)


def _axis_rel_weights(start, bin_sz, w0, out_size, size, window,
                      sampling_ratio, dtype):
    """Window-relative hat weights [..., out_size, window] for one axis.

    `start`/`bin_sz` are [...]-shaped roi starts / bin sizes (feature cells);
    `w0` is the (integer) window origin, broadcastable against them. mmcv
    border rule is applied against the TRUE map (`size`), then coordinates are
    clamped into the window's coverage (and to the real feature border inside
    it) — identical semantics to roi_align_window_matmul."""
    smax = ADAPTIVE_SMAX
    if sampling_ratio > 0:
        sn = jnp.full(start.shape, float(sampling_ratio), jnp.float32)
        smax = sampling_ratio
    else:
        sn = jnp.clip(jnp.ceil(bin_sz), 1, smax).astype(jnp.float32)
    k = jnp.arange(smax, dtype=jnp.float32)
    offs = (k + 0.5) / sn[..., None]                      # [..., smax]
    mask = k < sn[..., None]
    bins = jnp.arange(out_size, dtype=jnp.float32)
    coords = (start[..., None, None]
              + (bins[:, None] + offs[..., None, :]) * bin_sz[..., None, None]
              - 0.5)                                      # [..., out, smax]
    valid = (coords >= -1.0) & (coords <= size * 1.0) & mask[..., None, :]
    w0f = w0[..., None, None].astype(jnp.float32)
    rel = jnp.clip(coords - w0f, 0.0, window - 1.0)
    rel = jnp.minimum(rel, size - 1 - w0f)
    cells = jnp.arange(window, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., None] - cells))
    wgt = wgt * valid[..., None]
    return (wgt.sum(axis=-2) / sn[..., None, None]).astype(dtype)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale",
                                   "chunk", "window"))
def roi_align_grouped(
    feat: Array,      # [H, W, C]
    rois: Array,      # [G, U, 4] xyxy image coords
    centers: Array,   # [G, 2] (cx, cy) image coords — shared window origin
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 32,
    window: int = 16,
) -> Array:
    """RoIAlign for GROUP-structured rois: one shared `window`^2 feature patch
    per group, separable matmuls for all U members against it.

    The MIL bags are groups by construction (core/proposals.py
    fine_proposals: every bag member shares the reference box's centre, only
    w/h are ratio-scaled / shake-shifted by fractions of the box size), so one
    window per GROUP replaces one gather per ROI. Measured on the v5e, the
    per-roi window/full-map paths are GATHER-bound (~8.5 us per dynamic-slice
    window, ~15 GB/s effective — NOTES_r3 gather race); grouping cuts the
    gather count by U (25x on the shipped configs) and gives the member
    contraction a tall MXU M dimension (U*out rows vs out).

    Exactness: identical hat-weight math to roi_align_matmul; a member whose
    sample grid escapes the group window clamps to the window border (the
    same rule roi_align_window_matmul applies, asserted against the shipped
    bag geometry in tests). Returns [G, U, out, out, C].
    """
    h, w, c = feat.shape
    g, u = rois.shape[:2]
    window = min(window, h, w)

    x1 = rois[..., 0] * spatial_scale  # [G, U]
    y1 = rois[..., 1] * spatial_scale
    bin_w = jnp.maximum((rois[..., 2] - rois[..., 0]) * spatial_scale, 1e-6) / out_size
    bin_h = jnp.maximum((rois[..., 3] - rois[..., 1]) * spatial_scale, 1e-6) / out_size

    cx = centers[:, 0] * spatial_scale
    cy = centers[:, 1] * spatial_scale
    wy0 = jnp.clip(jnp.floor(cy - window / 2), 0, max(h - window, 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(cx - window / 2), 0, max(w - window, 0)).astype(jnp.int32)

    wy = _axis_rel_weights(y1, bin_h, wy0[:, None], out_size, h, window,
                           sampling_ratio, feat.dtype)  # [G, U, out, window]
    wx = _axis_rel_weights(x1, bin_w, wx0[:, None], out_size, w, window,
                           sampling_ratio, feat.dtype)

    inter_t = jnp.float32 if feat.dtype == jnp.float32 else feat.dtype

    def one_chunk(args):
        wy0_c, wx0_c, wy_c, wx_c = args

        def extract(yo, xo):
            return jax.lax.dynamic_slice(feat, (yo, xo, 0), (window, window, c))

        win = jax.vmap(extract)(wy0_c, wx0_c)  # [cg, window, window, C]
        tmp = jnp.einsum("guiy,gyxc->guixc", wy_c, win,
                         preferred_element_type=inter_t)
        return jnp.einsum("gujx,guixc->guijc", wx_c, tmp,
                          preferred_element_type=jnp.float32)

    if g <= chunk:
        return one_chunk((wy0, wx0, wy, wx)).astype(feat.dtype)
    pad = (-g) % chunk
    wy0_p = jnp.pad(wy0, (0, pad)).reshape(-1, chunk)
    wx0_p = jnp.pad(wx0, (0, pad)).reshape(-1, chunk)
    wy_p = jnp.pad(wy, ((0, pad),) + ((0, 0),) * 3).reshape(-1, chunk, u, out_size, window)
    wx_p = jnp.pad(wx, ((0, pad),) + ((0, 0),) * 3).reshape(-1, chunk, u, out_size, window)
    out = jax.lax.map(one_chunk, (wy0_p, wx0_p, wy_p, wx_p))
    return out.reshape(-1, u, out_size, out_size, c)[:g].astype(feat.dtype)


@partial(jax.jit, static_argnames=("window", "spatial_scale"))
def extract_group_windows(
    feat: Array,      # [H, W, C]
    centers: Array,   # [G, 2] (cx, cy) image coords
    window: int = 32,
    spatial_scale: float = 1.0 / 8,
):
    """One `window`^2 feature patch per group, centred on `centers` (clamped
    inside the map). Returns (win [G, window, window, C], wy0 [G], wx0 [G]).

    Factored out of roi_align_grouped so ONE window gather can serve BOTH
    grouped pools of a MIL stage (reg bags on the jittered boxes, cls bags on
    the DN-refined boxes — train/mil.py): the dynamic-slice gathers and their
    scatter-add transpose are the measured cost of the grouped pool (NOTES_r3
    gather race; the einsums are ~20x cheaper), and the refined bags stay
    near the input box centre by construction (the denoising loss pulls every
    member toward its reference box), so the same window covers both."""
    h, w, c = feat.shape
    window = min(window, h, w)
    cx = centers[:, 0] * spatial_scale
    cy = centers[:, 1] * spatial_scale
    wy0 = jnp.clip(jnp.floor(cy - window / 2), 0, max(h - window, 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(cx - window / 2), 0, max(w - window, 0)).astype(jnp.int32)

    def extract(yo, xo):
        return jax.lax.dynamic_slice(feat, (yo, xo, 0), (window, window, c))

    return jax.vmap(extract)(wy0, wx0), wy0, wx0


@partial(jax.jit, static_argnames=("feat_hw", "out_size", "sampling_ratio",
                                   "spatial_scale", "chunk"))
def roi_align_grouped_from_windows(
    win: Array,       # [G, window, window, C] from extract_group_windows
    wy0: Array,
    wx0: Array,
    rois: Array,      # [G, U, 4] xyxy image coords
    feat_hw,          # (H, W) of the TRUE map (border rules)
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 32,
) -> Array:
    """roi_align_grouped's contraction against pre-extracted windows —
    identical hat-weight math / border rules, so (extract_group_windows +
    this) == roi_align_grouped exactly. Returns [G, U, out, out, C]."""
    h, w = feat_hw
    g, u = rois.shape[:2]
    window = win.shape[1]

    x1 = rois[..., 0] * spatial_scale
    y1 = rois[..., 1] * spatial_scale
    bin_w = jnp.maximum((rois[..., 2] - rois[..., 0]) * spatial_scale, 1e-6) / out_size
    bin_h = jnp.maximum((rois[..., 3] - rois[..., 1]) * spatial_scale, 1e-6) / out_size

    wy = _axis_rel_weights(y1, bin_h, wy0[:, None], out_size, h, window,
                           sampling_ratio, win.dtype)  # [G, U, out, window]
    wx = _axis_rel_weights(x1, bin_w, wx0[:, None], out_size, w, window,
                           sampling_ratio, win.dtype)

    inter_t = jnp.float32 if win.dtype == jnp.float32 else win.dtype

    def one_chunk(args):
        win_c, wy_c, wx_c = args
        tmp = jnp.einsum("guiy,gyxc->guixc", wy_c, win_c,
                         preferred_element_type=inter_t)
        return jnp.einsum("gujx,guixc->guijc", wx_c, tmp,
                          preferred_element_type=jnp.float32)

    c = win.shape[-1]
    if g <= chunk:
        return one_chunk((win, wy, wx)).astype(win.dtype)
    pad = (-g) % chunk
    win_p = jnp.pad(win, ((0, pad),) + ((0, 0),) * 3).reshape(
        -1, chunk, window, window, c)
    wy_p = jnp.pad(wy, ((0, pad),) + ((0, 0),) * 3).reshape(-1, chunk, u, out_size, window)
    wx_p = jnp.pad(wx, ((0, pad),) + ((0, 0),) * 3).reshape(-1, chunk, u, out_size, window)
    out = jax.lax.map(one_chunk, (win_p, wy_p, wx_p))
    return out.reshape(-1, u, out_size, out_size, c)[:g].astype(win.dtype)


@partial(jax.jit, static_argnames=("feat_hw", "out_size", "sampling_ratio",
                                   "spatial_scale", "chunk"))
def roi_align_rotated_grouped_from_windows(
    win: Array,       # [G, window, window, C]
    wy0: Array,
    wx0: Array,
    rrois: Array,     # [G, U, 5]
    feat_hw,
    out_size: int = 7,
    sampling_ratio: int = 2,
    spatial_scale: float = 1.0 / 8,
    chunk: int = 16,
) -> Array:
    """roi_align_rotated_grouped's contraction against pre-extracted windows
    (same sample math / border rules). Returns [G, U, out, out, C]."""
    h, w = feat_hw
    g, u = rrois.shape[:2]
    window = win.shape[1]
    s = sampling_ratio
    ss = out_size * s
    dt = win.dtype

    rcx = rrois[..., 0] * spatial_scale
    rcy = rrois[..., 1] * spatial_scale
    bw = rrois[..., 2] * spatial_scale
    bh = rrois[..., 3] * spatial_scale
    ang = rrois[..., 4]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    offs = (jnp.arange(s, dtype=dt) + 0.5) / s
    bins = jnp.arange(out_size, dtype=dt)
    frac = ((bins[:, None] + offs[None, :]) / out_size - 0.5).reshape(-1)  # [ss]

    bx = frac[None, None, None, :] * bw[..., None, None]
    by = frac[None, None, :, None] * bh[..., None, None]
    sx = cos[..., None, None] * bx - sin[..., None, None] * by + rcx[..., None, None] - 0.5
    sy = sin[..., None, None] * bx + cos[..., None, None] * by + rcy[..., None, None] - 0.5

    valid = (sx >= -1.0) & (sx <= w * 1.0) & (sy >= -1.0) & (sy <= h * 1.0)
    ry = jnp.clip(sy - wy0[:, None, None, None], 0.0, window - 1.0)
    rx = jnp.clip(sx - wx0[:, None, None, None], 0.0, window - 1.0)
    ry = jnp.minimum(ry, (h - 1 - wy0)[:, None, None, None].astype(dt))
    rx = jnp.minimum(rx, (w - 1 - wx0)[:, None, None, None].astype(dt))

    k = jnp.arange(window, dtype=dt)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - k))  # [G, U, ss, ss, W]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - k))
    hy = hy * valid[..., None]

    mm_dtype = dt if dt == jnp.bfloat16 else jnp.float32
    c = win.shape[-1]

    def one_chunk(args):
        win_c, hy_c, hx_c = args
        cg = win_c.shape[0]
        wgt = (hy_c[..., :, None] * hx_c[..., None, :]).reshape(
            cg, u * ss * ss, window * window).astype(mm_dtype)
        out = jnp.einsum("gsp,gpc->gsc", wgt,
                         win_c.astype(mm_dtype).reshape(cg, window * window, c),
                         preferred_element_type=jnp.float32)
        return out.reshape(cg, u, out_size, s, out_size, s, c).mean(axis=(3, 5))

    if g <= chunk:
        return one_chunk((win, hy, hx)).astype(dt)
    pad = (-g) % chunk
    win_p = jnp.pad(win, ((0, pad),) + ((0, 0),) * 3).reshape(
        -1, chunk, window, window, c)
    hy_p = jnp.pad(hy, ((0, pad),) + ((0, 0),) * 4).reshape(-1, chunk, u, ss, ss, window)
    hx_p = jnp.pad(hx, ((0, pad),) + ((0, 0),) * 4).reshape(-1, chunk, u, ss, ss, window)
    out = jax.lax.map(one_chunk, (win_p, hy_p, hx_p))
    return out.reshape(-1, u, out_size, out_size, c)[:g].astype(dt)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale",
                                   "chunk", "window"))
def roi_align_rotated_grouped(
    feat: Array,      # [H, W, C]
    rrois: Array,     # [G, U, 5] (cx, cy, w, h, a) image coords
    centers: Array,   # [G, 2] (cx, cy) image coords — shared window origin
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 2,
    chunk: int = 16,
    window: int = 16,
) -> Array:
    """Rotated RoIAlign with one shared window per GROUP of co-located rois
    (the rotated MIL bags: same centre, ratio-scaled w/h, carried angle).

    Per-sample weights factor as hat(y) (x) hat(x) exactly as in
    roi_align_rotated_matmul; the member contraction becomes one
    [U*ss*ss, window^2] x [window^2, C] MXU dot per group instead of a
    [ss*ss, window^2] dot per roi, and the window gather count drops by U.
    Border/validity rules identical to roi_align_rotated_matmul.
    Returns [G, U, out, out, C].
    """
    h, w, c = feat.shape
    g, u = rrois.shape[:2]
    s = sampling_ratio
    ss = out_size * s
    window = min(window, h, w)

    rcx = rrois[..., 0] * spatial_scale  # [G, U]
    rcy = rrois[..., 1] * spatial_scale
    bw = rrois[..., 2] * spatial_scale
    bh = rrois[..., 3] * spatial_scale
    ang = rrois[..., 4]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    offs = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s
    bins = jnp.arange(out_size, dtype=feat.dtype)
    frac = ((bins[:, None] + offs[None, :]) / out_size - 0.5).reshape(-1)  # [ss]

    # absolute sample coords [G, U, ss(y), ss(x)]
    bx = frac[None, None, None, :] * bw[..., None, None]
    by = frac[None, None, :, None] * bh[..., None, None]
    sx = cos[..., None, None] * bx - sin[..., None, None] * by + rcx[..., None, None] - 0.5
    sy = sin[..., None, None] * bx + cos[..., None, None] * by + rcy[..., None, None] - 0.5

    gx = centers[:, 0] * spatial_scale
    gy = centers[:, 1] * spatial_scale
    wy0 = jnp.clip(jnp.floor(gy - window / 2), 0, max(h - window, 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(gx - window / 2), 0, max(w - window, 0)).astype(jnp.int32)

    valid = (sx >= -1.0) & (sx <= w * 1.0) & (sy >= -1.0) & (sy <= h * 1.0)
    ry = jnp.clip(sy - wy0[:, None, None, None], 0.0, window - 1.0)
    rx = jnp.clip(sx - wx0[:, None, None, None], 0.0, window - 1.0)
    ry = jnp.minimum(ry, (h - 1 - wy0)[:, None, None, None].astype(feat.dtype))
    rx = jnp.minimum(rx, (w - 1 - wx0)[:, None, None, None].astype(feat.dtype))

    k = jnp.arange(window, dtype=feat.dtype)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - k))  # [G, U, ss, ss, W]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - k))
    hy = hy * valid[..., None]

    mm_dtype = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    feat_c = feat.astype(mm_dtype)

    def one_chunk(args):
        wy0_c, wx0_c, hy_c, hx_c = args
        cg = wy0_c.shape[0]

        def extract(yo, xo):
            return jax.lax.dynamic_slice(feat_c, (yo, xo, 0), (window, window, c))

        win = jax.vmap(extract)(wy0_c, wx0_c)  # [cg, W, W, C]
        wgt = (hy_c[..., :, None] * hx_c[..., None, :]).reshape(
            cg, u * ss * ss, window * window).astype(mm_dtype)
        out = jnp.einsum("gsp,gpc->gsc", wgt, win.reshape(cg, window * window, c),
                         preferred_element_type=jnp.float32)
        return out.reshape(cg, u, out_size, s, out_size, s, c).mean(axis=(3, 5))

    if g <= chunk:
        return one_chunk((wy0, wx0, hy, hx)).astype(feat.dtype)
    pad = (-g) % chunk
    wy0_p = jnp.pad(wy0, (0, pad)).reshape(-1, chunk)
    wx0_p = jnp.pad(wx0, (0, pad)).reshape(-1, chunk)
    hy_p = jnp.pad(hy, ((0, pad),) + ((0, 0),) * 4).reshape(-1, chunk, u, ss, ss, window)
    hx_p = jnp.pad(hx, ((0, pad),) + ((0, 0),) * 4).reshape(-1, chunk, u, ss, ss, window)
    out = jax.lax.map(one_chunk, (wy0_p, wx0_p, hy_p, hx_p))
    return out.reshape(-1, u, out_size, out_size, c)[:g].astype(feat.dtype)


# The MXU formulation is the default RoIAlign on the training path.
roi_align = roi_align_matmul


def roi_align_batched(
    feat: Array,    # [B, H, W, C]
    rois: Array,    # [B, N, 4] xyxy image coords
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 256,
    use_pallas: bool | None = None,
) -> Array:
    """Batched RoIAlign dispatcher -> [B, N, out, out, C].

    use_pallas=True routes to the fused VMEM-resident kernel
    (ops/roi_align_pallas.py) — bit-exact vs this path on TPU (f32 and
    bf16), but MEASURED SLOWER at the MIL geometry (B=8, 7.7k rois/img,
    100x100x256 bf16: fwd 168-194 ms vs 102 ms for the XLA two-einsum path;
    fwd+bwd 305 vs 178 ms — r3 ledger in NOTES_r3.md). The per-roi second
    contraction runs at M=7 MXU utilisation and its relayouts dominate;
    XLA's fusion of the einsum chain wins. Default stays False."""
    import jax as _jax

    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        from .roi_align_pallas import roi_align_batched_pallas

        return roi_align_batched_pallas(
            feat, rois, out_size=out_size, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, chunk=8,
        )
    return _jax.vmap(
        lambda f, r: roi_align_matmul(
            f, r, out_size=out_size, spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio, chunk=chunk,
        )
    )(feat, rois)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale", "chunk"))
def roi_align_gather(
    feat: Array,
    rois: Array,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 0,
    chunk: int = 1024,
) -> Array:
    """feat [H, W, C] (single image, NHWC-sliced), rois [N, 4] xyxy in image
    coords -> [N, out, out, C]. Reference gather implementation (golden oracle
    for roi_align_matmul; also fine on CPU). sampling_ratio=0 = mmcv adaptive
    via a masked ADAPTIVE_SMAX sample grid."""
    h, w, c = feat.shape
    feat_flat = feat.reshape(h * w, c)
    n = rois.shape[0]
    s = sampling_ratio if sampling_ratio > 0 else ADAPTIVE_SMAX
    adaptive = sampling_ratio <= 0

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    # aligned=True: half-pixel offset applied to sample coords below
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size
    if adaptive:
        sn_x = jnp.clip(jnp.ceil(bin_w), 1, s).astype(feat.dtype)
        sn_y = jnp.clip(jnp.ceil(bin_h), 1, s).astype(feat.dtype)
    else:
        sn_x = sn_y = jnp.full((n,), float(s), feat.dtype)

    k = jnp.arange(s, dtype=feat.dtype)
    bins = jnp.arange(out_size, dtype=feat.dtype)  # [out]

    def one_chunk(rois_chunk):
        cx1, cbw, csx = rois_chunk[:, 0], rois_chunk[:, 1], rois_chunk[:, 4]
        cy1, cbh, csy = rois_chunk[:, 2], rois_chunk[:, 3], rois_chunk[:, 5]
        nc = rois_chunk.shape[0]
        # per-roi sample offsets and masks [Nc, s]
        offs_x = (k[None, :] + 0.5) / csx[:, None]
        offs_y = (k[None, :] + 0.5) / csy[:, None]
        mask_x = k[None, :] < csx[:, None]
        mask_y = k[None, :] < csy[:, None]
        # sample coords [Nc, out, s]
        sx = cx1[:, None, None] + (bins[None, :, None] + offs_x[:, None, :]) * cbw[:, None, None] - 0.5
        sy = cy1[:, None, None] + (bins[None, :, None] + offs_y[:, None, :]) * cbh[:, None, None] - 0.5
        # broadcast to [Nc, out, s, out, s]
        sx_b = jnp.broadcast_to(sx[:, None, None, :, :], (nc, out_size, s, out_size, s))
        sy_b = jnp.broadcast_to(sy[:, :, :, None, None], (nc, out_size, s, out_size, s))
        vals = _bilinear_gather(feat_flat, h, w, sx_b, sy_b)  # [Nc, out, s, out, s, C]
        m = (mask_y[:, None, :, None, None] & mask_x[:, None, None, None, :])
        vals = vals * m[..., None]
        return vals.sum(axis=(2, 4)) / (csy * csx)[:, None, None, None]

    packed = jnp.stack([x1, bin_w, y1, bin_h, sn_x, sn_y], axis=-1)
    if n <= chunk:
        return one_chunk(packed)
    # pad to a multiple of chunk and scan (pad sn with 1 to avoid div-by-zero)
    pad = (-n) % chunk
    packed_p = jnp.pad(packed, ((0, pad), (0, 0)),
                       constant_values=1.0)
    blocks = packed_p.reshape(-1, chunk, 6)
    out = jax.lax.map(one_chunk, blocks)
    return out.reshape(-1, out_size, out_size, c)[:n]


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale",
                                   "chunk", "window"))
def roi_align_rotated_matmul(
    feat: Array,
    rrois: Array,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 2,
    chunk: int = 64,
    window: int = 32,
) -> Array:
    """Rotated RoIAlign as windowed MXU matmuls (OBB hot path).

    Rotated sampling is not axis-separable over bins, but each SAMPLE's
    bilinear weight factorises as hat(y)*hat(x). Extract a `window`^2 feature
    patch around each roi (contiguous dynamic-slice gather), then contract the
    per-sample hat weights against it with two einsums. Exact while the roi's
    rotated sampling grid fits the window (window*8px = 256px covers SODA-A
    objects by a wide margin); larger rois clamp to the window border —
    matching the behaviour of sampling a clamped grid.
    """
    h, w, c = feat.shape
    n = rrois.shape[0]
    s = sampling_ratio
    ss = out_size * s  # samples per axis
    window = min(window, h, w)  # small feature maps: window covers everything

    cx = rrois[:, 0] * spatial_scale
    cy = rrois[:, 1] * spatial_scale
    bw = rrois[:, 2] * spatial_scale
    bh = rrois[:, 3] * spatial_scale
    ang = rrois[:, 4]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    offs = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s
    bins = jnp.arange(out_size, dtype=feat.dtype)
    frac = ((bins[:, None] + offs[None, :]) / out_size - 0.5).reshape(-1)  # [ss]

    # absolute sample coords [N, ss(y-bin), ss(x-bin)]
    bx = frac[None, None, :] * bw[:, None, None]
    by = frac[None, :, None] * bh[:, None, None]
    sx = cos[:, None, None] * bx - sin[:, None, None] * by + cx[:, None, None] - 0.5
    sy = sin[:, None, None] * bx + cos[:, None, None] * by + cy[:, None, None] - 0.5

    # window origin (top-left feature cell), clamped inside the map
    wy0 = jnp.clip(jnp.floor(cy - window / 2), 0, max(h - window, 0)).astype(jnp.int32)
    wx0 = jnp.clip(jnp.floor(cx - window / 2), 0, max(w - window, 0)).astype(jnp.int32)

    # mmcv border rule, then clamp into the window's coverage
    valid = ((sx >= -1.0) & (sx <= w * 1.0) & (sy >= -1.0) & (sy <= h * 1.0))
    ry = jnp.clip(sy - wy0[:, None, None], 0.0, window - 1.0)
    rx = jnp.clip(sx - wx0[:, None, None], 0.0, window - 1.0)
    # also clamp to the true feature border inside the window
    ry = jnp.minimum(ry, (h - 1 - wy0)[:, None, None].astype(feat.dtype))
    rx = jnp.minimum(rx, (w - 1 - wx0)[:, None, None].astype(feat.dtype))

    k = jnp.arange(window, dtype=feat.dtype)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - k))  # [N, ss, ss, W]
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - k))
    hy = hy * valid[..., None]

    # bf16 fast path: when the feature map is already bf16 (the training
    # step's MIL features), contract in bf16 with f32 accumulation — same
    # policy as the HBB roi_align bf16 matmul path. f32 inputs keep the
    # exact f32 contraction (golden tests run there).
    mm_dtype = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    feat_c = feat.astype(mm_dtype)

    def one_chunk(args):
        wy0_c, wx0_c, hy_c, hx_c = args
        nc = wy0_c.shape[0]

        def extract(y0, x0):
            return jax.lax.dynamic_slice(feat_c, (y0, x0, 0), (window, window, c))

        win = jax.vmap(extract)(wy0_c, wx0_c)  # [Nc, W, W, C]
        # per-sample 2D weight = hat(y) (x) hat(x): [Nc, ss*ss, W*W],
        # then one batched [samples, W*W] @ [W*W, C] matmul per roi (MXU)
        wgt = (hy_c[..., :, None] * hx_c[..., None, :]).reshape(
            nc, ss * ss, window * window).astype(mm_dtype)
        out = jnp.einsum("nsp,npc->nsc", wgt, win.reshape(nc, window * window, c),
                         preferred_element_type=jnp.float32)
        out = out.reshape(nc, out_size, s, out_size, s, c).mean(axis=(2, 4))
        return out

    if n <= chunk:
        return one_chunk((wy0, wx0, hy, hx)).astype(feat.dtype)
    pad = (-n) % chunk
    wy0_p = jnp.pad(wy0, (0, pad)).reshape(-1, chunk)
    wx0_p = jnp.pad(wx0, (0, pad)).reshape(-1, chunk)
    hy_p = jnp.pad(hy, ((0, pad), (0, 0), (0, 0), (0, 0))).reshape(-1, chunk, ss, ss, window)
    hx_p = jnp.pad(hx, ((0, pad), (0, 0), (0, 0), (0, 0))).reshape(-1, chunk, ss, ss, window)
    out = jax.lax.map(one_chunk, (wy0_p, wx0_p, hy_p, hx_p))
    return out.reshape(-1, out_size, out_size, c)[:n].astype(feat.dtype)


@partial(jax.jit, static_argnames=("out_size", "sampling_ratio", "spatial_scale", "chunk"))
def roi_align_rotated(
    feat: Array,
    rrois: Array,
    out_size: int = 7,
    spatial_scale: float = 1.0 / 8,
    sampling_ratio: int = 2,
    chunk: int = 1024,
) -> Array:
    """feat [H, W, C], rrois [N, 5] (cx, cy, w, h, a) in image coords (clockwise
    convention as in mmcv RoIAlignRotated(clockwise=True)) -> [N, out, out, C]."""
    h, w, c = feat.shape
    feat_flat = feat.reshape(h * w, c)
    n = rrois.shape[0]
    s = sampling_ratio

    offs = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s
    bins = jnp.arange(out_size, dtype=feat.dtype)
    frac = (bins[:, None] + offs[None, :]) / out_size - 0.5  # [-0.5, 0.5) box frame

    def one_chunk(rr):
        cx = rr[:, 0] * spatial_scale
        cy = rr[:, 1] * spatial_scale
        bw = rr[:, 2] * spatial_scale
        bh = rr[:, 3] * spatial_scale
        ang = rr[:, 4]
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        nc = rr.shape[0]
        fx = jnp.broadcast_to(frac[None, None, None, :, :], (nc, out_size, s, out_size, s))
        fy = jnp.broadcast_to(frac[None, :, :, None, None], (nc, out_size, s, out_size, s))
        bx = fx * bw[:, None, None, None, None]
        by = fy * bh[:, None, None, None, None]
        sx = cos[:, None, None, None, None] * bx - sin[:, None, None, None, None] * by + cx[:, None, None, None, None] - 0.5
        sy = sin[:, None, None, None, None] * bx + cos[:, None, None, None, None] * by + cy[:, None, None, None, None] - 0.5
        vals = _bilinear_gather(feat_flat, h, w, sx, sy)
        return vals.mean(axis=(2, 4))

    if n <= chunk:
        return one_chunk(rrois)
    pad = (-n) % chunk
    rr_p = jnp.pad(rrois, ((0, pad), (0, 0)))
    blocks = rr_p.reshape(-1, chunk, 5)
    out = jax.lax.map(one_chunk, blocks)
    return out.reshape(-1, out_size, out_size, c)[:n]

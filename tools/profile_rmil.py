"""Rotated-MIL component pricing at the bench geometry (SODA-A 1200px, B=4):
window extraction, grouped rotated pools (reg + cls), per-roi negative pool,
towers, rbox_iou diagnostics — the sub-split of rbisect's 138 ms MIL item.
Tunnel protocol: single scalar fetch, subtract the printed null round trip.
Run: python tools/profile_rmil.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timeit(fn, *args, n=6, grad_wrt=None):
    if grad_wrt is None:
        def total(*a):
            leaves = jax.tree_util.tree_leaves(fn(*a))
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        wrapped = jax.jit(total)
    else:
        def total(*a):
            def scalar(x):
                aa = list(a)
                aa[grad_wrt] = x
                leaves = jax.tree_util.tree_leaves(fn(*aa))
                return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            g = jax.grad(scalar)(a[grad_wrt])
            return jnp.sum(g.astype(jnp.float32))
        wrapped = jax.jit(total)
    float(wrapped(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(wrapped(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=1200)
    args = ap.parse_args()

    from point_teacher_tpu.core.proposals import fine_proposals, negative_proposals
    from point_teacher_tpu.ops.boxes import cxcywh_to_xyxy, xyxy_to_cxcywh
    from point_teacher_tpu.ops.roi_align import (
        extract_group_windows, roi_align_rotated_grouped_from_windows,
        roi_align_rotated_matmul)
    from point_teacher_tpu.ops.rotated import rbox_iou
    from point_teacher_tpu.train.config import config_sodaa

    b, s = args.batch, args.img
    cfg = config_sodaa(batch_size=b).normalized()
    g = cfg.num_training_burninstep1
    fine = cfg.fine_proposal_cfg[0]
    ext_c = cfg.fine_proposal_extensive_cfg[0]
    hw = (s, s)
    window = cfg.mil_pool_window_rotated
    r = np.random.RandomState(0)
    feat = jnp.asarray(r.randn(b, s // 8, s // 8, 256), jnp.bfloat16)
    cxy = r.uniform(60, s - 60, (b, g, 2))
    wh = r.uniform(8, 40, (b, g, 2))
    ang = r.uniform(-np.pi / 2, np.pi / 2, (b, g, 1))
    rb = jnp.asarray(np.concatenate([cxy, wh, ang], -1), jnp.float32)
    print(f"geometry: B={b} G={g} window={window}")

    t0 = timeit(lambda x: x + 1.0, jnp.float32(1.0))
    print(f"null round trip:             {t0:8.1f} ms")

    def gen(rb5):
        hbb = cxcywh_to_xyxy(rb5[..., :4])
        props, pv = jax.vmap(lambda q: fine_proposals(q, fine, hw))(hbb)
        u1 = props.shape[2]
        ext, ev = jax.vmap(lambda q: fine_proposals(q.reshape(-1, 4), ext_c, hw))(props)
        u2 = ext.shape[2]
        ext = ext.reshape(b, g, u1, u2, 4)
        a1 = jnp.broadcast_to(rb5[..., None, 4], (b, g, u1))
        ea = jnp.broadcast_to(a1[..., None], (b, g, u1, u2))
        return jnp.concatenate([xyxy_to_cxcywh(ext), ea[..., None]], -1)

    ext_rb = jax.jit(gen)(rb)
    u = ext_rb.shape[2] * ext_rb.shape[3]
    print(f"proposal gen:                {timeit(gen, rb):8.1f} ms  U={u}")

    gctr = rb[..., :2]

    def extract(f, c_):
        return jax.vmap(lambda ff, cc: extract_group_windows(ff, cc, window=window))(f, c_)

    print(f"window extract fwd:          {timeit(extract, feat, gctr):8.1f} ms")
    print(f"window extract fwd+bwd:      {timeit(extract, feat, gctr, grad_wrt=0):8.1f} ms")

    win, wy0, wx0 = jax.jit(extract)(feat, gctr)
    rr = ext_rb.reshape(b, g, u, 5)
    fhw = (feat.shape[1], feat.shape[2])

    def gpool(w_, y0, x0, rrois):
        return jax.vmap(lambda a1, a2, a3, a4: roi_align_rotated_grouped_from_windows(
            a1, a2, a3, a4, fhw, out_size=7, spatial_scale=1.0 / 8,
            chunk=a4.shape[0]))(w_, y0, x0, rrois)

    print(f"grouped pool fwd:            {timeit(gpool, win, wy0, wx0, rr):8.1f} ms")
    print(f"grouped pool fwd+bwd(win):   {timeit(gpool, win, wy0, wx0, rr, grad_wrt=0):8.1f} ms")

    def full_pool(f, c_, rrois):
        w_, y0, x0 = extract(f, c_)
        return gpool(w_, y0, x0, rrois)

    print(f"extract+pool fwd+bwd(feat):  {timeit(full_pool, feat, gctr, rr, grad_wrt=0):8.1f} ms")

    nn_ = fine.gen_num_neg
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    hbb = cxcywh_to_xyxy(rb[..., :4])
    props, pv = jax.jit(jax.vmap(lambda q: fine_proposals(q, fine, hw)))(hbb)

    def negpool(f, p, v):
        neg, neg_w = jax.vmap(
            lambda k, pp, vv: negative_proposals(k, pp, vv, nn_, hw)
        )(keys, p, v)
        neg_rb = jnp.concatenate(
            [xyxy_to_cxcywh(neg), jnp.zeros((*neg.shape[:-1], 1), neg.dtype)], -1)
        return jax.vmap(lambda ff, rrr: roi_align_rotated_matmul(
            ff, rrr, out_size=7, spatial_scale=1.0 / 8, chunk=256,
            window=window))(f, neg_rb)

    pvv = pv & jnp.ones((b, g, 1), bool)
    print(f"neg pool ({nn_}/img) fwd:       {timeit(negpool, feat, props, pvv):8.1f} ms")
    print(f"neg pool fwd+bwd(feat):      {timeit(negpool, feat, props, pvv, grad_wrt=0):8.1f} ms")

    def diag(rr5):
        flat = rr5.reshape(-1, 5)
        return rbox_iou(flat, flat, aligned=True)

    print(f"rbox_iou diag ({b*g*u} pairs): {timeit(diag, ext_rb):8.1f} ms")


if __name__ == "__main__":
    main()

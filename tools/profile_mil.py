"""MIL-stage sub-part timings at the bench geometry (tunnel protocol:
single scalar fetch, subtract the printed null round trip).
Run: python tools/profile_mil.py --batch 8
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


def timeit(fn, *args, n=6):
    def total(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(l.astype(jnp.float32)) if l.dtype != bool else jnp.sum(l)
                   for l in leaves)
    wrapped = jax.jit(total)
    float(wrapped(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(wrapped(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=800)
    args = ap.parse_args()

    from point_teacher_tpu.core.proposals import fine_proposals
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.ops.roi_align import roi_align
    from point_teacher_tpu.train.config import PointTeacherConfig

    s, b = args.img, args.batch
    cfg = PointTeacherConfig(img_size=s, batch_size=b).normalized()
    g = cfg.num_training_burninstep1
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, frozen_stages=1, dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    r = np.random.RandomState(0)
    feat = jnp.asarray(r.randn(b, s // 8, s // 8, 256), jnp.bfloat16)
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), jnp.float32)

    fine = cfg.fine_proposal_cfg[0]
    ext_c = cfg.fine_proposal_extensive_cfg[0]
    hw = (s, s)
    print(f"geometry: B={b} G={g}")

    t0 = timeit(lambda x: x + 1.0, jnp.float32(1.0))
    print(f"null round trip:           {t0*1e3:8.1f} ms")

    def gen(bx):
        props, pv = jax.vmap(lambda q: fine_proposals(q, fine, hw))(bx)
        u1 = props.shape[2]
        ext, ev = jax.vmap(lambda q: fine_proposals(q.reshape(-1, 4), ext_c, hw))(props)
        return ext, ev
    ext, ev = jax.jit(gen)(boxes)
    print(f"proposal gen:              {timeit(gen, boxes)*1e3:8.1f} ms   ext={ext.shape}")

    rois = ext.reshape(b, -1, 4)
    n = rois.shape[1]
    print(f"rois per image: {n}")

    def pool(f, rr):
        return jax.vmap(lambda fi, ri: roi_align(fi, ri, out_size=7,
                                                 spatial_scale=1.0 / 8, chunk=128))(f, rr)
    pooled = jax.jit(pool)(feat, rois)
    print(f"roi_align fwd:             {timeit(pool, feat, rois)*1e3:8.1f} ms")

    def pool_grad(f, rr):
        return jax.grad(lambda ff: pool(ff, rr).astype(jnp.float32).sum())(f)
    print(f"roi_align fwd+bwd(feat):   {timeit(pool_grad, feat, rois)*1e3:8.1f} ms")

    def reg(p, pf):
        return model.apply(p, pf.reshape(b * n, 7, 7, 256), 0,
                           method=StudentFCOS.mil_regress)
    print(f"reg tower fwd:             {timeit(reg, params, pooled)*1e3:8.1f} ms")

    def reg_grad(p, pf):
        return jax.grad(lambda q: reg(q, pf).astype(jnp.float32).sum())(p)
    print(f"reg tower fwd+bwd:         {timeit(reg_grad, params, pooled)*1e3:8.1f} ms")

    def cls(p, pf):
        c1, c2 = model.apply(p, pf.reshape(b * n, 7, 7, 256), 0,
                             method=StudentFCOS.mil_classify)
        return c1.sum() + c2.sum()
    print(f"cls tower fwd:             {timeit(cls, params, pooled)*1e3:8.1f} ms")
    def cls_grad(p, pf):
        return jax.grad(lambda q: cls(q, pf))(p)
    print(f"cls tower fwd+bwd:         {timeit(cls_grad, params, pooled)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

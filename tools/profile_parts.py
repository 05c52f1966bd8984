"""Per-component wall times of the phase-1 step at the bench geometry.

Each subgraph is its own jit with a single fetched-scalar sync (see
profile_dense.py for the tunnel measurement protocol). The null-program
round trip (~30 ms) is printed first; subtract it from every row.
Run: python tools/profile_parts.py --batch 8
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

    from point_teacher_tpu.core.augment import AugBatch, strong_augment
    from point_teacher_tpu.core.pseudo import generate_pseudo_boxes
    from point_teacher_tpu.core.synthetic import generate_black_paper_batch
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.ops.boxes import grid_points
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.dense_losses import pseudo_branch_loss, syn_branch_loss
    from point_teacher_tpu.train.steps import _flatten_head, _run_mil_stages

    s, b = args.img, args.batch
    cfg = PointTeacherConfig(img_size=s, batch_size=b).normalized()
    g = cfg.max_gt
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, frozen_stages=1, dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), jnp.float32)
    pts2 = jnp.asarray(cxy, jnp.float32)
    labels = jnp.asarray(r.randint(0, 8, (b, g)), jnp.int32)
    valid = jnp.ones((b, g), bool)
    points = grid_points(s // 8, s // 8, 8)
    feat = jnp.asarray(r.randn(b, s // 8, s // 8, 256), jnp.bfloat16)
    nt = cfg.num_training_burninstep1

    t0 = timeit(lambda x: x + 1.0, jnp.float32(1.0))
    print(f"null round trip:          {t0*1e3:8.1f} ms")

    def syn(k, i, bx, v):
        o, sb, srb, sv = generate_black_paper_batch(k, i, bx, v, cfg.syn_cfg,
                                                    fill_value=cfg.syn_fill_value)
        order = jnp.argsort(~sv, axis=-1, stable=True)
        sb = jnp.take_along_axis(sb, order[..., None], axis=1)
        sv = jnp.take_along_axis(sv, order, axis=1)
        return o, sb, sv
    print(f"syn-gen+compact:          {timeit(syn, rng, img, boxes, valid)*1e3:8.1f} ms")

    def teacher_pseudo(p, i):
        outs, _ = model.apply(p, i)
        cls_t, bbox_t, _ = _flatten_head(outs)
        return jax.vmap(
            lambda cl, bp, gp, gl, gv, gb: generate_pseudo_boxes(
                points, cl, bp, gp, gl, gv, gb, cfg.filter_score, cfg.fuse_assigner)
        )(cls_t, bbox_t, pts2, labels, valid, boxes)
    print(f"teacher fwd + pseudo:     {timeit(teacher_pseudo, params, img)*1e3:8.1f} ms")

    def aug(k):
        a = strong_augment(k, AugBatch(img, pts2, valid, pts2, boxes, valid))
        return a.image, a.gt_points
    print(f"strong augment:           {timeit(aug, rng)*1e3:8.1f} ms")

    def mil_syn(p):
        m = {}
        _, loss = _run_mil_stages(model, p, feat, boxes[:, :nt],
                                  jnp.zeros_like(labels[:, :nt]), valid[:, :nt],
                                  boxes[:, :nt], cfg, rng, (s, s), False, m)
        return loss
    print(f"grad MIL syn (reg only):  {timeit(jax.grad(mil_syn), params)*1e3:8.1f} ms")

    def mil_ori(p):
        m = {}
        _, loss = _run_mil_stages(model, p, feat, boxes[:, :nt], labels[:, :nt],
                                  valid[:, :nt], boxes[:, :nt], cfg, rng, (s, s),
                                  True, m)
        return loss
    print(f"grad MIL ori (full):      {timeit(jax.grad(mil_ori), params)*1e3:8.1f} ms")

    def dense3(p):
        img_all = jnp.concatenate([img, img, img], axis=0)
        outs, feat_ = model.apply(p, img_all)
        cls_f, bb_f, ct_f = _flatten_head(outs)
        lb, lc = syn_branch_loss(cls_f[:b], bb_f[:b], ct_f[:b], points,
                                 boxes, valid, cfg.dense)
        l1, l2, l3 = pseudo_branch_loss(cls_f[2*b:], bb_f[2*b:], ct_f[2*b:], points,
                                        pts2, labels, valid, boxes, valid, cfg.dense)
        return lb + lc + l1 + feat_.astype(jnp.float32).sum() * 0.0
    print(f"grad dense 3B + losses:   {timeit(jax.grad(dense3), params)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

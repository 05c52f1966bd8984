"""Decompose phase-1 train-step cost into its pieces (TPU timing harness).

Analog of the reference's tools/analysis_tools/benchmark.py + profiling.py,
used to find which subgraph dominates the step.
"""
import argparse
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=6, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--gt", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from point_teacher_tpu.core.synthetic import generate_black_paper_batch
    from point_teacher_tpu.core.pseudo import generate_pseudo_boxes
    from point_teacher_tpu.core.augment import AugBatch, strong_augment
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.ops.boxes import grid_points
    from point_teacher_tpu.ops.roi_align import roi_align
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.steps import _flatten_head

    cfg = PointTeacherConfig(img_size=args.img, max_gt=args.gt, batch_size=args.batch)
    b, s, g = args.batch, args.img, args.gt
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), dtype=jnp.float32)
    labels = jnp.asarray(r.randint(0, 8, (b, g)), dtype=jnp.int32)
    valid = jnp.ones((b, g), bool)
    points = grid_points(s // 8, s // 8, 8)

    # 1. backbone fwd
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t = timeit(fwd, params, img)
    print(f"student fwd (B={b}):            {t*1e3:8.1f} ms")

    # 2. backbone fwd+bwd
    def loss1(p, x):
        (c, bb, ct), f = model.apply(p, x)
        return (c.sum() + bb.sum() + ct.sum() + f.sum()).astype(jnp.float32)
    g1 = jax.jit(jax.grad(loss1))
    t = timeit(g1, params, img)
    print(f"student fwd+bwd (B={b}):        {t*1e3:8.1f} ms")

    # 3. synthetic generation
    syn = jax.jit(lambda k, i, bx, v: generate_black_paper_batch(k, i, bx, v, cfg.syn_cfg))
    t = timeit(syn, rng, img, boxes, valid)
    print(f"black-paper synthesis:          {t*1e3:8.1f} ms")

    # 4. teacher pseudo
    (c, bb, ct), _ = fwd(params, img)
    cls_f = c.reshape(b, -1, 8)
    bb_f = bb.reshape(b, -1, 4)
    ps = jax.jit(jax.vmap(lambda cl, bp, gp, gl, gv, gb: generate_pseudo_boxes(
        points, cl, bp, gp, gl, gv, gb, 0.0, cfg.fuse_assigner)))
    ctr_pts = jnp.asarray(np.stack([cxy, cxy], 0)[0])[None].repeat(b, 0) if False else \
        jnp.asarray(cxy, dtype=jnp.float32)
    t = timeit(ps, cls_f, bb_f, ctr_pts, labels, valid, boxes)
    print(f"pseudo-box generation (fuse):   {t*1e3:8.1f} ms")

    # 5. strong aug
    aug = jax.jit(lambda k, a: strong_augment(k, a))
    ab = AugBatch(img, ctr_pts, valid, ctr_pts, boxes, valid)
    t = timeit(aug, rng, ab)
    print(f"strong augmentation:            {t*1e3:8.1f} ms")

    # 6. RoIAlign 2500 rois/img
    feat = jnp.zeros((b, s // 8, s // 8, 256), jnp.bfloat16)
    rois = jnp.asarray(r.uniform(10, s - 30, (b, 2500, 4)).astype(np.float32))
    rois = jnp.concatenate([rois[..., :2], rois[..., :2] + 16], -1)
    ra = jax.jit(lambda f, ro: jax.vmap(lambda ff, rr: roi_align(ff, rr, chunk=1024))(f, ro))
    t = timeit(ra, feat, rois)
    print(f"roi_align 2x2500 (fwd):         {t*1e3:8.1f} ms")

    def ra_loss(f, ro):
        return roi_align(f[0], ro[0], chunk=1024).astype(jnp.float32).sum()
    ra_g = jax.jit(jax.grad(ra_loss))
    t = timeit(ra_g, feat, rois)
    print(f"roi_align 2500 (fwd+bwd):       {t*1e3:8.1f} ms")

    # 6.5 full phase-1/2 train steps (the ground truth)
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state
    from point_teacher_tpu.train.steps import build_train_step

    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=16, max_gt=g, rng=rng)
    step = build_train_step(model, tx, cfg)
    batch = Batch(image=img, gt_boxes=boxes, gt_labels=labels, gt_valid=valid,
                  image_ids=jnp.arange(b, dtype=jnp.int32))
    def run_p1(st):
        st2, mm = step(st, batch, phase1=True)
        return mm["total_loss"]
    t = timeit(run_p1, state)
    print(f"FULL phase-1 step:              {t*1e3:8.1f} ms")
    def run_p2(st):
        st2, mm = step(st, batch, phase1=False)
        return mm["total_loss"]
    t = timeit(run_p2, state)
    print(f"FULL phase-2 step:              {t*1e3:8.1f} ms")

    # 6.6 detector core: grad of a 3-pass dense-only loss (no MIL, no syn gen)
    from point_teacher_tpu.train.dense_losses import pseudo_branch_loss, syn_branch_loss
    from point_teacher_tpu.train.steps import _flatten_head

    ncfg = cfg.normalized()
    def core_loss(p):
        img_all = jnp.concatenate([img, img], 0)
        outs, feat = model.apply(p, img_all)
        cls_f, bb_f, ct_f = _flatten_head(outs)
        lb, lc = syn_branch_loss(cls_f[:b], bb_f[:b], ct_f[:b], points, boxes, valid, ncfg.dense)
        outs2, _ = model.apply(p, img)
        cls2, bb2, ct2 = _flatten_head(outs2)
        l1, l2, l3 = pseudo_branch_loss(cls2, bb2, ct2, points, ctr_pts, labels, valid,
                                        boxes, valid, ncfg.dense)
        return lb + lc + l1 + l2 + l3
    core_g = jax.jit(jax.grad(core_loss))
    t = timeit(core_g, params)
    print(f"3-pass dense core (f+b):        {t*1e3:8.1f} ms")

    # 7. MIL towers matmul
    roi_feats = jnp.zeros((b * 2500, 7, 7, 256), jnp.bfloat16)
    def tower(p, x):
        return model.apply(p, x, 0, method=StudentFCOS.mil_regress).sum()
    tg = jax.jit(jax.grad(tower, argnums=1))
    t = timeit(tg, params, roi_feats)
    print(f"MIL reg tower 5000 rois (f+b):  {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

"""Ablation profile of the phase-1 subgraphs (each as its own jit)."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from point_teacher_tpu.core.synthetic import generate_black_paper_batch
    from point_teacher_tpu.core.augment import AugBatch, strong_augment
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.ops.boxes import grid_points
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.dense_losses import pseudo_branch_loss, syn_branch_loss
    from point_teacher_tpu.train.steps import _flatten_head, _run_mil_stages

    s, b, g = 800, 2, 100
    cfg = PointTeacherConfig(img_size=s, max_gt=g, batch_size=b).normalized()
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), dtype=jnp.float32)
    pts2 = jnp.asarray(cxy, dtype=jnp.float32)
    labels = jnp.asarray(r.randint(0, 8, (b, g)), dtype=jnp.int32)
    valid = jnp.ones((b, g), bool)
    points = grid_points(s // 8, s // 8, 8)
    feat = jnp.asarray(r.randn(b, s // 8, s // 8, 256), dtype=jnp.bfloat16)
    syn_slots = 2 * g + 10
    syn_boxes = jnp.asarray(
        np.concatenate([r.uniform(0, s - 40, (b, syn_slots, 2)),
                        r.uniform(0, s - 40, (b, syn_slots, 2)) + 20], -1),
        dtype=jnp.float32)
    syn_valid = jnp.asarray(r.rand(b, syn_slots) < 0.5)

    # 1. syn gen with consumer (prevents overlap-hiding)
    @jax.jit
    def syn_gen(k, i, bx, v):
        o, sb, srb, sv = generate_black_paper_batch(k, i, bx, v, cfg.syn_cfg)
        return o.sum(), sb.sum(), sv.sum()
    print(f"syn-gen (consumed):       {timeit(syn_gen, rng, img, boxes, valid)*1e3:8.1f} ms")

    # 2. grad of syn dense loss through one backbone pass
    def syn_loss(p):
        outs, _ = model.apply(p, img)
        cls_f, bb_f, ct_f = _flatten_head(outs)
        lb, lc = syn_branch_loss(cls_f, bb_f, ct_f, points, syn_boxes, syn_valid, cfg.dense)
        return lb + lc
    print(f"grad syn dense (1 pass):  {timeit(jax.jit(jax.grad(syn_loss)), params)*1e3:8.1f} ms")

    # 3. grad of pseudo dense loss through one backbone pass
    def ps_loss(p):
        outs, _ = model.apply(p, img)
        cls_f, bb_f, ct_f = _flatten_head(outs)
        l1, l2, l3 = pseudo_branch_loss(cls_f, bb_f, ct_f, points, pts2, labels, valid,
                                        boxes, valid, cfg.dense)
        return l1 + l2 + l3
    print(f"grad pseudo dense (1 pass):{timeit(jax.jit(jax.grad(ps_loss)), params)*1e3:7.1f} ms")

    # 4. grad of MIL full (bags+neg+selection) on a FIXED feature map
    def mil_full(p):
        m = {}
        refined, loss = _run_mil_stages(model, p, feat, boxes, labels, valid, boxes,
                                        cfg, rng, (s, s), True, m)
        return loss
    print(f"grad MIL ori full:        {timeit(jax.jit(jax.grad(mil_full)), params)*1e3:8.1f} ms")

    # 5. grad of MIL syn (reg only)
    def mil_syn(p):
        m = {}
        _, loss = _run_mil_stages(model, p, feat, syn_boxes[:, :g],
                                  jnp.zeros_like(labels), syn_valid[:, :g],
                                  syn_boxes[:, :g], cfg, rng, (s, s), False, m)
        return loss
    print(f"grad MIL syn (reg only):  {timeit(jax.jit(jax.grad(mil_syn)), params)*1e3:8.1f} ms")

    # 6. strong augment with consumer
    @jax.jit
    def aug_run(k):
        a = strong_augment(k, AugBatch(img, pts2, valid, pts2, boxes, valid))
        return a.image.sum(), a.gt_points.sum()
    print(f"strong aug (consumed):    {timeit(aug_run, rng)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

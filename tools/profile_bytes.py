"""Attribute the phase-1 program's bytes-accessed to its subgraphs."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("flops", 0) / 1e9, c.get("bytes accessed", 0) / 1e9


def main():
    from point_teacher_tpu.core.synthetic import generate_black_paper_batch
    from point_teacher_tpu.core.augment import AugBatch, strong_augment
    from point_teacher_tpu.core.pseudo import generate_pseudo_boxes
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

    def p(name, fl, by):
        print(f"{name:32s} {fl:10.1f} GF {by:10.1f} GB")

    p("syn gen", *cost(lambda k: generate_black_paper_batch(k, img, boxes, valid, cfg.syn_cfg), rng))

    def fwd(pp):
        outs, f = model.apply(pp, img)
        return outs[0].sum().astype(jnp.float32)
    p("backbone fwd (B2)", *cost(jax.grad(fwd), params))

    def syn_loss(pp):
        outs, _ = model.apply(pp, img)
        cls_f, bb_f, ct_f = _flatten_head(outs)
        lb, lc = syn_branch_loss(cls_f, bb_f, ct_f, points, syn_boxes, syn_valid, cfg.dense)
        return lb + lc
    p("grad syn dense (1 pass)", *cost(jax.grad(syn_loss), params))

    def ps_loss(pp):
        outs, _ = model.apply(pp, img)
        cls_f, bb_f, ct_f = _flatten_head(outs)
        l1, l2, l3 = pseudo_branch_loss(cls_f, bb_f, ct_f, points, pts2, labels, valid,
                                        boxes, valid, cfg.dense)
        return l1 + l2 + l3
    p("grad pseudo dense (1 pass)", *cost(jax.grad(ps_loss), params))

    def mil_full(pp):
        m = {}
        refined, loss = _run_mil_stages(model, pp, feat, boxes, labels, valid, boxes,
                                        cfg, rng, (s, s), True, m)
        return loss
    p("grad MIL ori full", *cost(jax.grad(mil_full), params))

    def ps_gen(cl, bp):
        return jax.vmap(lambda c2, b2, gp, gl, gv, gb: generate_pseudo_boxes(
            points, c2, b2, gp, gl, gv, gb, 0.0, cfg.fuse_assigner
        ))(cl, bp, pts2, labels, valid, boxes)["pseudo_boxes"].sum()
    cls_f = jnp.zeros((b, 10000, 8))
    bb_f = jnp.zeros((b, 10000, 4))
    p("pseudo gen", *cost(ps_gen, cls_f, bb_f))

    p("strong aug", *cost(
        lambda k: strong_augment(k, AugBatch(img, pts2, valid, pts2, boxes, valid)).image.sum(),
        rng))


if __name__ == "__main__":
    main()

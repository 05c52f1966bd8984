"""Bisect the phase-1 step cost by monkeypatching subgraphs out of the REAL
train step (each variant compiles the full program minus one piece)."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(cfg, model, tx):
    from point_teacher_tpu.train.steps import build_train_step
    return build_train_step(model, tx, cfg, donate=False)


def timeit(step, state, batch, n=5):
    out = step(state, batch, phase1=True)
    jax.block_until_ready(out[1]["total_loss"])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = step(state, batch, phase1=True)
        jax.block_until_ready(out[1]["total_loss"])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import point_teacher_tpu.train.steps as steps_mod
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state

    s, b, g = 800, 2, 100
    cfg = PointTeacherConfig(img_size=s, max_gt=g, batch_size=b)
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=16, max_gt=g, rng=rng)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), dtype=jnp.float32)
    batch = Batch(image=img, gt_boxes=boxes,
                  gt_labels=jnp.asarray(r.randint(0, 8, (b, g)), dtype=jnp.int32),
                  gt_valid=jnp.ones((b, g), bool),
                  image_ids=jnp.arange(b, dtype=jnp.int32))

    orig_mil = steps_mod._run_mil_stages
    orig_syn_loss = steps_mod.syn_branch_loss
    orig_ps_loss = steps_mod.pseudo_branch_loss
    orig_syngen = steps_mod.generate_black_paper_batch
    orig_pseudo = steps_mod._teacher_pseudo

    def no_mil(model_, params_, feat, bx, lb, vd, real, cfg_, key, hw, with_bags,
               metrics, prefix=""):
        metrics[f"{prefix}stage0_loss_mil_bbox"] = jnp.zeros(())
        metrics[f"{prefix}stage0_coarse_bags_iou"] = jnp.zeros(())
        metrics[f"{prefix}stage0_refine_bags_iou"] = jnp.zeros(())
        if with_bags:
            metrics["stage0_refine_bboxes_iou"] = jnp.zeros(())
            metrics[f"{prefix}stage0_loss_mil_bags"] = jnp.zeros(())
        return bx, feat.astype(jnp.float32).mean() * 0.0

    def no_syn_loss(cls, bb, ct, pts, sb, sv, dcfg):
        return cls.astype(jnp.float32).mean() * 0.0, ct.astype(jnp.float32).mean() * 0.0

    def no_ps_loss(cls, bb, ct, pts, gp, gl, gv, pb, pv, dcfg):
        z = cls.astype(jnp.float32).mean() * 0.0
        return z, z, z

    def no_syngen(k, i, bx, v, c, fill_value=255.0):
        slots = 2 * bx.shape[1] + 10
        sb = jnp.pad(bx, ((0, 0), (0, slots - bx.shape[1]), (0, 0)))
        rb = jnp.zeros((bx.shape[0], slots, 5), bx.dtype)
        sv = jnp.pad(v, ((0, 0), (0, slots - v.shape[1])))
        return i, sb, rb, sv

    import point_teacher_tpu.core.synthetic as syn_mod
    orig_raster = syn_mod.rasterize_rboxes
    orig_nmsrot = syn_mod.nms_rotated

    def no_raster(rb, vd, h2, w2, row_block=64):
        return jnp.zeros((h2, w2), bool)

    def no_nms(rb, sc, thr, valid=None, iters=None):
        return valid if valid is not None else jnp.ones(rb.shape[0], bool)

    def no_chains(key, bxs, gt_valid, dense_cls_max):
        import point_teacher_tpu.core.synthetic as sm
        ch = jnp.zeros((sm.CHAIN_SLOTS, 7), bxs.dtype)
        cv = jnp.zeros((sm.CHAIN_SLOTS,), bool)
        return ch, cv

    orig_chains = syn_mod._adjacency_chains

    def depcut(k, i, bx, v, c, fill_value=255.0):
        o, sb, srb, sv = orig_syngen(k, i, bx, v, c, fill_value=fill_value)
        # keep all outputs except the image dependency
        return i + 0.0 * o.mean(), sb, srb, sv

    variants = [
        ("no rasterize", {"__syn_raster__": no_raster}),
        ("no syn NMS", {"__syn_nms__": no_nms}),
        ("no syn gen", {"generate_black_paper_batch": no_syngen}),
    ]
    for name, patches in variants:
        for k, v in patches.items():
            if k == "__syn_raster__":
                syn_mod.rasterize_rboxes = v
            elif k == "__syn_nms__":
                syn_mod.nms_rotated = v
            elif k == "__syn_chains__":
                syn_mod._adjacency_chains = v
            else:
                setattr(steps_mod, k, v)
        try:
            # the synthetic generator is itself jitted: clear its trace cache
            # so monkeypatched internals actually take effect
            try:
                syn_mod.generate_black_paper_batch.clear_cache()
            except Exception:
                pass
            try:
                syn_mod.rasterize_rboxes.clear_cache()
            except Exception:
                pass
            step = build(cfg, model, tx)
            t = timeit(step, state, batch)
            print(f"{name:26s} {t:8.1f} ms", flush=True)
        finally:
            syn_mod.rasterize_rboxes = orig_raster
            syn_mod.nms_rotated = orig_nmsrot
            syn_mod._adjacency_chains = orig_chains
            steps_mod._run_mil_stages = orig_mil
            steps_mod.syn_branch_loss = orig_syn_loss
            steps_mod.pseudo_branch_loss = orig_ps_loss
            steps_mod.generate_black_paper_batch = orig_syngen
            steps_mod._teacher_pseudo = orig_pseudo


if __name__ == "__main__":
    main()

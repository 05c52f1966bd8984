"""Bisect the REAL phase-1 step at the bench operating point (batch 8):
compile full-program variants with one subsystem stubbed out each and diff
the step times. Run: python tools/profile_bisect8.py
"""
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


def timeit(step, state, batch, n=6):
    out = step(state, batch, phase1=True)
    float(out[1]["total_loss"])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = step(state, batch, phase1=True)
        float(out[1]["total_loss"])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import point_teacher_tpu.train.steps as steps_mod
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state

    s, b = 800, 8
    cfg = PointTeacherConfig(img_size=s, batch_size=b)
    g = cfg.max_gt
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, frozen_stages=cfg.optim.frozen_stages,
                        dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=64, max_gt=g, rng=rng)
    r = np.random.RandomState(0)
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    batch = Batch(
        image=jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32)),
        gt_boxes=jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
                             jnp.float32),
        gt_labels=jnp.asarray(r.randint(0, 8, (b, g)), jnp.int32),
        gt_valid=jnp.ones((b, g), bool),
        image_ids=jnp.arange(b, dtype=jnp.int32),
    )

    def build():
        from point_teacher_tpu.train.steps import build_train_step
        return build_train_step(model, tx, cfg, donate=False)

    orig_mil = steps_mod._run_mil_stages
    orig_pseudo = steps_mod._teacher_pseudo
    orig_syngen = steps_mod.generate_black_paper_batch
    orig_ps_loss = steps_mod.pseudo_branch_loss
    orig_syn_loss = steps_mod.syn_branch_loss

    def no_mil(model_, params_, feat, bx, lb, vd, real, cfg_, key, hw, with_bags,
               metrics, prefix=""):
        metrics[f"{prefix}stage0_loss_mil_bbox"] = jnp.zeros(())
        metrics[f"{prefix}stage0_coarse_bags_iou"] = jnp.zeros(())
        metrics[f"{prefix}stage0_refine_bags_iou"] = jnp.zeros(())
        if with_bags:
            metrics["stage0_refine_bboxes_iou"] = jnp.zeros(())
            metrics[f"{prefix}stage0_loss_mil_bags"] = jnp.zeros(())
        return bx, feat.astype(jnp.float32).mean() * 0.0

    def no_pseudo(model_, tp, batch_, gt_points, points, cfg_):
        bsz, gsz = batch_.gt_boxes.shape[:2]
        half = jnp.full((bsz, gsz, 2), 4.0, jnp.float32)
        pb = jnp.concatenate([gt_points - half, gt_points + half], -1)
        return dict(pseudo_boxes=pb, pseudo_labels=batch_.gt_labels,
                    mean_iou=jnp.zeros((bsz,)))

    def no_syngen(k, i, bx, v, c, fill_value=255.0):
        slots = 2 * bx.shape[1] + 10
        sb = jnp.pad(bx, ((0, 0), (0, slots - bx.shape[1]), (0, 0)))
        rb = jnp.zeros((bx.shape[0], slots, 5), bx.dtype)
        sv = jnp.pad(v, ((0, 0), (0, slots - v.shape[1])))
        return i, sb, rb, sv

    def no_syn_loss(cls, bb, ct, pts, sb, sv, dcfg):
        z = cls.astype(jnp.float32).mean() * 0.0
        return z, z

    def no_ps_loss(cls, bb, ct, pts, gp, gl, gv, pb, pv, dcfg):
        z = cls.astype(jnp.float32).mean() * 0.0
        return z, z, z

    variants = [
        ("baseline", {}),
        ("no MIL (both)", {"_run_mil_stages": no_mil}),
        ("no teacher+pseudo", {"_teacher_pseudo": no_pseudo}),
        ("no syn gen", {"generate_black_paper_batch": no_syngen}),
        ("no dense losses", {"syn_branch_loss": no_syn_loss,
                             "pseudo_branch_loss": no_ps_loss}),
        ("no MIL + no pseudo", {"_run_mil_stages": no_mil,
                                "_teacher_pseudo": no_pseudo}),
    ]
    base = None
    for name, patches in variants:
        for k, v in patches.items():
            setattr(steps_mod, k, v)
        try:
            t = timeit(build(), state, batch)
            d = "" if base is None else f"   (delta {base - t:+8.1f} ms)"
            if base is None:
                base = t
            print(f"{name:24s} {t:8.1f} ms{d}", flush=True)
        finally:
            steps_mod._run_mil_stages = orig_mil
            steps_mod._teacher_pseudo = orig_pseudo
            steps_mod.generate_black_paper_batch = orig_syngen
            steps_mod.pseudo_branch_loss = orig_ps_loss
            steps_mod.syn_branch_loss = orig_syn_loss


if __name__ == "__main__":
    main()

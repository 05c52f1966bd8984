"""Bisect the REAL rotated phase-1 step at the bench operating point
(SODA-A geometry, 1200px, batch 4): compile full-program variants with one
subsystem stubbed out each and diff the step times.
Run: python tools/profile_rbisect.py  (ONE TPU process at a time)
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
    # donated step: thread the returned state (two live copies of the train
    # state no longer fit at the HEAD 1200px geometry — r4 OOM)
    state, m = step(state, batch, phase1=True)
    float(m["total_loss"])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        state, m = step(state, batch, phase1=True)
        float(m["total_loss"])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import point_teacher_tpu.train.rsteps as rsteps_mod
    from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
    from point_teacher_tpu.train.config import config_sodaa
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state

    b = 4
    cfg = config_sodaa(batch_size=b)
    s, g = cfg.img_size, cfg.max_gt
    rng = jax.random.PRNGKey(0)
    model = StudentRotatedFCOS(num_classes=cfg.num_classes,
                               num_stages=cfg.num_stages,
                               frozen_stages=cfg.optim.frozen_stages,
                               dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentRotatedFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=64, max_gt=g, rng=rng)
    r = np.random.RandomState(0)
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    ang = r.uniform(-np.pi / 2, np.pi / 2, (b, g, 1))
    batch = Batch(
        image=jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32)),
        gt_boxes=jnp.asarray(np.concatenate([cxy, wh, ang], -1), jnp.float32),
        gt_labels=jnp.asarray(r.randint(0, cfg.num_classes, (b, g)), jnp.int32),
        gt_valid=jnp.ones((b, g), bool),
        image_ids=jnp.arange(b, dtype=jnp.int32),
    )

    def build():
        from point_teacher_tpu.train.rsteps import build_rotated_train_step
        return build_rotated_train_step(model, tx, cfg, donate=True)

    originals = {
        k: getattr(rsteps_mod, k)
        for k in ("_run_rmil_stages", "generate_pseudo_rboxes",
                  "generate_black_paper_batch", "syn_branch_loss_rotated",
                  "pseudo_branch_loss_rotated", "strong_augment_rotated")
    }

    def no_rmil(model_, params_, mil_feat, rboxes, labels, valid, real, cfg_,
                key, hw, with_bags, metrics):
        for st in range(cfg_.num_stages):
            metrics[f"stage{st}_loss_mil_bbox"] = jnp.zeros(())
            metrics[f"stage{st}_coarse_bags_iou"] = jnp.zeros(())
            metrics[f"stage{st}_refine_bags_iou"] = jnp.zeros(())
            if with_bags:
                metrics[f"stage{st}_loss_mil_bags"] = jnp.zeros(())
                metrics[f"stage{st}_refine_bboxes_iou"] = jnp.zeros(())
        return rboxes, mil_feat.astype(jnp.float32).mean() * 0.0

    def no_pseudo(points, cl, bp, gp, gl, gv, gb, fs, fcfg):
        gsz = gp.shape[0]
        pb = jnp.concatenate(
            [gp, jnp.full((gsz, 2), 8.0), jnp.zeros((gsz, 1))], -1)
        return dict(pseudo_boxes=pb, pseudo_points=gp, pseudo_labels=gl,
                    pseudo_valid=gv, matched=gv,
                    mean_iou=cl.astype(jnp.float32).mean() * 0.0)

    def no_syngen(k, img, bx, v, c, fill_value=255.0):
        slots = 2 * bx.shape[1] + 10
        sb = jnp.pad(bx, ((0, 0), (0, slots - bx.shape[1]), (0, 0)))
        sv = jnp.pad(v, ((0, 0), (0, slots - v.shape[1])))
        return img, img, sb, sv

    def no_syn_loss(cls, bb, ag, ct, pts, sb, sv, dcfg):
        z = cls.astype(jnp.float32).mean() * 0.0
        return z, z

    def no_ps_loss(cls, bb, ag, ct, pts, gp, gl, gv, pb, pv, dcfg):
        z = cls.astype(jnp.float32).mean() * 0.0
        return z, z, z

    def no_aug(k, ab):
        return ab

    variants = [
        ("baseline", {}),
        ("no rotated MIL (both)", {"_run_rmil_stages": no_rmil}),
        ("no teacher pseudo-gen", {"generate_pseudo_rboxes": no_pseudo}),
        ("no syn gen", {"generate_black_paper_batch": no_syngen}),
        ("no dense losses", {"syn_branch_loss_rotated": no_syn_loss,
                             "pseudo_branch_loss_rotated": no_ps_loss}),
        ("no strong aug", {"strong_augment_rotated": no_aug}),
        ("no MIL + no pseudo + no syn", {"_run_rmil_stages": no_rmil,
                                         "generate_pseudo_rboxes": no_pseudo,
                                         "generate_black_paper_batch": no_syngen}),
    ]
    base = None
    failed = 0
    for name, patches in variants:
        for k, v in originals.items():
            setattr(rsteps_mod, k, v)
        for k, v in patches.items():
            setattr(rsteps_mod, k, v)
        try:
            # fresh state per variant: the donated step consumes its input.
            # COPY the params tree — create_train_state aliases it into
            # state.params, so without the copy the first donated execution
            # deletes the master `params` buffers and every later variant
            # fails at dispatch with INVALID_ARGUMENT (the r4 rbisect.json
            # failure mode: baseline ok, all six ablations dead). The rng
            # KEY is aliased the same way (state.rng) — recreate it too, or
            # every post-baseline variant dies with "Array has been deleted
            # (uint32[2])" (the r5 first-rerun failure mode).
            vparams = jax.tree_util.tree_map(jnp.copy, params)
            vstate = create_train_state(vparams, tx, num_images=64, max_gt=g,
                                        rng=jax.random.PRNGKey(0))
            t = timeit(build(), vstate, batch)
            d = "" if base is None else f"   (delta {base - t:+8.1f} ms)"
            if base is None:
                base = t
            print(f"{name:35s}: {t:8.1f} ms{d}", flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"{name:35s}: FAILED {str(e)[:120]}", flush=True)
    for k, v in originals.items():
        setattr(rsteps_mod, k, v)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

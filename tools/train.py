"""Training entry point.

Capability target: HBB_TOD/tools/train.py + mmdet/apis/train.py
(train_detector): `python tools/train.py <config.py> [--work-dir ...]
[--resume-from ckpt] [--cfg-options k=v ...]`.

Extras over the reference:
- `--synthetic-data N --max-steps M`: run on fabricated batches (fake COCO
  batches — the _demo_mm_inputs pattern of the reference's tests) to smoke
  the full pipeline without the dataset;
- checkpoints carry teacher+student+optimizer+point caches (resume-safe).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description="Train a Point-Teacher detector")
    ap.add_argument("config")
    ap.add_argument("--work-dir")
    ap.add_argument("--resume-from")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cfg-options", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug/smoke)")
    ap.add_argument("--cpu-devices", type=int, default=0, help="virtual CPU device count")
    ap.add_argument("--synthetic-data", type=int, default=0, metavar="N_IMAGES",
                    help="train on N fabricated images instead of the dataset")
    ap.add_argument("--max-steps", type=int, default=0, help="stop after N steps (0=full)")
    ap.add_argument("--ckpt-interval", type=int, default=1, help="epochs between ckpts")
    ap.add_argument("--val-interval", type=int, default=0, metavar="EPOCHS",
                    help="run val evaluation every N epochs and track the best "
                         "mAP checkpoint (EvalHook analog; 0 = off)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1, metavar="K",
                    help="run K train steps per dispatched program "
                         "(lax.scan superstep — amortises host->device launch "
                         "latency; semantics identical to K sequential steps). "
                         "Supported by all trainers.")
    return ap.parse_args()


def synthetic_dataset(n_images, cfg_pt, seed=0, rotated=False):
    """Fabricated fixed batches (no files on disk)."""
    from point_teacher_tpu.train.state import Batch

    r = np.random.RandomState(seed)
    s, g = cfg_pt.img_size, cfg_pt.max_gt

    def batches(batch_size):
        ids = np.arange(n_images)
        for start in range(0, n_images - batch_size + 1, batch_size):
            idx = ids[start:start + batch_size]
            rr = np.random.RandomState(seed * 1000 + start)
            img = rr.randint(0, 255, (batch_size, s, s, 3)).astype(np.float32)
            ng = rr.randint(1, g + 1, batch_size)
            cxy = rr.uniform(12, s - 12, (batch_size, g, 2))
            wh = rr.uniform(4, 16, (batch_size, g, 2))
            if rotated:
                ang = rr.uniform(-np.pi / 2, np.pi / 2, (batch_size, g, 1))
                boxes = np.concatenate([cxy, wh, ang], -1).astype(np.float32)
            else:
                boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
            valid = np.arange(g)[None] < ng[:, None]
            yield Batch(
                image=img, gt_boxes=boxes,
                gt_labels=rr.randint(0, cfg_pt.num_classes, (batch_size, g)).astype(np.int32),
                gt_valid=valid, image_ids=idx.astype(np.int32),
            )

    return batches


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    # persistent compile cache: the full train step is a multi-minute compile
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from point_teacher_tpu.config_io import apply_overrides, load_config
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
    from point_teacher_tpu.train.optim import make_lr_schedule, make_optimizer
    from point_teacher_tpu.train.state import create_train_state
    from point_teacher_tpu.train.steps import build_train_step
    from point_teacher_tpu.utils.checkpoint import load_checkpoint, load_meta, save_checkpoint
    from point_teacher_tpu.utils.logging import TrainLogger

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    pt = cfg["pt"]
    rotated = bool(cfg.get("rotated", False))
    trainer = cfg.get("trainer", "point_teacher")
    work_dir = args.work_dir or cfg.get("work_dir", "work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    model_kw = {k: v for k, v in cfg.get("model", {}).items()
                if k in ("depth", "backbone_style")}
    if trainer == "rfla_fcos":
        from point_teacher_tpu.models.rfla_fcos_head import RFLAFCOS

        model = RFLAFCOS(num_classes=pt.num_classes,
                         frozen_stages=pt.optim.frozen_stages,
                         dtype=jnp.bfloat16, **model_kw)
        params = model.init(rng, jnp.zeros((1, pt.img_size, pt.img_size, 3)))
    else:
        model_cls = StudentRotatedFCOS if rotated else StudentFCOS
        model = model_cls(
            num_classes=pt.num_classes, num_stages=pt.num_stages,
            mil_stack_conv=0, frozen_stages=pt.optim.frozen_stages,
            dtype=jnp.bfloat16, **model_kw,
        )
        params = model.init(
            rng, jnp.zeros((1, pt.img_size, pt.img_size, 3)),
            jnp.zeros((1, 7, 7, 256)), method=model_cls.init_all,
        )
    pretrained = cfg.get("model", {}).get("pretrained")
    if pretrained:
        from point_teacher_tpu.utils.torch_port import load_torch_resnet50_into
        params = load_torch_resnet50_into(params, pretrained)
        print(f"loaded pretrained backbone from {pretrained}")

    if args.synthetic_data:
        n_images = args.synthetic_data
        batches_fn = synthetic_dataset(n_images, pt, args.seed, rotated=rotated)
    else:
        from point_teacher_tpu.data import TrainLoader

        if rotated:
            from point_teacher_tpu.data.sodaa import SODAADataset

            ds = SODAADataset(cfg["dataset"]["train_ann"],
                              cfg["dataset"]["train_img_prefix"])
        else:
            from point_teacher_tpu.data import AITODDataset

            ds = AITODDataset(cfg["dataset"]["train_ann"],
                              cfg["dataset"]["train_img_prefix"])
        n_images = len(ds)
        loader = TrainLoader(ds, pt.batch_size, pt.max_gt, pt.img_size, seed=args.seed,
                             img_norm=cfg["dataset"].get("img_norm"))
        batches_fn = lambda bs: loader.epoch()  # noqa: E731
        print(f"dataset: {len(ds)} images, {len(ds.CLASSES)} classes")

    iters_per_epoch = max(n_images // pt.batch_size, 1)
    pt = pt._replace(optim=pt.optim._replace(iters_per_epoch=iters_per_epoch))

    tx = make_optimizer(params, pt.optim)
    state = create_train_state(params, tx, num_images=n_images, max_gt=pt.max_gt, rng=rng)
    if args.resume_from:
        state = load_checkpoint(state, args.resume_from)
        print(f"resumed from {args.resume_from} at step {int(state.step)}")

    if trainer == "fcos":
        from point_teacher_tpu.train.fcos_baseline import build_fcos_train_step

        fcos_step = build_fcos_train_step(model, tx, pt, donate=False)
        step_fn = lambda s, b, phase1: fcos_step(s, b)  # noqa: E731
    elif trainer == "rfla_fcos":
        from point_teacher_tpu.train.rfla_baseline import build_rfla_train_step

        rfla_step = build_rfla_train_step(model, tx, pt, donate=False)
        step_fn = lambda s, b, phase1: rfla_step(s, b)  # noqa: E731
    elif rotated:
        from point_teacher_tpu.train.rsteps import build_rotated_train_step

        step_fn = build_rotated_train_step(model, tx, pt, donate=False)
    else:
        step_fn = build_train_step(model, tx, pt, donate=False)
    scan_k = max(1, args.steps_per_dispatch)
    scan_step_fn = None
    if scan_k > 1:
        if trainer == "fcos":
            from point_teacher_tpu.train.fcos_baseline import build_fcos_train_step_scan

            fcos_scan = build_fcos_train_step_scan(model, tx, pt, donate=False)
            scan_step_fn = lambda s, b, phase1: fcos_scan(s, b)  # noqa: E731
        elif trainer == "rfla_fcos":
            from point_teacher_tpu.train.rfla_baseline import build_rfla_train_step_scan

            rfla_scan = build_rfla_train_step_scan(model, tx, pt, donate=False)
            scan_step_fn = lambda s, b, phase1: rfla_scan(s, b)  # noqa: E731
        elif rotated:
            from point_teacher_tpu.train.rsteps import build_rotated_train_step_scan

            scan_step_fn = build_rotated_train_step_scan(model, tx, pt, donate=False)
        else:
            from point_teacher_tpu.train.steps import build_train_step_scan

            scan_step_fn = build_train_step_scan(model, tx, pt, donate=False)
    schedule = make_lr_schedule(pt.optim)
    logger = TrainLogger(work_dir, interval=50)

    # SPMD data parallelism over all visible chips (the dist_train.sh analog)
    if jax.device_count() > 1 and pt.batch_size % jax.device_count() == 0:
        from point_teacher_tpu.parallel import (
            make_mesh, replicate_state, shard_batch, shard_stacked_batch)

        mesh = make_mesh()
        state = replicate_state(state, mesh)
        shard = lambda b: shard_batch(b, mesh)  # noqa: E731
        # superstep batches are [K, B, ...]: axis 0 is the scan/step axis
        # (replicated), axis 1 the batch axis (split on 'data')
        shard_stacked = lambda b: shard_stacked_batch(b, mesh)  # noqa: E731
        print(f"data parallel over {jax.device_count()} devices")
    else:
        shard = lambda b: b  # noqa: E731
        shard_stacked = lambda b: b  # noqa: E731

    # EvalHook analog (reference registers EvalHook(val_dataloader, interval=12)
    # at mmdet/apis/train.py:141-150): periodic val mAP + best-ckpt tracking.
    val_state = {"infer": None, "best": -1.0}

    def run_validation(cur_state, epoch_no, cur_step):
        from point_teacher_tpu.evalx.runner import build_infer, evaluate_detector

        if val_state["infer"] is None:
            val_state["infer"] = build_infer(model, pt, rotated, trainer=trainer)
        ap_, stats = evaluate_detector(
            val_state["infer"], cur_state.teacher_params, pt, cfg, rotated=rotated,
            synthetic_n=args.synthetic_data, quiet=True,
        )
        logger.val(cur_step, epoch_no, {"val_mAP": ap_}, lr=float(schedule(cur_step)))
        print(f"epoch {epoch_no}: val mAP = {ap_:.4f}"
              + (f" (best {val_state['best']:.4f})" if val_state["best"] >= 0 else ""))
        if ap_ > val_state["best"]:
            val_state["best"] = ap_
            best_path = os.path.join(work_dir, "best.ckpt")
            save_checkpoint(cur_state, best_path,
                            meta=dict(epoch=epoch_no, step=cur_step,
                                      num_images=n_images, val_mAP=ap_))
            print(f"new best mAP {ap_:.4f} -> {best_path}")

    step = int(state.step)
    start_epoch = step // iters_per_epoch
    stop = False
    for epoch in range(start_epoch, pt.optim.max_epochs):
        pending = []  # batches grouped for the scan superstep

        def run_pending(state, step):
            nonlocal stop
            if not pending:
                return state, step
            phase1 = step <= pt.burn_in_step
            if scan_step_fn is not None and len(pending) > 1:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *pending)
                state, ms = scan_step_fn(state, shard_stacked(stacked), phase1=phase1)
                metric_list = [
                    {k: float(v[i]) for k, v in ms.items()}
                    for i in range(len(pending))
                ]
            else:
                metric_list = []
                for bt in pending:
                    state, m = step_fn(state, shard(bt), phase1=phase1)
                    metric_list.append({k: float(v) for k, v in m.items()})
            for m in metric_list:
                step += 1
                logger.step(step, epoch + 1, m, lr=float(schedule(step)))
                if args.max_steps and step >= args.max_steps:
                    stop = True
            pending.clear()
            return state, step

        for batch in batches_fn(pt.batch_size):
            pending.append(batch)
            next_step = step + len(pending)
            # flush when the group is full, at the phase boundary (phase1 is
            # static per compiled program), or at max-steps
            boundary = (next_step == pt.burn_in_step + 1)
            full = len(pending) >= scan_k
            hit_max = args.max_steps and next_step >= args.max_steps
            if full or boundary or hit_max:
                state, step = run_pending(state, step)
            if stop:
                break
        if not stop:
            state, step = run_pending(state, step)
        logger.emit(step, epoch + 1, lr=float(schedule(step)))
        if args.val_interval and ((epoch + 1) % args.val_interval == 0 or stop):
            run_validation(state, epoch + 1, step)
        if (epoch + 1) % args.ckpt_interval == 0 or stop:
            meta = dict(epoch=epoch + 1, step=step, num_images=n_images)
            path = os.path.join(work_dir, f"epoch_{epoch + 1}.ckpt")
            save_checkpoint(state, path, meta=meta)
            latest = os.path.join(work_dir, "latest.ckpt")
            save_checkpoint(state, latest, meta=meta)
            print(f"saved checkpoint: {path}")
        if stop:
            break
    print(f"training done at step {step}")


if __name__ == "__main__":
    main()

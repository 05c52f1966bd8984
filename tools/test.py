"""Evaluation entry point.

Capability target: HBB_TOD/tools/test.py + mmdet/apis/test.py single_gpu_test:
`python tools/test.py <config.py> <ckpt> --eval bbox`. Runs the TEACHER
(fcos_p2b_teacher_student.py:276-298), converts fixed-shape padded detections
to per-image numpy results, and evaluates with the AI-TOD COCO-style metrics
(AP at IoU 0.25, vt/t/s/m buckets, oLRP).

`--synthetic-data N` fabricates a dataset where GT boxes are drawn on blank
images, giving a closed-loop accuracy check without data on disk.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description="Evaluate a Point-Teacher detector")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?")
    ap.add_argument("--eval", default="bbox")
    ap.add_argument("--cfg-options", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug/smoke)")
    ap.add_argument("--cpu-devices", type=int, default=0, help="virtual CPU device count")
    ap.add_argument("--synthetic-data", type=int, default=0)
    ap.add_argument("--student", action="store_true",
                    help="evaluate the student instead of the teacher")
    ap.add_argument("--torch-ckpt", default=None,
                    help="load a REFERENCE PyTorch TS checkpoint (.pth) via the "
                         "weight port instead of a native checkpoint (the "
                         "teacher branch, or student with --student)")
    ap.add_argument("--out", help="write detections (npz)")
    ap.add_argument("--tta-scales", default=None, metavar="S1,S2",
                    help="comma-separated square canvas sizes for multi-scale "
                         "TTA (aug_test analog; HBB only)")
    ap.add_argument("--tta-no-flip", action="store_true",
                    help="disable the horizontal-flip views in TTA")
    ap.add_argument("--show-dir", help="write annotated detection images "
                                       "(reference tools/test.py --show-dir)")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from point_teacher_tpu.config_io import apply_overrides, load_config
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.utils.checkpoint import load_checkpoint

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    pt = cfg["pt"]
    rotated = bool(cfg.get("rotated", False))
    trainer = cfg.get("trainer", "point_teacher")
    if args.torch_ckpt and trainer == "rfla_fcos":
        raise SystemExit("--torch-ckpt supports the point_teacher trainer "
                         "only (the loader expects the Student_FCOS param "
                         "tree, not RFLAFCOS)")
    rng = jax.random.PRNGKey(0)
    model_kw = {k: v for k, v in cfg.get("model", {}).items()
                if k in ("depth", "backbone_style")}
    if trainer == "rfla_fcos":
        from point_teacher_tpu.models.rfla_fcos_head import RFLAFCOS

        model = RFLAFCOS(num_classes=pt.num_classes, dtype=jnp.bfloat16, **model_kw)
        params = model.init(rng, jnp.zeros((1, pt.img_size, pt.img_size, 3)))
    else:
        if rotated:
            from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
            model_cls = StudentRotatedFCOS
        else:
            model_cls = StudentFCOS
        model = model_cls(
            num_classes=pt.num_classes, num_stages=pt.num_stages, dtype=jnp.bfloat16,
            **model_kw,
        )
        params = model.init(
            rng, jnp.zeros((1, pt.img_size, pt.img_size, 3)),
            jnp.zeros((1, 7, 7, 256)), method=model_cls.init_all,
        )

    if args.torch_ckpt:
        from point_teacher_tpu.utils.torch_port import load_reference_ts_checkpoint

        eval_params = load_reference_ts_checkpoint(
            params, args.torch_ckpt,
            branch="student" if args.student else "teacher",
            rotated=rotated, num_stages=pt.num_stages)
        print(f"loaded reference torch checkpoint {args.torch_ckpt} "
              f"({'student' if args.student else 'teacher'} branch)")
    elif args.checkpoint:
        from point_teacher_tpu.train.optim import make_optimizer
        from point_teacher_tpu.train.state import create_train_state

        from point_teacher_tpu.utils.checkpoint import load_meta

        tx = make_optimizer(params, pt.optim)
        # the point-cache size is dataset-dependent; it is recorded in the
        # checkpoint meta (save side always writes num_images)
        meta = load_meta(args.checkpoint)
        n_images = int(meta.get("num_images", 1))
        template = create_train_state(params, tx, num_images=n_images,
                                      max_gt=pt.max_gt, rng=rng)
        state = load_checkpoint(template, args.checkpoint)
        eval_params = state.params if args.student else state.teacher_params
    else:
        eval_params = params
        print("WARNING: no checkpoint given — evaluating random init")

    from point_teacher_tpu.evalx.runner import build_infer, evaluate_detector, shard_infer

    infer = build_infer(model, pt, rotated, trainer=trainer)

    # multi_gpu_test analog: shard eval batches over every visible chip
    if jax.device_count() > 1 and pt.batch_size % jax.device_count() == 0:
        infer, eval_params = shard_infer(infer, eval_params)
        print(f"eval sharded over {jax.device_count()} devices")

    tta = None
    if args.tta_scales:
        if rotated:
            raise SystemExit("--tta-scales covers the HBB path only")
        tta = dict(model=model,
                   scales=[int(s) for s in args.tta_scales.split(",")],
                   flip=not args.tta_no_flip)
    evaluate_detector(infer, eval_params, pt, cfg, rotated=rotated,
                      synthetic_n=args.synthetic_data, out=args.out,
                      show_dir=args.show_dir, tta=tta)


if __name__ == "__main__":
    main()

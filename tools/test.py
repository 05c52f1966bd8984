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
    ap.add_argument("--out", help="write detections (npz)")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cpu_devices:
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax.numpy as jnp

    from point_teacher_tpu.config_io import apply_overrides, load_config
    from point_teacher_tpu.inference import build_inference_fn
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.evalx.cocoeval import COCOStyleEval
    from point_teacher_tpu.utils.checkpoint import load_checkpoint

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    pt = cfg["pt"]
    rotated = bool(cfg.get("rotated", False))
    if rotated:
        from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
        model_cls = StudentRotatedFCOS
    else:
        model_cls = StudentFCOS
    model = model_cls(
        num_classes=pt.num_classes, num_stages=pt.num_stages, dtype=jnp.bfloat16,
        **{k: v for k, v in cfg.get("model", {}).items()
           if k in ("depth", "backbone_style")},
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng, jnp.zeros((1, pt.img_size, pt.img_size, 3)),
        jnp.zeros((1, 7, 7, 256)), method=model_cls.init_all,
    )

    if args.checkpoint:
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

    if rotated:
        from point_teacher_tpu.inference import build_rotated_inference_fn
        infer = build_rotated_inference_fn(model, pt.test, pt.img_size, pt.stride)
    else:
        infer = build_inference_fn(model, pt.test, pt.img_size, pt.stride)

    # multi_gpu_test analog: shard eval batches over every visible chip
    if jax.device_count() > 1 and pt.batch_size % jax.device_count() == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from point_teacher_tpu.parallel.mesh import make_mesh, replicated

        mesh = make_mesh()
        data_s = NamedSharding(mesh, P("data"))
        rep = replicated(mesh)
        eval_params = jax.device_put(eval_params, rep)
        _infer = infer
        infer = lambda p, im, sf: _infer(  # noqa: E731
            p, jax.device_put(im, data_s), jax.device_put(sf, data_s)
        )
        print(f"eval sharded over {jax.device_count()} devices")

    if rotated and not args.synthetic_data:
        # SODA-A: per-patch inference -> translate + rotated-NMS merge -> eval
        from point_teacher_tpu.data.loader import EvalLoader
        from point_teacher_tpu.data.sodaa import SODAADataset
        from point_teacher_tpu.evalx.sodaa import merge_patch_detections, sodaa_evaluate

        ds = SODAADataset(cfg["dataset"]["val_ann"], cfg["dataset"]["val_img_prefix"],
                          ori_ann_folder=cfg["dataset"].get("ori_val_ann"))
        loader = EvalLoader(ds, pt.batch_size, pt.img_size,
                            img_norm=cfg["dataset"].get("img_norm"))
        patch_names, patch_dets = [], []
        for idxs, imgs, scales in loader:
            d, l, v = infer(eval_params, jnp.asarray(imgs), jnp.asarray(scales))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for bi, i in enumerate(idxs):
                keep = v[bi]
                patch_names.append(ds.infos[i]["filename"])
                patch_dets.append((d[bi, keep, :5], d[bi, keep, 5], l[bi, keep]))
        merged = merge_patch_detections(patch_names, patch_dets, pt.num_classes)
        gt = ds.ori_gt()
        empty = (np.zeros((0, 5), np.float32), np.zeros(0), np.zeros(0))
        dets_per_img = [
            merged.get(name.rsplit(".", 1)[0], empty) for name in gt["img_ids"]
        ]
        stats = sodaa_evaluate(gt, dets_per_img)
        print("\n--- SODA-A rotated metrics (AP over IoU .5:.95) ---")
        for k, v in stats.items():
            if k != "per_class":
                print(f"{k:>24s}: {v:.4f}")
        print("\nper-class AP:")
        for cls, ap in stats.get("per_class", {}).items():
            print(f"{cls:>24s}: {ap:.4f}")
        return

    dets_per_img = []
    box_dim = 5 if rotated else 4
    if args.synthetic_data:
        gt_annotations = []
        r = np.random.RandomState(0)
        bs = pt.batch_size
        n = args.synthetic_data
        classes = [f"c{i}" for i in range(pt.num_classes)]
        for start in range(0, n, bs):
            img = r.randint(0, 255, (bs, pt.img_size, pt.img_size, 3)).astype(np.float32)
            g = r.randint(1, 8)
            for b in range(bs):
                cxy = r.uniform(20, pt.img_size - 20, (g, 2))
                wh = r.uniform(6, 20, (g, 2))
                if rotated:
                    ang = r.uniform(-np.pi / 2, np.pi / 2, (g, 1))
                    boxes = np.concatenate([cxy, wh, ang], -1).astype(np.float32)
                else:
                    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
                gt_annotations.append(dict(boxes=boxes, labels=r.randint(0, pt.num_classes, g)))
            d, l, v = infer(eval_params, jnp.asarray(img), jnp.ones((bs, 4)))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for b in range(bs):
                keep = v[b]
                dets_per_img.append((d[b, keep, :box_dim], d[b, keep, box_dim], l[b, keep]))
        gt = dict(img_ids=list(range(len(gt_annotations))), classes=classes,
                  annotations=gt_annotations)
        if rotated:
            from point_teacher_tpu.evalx.sodaa import sodaa_evaluate

            stats = sodaa_evaluate(gt, dets_per_img)
            print("\n--- SODA-A rotated metrics (synthetic) ---")
            for k, v in stats.items():
                if k != "per_class":
                    print(f"{k:>24s}: {v:.4f}")
            return
    else:
        from point_teacher_tpu.data import AITODDataset, EvalLoader

        ds = AITODDataset(cfg["dataset"]["val_ann"], cfg["dataset"]["val_img_prefix"],
                          filter_empty=False)
        loader = EvalLoader(ds, pt.batch_size, pt.img_size)
        for idxs, imgs, scales in loader:
            d, l, v = infer(eval_params, jnp.asarray(imgs), jnp.asarray(scales))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for bi, _ in enumerate(idxs):
                keep = v[bi]
                dets_per_img.append((d[bi, keep, :4], d[bi, keep, 4], l[bi, keep]))
        gt = ds.coco_gt()

    if args.out:
        np.savez(args.out, **{
            f"img{i}": np.concatenate(
                [d, s[:, None], l[:, None].astype(np.float32)], -1)
            for i, (d, s, l) in enumerate(dets_per_img)
        })

    ev = COCOStyleEval(gt, dets_per_img)
    stats = ev.evaluate()
    print("\n--- AI-TOD COCO-style metrics (IoU 0.25) ---")
    for k, v in stats.items():
        print(f"{k:>24s}: {v:.4f}")
    print("\nper-class AP:")
    for cls, ap in ev.per_class_ap.items():
        print(f"{cls:>24s}: {ap:.4f}")


if __name__ == "__main__":
    main()

"""Shared evaluation runner: one entry point for tools/test.py and the
in-training EvalHook.

Capability target: mmdet/apis/test.py single_gpu_test + the EvalHook the
reference registers at mmdet/apis/train.py:141-150 (interval-driven val
evaluation during training). Returns (headline_ap, stats) so the train loop
can track the best checkpoint.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def build_infer(model, pt, rotated: bool, trainer: str = "point_teacher"):
    if trainer == "rfla_fcos":
        from ..inference import build_rfla_inference_fn

        return build_rfla_inference_fn(model, pt.test, pt.img_size)
    if rotated:
        from ..inference import build_rotated_inference_fn

        return build_rotated_inference_fn(model, pt.test, pt.img_size, pt.stride)
    from ..inference import build_inference_fn

    return build_inference_fn(model, pt.test, pt.img_size, pt.stride)


def shard_infer(infer, eval_params):
    """multi_gpu_test analog: shard eval batches over every visible chip."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_mesh, replicated

    mesh = make_mesh()
    data_s = NamedSharding(mesh, P("data"))
    eval_params = jax.device_put(eval_params, replicated(mesh))
    _infer = infer

    def run(p, im, sf, *extra):
        return _infer(p, jax.device_put(im, data_s), jax.device_put(sf, data_s),
                      *[jax.device_put(e, data_s) for e in extra])

    return run, eval_params


def synthetic_val_set(pt, n: int, rotated: bool, seed: int = 0):
    """Deterministic fabricated val set (same stream as tools/test.py used)."""
    r = np.random.RandomState(seed)
    bs = pt.batch_size
    batches, gt_annotations = [], []
    for start in range(0, n, bs):
        img = r.randint(0, 255, (bs, pt.img_size, pt.img_size, 3)).astype(np.float32)
        g = r.randint(1, 8)
        boxes_b = []
        for b in range(bs):
            cxy = r.uniform(20, pt.img_size - 20, (g, 2))
            wh = r.uniform(6, 20, (g, 2))
            if rotated:
                ang = r.uniform(-np.pi / 2, np.pi / 2, (g, 1))
                boxes = np.concatenate([cxy, wh, ang], -1).astype(np.float32)
            else:
                boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
            labels = r.randint(0, pt.num_classes, g)
            gt_annotations.append(dict(boxes=boxes, labels=labels))
            boxes_b.append((boxes, labels))
        batches.append(img)
    gt = dict(img_ids=list(range(len(gt_annotations))),
              classes=[f"c{i}" for i in range(pt.num_classes)],
              annotations=gt_annotations)
    return batches, gt


def evaluate_detector(
    infer,
    eval_params,
    pt,
    cfg: Dict,
    rotated: bool = False,
    synthetic_n: int = 0,
    out: Optional[str] = None,
    show_dir: Optional[str] = None,
    quiet: bool = False,
    tta: Optional[Dict] = None,
) -> Tuple[float, Dict[str, float]]:
    """Run val-set inference + metrics. Returns (headline mAP, stats dict).
    show_dir writes annotated detection images (the --show-dir of
    HBB_TOD/tools/test.py:47-49).

    tta: dict(model=..., scales=(800, ...), flip=bool) switches the HBB path
    to multi-scale+flip aug_test (per-image views merged by one NMS —
    dense_test_mixins.py aug_test_bboxes); `infer` is ignored then."""
    import os

    import jax.numpy as jnp

    from .cocoeval import COCOStyleEval

    box_dim = 5 if rotated else 4

    def draw(img_np, dets, scores, labels, name, denorm=True):
        if not show_dir:
            return
        from ..utils.visualize import imshow_det_bboxes, imshow_det_rbboxes

        norm = cfg.get("dataset", {}).get("img_norm")
        if norm and denorm:  # de-normalize for a viewable image
            img_np = img_np * np.asarray(norm["std"]) + np.asarray(norm["mean"])
        fn = imshow_det_rbboxes if rotated else imshow_det_bboxes
        fn(img_np, dets, labels, scores, score_thr=0.3,
           out_file=os.path.join(show_dir, name))

    if rotated and not synthetic_n:
        # SODA-A: per-patch inference -> translate + rotated-NMS merge -> eval
        from ..data.loader import EvalLoader
        from ..data.sodaa import SODAADataset
        from .sodaa import merge_patch_detections, sodaa_evaluate

        ds = SODAADataset(cfg["dataset"]["val_ann"], cfg["dataset"]["val_img_prefix"],
                          ori_ann_folder=cfg["dataset"].get("ori_val_ann"))
        loader = EvalLoader(ds, pt.batch_size, pt.img_size,
                            img_norm=cfg["dataset"].get("img_norm"))
        patch_names, patch_dets = [], []
        for idxs, imgs, scales, _shapes in loader:
            d, l, v = infer(eval_params, jnp.asarray(imgs), jnp.asarray(scales))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for bi, i in enumerate(idxs):
                keep = v[bi]
                patch_names.append(ds.infos[i]["filename"])
                patch_dets.append((d[bi, keep, :5], d[bi, keep, 5], l[bi, keep]))
                draw(imgs[bi], d[bi, keep, :5], d[bi, keep, 5], l[bi, keep],
                     ds.infos[i]["filename"])
        merged = merge_patch_detections(patch_names, patch_dets, pt.num_classes)
        gt = ds.ori_gt()
        empty = (np.zeros((0, 5), np.float32), np.zeros(0), np.zeros(0))
        dets_per_img = [
            merged.get(name.rsplit(".", 1)[0], empty) for name in gt["img_ids"]
        ]
        stats = sodaa_evaluate(gt, dets_per_img)
        if not quiet:
            print("\n--- SODA-A rotated metrics (AP over IoU .5:.95) ---")
            for k, v in stats.items():
                if k != "per_class":
                    print(f"{k:>24s}: {v:.4f}")
            print("\nper-class AP:")
            for cls, ap in stats.get("per_class", {}).items():
                print(f"{cls:>24s}: {ap:.4f}")
        return float(stats.get("mAP", 0.0)), stats

    header = "AI-TOD COCO-style metrics (IoU 0.25)"
    dets_per_img = []
    if tta is not None and not rotated:
        from ..data.pipeline import make_tta_views
        from ..inference import build_tta_inference_fn

        scales = tuple(int(s) for s in tta["scales"])
        flip = bool(tta.get("flip", True))
        n_views = len(scales) * (2 if flip else 1)
        canvases = [s for s in scales for _ in range(2 if flip else 1)]
        tta_fn = build_tta_inference_fn(tta["model"], pt.test, canvases)
        norm = cfg.get("dataset", {}).get("img_norm")

        def infer_one(img_np):
            views = [
                {k: jnp.asarray(v) for k, v in view.items()}
                for view in make_tta_views(img_np, scales, flip, img_norm=norm)
            ]
            assert len(views) == n_views
            d, l, v = tta_fn(eval_params, views)
            d, l, v = np.asarray(d[0]), np.asarray(l[0]), np.asarray(v[0])
            return d[v, :4], d[v, 4], l[v]

        if synthetic_n:
            batches, gt = synthetic_val_set(pt, synthetic_n, rotated)
            imgs_iter = (img[b] for img in batches for b in range(img.shape[0]))
            names = [f"img{i}.jpg" for i in range(synthetic_n)]
        else:
            from ..data import AITODDataset
            from ..data.pipeline import load_image

            ds = AITODDataset(cfg["dataset"]["val_ann"],
                              cfg["dataset"]["val_img_prefix"], filter_empty=False)
            gt = ds.coco_gt()
            imgs_iter = (load_image(ds.image_path(i)) for i in range(len(ds)))
            names = [os.path.basename(ds.img_infos[i].get("file_name", f"img{i}.jpg"))
                     for i in range(len(ds))]
        for i_img, img_np in enumerate(imgs_iter):
            img_np = np.asarray(img_np, np.float32)
            d, s, l = infer_one(img_np)
            dets_per_img.append((d, s, l))
            # TTA views are normalized inside make_tta_views; img_np is raw
            draw(img_np, d, s, l, names[i_img], denorm=False)
        header += f", TTA scales={list(scales)} flip={flip}"
    elif synthetic_n:
        batches, gt = synthetic_val_set(pt, synthetic_n, rotated)
        for img in batches:
            d, l, v = infer(eval_params, jnp.asarray(img),
                            jnp.ones((img.shape[0], 4)))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for b in range(img.shape[0]):
                keep = v[b]
                dets_per_img.append((d[b, keep, :box_dim], d[b, keep, box_dim],
                                     l[b, keep]))
                draw(img[b], d[b, keep, :box_dim], d[b, keep, box_dim],
                     l[b, keep], f"img{len(dets_per_img) - 1}.jpg")
        if rotated:
            from .sodaa import sodaa_evaluate

            stats = sodaa_evaluate(gt, dets_per_img)
            if not quiet:
                print("\n--- SODA-A rotated metrics (synthetic) ---")
                for k, v in stats.items():
                    if k != "per_class":
                        print(f"{k:>24s}: {v:.4f}")
            return float(stats.get("mAP", 0.0)), stats
    else:
        from ..data import AITODDataset, EvalLoader

        ds = AITODDataset(cfg["dataset"]["val_ann"], cfg["dataset"]["val_img_prefix"],
                          filter_empty=False)
        loader = EvalLoader(ds, pt.batch_size, pt.img_size,
                            img_norm=cfg["dataset"].get("img_norm"))
        for idxs, imgs, scales, shapes in loader:
            d, l, v = infer(eval_params, jnp.asarray(imgs), jnp.asarray(scales),
                            jnp.asarray(shapes))
            d, l, v = np.asarray(d), np.asarray(l), np.asarray(v)
            for bi, i in enumerate(idxs):
                keep = v[bi]
                dets_per_img.append((d[bi, keep, :4], d[bi, keep, 4], l[bi, keep]))
                draw(imgs[bi], d[bi, keep, :4], d[bi, keep, 4], l[bi, keep],
                     os.path.basename(ds.img_infos[i].get("file_name", f"img{i}.jpg")))
        gt = ds.coco_gt()

    if out:
        np.savez(out, **{
            f"img{i}": np.concatenate(
                [d, s[:, None], l[:, None].astype(np.float32)], -1)
            for i, (d, s, l) in enumerate(dets_per_img)
        })

    ev = COCOStyleEval(gt, dets_per_img)
    stats = ev.evaluate()
    if not quiet:
        print(f"\n--- {header} ---")
        for k, v in stats.items():
            print(f"{k:>24s}: {v:.4f}")
        print("\nper-class AP:")
        for cls, ap in ev.per_class_ap.items():
            print(f"{cls:>24s}: {ap:.4f}")
    return float(stats.get("mAP", 0.0)), stats

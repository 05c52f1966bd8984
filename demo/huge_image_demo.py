"""Huge-image inference demo: tile -> per-patch inference -> rotated-NMS merge.

Capability target: OBB_TOD/demo/huge_image_demo.py (inference_detector_by_patches).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("img")
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?")
    ap.add_argument("--patch-size", type=int, default=800)
    ap.add_argument("--gap", type=int, default=200)
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from point_teacher_tpu.apis import inference_detector, init_detector
    from point_teacher_tpu.data.patch import patch_name, split_image
    from point_teacher_tpu.data.pipeline import load_image
    from point_teacher_tpu.evalx.sodaa import merge_patch_detections

    det = init_detector(args.config, args.checkpoint)
    img = load_image(args.img)
    names, dets_list = [], []
    for patch, (x0, y0) in split_image(img, (args.patch_size,), (args.gap,)):
        per_class = inference_detector(det, patch)
        boxes = np.concatenate([r[:, :-1] for r in per_class]) if per_class else np.zeros((0, 5))
        scores = np.concatenate([r[:, -1] for r in per_class])
        labels = np.concatenate([np.full(len(r), c) for c, r in enumerate(per_class)])
        names.append(patch_name(os.path.basename(args.img), args.patch_size, x0, y0))
        dets_list.append((boxes, scores, labels))
    merged = merge_patch_detections(names, dets_list, len(det.CLASSES))
    (rb, sc, lb) = next(iter(merged.values()))
    keep = sc >= args.score_thr
    print(f"{int(keep.sum())} detections above {args.score_thr}:")
    for b, s, l in zip(rb[keep], sc[keep], lb[keep]):
        print(f"  {det.CLASSES[int(l)]}: {np.round(b, 1).tolist()} score={s:.3f}")


if __name__ == "__main__":
    main()

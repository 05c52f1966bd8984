"""Single-image inference demo.

Capability target: HBB_TOD/demo/image_demo.py — init_detector +
inference_detector on one image, printing (and optionally saving) detections.
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
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--out", help="save detections as .npz")
    ap.add_argument("--out-img", help="save an annotated image "
                                      "(model.show_result analog)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from point_teacher_tpu.apis import inference_detector, init_detector

    det = init_detector(args.config, args.checkpoint)
    results = inference_detector(det, args.img)
    for cls_name, res in zip(det.CLASSES, results):
        keep = res[:, -1] >= args.score_thr
        for row in res[keep]:
            print(f"{cls_name}: box={np.round(row[:-1], 1).tolist()} "
                  f"score={row[-1]:.3f}")
    if args.out:
        np.savez(args.out, **{c: r for c, r in zip(det.CLASSES, results)})
        print(f"saved: {args.out}")
    if args.out_img:
        from point_teacher_tpu.data.pipeline import load_image
        from point_teacher_tpu.utils.visualize import (
            imshow_det_bboxes, imshow_det_rbboxes,
        )

        boxes = np.concatenate([r[:, :-1] for r in results], 0)
        scores = np.concatenate([r[:, -1] for r in results], 0)
        labels = np.concatenate(
            [np.full(len(r), i) for i, r in enumerate(results)], 0)
        drawer = imshow_det_rbboxes if det.rotated else imshow_det_bboxes
        drawer(load_image(args.img), boxes, labels, scores,
               class_names=det.CLASSES, score_thr=args.score_thr,
               out_file=args.out_img)
        print(f"saved annotated image: {args.out_img}")


if __name__ == "__main__":
    main()

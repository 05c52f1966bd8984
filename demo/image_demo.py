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


if __name__ == "__main__":
    main()

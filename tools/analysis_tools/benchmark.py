"""Inference FPS benchmark.

Capability target: HBB_TOD/tools/analysis_tools/benchmark.py:90-116 — measure
teacher-inference FPS over synthetic or real batches with warmup.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?")
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from point_teacher_tpu.apis import init_detector

    det = init_detector(args.config, args.checkpoint)
    r = np.random.RandomState(0)
    imgs = jnp.asarray(
        r.randint(0, 255, (args.batch, det.img_size, det.img_size, 3)).astype(np.float32)
    )
    scales = jnp.ones((args.batch, 4))
    for _ in range(args.warmup):
        out = det.infer_fn(det.params, imgs, scales)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = det.infer_fn(det.params, imgs, scales)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.iters * args.batch / dt
    print(f"Overall fps: {fps:.1f} img / s  ({dt / args.iters * 1e3:.1f} ms/iter, "
          f"batch {args.batch}, {det.img_size}px)")


if __name__ == "__main__":
    main()

"""Profile the rotated strong-augmentation warp at the bench geometry.

VERDICT r4 target: the rotation-aug warp (raugment.py, parity-required per
OBB_TOD syn_images_generator_v2.py:223-360) cost ~1.1 imgs/s of the rotated
bench. This isolates where that time goes: the lax.switch flip (computes all
4 branches under vmap), the NEAREST rotate (full 2D gather), the separable
bilinear rescale, and candidate variants.

Tunnel-safe protocol (CLAUDE.md): K reps inside one jit via lax.scan with a
data-dependent carry; report (T_K - T_1)/(K - 1).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.core.raugment import (
    RAugBatch,
    _canon_le90,
    _flip_image,
    _flip_points,
    _flip_rboxes,
    _rotate_coords,
    _rotate_image_nearest,
    strong_augment_rotated,
)
from point_teacher_tpu.core.augment import rescale_offsets, warp_rescale_image


def timed(fn, args, k=8, reps=3):
    """(T_K - T_1)/(K-1) with a scan-carried dependence."""

    def body(c, _):
        out = fn(*((c,) + args[1:]))
        return out, ()

    @jax.jit
    def run_k(x):
        y, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.float32(y).ravel()[0] + 0.0

    @jax.jit
    def run_1(x):
        y, _ = jax.lax.scan(body, x, None, length=1)
        return jnp.float32(y).ravel()[0] + 0.0

    float(run_k(args[0]))
    float(run_1(args[0]))
    tk = min(
        (lambda t0: (float(run_k(args[0])), time.perf_counter() - t0))(
            time.perf_counter())[1] for _ in range(reps))
    t1 = min(
        (lambda t0: (float(run_1(args[0])), time.perf_counter() - t0))(
            time.perf_counter())[1] for _ in range(reps))
    return (tk - t1) / (k - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=1200)
    ap.add_argument("--gt", type=int, default=48)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    r = np.random.RandomState(0)
    b, s, g = args.batch, args.img, args.gt
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    pts = jnp.asarray(r.uniform(50, s - 50, (b, g, 2)).astype(np.float32))
    rb = jnp.asarray(np.concatenate([
        r.uniform(50, s - 50, (b, g, 2)), r.uniform(8, 40, (b, g, 2)),
        r.uniform(-1.5, 1.5, (b, g, 1))], -1).astype(np.float32))
    valid = jnp.ones((b, g), bool)
    key = jax.random.PRNGKey(0)

    def full(im):
        batch = RAugBatch(im, pts, valid, pts, rb, valid)
        out = strong_augment_rotated(key, batch)
        return out.image

    def flip_only(im):
        def one(k1, x):
            d = jax.random.randint(k1, (), 0, 4)
            return _flip_image(x, d)
        return jax.vmap(one)(jax.random.split(key, b), im)

    def rot_only(im):
        def one(k1, x):
            a = jax.random.randint(k1, (), 1, 20).astype(x.dtype)
            return _rotate_image_nearest(x, -(-a * (jnp.pi / 180.0)), s, s)
        return jax.vmap(one)(jax.random.split(key, b), im)

    def rescale_only(im):
        def one(k1, x):
            u = jax.random.uniform(k1, (), minval=0.8, maxval=1.2)
            sc = jnp.round(u * 10.0) / 10.0
            return warp_rescale_image(x, sc)
        return jax.vmap(one)(jax.random.split(key, b), im)

    for name, fn in [("full aug", full), ("flip only", flip_only),
                     ("rotate only", rot_only), ("rescale only", rescale_only)]:
        dt = timed(fn, (img,), k=args.k)
        print(f"{name:>14s}: {dt * 1e3:8.2f} ms  ({dt * 1e3 / b:.2f} ms/img)",
              flush=True)


if __name__ == "__main__":
    main()

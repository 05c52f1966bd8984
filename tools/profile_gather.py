"""Price the rotated strong-aug image gather vs dtype and layout.

The batch-flat nearest-rotate gather (core/raugment.rotate_images_nearest)
costs ~9.7 ms/img at 1200px f32 (r4). If the TPU gather is bandwidth-bound,
halving the element size (bf16 — exact for raw integer pixels <= 255) halves
it; if it is index-overhead-bound, dtype won't matter and the remaining lever
is fewer gathered elements. This probe measures jnp.take at the aug geometry
for f32 / bf16 / u8 payloads, plus the full rotate_images_nearest on both
dtypes, using the tunnel-safe in-jit K-rep protocol (CLAUDE.md).

Run: python tools/profile_gather.py [--img 1200 --batch 4] [--cpu]
"""
import argparse
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


def timeit_krep(fn, *args, k=8):
    """(T_K - T_1)/(K-1): run the op K times inside one jit with a
    data-dependent carry so reps are not CSE'd; subtracts dispatch RTT."""

    def reps(n, *a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            return out, ()

        out, _ = jax.lax.scan(body, a[0], None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    r1 = jax.jit(lambda *a: reps(1, *a))
    rk = jax.jit(lambda *a: reps(k, *a))
    float(r1(*args)); float(rk(*args))
    t1s, tks = [], []
    for _ in range(5):
        t0 = time.perf_counter(); float(r1(*args)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(rk(*args)); tks.append(time.perf_counter() - t0)
    t1, tk = float(np.median(t1s)), float(np.median(tks))
    return (tk - t1) / (k - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    s, b = args.img, args.batch
    r = np.random.RandomState(0)
    base = r.randint(0, 255, (b, s, s, 3)).astype(np.float32)
    idx = jnp.asarray(r.randint(0, b * s * s, (b * s * s,)), jnp.int32)

    for name, arr in [
        ("f32", jnp.asarray(base)),
        ("bf16", jnp.asarray(base, jnp.bfloat16)),
        ("u8", jnp.asarray(base, jnp.uint8)),
    ]:
        flat = arr.reshape(b * s * s, 3)

        # carry is the gathered output; regather from it so reps chain
        t = timeit_krep(lambda c, ix: jnp.take(c, ix, axis=0), flat, idx)
        gb = flat.size * flat.dtype.itemsize / 1e9
        print(f"take[{name}]  {t*1e3:7.2f} ms  ({gb:.3f} GB payload, "
              f"{gb/t:.0f} GB/s effective)")

    from point_teacher_tpu.core.raugment import rotate_images_nearest

    rads = jnp.asarray(r.uniform(-0.33, -0.02, (b,)), jnp.float32)
    for name, arr in [("f32", jnp.asarray(base)),
                      ("bf16", jnp.asarray(base, jnp.bfloat16))]:
        t = timeit_krep(lambda c, rd: rotate_images_nearest(c, rd), arr, rads)
        print(f"rotate_images_nearest[{name}]  {t*1e3:7.2f} ms "
              f"({t/b*1e3:.2f} ms/img)")


if __name__ == "__main__":
    main()

"""Isolated dense-core (backbone+FPN+PSAGG+head) fwd/bwd throughput + MFU.

Measurement protocol for the axon tunnel backend: ONE process at a time, and
sync by fetching a scalar VALUE (device_get) — block_until_ready alone has
been observed to return early when multiple processes share the tunnel.
Run:  python tools/profile_dense.py --batch 6
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


def timeit(fn, *args, n=8):
    # reduce to ONE scalar inside the jitted program (a python-side tree sum
    # would issue one tiny dispatch per leaf — ~ms each over the tunnel),
    # then fetch its VALUE (block_until_ready alone has returned early when
    # several processes share the tunnel).
    def total(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(jnp.sum(l.astype(jnp.float32)) if l.dtype != bool else jnp.sum(l)
                   for l in leaves)

    wrapped = jax.jit(total)
    float(wrapped(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(wrapped(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def conv_flops(h, w, cin, cout, k=3, stride=1):
    return 2 * (h // stride) * (w // stride) * cin * cout * k * k


def dense_flops_per_img(s=800):
    f = conv_flops(s, s, 3, 64, 7, 2)
    cfg = [(3, 64, 256, s // 4), (4, 128, 512, s // 8),
           (6, 256, 1024, s // 16), (3, 512, 2048, s // 32)]
    cin = 64
    for blocks, mid, cout, sz in cfg:
        for b in range(blocks):
            f += conv_flops(sz, sz, cin if b == 0 else cout, mid, 1)
            f += conv_flops(sz, sz, mid, mid, 3)
            f += conv_flops(sz, sz, mid, cout, 1)
            if b == 0:
                f += conv_flops(sz, sz, cin, cout, 1)
        cin = cout
    for c, sz in ((512, s // 8), (1024, s // 16), (2048, s // 32)):
        f += conv_flops(sz, sz, c, 256, 1)
    for sz in (s // 8, s // 16, s // 32):
        f += conv_flops(sz, sz, 256, 256, 3)
    f += conv_flops(s // 32, s // 32, 256, 256, 3, 2)
    f += conv_flops(s // 64, s // 64, 256, 256, 3, 2)
    for sz in (s // 128, s // 64, s // 32, s // 16, s // 8):
        f += conv_flops(sz, sz, 256, 256, 1)
    hs = s // 8
    f += 8 * conv_flops(hs, hs, 256, 256, 3)
    f += conv_flops(hs, hs, 256, 8, 3) + conv_flops(hs, hs, 256, 4, 3)
    f += conv_flops(hs, hs, 256, 1, 3)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--frozen-stages", type=int, default=1)
    ap.add_argument("--calib-only", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (functional check only — "
                         "throughput numbers are meaningless off-TPU)")
    ap.add_argument("--rotated", action="store_true",
                    help="profile the SODA-A rotated dense core instead "
                         "(StudentRotatedFCOS: GN(32) towers, angle branch). "
                         "Use --img 1200 --batch 12 for the 3-view phase-1 "
                         "geometry. Adds a tower_gn=False A/B to price the "
                         "GroupNorm layers.")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    s, b = args.img, args.batch
    r = np.random.RandomState(0)

    # dispatch floor: a null program round trip (tunnel RPC + scalar fetch)
    z = jnp.float32(1.0)
    t0 = timeit(lambda x: x + 1.0, z)
    print(f"null-program round trip:                     {t0*1e3:7.1f} ms")

    # --- calibration: plain 8-deep 3x3x256 conv stack at the head geometry ---
    hs = s // 8
    x0 = jnp.asarray(r.randn(b, hs, hs, 256), jnp.bfloat16)
    ks = [jnp.asarray(r.randn(3, 3, 256, 256) * 0.05, jnp.bfloat16) for _ in range(8)]

    def stack(x, ks):
        for k in ks:
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return x

    t = timeit(stack, x0, ks)
    fl = 8 * conv_flops(hs, hs, 256, 256, 3) * b
    print(f"calib conv stack fwd ({b}x{hs}x{hs}x256, 8 layers): "
          f"{t*1e3:7.1f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    def stack_loss(ks, x):
        return stack(x, ks).astype(jnp.float32).sum()

    t = timeit(jax.grad(stack_loss), ks, x0)
    print(f"calib conv stack fwd+bwd:                    "
          f"{t*1e3:7.1f} ms  {3*fl/t/1e12:6.1f} TFLOP/s")
    if args.calib_only:
        return

    rng = jax.random.PRNGKey(0)
    if args.rotated:
        from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS

        def mk(**kw):
            m = StudentRotatedFCOS(num_classes=9,
                                   frozen_stages=args.frozen_stages,
                                   dtype=jnp.bfloat16, **kw)
            p = m.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                       method=StudentRotatedFCOS.init_all)
            return m, p

        model, params = mk()
    else:
        from point_teacher_tpu.models.detector import StudentFCOS

        model = StudentFCOS(num_classes=8, frozen_stages=args.frozen_stages,
                            dtype=jnp.bfloat16)
        params = model.init(rng, jnp.zeros((1, s, s, 3)),
                            jnp.zeros((1, 7, 7, 256)),
                            method=StudentFCOS.init_all)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))

    fwd_f = dense_flops_per_img(s) * b
    print(f"analytic dense fwd: {fwd_f/1e9:.1f} GFLOP for batch {b}")

    def full(p, x):
        outs, feat = model.apply(p, x)
        return (sum(o.sum() for o in outs)
                + feat.astype(jnp.float32).sum())

    def bb_only(p, x):
        feats = model.apply(p, x, method=lambda m, xx: m.backbone(xx))
        return sum(f.astype(jnp.float32).sum() for f in feats)

    def up_to_agg(p, x):
        feat = model.apply(p, x, method=lambda m, xx: m.extract_feat(xx))
        return feat.astype(jnp.float32).sum()

    t_bb = timeit(bb_only, params, img)
    t_agg = timeit(up_to_agg, params, img)
    t_fwd = timeit(full, params, img)
    print(f"backbone fwd:        {t_bb*1e3:8.1f} ms")
    print(f"backbone+necks fwd:  {t_agg*1e3:8.1f} ms")
    print(f"full fwd:            {t_fwd*1e3:8.1f} ms   "
          f"{fwd_f/t_fwd/1e12:6.1f} TFLOP/s")
    print(f"head fwd (derived):  {(t_fwd-t_agg)*1e3:8.1f} ms")

    t_g = timeit(jax.grad(full), params, img)
    t_bbg = timeit(jax.grad(bb_only), params, img)
    t_aggg = timeit(jax.grad(up_to_agg), params, img)
    tot = fwd_f * (1 + 2 * 0.85)
    print(f"full fwd+bwd:           {t_g*1e3:8.1f} ms   "
          f"{tot/t_g/1e12:6.1f} TFLOP/s (approx)")
    print(f"backbone fwd+bwd:       {t_bbg*1e3:8.1f} ms")
    print(f"backbone+necks fwd+bwd: {t_aggg*1e3:8.1f} ms")

    if args.rotated:
        # price the GN(32) tower layers: same model with tower_gn=False
        # (throughput probe only — the param tree differs, fresh init)
        m3, p3 = mk(tower_gn=False)

        def full3(p, x):
            outs, feat = m3.apply(p, x)
            return sum(o.sum() for o in outs) + feat.astype(jnp.float32).sum()

        t3f = timeit(full3, p3, img)
        t3g = timeit(jax.grad(full3), p3, img)
        print(f"[A/B] tower_gn=False fwd:     {t3f*1e3:8.1f} ms "
              f"(vs {t_fwd*1e3:.1f})")
        print(f"[A/B] tower_gn=False fwd+bwd: {t3g*1e3:8.1f} ms "
              f"(vs {t_g*1e3:.1f})")


if __name__ == "__main__":
    main()

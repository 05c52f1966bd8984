"""Isolated dense-core (backbone+FPN+PSAGG+head) fwd/bwd throughput + MFU.

Times jax.grad of a scalar loss over the full dense forward at the benched
geometry, reports achieved TFLOP/s against an analytic FLOP count, and
optionally ablates submodules (backbone-only, up-to-neck) to localise the
budget. Run on the real chip:  python tools/profile_dense.py --batch 6
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
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def conv_flops(h, w, cin, cout, k=3, stride=1):
    return 2 * (h // stride) * (w // stride) * cin * cout * k * k


def dense_flops_per_img(s=800):
    """Analytic fwd FLOPs: R50(caffe) + FPN(P3-P7) + PSAGG + FCOS head."""
    f = 0
    # stem: 7x7 s2 3->64 at s/2
    f += conv_flops(s, s, 3, 64, 7, 2)
    # R50 stages (NHWC sizes at s/4, s/8, s/16, s/32)
    cfg = [(3, 64, 256, s // 4), (4, 128, 512, s // 8),
           (6, 256, 1024, s // 16), (3, 512, 2048, s // 32)]
    cin = 64
    for blocks, mid, cout, sz in cfg:
        for b in range(blocks):
            f += conv_flops(sz, sz, cin if b == 0 else cout, mid, 1)
            f += conv_flops(sz, sz, mid, mid, 3)
            f += conv_flops(sz, sz, mid, cout, 1)
            if b == 0:
                f += conv_flops(sz, sz, cin, cout, 1)  # downsample proj
        cin = cout
    # FPN laterals (C3..C5) + 3x3 convs P3..P5 + extra P6 P7
    for c, sz in ((512, s // 8), (1024, s // 16), (2048, s // 32)):
        f += conv_flops(sz, sz, c, 256, 1)
    for sz in (s // 8, s // 16, s // 32):
        f += conv_flops(sz, sz, 256, 256, 3)
    f += conv_flops(s // 32, s // 32, 256, 256, 3, 2)   # P6
    f += conv_flops(s // 64, s // 64, 256, 256, 3, 2)   # P7
    # PSAGG: 5 1x1 convs at P7..P3 output sizes
    for sz in (s // 128, s // 64, s // 32, s // 16, s // 8):
        f += conv_flops(sz, sz, 256, 256, 1)
    # head: 8 tower convs + cls/reg/ctr at s/8
    hs = s // 8
    f += 8 * conv_flops(hs, hs, 256, 256, 3)
    f += conv_flops(hs, hs, 256, 8, 3) + conv_flops(hs, hs, 256, 4, 3)
    f += conv_flops(hs, hs, 256, 1, 3)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--frozen-stages", type=int, default=1)
    args = ap.parse_args()

    from point_teacher_tpu.models.detector import StudentFCOS

    s, b = args.img, args.batch
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, frozen_stages=args.frozen_stages,
                        dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))

    fwd_f = dense_flops_per_img(s) * b
    print(f"analytic dense fwd: {fwd_f/1e9:.1f} GFLOP for batch {b}")

    def loss(p, x):
        (cls, bb, ct), feat = model.apply(p, x)
        return (cls.sum() + bb.sum() + ct.sum()
                + feat.astype(jnp.float32).sum())

    t_fwd = timeit(jax.jit(loss), params, img)
    print(f"fwd:      {t_fwd*1e3:8.1f} ms   {fwd_f/t_fwd/1e12:6.1f} TFLOP/s")

    if not args.fwd_only:
        g = jax.jit(jax.grad(loss))
        t_bwd = timeit(g, params, img)
        # bwd ~ 2x fwd flops (frozen stem+layer1 deducted roughly: ~15%)
        tot = fwd_f * (1 + 2 * 0.85)
        print(f"fwd+bwd:  {t_bwd*1e3:8.1f} ms   {tot/t_bwd/1e12:6.1f} TFLOP/s (approx)")

    # ablations: backbone only / + neck / + head
    def bb_only(p, x):
        feats = model.apply(p, x, method=lambda m, xx: m.backbone(xx))
        return sum(f.astype(jnp.float32).sum() for f in feats)

    def up_to_agg(p, x):
        feat = model.apply(p, x, method=StudentFCOS.extract_feat)
        return feat.astype(jnp.float32).sum()

    t_bb = timeit(jax.jit(bb_only), params, img)
    t_agg = timeit(jax.jit(up_to_agg), params, img)
    print(f"backbone fwd:        {t_bb*1e3:8.1f} ms")
    print(f"backbone+necks fwd:  {t_agg*1e3:8.1f} ms")
    print(f"head fwd (derived):  {(t_fwd-t_agg)*1e3:8.1f} ms")

    if not args.fwd_only:
        t_bbg = timeit(jax.jit(jax.grad(bb_only)), params, img)
        t_aggg = timeit(jax.jit(jax.grad(up_to_agg)), params, img)
        print(f"backbone fwd+bwd:       {t_bbg*1e3:8.1f} ms")
        print(f"backbone+necks fwd+bwd: {t_aggg*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

"""Model FLOPs/params counter.

Capability target: HBB_TOD/tools/analysis_tools/get_flops.py (forward_dummy +
mmcv flops counter). Uses XLA's own cost analysis of the compiled forward —
more accurate than layer-hook counting.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--shape", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from point_teacher_tpu.apis import init_detector

    det = init_detector(args.config)
    img = jnp.zeros((1, args.shape, args.shape, 3))

    def fwd(params, img):
        return det.model.apply(params, img)

    lowered = jax.jit(fwd).lower(det.params, img)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(det.params))
    print(f"Input shape: (1, {args.shape}, {args.shape}, 3)")
    print(f"Flops: {flops / 1e9:.2f} GFLOPs")
    print(f"Params: {n_params / 1e6:.2f} M")


if __name__ == "__main__":
    main()

"""Phase-1 memory diagnosis: XLA memory analysis + explicit-remat variant."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import Batch, create_train_state
    from point_teacher_tpu.train.steps import build_train_step

    s, b, g = 800, 2, 100
    cfg = PointTeacherConfig(img_size=s, max_gt=g, batch_size=b)
    rng = jax.random.PRNGKey(0)
    model = StudentFCOS(num_classes=8, dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, 7, 7, 256)),
                        method=StudentFCOS.init_all)
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randint(0, 255, (b, s, s, 3)).astype(np.float32))
    cxy = r.uniform(20, s - 20, (b, g, 2))
    wh = r.uniform(4, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), dtype=jnp.float32)
    labels = jnp.asarray(r.randint(0, 8, (b, g)), dtype=jnp.int32)
    valid = jnp.ones((b, g), bool)
    batch = Batch(image=img, gt_boxes=boxes, gt_labels=labels, gt_valid=valid,
                  image_ids=jnp.arange(b, dtype=jnp.int32))
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=16, max_gt=g, rng=rng)
    step = build_train_step(model, tx, cfg, donate=False)

    lowered = step.lower(state, batch, phase1=True)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        print("memory analysis:", ma)
    except Exception as e:
        print("memory_analysis unavailable:", e)
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print("flops:", ca.get("flops"), "bytes:", ca.get("bytes accessed"))
    except Exception as e:
        print("cost_analysis unavailable:", e)

    def timeit(fn, *args, n=5):
        out = fn(*args)
        jax.block_until_ready(out[1]["total_loss"])
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out[1]["total_loss"])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    print(f"phase-1 (no donate):   {timeit(compiled, state, batch)*1e3:8.1f} ms"
          if False else f"phase-1:   {timeit(lambda s2, b2: step(s2, b2, phase1=True), state, batch)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

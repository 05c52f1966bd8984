"""Mesh/data-parallel utilities (the mock-distributed test analog)."""
import jax
import jax.numpy as jnp
import numpy as np

from point_teacher_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_state, shard_batch,
)
from point_teacher_tpu.train.state import Batch


def _batch(b):
    return Batch(
        image=np.zeros((b, 8, 8, 3), np.float32),
        gt_boxes=np.zeros((b, 2, 4), np.float32),
        gt_labels=np.zeros((b, 2), np.int32),
        gt_valid=np.ones((b, 2), bool),
        image_ids=np.arange(b, dtype=np.int32),
    )


def test_shard_batch_over_mesh():
    assert jax.device_count() == 8
    mesh = make_mesh()
    b = shard_batch(_batch(8), mesh)
    assert len(b.image.sharding.device_set) == 8
    # per-device shard carries one image
    assert b.image.addressable_shards[0].data.shape[0] == 1


def test_replicate_state():
    mesh = make_mesh()
    state = {"w": jnp.ones((4, 4))}
    rep = replicate_state(state, mesh)
    assert len(rep["w"].sharding.device_set) == 8
    assert rep["w"].addressable_shards[0].data.shape == (4, 4)  # full copy


def test_global_sum_matches_local():
    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    b = _batch(8)._replace(image=np.broadcast_to(x[:, :, None, None], (8, 2, 1, 1)).copy())
    sharded = shard_batch(b, mesh)
    total = jax.jit(lambda im: im.sum())(sharded.image)
    assert float(total) == float(x.sum() * 1)


def test_sharded_train_step_matches_single_device():
    """The full phase-1/phase-2 point-teacher step over the 8-device mesh
    produces the same losses/metrics and the same updated state as the
    single-device program (same batch, same rng) — the DP-equivalence
    guarantee the reference gets from DDP gradient all-reduce
    (mmdet/apis/train.py:73-85)."""
    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.parallel.mesh import make_sharded_train_step
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import create_train_state
    from point_teacher_tpu.train.steps import build_train_step

    B, IMG, G = 8, 64, 4
    cfg = PointTeacherConfig(
        num_classes=4, img_size=IMG, max_gt=G, batch_size=B,
        num_training_burninstep1=G, num_training_burninstep2=G,
        fine_proposal_cfg=(
            FineProposalCfg(base_ratios=(1.0,), shake_ratio=None, min_scale=0.0,
                            gen_num_neg=8),
        ),
        fine_proposal_extensive_cfg=(
            FineProposalCfg(base_ratios=(1.0, 1.2), shake_ratio=None, min_scale=4.0),
        ),
    )
    model = StudentFCOS(num_classes=cfg.num_classes, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)),
                        jnp.zeros((2, 7, 7, 256)), method=StudentFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=16, max_gt=G, rng=rng)

    rs = np.random.RandomState(7)
    cxy = rs.uniform(10, IMG - 10, (B, G, 2)).astype(np.float32)
    wh = rs.uniform(4, 12, (B, G, 2)).astype(np.float32)
    batch = Batch(
        image=rs.randint(0, 255, (B, IMG, IMG, 3)).astype(np.float32),
        gt_boxes=np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
        gt_labels=rs.randint(0, 4, (B, G)).astype(np.int32),
        gt_valid=np.ones((B, G), bool),
        image_ids=np.arange(B, dtype=np.int32),
    )

    single = build_train_step(model, tx, cfg)
    mesh = make_mesh()
    sharded = make_sharded_train_step(model, tx, cfg, mesh)

    for phase1 in (True, False):
        s_ref, m_ref = single(state, jax.tree_util.tree_map(jnp.asarray, batch),
                              phase1)
        s_dp, m_dp = sharded(state, batch, phase1)
        for k in sorted(m_ref):
            a, b = float(m_ref[k]), float(m_dp[k])
            assert np.isfinite(b), (k, b)
            assert np.allclose(a, b, rtol=2e-3, atol=2e-4), (k, a, b)
        # updated parameters agree (the DP gradient reduction matches the
        # single-program gradient)
        leaves_ref = jax.tree_util.tree_leaves(s_ref.params)
        leaves_dp = jax.tree_util.tree_leaves(s_dp.params)
        for lr, ld in zip(leaves_ref, leaves_dp):
            np.testing.assert_allclose(np.asarray(lr), np.asarray(ld),
                                       rtol=2e-3, atol=2e-4)
        # point caches committed identically
        np.testing.assert_allclose(np.asarray(s_ref.refined_points),
                                   np.asarray(s_dp.refined_points),
                                   rtol=1e-4, atol=1e-4)


def test_scan_superstep_shards_batch_axis_not_step_axis():
    """Superstep + DP: the [K, B, ...]-stacked pytree must shard axis 1 (the
    batch) with P(None, 'data'), not axis 0 (the scan axis) — and a group
    length K NOT divisible by the device count must still run. Equivalence
    oracle: K sequential single-device steps (round-2 advisor finding)."""
    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.parallel.mesh import shard_stacked_batch
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import create_train_state
    from point_teacher_tpu.train.steps import build_train_step, build_train_step_scan

    K, B, IMG, G = 3, 8, 64, 4  # K=3 is NOT divisible by the 8-device mesh
    cfg = PointTeacherConfig(
        num_classes=4, img_size=IMG, max_gt=G, batch_size=B,
        num_training_burninstep1=G, num_training_burninstep2=G,
        fine_proposal_cfg=(
            FineProposalCfg(base_ratios=(1.0,), shake_ratio=None, min_scale=0.0,
                            gen_num_neg=8),
        ),
        fine_proposal_extensive_cfg=(
            FineProposalCfg(base_ratios=(1.0, 1.2), shake_ratio=None, min_scale=4.0),
        ),
    )
    model = StudentFCOS(num_classes=cfg.num_classes, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)),
                        jnp.zeros((2, 7, 7, 256)), method=StudentFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=32, max_gt=G, rng=rng)

    rs = np.random.RandomState(11)
    batches = []
    for k in range(K):
        cxy = rs.uniform(10, IMG - 10, (B, G, 2)).astype(np.float32)
        wh = rs.uniform(4, 12, (B, G, 2)).astype(np.float32)
        batches.append(Batch(
            image=rs.randint(0, 255, (B, IMG, IMG, 3)).astype(np.float32),
            gt_boxes=np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
            gt_labels=rs.randint(0, 4, (B, G)).astype(np.int32),
            gt_valid=np.ones((B, G), bool),
            image_ids=(np.arange(B, dtype=np.int32) + k * B),
        ))

    single = build_train_step(model, tx, cfg)
    s_ref = state
    metrics_ref = []
    for b in batches:
        s_ref, m = single(s_ref, jax.tree_util.tree_map(jnp.asarray, b), True)
        metrics_ref.append(m)

    mesh = make_mesh()
    scan = build_train_step_scan(model, tx, cfg, donate=False)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    state_rep = replicate_state(state, mesh)
    s_dp, ms = scan(state_rep, shard_stacked_batch(stacked, mesh), phase1=True)

    for k in sorted(metrics_ref[0]):
        for i in range(K):
            a, b = float(metrics_ref[i][k]), float(ms[k][i])
            assert np.isfinite(b), (k, i, b)
            assert np.allclose(a, b, rtol=2e-3, atol=2e-4), (k, i, a, b)
    for lr, ld in zip(jax.tree_util.tree_leaves(s_ref.params),
                      jax.tree_util.tree_leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(lr), np.asarray(ld),
                                   rtol=2e-3, atol=2e-4)


def test_rotated_sharded_train_step_matches_single_device():
    """Rotated TS step over the 8-device mesh == single-device program (same
    batch, same rng): the SPMD DP guarantee extended to the OBB trainer."""
    from point_teacher_tpu.core.proposals import FineProposalCfg
    from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS
    from point_teacher_tpu.parallel.mesh import make_sharded_rotated_train_step
    from point_teacher_tpu.train.config import PointTeacherConfig
    from point_teacher_tpu.train.optim import make_optimizer
    from point_teacher_tpu.train.state import create_train_state
    from point_teacher_tpu.train.rsteps import build_rotated_train_step

    B, IMG, G = 8, 64, 3
    cfg = PointTeacherConfig(
        num_classes=4, img_size=IMG, max_gt=G, batch_size=B, num_stages=1,
        num_training_burninstep1=G, num_training_burninstep2=G,
        fine_proposal_cfg=(
            FineProposalCfg(base_ratios=(1.0,), shake_ratio=None, min_scale=0.0,
                            gen_num_neg=8),
        ),
        fine_proposal_extensive_cfg=(
            FineProposalCfg(base_ratios=(1.0, 1.2), shake_ratio=None, min_scale=4.0),
        ),
    )
    model = StudentRotatedFCOS(num_classes=cfg.num_classes, num_stages=1,
                               dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, IMG, IMG, 3)),
                        jnp.zeros((2, 7, 7, 256)),
                        method=StudentRotatedFCOS.init_all)
    tx = make_optimizer(params, cfg.optim)
    state = create_train_state(params, tx, num_images=16, max_gt=G, rng=rng)

    rs = np.random.RandomState(9)
    gt = np.stack(
        [rs.uniform(12, IMG - 12, (B, G)), rs.uniform(12, IMG - 12, (B, G)),
         rs.uniform(6, 14, (B, G)), rs.uniform(4, 10, (B, G)),
         rs.uniform(-np.pi / 2, np.pi / 2, (B, G))], -1).astype(np.float32)
    batch = Batch(
        image=rs.randint(0, 255, (B, IMG, IMG, 3)).astype(np.float32),
        gt_boxes=gt,
        gt_labels=rs.randint(0, 4, (B, G)).astype(np.int32),
        gt_valid=np.ones((B, G), bool),
        image_ids=np.arange(B, dtype=np.int32),
    )

    single = build_rotated_train_step(model, tx, cfg)
    mesh = make_mesh()
    sharded = make_sharded_rotated_train_step(model, tx, cfg, mesh)

    for phase1 in (True, False):
        s_ref, m_ref = single(state, jax.tree_util.tree_map(jnp.asarray, batch),
                              phase1)
        s_dp, m_dp = sharded(state, batch, phase1)
        for k in sorted(m_ref):
            a, b = float(m_ref[k]), float(m_dp[k])
            assert np.isfinite(b), (k, b)
            assert np.allclose(a, b, rtol=2e-3, atol=2e-4), (k, a, b)
        leaves_ref = jax.tree_util.tree_leaves(s_ref.params)
        leaves_dp = jax.tree_util.tree_leaves(s_dp.params)
        for lr, ld in zip(leaves_ref, leaves_dp):
            # the polygon-clip IoU gradients amplify f32 reduction-order
            # noise slightly more than the HBB step (observed max 4e-4)
            np.testing.assert_allclose(np.asarray(lr), np.asarray(ld),
                                       rtol=2e-3, atol=8e-4)
        np.testing.assert_allclose(np.asarray(s_ref.refined_points),
                                   np.asarray(s_dp.refined_points),
                                   rtol=1e-3, atol=1e-3)

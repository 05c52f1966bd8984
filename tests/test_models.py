import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.models import FCOSHead, FPN, PSAGG, ResNet, StudentFCOS


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_resnet50_stage_shapes(rng):
    model = ResNet(depth=50, style="caffe", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(rng, x)
    outs = model.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)
    ]


def test_fpn_five_levels(rng):
    model = FPN(out_channels=256, dtype=jnp.float32)
    ins = [jnp.zeros((1, 32, 32, 256)), jnp.zeros((1, 16, 16, 512)),
           jnp.zeros((1, 8, 8, 1024)), jnp.zeros((1, 4, 4, 2048))]
    params = model.init(rng, ins)
    outs = model.apply(params, ins)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 256 for o in outs)


def test_psagg_collapses_to_stride8(rng):
    model = PSAGG(num_aggregation=5, out_channels=256, dtype=jnp.float32)
    ins = [jnp.ones((1, 2 ** (4 - i), 2 ** (4 - i), 256)) for i in range(5)]
    params = model.init(rng, ins)
    outs = model.apply(params, ins)
    assert len(outs) == 1
    assert outs[0].shape == (1, 16, 16, 256)


def test_fcos_head_outputs(rng):
    head = FCOSHead(num_classes=8, dtype=jnp.float32)
    feat = jax.random.normal(rng, (2, 16, 16, 256))
    params = head.init(rng, feat)
    cls_score, bbox_pred, ctr = head.apply(params, feat)
    assert cls_score.shape == (2, 16, 16, 8)
    assert bbox_pred.shape == (2, 16, 16, 4)
    assert ctr.shape == (2, 16, 16, 1)
    # norm_on_bbox: non-negative, stride-scaled
    assert float(bbox_pred.min()) >= 0.0
    # prior-prob bias: initial cls sigmoid ~= 0.01
    p = jax.nn.sigmoid(cls_score)
    assert 0.003 < float(p.mean()) < 0.05


def test_student_fcos_end_to_end(rng):
    model = StudentFCOS(num_classes=8, dtype=jnp.float32)
    img = jax.random.uniform(rng, (1, 64, 64, 3)) * 255.0
    rois = jnp.zeros((4, 7, 7, 256))
    params = model.init(rng, img, rois, method=StudentFCOS.init_all)
    (cls_score, bbox_pred, ctr), feat = model.apply(params, img)
    assert cls_score.shape == (1, 8, 8, 8)
    assert feat.shape == (1, 8, 8, 256)
    # MIL towers callable
    deltas = model.apply(params, rois, 0, method=StudentFCOS.mil_regress)
    assert deltas.shape == (4, 4)
    cs, ins = model.apply(params, rois, 0, method=StudentFCOS.mil_classify)
    assert cs.shape == (4, 8) and ins.shape == (4, 8)


def test_student_fcos_bf16_params_f32_outputs(rng):
    model = StudentFCOS(num_classes=8, dtype=jnp.bfloat16)
    img = jnp.ones((1, 32, 32, 3)) * 128.0
    rois = jnp.zeros((2, 7, 7, 256))
    params = model.init(rng, img, rois, method=StudentFCOS.init_all)
    # params stay f32 (flax promotes computation only)
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
    (cls_score, bbox_pred, ctr), feat = model.apply(params, img)
    assert cls_score.dtype == jnp.float32  # head casts outputs back to f32
    assert np.isfinite(np.asarray(cls_score)).all()


def test_student_fcos_odd_pyramid_sizes(rng):
    # 160px -> levels 20,10,5,3,2: odd sizes exercise the nearest-resize paths
    model = StudentFCOS(num_classes=4, dtype=jnp.float32)
    img = jnp.ones((1, 160, 160, 3)) * 80.0
    rois = jnp.zeros((1, 7, 7, 256))
    params = model.init(rng, img, rois, method=StudentFCOS.init_all)
    (cls_score, bbox_pred, ctr), feat = model.apply(params, img)
    assert cls_score.shape == (1, 20, 20, 4)
    assert np.isfinite(np.asarray(cls_score)).all()


def test_space_to_depth_stem_equals_plain_stem():
    """The s2d stem (4x4/s1 conv on 2x2 space-to-depth input, kernel
    repacked from the stored [7,7,3,64]) must reproduce the plain 7x7/s2
    stem exactly — same params, same math, MXU-friendlier layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from point_teacher_tpu.models.resnet import ResNet

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 64, 64, 3).astype(np.float32))
    m_plain = ResNet(depth=50, s2d_stem=False, dtype=jnp.float32)
    m_s2d = ResNet(depth=50, s2d_stem=True, dtype=jnp.float32)
    params = m_plain.init(jax.random.PRNGKey(0), x)
    # identical parameter trees: the s2d variant reuses stem_conv/kernel
    params2 = m_s2d.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(params2)
    assert t1 == t2
    o_plain = m_plain.apply(params, x)
    o_s2d = m_s2d.apply(params, x)
    for a, b in zip(o_plain, o_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_split_forward_equals_fused_forward():
    """extract_feat -> head (the train steps' split student forward, which
    lets the head run on a subset of view rows) must be bit-identical to the
    fused __call__ on every row, for both detector forks."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from point_teacher_tpu.models.detector import StudentFCOS
    from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS

    r = np.random.RandomState(1)
    img = jnp.asarray(r.randint(0, 255, (3, 64, 64, 3)).astype(np.float32))
    rois = jnp.zeros((1, 7, 7, 256))
    for cls_m, init_m in ((StudentFCOS, StudentFCOS.init_all),
                          (StudentRotatedFCOS, StudentRotatedFCOS.init_all)):
        model = cls_m(dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0), img[:1], rois, method=init_m)
        outs_fused, feat_fused = model.apply(params, img)
        feat = model.apply(params, img, method=lambda m, x: m.extract_feat(x))
        outs_split = model.apply(params, feat, method=lambda m, f: m.head(f))
        np.testing.assert_array_equal(np.asarray(feat), np.asarray(feat_fused))
        for a, b in zip(outs_fused, outs_split):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and on a row subset: head(feat[1:]) == full rows 1:
        outs_sub = model.apply(params, feat[1:], method=lambda m, f: m.head(f))
        for a, b in zip(outs_fused, outs_sub):
            np.testing.assert_array_equal(np.asarray(a)[1:], np.asarray(b))

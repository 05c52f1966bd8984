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

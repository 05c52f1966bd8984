"""Rotated-detector torch->flax weight port + forward equivalence.

Rotated analog of test_torch_port_full.py: the torch side is the
reference's own TS_P2RBRotatedFCOSHead (rotated_fcos_head_p2rb_ts.py,
loaded in place via tests/_ref_stubs.py) instantiated with the shipped
SODA-A config shape — which leaves the head's default GN(32) towers and
centerness_on_reg=False in force (both were missing from our rotated head
until this test was written; see models/rotated_head.py docstring).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS  # noqa: E402
from point_teacher_tpu.utils.torch_port import (  # noqa: E402
    torch_mil_to_flax, torch_rotated_head_to_flax,
)

from _ref_stubs import setup  # noqa: E402

REF = setup()


@pytest.fixture(scope="module")
def torch_head():
    torch.manual_seed(0)
    head = REF.r_head.TS_P2RBRotatedFCOSHead(
        num_classes=9, in_channels=256, stacked_convs=4, feat_channels=256,
        strides=[8], center_sampling=True, center_sample_radius=1.5,
        norm_on_bbox=True, separate_angle=False, scale_angle=True,
        mil_stack_conv=0, num_stages=2, train_cfg=None,
        bbox_coder=dict(type="DistanceAnglePointCoder", angle_version="le90"),
        bbox_roi_extractor=dict(type="RotatedSingleRoIExtractor"),
    )
    for p in head.parameters():
        p.data = torch.randn_like(p) * 0.05
    return head.eval()


@pytest.fixture(scope="module")
def flax_side(torch_head):
    model = StudentRotatedFCOS(num_classes=9, num_stages=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 7, 7, 256)),
                        method=StudentRotatedFCOS.init_all)
    tree = jax.tree_util.tree_map(np.asarray, params)  # mutable copy
    from point_teacher_tpu.utils.torch_port import _merge_into

    sd = torch_head.state_dict()
    _merge_into(tree["params"]["bbox_head"], torch_rotated_head_to_flax(sd))
    _merge_into(tree["params"]["mil_head"], torch_mil_to_flax(sd, num_stages=2))
    return model, tree


def test_rotated_head_forward_equivalence(torch_head, flax_side):
    """agg feature -> towers (GN) -> cls/bbox/angle/centerness match 1e-4."""
    model, tree = flax_side
    r = np.random.RandomState(1)
    feat_nchw = r.randn(1, 256, 16, 16).astype(np.float32) * 0.5

    with torch.no_grad():
        t_cls, t_bbox, t_angle, t_ctr, _ = torch_head.forward_single(
            torch.from_numpy(feat_nchw), torch_head.scales[0], 8, None)

    feat_nhwc = jnp.asarray(feat_nchw.transpose(0, 2, 3, 1))
    j_cls, j_bbox, j_angle, j_ctr = model.bind(tree).bbox_head(feat_nhwc)

    np.testing.assert_allclose(np.asarray(j_cls).transpose(0, 3, 1, 2),
                               t_cls.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_bbox).transpose(0, 3, 1, 2),
                               t_bbox.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_angle).transpose(0, 3, 1, 2),
                               t_angle.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ctr).transpose(0, 3, 1, 2),
                               t_ctr.numpy(), rtol=1e-4, atol=1e-4)


def test_rotated_mil_tower_forward_equivalence(torch_head, flax_side):
    """Both MIL stages' FC stacks match (reg + bag towers, fc_reg/cls/ins)."""
    model, tree = flax_side
    r = np.random.RandomState(3)
    roi_nchw = r.randn(10, 256, 7, 7).astype(np.float32) * 0.5

    for stage in range(2):
        with torch.no_grad():
            x = torch.from_numpy(roi_nchw).flatten(1)
            h_reg = x
            for fc in torch_head.shared_fcs_reg[stage]:
                h_reg = torch_head.relu(fc(h_reg))
            t_reg = torch_head.fc_reg[stage](h_reg)
            h_bag = x
            for fc in torch_head.shared_fcs_bag[stage]:
                h_bag = torch_head.relu(fc(h_bag))
            t_cls = torch_head.fc_cls[stage](h_bag)
            t_ins = torch_head.fc_ins[stage](h_bag)

        roi_nhwc = jnp.asarray(roi_nchw.transpose(0, 2, 3, 1))
        j_reg = model.apply(tree, roi_nhwc, stage,
                            method=StudentRotatedFCOS.mil_regress)
        j_cls, j_ins = model.apply(tree, roi_nhwc, stage,
                                   method=StudentRotatedFCOS.mil_classify)
        np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f"stage {stage}")
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f"stage {stage}")
        np.testing.assert_allclose(np.asarray(j_ins), t_ins.numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f"stage {stage}")

"""Full-detector torch->flax weight port + forward equivalence.

The torch side is the REFERENCE's own modules (FPN from
mmdet/models/necks/fpn.py, PSAGG from necks/ps_fpn.py, TS_P2BFCOSHead from
dense_heads/fcos_head_p2b_ts.py — loaded in place via tests/_ref_stubs.py)
instantiated with the shipped aitodv2 config and random weights. Porting the
state_dict through utils/torch_port.py must make our flax modules reproduce
the reference dense forward (cls/bbox/centerness maps) and the MIL tower
outputs to float32 tolerance.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from point_teacher_tpu.models.detector import StudentFCOS  # noqa: E402
from point_teacher_tpu.utils.torch_port import (  # noqa: E402
    torch_fcos_head_to_flax, torch_fpn_to_flax, torch_mil_to_flax,
    torch_psagg_to_flax,
)

from _ref_stubs import setup  # noqa: E402

REF = setup()


@pytest.fixture(scope="module")
def torch_modules():
    torch.manual_seed(0)
    fpn = REF.fpn.FPN(in_channels=[256, 512, 1024, 2048], out_channels=256,
                      start_level=1, add_extra_convs="on_output", num_outs=5,
                      relu_before_extra_convs=True)
    ps = REF.ps_fpn.PSAGG(num_aggregation=5, in_channels=256, out_channels=256)
    head = REF.fcos_head.TS_P2BFCOSHead(
        num_classes=8, in_channels=256, stacked_convs=4, feat_channels=256,
        strides=[8], norm_cfg=None, conv_bias=True, norm_on_bbox=True,
        centerness_on_reg=True, dcn_on_last_conv=False, center_sampling=True,
        mil_stack_conv=0, num_stages=1, train_cfg=None,
        bbox_roi_extractor=dict(type="SingleRoIExtractor"),
    )
    # re-randomize so constant-initialized layers don't mask layout bugs
    for m in (fpn, ps, head):
        for p in m.parameters():
            p.data = torch.randn_like(p) * 0.05
    return fpn.eval(), ps.eval(), head.eval()


@pytest.fixture(scope="module")
def flax_side(torch_modules):
    fpn, ps, head = torch_modules
    model = StudentFCOS(num_classes=8, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 7, 7, 256)), method=StudentFCOS.init_all)
    tree = jax.tree_util.tree_map(np.asarray, params)  # mutable copy
    from point_teacher_tpu.utils.torch_port import _merge_into

    _merge_into(tree["params"]["neck"], torch_fpn_to_flax(fpn.state_dict()))
    _merge_into(tree["params"]["neck_agg"], torch_psagg_to_flax(ps.state_dict()))
    head_sd = head.state_dict()
    _merge_into(tree["params"]["bbox_head"], torch_fcos_head_to_flax(head_sd))
    _merge_into(tree["params"]["mil_head"], torch_mil_to_flax(head_sd))
    return model, tree


def _feats(seed=1, h=16, w=16):
    r = np.random.RandomState(seed)
    return [r.randn(1, c, h // (2 ** i), w // (2 ** i)).astype(np.float32) * 0.5
            for i, c in enumerate([256, 512, 1024, 2048])]


def test_neck_and_head_forward_equivalence(torch_modules, flax_side):
    """C2-C5 features -> FPN -> PSAGG -> dense head: maps match to 1e-4."""
    fpn, ps, head = torch_modules
    model, tree = flax_side
    feats_nchw = _feats()

    with torch.no_grad():
        t_outs = fpn([torch.from_numpy(f) for f in feats_nchw])
        t_agg = ps(t_outs)[0]
        t_cls, t_bbox, t_ctr, _ = head.forward_single(
            t_agg, head.scales[0], 8, None)

    feats_nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_nchw]

    def run(p, feats):
        fpn_outs = model.bind(p).neck(feats)
        agg = model.bind(p).neck_agg(fpn_outs)[0]
        return model.bind(p).bbox_head(agg), fpn_outs, agg

    (j_cls, j_bbox, j_ctr), j_fpn_outs, j_agg = run(tree, feats_nhwc)

    for i, t in enumerate(t_outs):
        np.testing.assert_allclose(
            np.asarray(j_fpn_outs[i]).transpose(0, 3, 1, 2), t.numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"fpn level {i}")
    np.testing.assert_allclose(np.asarray(j_agg).transpose(0, 3, 1, 2),
                               t_agg.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_cls).transpose(0, 3, 1, 2),
                               t_cls.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_bbox).transpose(0, 3, 1, 2),
                               t_bbox.numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_ctr).transpose(0, 3, 1, 2),
                               t_ctr.numpy(), rtol=1e-4, atol=1e-4)


def test_mil_tower_forward_equivalence(torch_modules, flax_side):
    """RoI feats -> shared FC towers -> fc_reg / fc_cls / fc_ins match
    (incl. the NCHW->NHWC flatten-layout permutation on the first FC)."""
    _, _, head = torch_modules
    model, tree = flax_side
    r = np.random.RandomState(3)
    roi_nchw = r.randn(12, 256, 7, 7).astype(np.float32) * 0.5

    with torch.no_grad():
        x = torch.from_numpy(roi_nchw).flatten(1)
        h_reg = x
        for fc in head.shared_fcs_reg[0]:
            h_reg = head.relu(fc(h_reg))
        t_reg = head.fc_reg[0](h_reg)
        h_bag = x
        for fc in head.shared_fcs_bag[0]:
            h_bag = head.relu(fc(h_bag))
        t_cls = head.fc_cls[0](h_bag)
        t_ins = head.fc_ins[0](h_bag)

    roi_nhwc = jnp.asarray(roi_nchw.transpose(0, 2, 3, 1))
    j_reg = model.apply(tree, roi_nhwc, 0, method=StudentFCOS.mil_regress)
    j_cls, j_ins = model.apply(tree, roi_nhwc, 0, method=StudentFCOS.mil_classify)

    np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_ins), t_ins.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_load_reference_ts_checkpoint_cli_path(torch_modules, tmp_path):
    """A TS-wrapper .pth (teacher.* + student.* branches, reference layout)
    loads through load_reference_ts_checkpoint — the tools/test.py
    --torch-ckpt path — and selects the requested branch."""
    from test_torch_port import _fake_torch_resnet50_state

    from point_teacher_tpu.utils.torch_port import (
        load_reference_ts_checkpoint, load_torch_detector_into)

    fpn, ps, head = torch_modules
    branch_sd = dict(_fake_torch_resnet50_state())
    # mmdet registers submodules as backbone./neck./neck_agg./bbox_head.
    branch_sd = {"backbone." + k: v for k, v in branch_sd.items()}
    for mod, pre in ((fpn, "neck."), (ps, "neck_agg."), (head, "bbox_head.")):
        for k, v in mod.state_dict().items():
            branch_sd[pre + k] = v
    ts_sd = {}
    for k, v in branch_sd.items():
        ts_sd["teacher." + k] = v
        ts_sd["student." + k] = v * 0  # decoy: zeros must NOT be loaded
    path = str(tmp_path / "ref_ts.pth")
    torch.save({"state_dict": ts_sd, "meta": {"mmdet_version": "2.24.0"}}, path)

    model = StudentFCOS(num_classes=8, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 7, 7, 256)), method=StudentFCOS.init_all)
    got = load_reference_ts_checkpoint(params, path, branch="teacher")
    want = load_torch_detector_into(params, ts_sd, prefix="teacher.")
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert flat_g and len(flat_g) == len(flat_w)
    nonzero = 0
    for p, leaf in flat_g:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_w[p]))
        nonzero += np.any(np.asarray(leaf) != 0)
    assert nonzero > 100  # the zeroed student decoy was not the branch loaded

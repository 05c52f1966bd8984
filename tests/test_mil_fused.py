"""The fused phase-1 MIL pair (train/mil.py mil_stage_pair_phase1) must be
bit-identical to the two sequential mil_stage calls it replaces: the syn
branch (with_bags=False) and the real branch (with_bags=True) share
reg_tower weights, so concatenating their rows into one tower matmul is a
pure launch-count change (row-wise Dense). Guards the r5 fusion used by
train/steps.py phase 1."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.core.proposals import FineProposalCfg
from point_teacher_tpu.train.mil import mil_stage, mil_stage_pair_phase1


@pytest.fixture(scope="module")
def towers():
    r = np.random.RandomState(0)
    w1 = jnp.asarray(r.randn(7 * 7 * 32, 64) * 0.05, jnp.float32)
    wr = jnp.asarray(r.randn(64, 4) * 0.05, jnp.float32)
    wc = jnp.asarray(r.randn(64, 3) * 0.05, jnp.float32)
    wi = jnp.asarray(r.randn(64, 3) * 0.05, jnp.float32)

    def regress(feats, stage):
        h = jax.nn.relu(feats.reshape(feats.shape[0], -1) @ w1)
        return h @ wr

    def classify(feats, stage):
        h = jax.nn.relu(feats.reshape(feats.shape[0], -1) @ w1)
        return h @ wc, h @ wi

    def classify_neg(feats, stage):
        return classify(feats, stage)[0]

    return regress, classify, classify_neg


@pytest.mark.parametrize("grouped", [True, False])
def test_fused_pair_equals_two_stages(towers, grouped):
    regress, classify, classify_neg = towers
    r = np.random.RandomState(1)
    b, g, hw = 2, 3, (96, 96)
    feat_syn = jnp.asarray(r.randn(b, 12, 12, 32), jnp.float32)
    feat_ori = jnp.asarray(r.randn(b, 12, 12, 32), jnp.float32)
    cxy = r.uniform(20, 76, (b, g, 2))
    wh = r.uniform(8, 16, (b, g, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
                        jnp.float32)
    cxy2 = r.uniform(20, 76, (b, g, 2))
    syn_boxes = jnp.asarray(np.concatenate([cxy2 - wh / 2, cxy2 + wh / 2], -1),
                            jnp.float32)
    labels = jnp.asarray(r.randint(0, 3, (b, g)), jnp.int32)
    valid = jnp.asarray(r.rand(b, g) > 0.2)
    real = boxes + 1.5
    fine = FineProposalCfg(base_ratios=(1.0,), shake_ratio=None, min_scale=0.0,
                           gen_num_neg=8)
    ext = FineProposalCfg(base_ratios=(1.0, 1.2, 0.8), shake_ratio=None,
                          min_scale=4.0)
    key = jax.random.PRNGKey(7)
    common = dict(stage=0, img_hw=hw, top_k=2, beta=0.25, dn_hyper=0.2,
                  window=16, grouped=grouped)

    syn_ref = mil_stage(regress, None, None, feat_syn, syn_boxes,
                        jnp.zeros_like(labels), valid, syn_boxes, fine, ext,
                        neg_key=key, with_bags_loss=False, **common)
    ori_ref = mil_stage(regress, classify, classify_neg, feat_ori, boxes,
                        labels, valid, real, fine, ext,
                        neg_key=key, with_bags_loss=True, **common)

    syn_f, ori_f = mil_stage_pair_phase1(
        regress, classify, classify_neg, feat_syn, syn_boxes, valid,
        feat_ori, boxes, labels, valid, real, fine, ext,
        neg_key=key, **common)

    for a, bb in ((syn_ref, syn_f), (ori_ref, ori_f)):
        for name, x, y in zip(a._fields, a, bb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                       atol=0, err_msg=name)

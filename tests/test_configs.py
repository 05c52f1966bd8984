"""Config-driven tests: every shipped config loads, builds its model, and its
hyperparameters mirror the reference values (the reference's
tests/test_models/test_config.py pattern)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_teacher_tpu.config_io import apply_overrides, load_config

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                        "configs", "**", "*.py"), recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads_and_builds(path):
    cfg = load_config(path)
    pt = cfg["pt"]
    assert pt.num_classes in (8, 9)
    assert len(pt.fine_proposal_cfg) >= pt.num_stages
    assert len(pt.fine_proposal_extensive_cfg) >= pt.num_stages
    rotated = bool(cfg.get("rotated", False))
    if rotated:
        from point_teacher_tpu.models.rotated_detector import StudentRotatedFCOS as M
    else:
        from point_teacher_tpu.models.detector import StudentFCOS as M
    model = M(num_classes=pt.num_classes, num_stages=pt.num_stages, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 7, 7, 256)), method=M.init_all)
    outs, feat = model.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert outs[0].shape[-1] == pt.num_classes


def test_reference_hparams_0pct():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs",
                                   "point_teacher", "aitodv2_point_teacher_0.py"))
    pt = cfg["pt"]
    # aitodv2_point_teacher_0%.py values
    assert pt.burn_in_step == 4000
    assert pt.ema_alpha == 0.999
    assert pt.lamda == 1.0 and pt.position == 0.0
    assert pt.top_k == 1 and pt.beta == 0.25
    assert pt.alpha == (0.01, 0.25)
    assert pt.num_training_burninstep1 == 100
    assert pt.filter_score == 0.0
    assert pt.fine_proposal_extensive_cfg[0].base_ratios == (1.0, 1.2, 1.3, 0.8, 0.7)
    assert pt.fine_proposal_extensive_cfg[0].num_bags == 25
    assert pt.test.nms_pre == 3000 and pt.test.max_per_img == 3000
    assert pt.optim.base_lr == 0.005 and pt.optim.grad_clip_norm == 35.0


def test_reference_hparams_sodaa():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs",
                                   "point_teacher", "sodaa_point_teacher_1x.py"))
    pt = cfg["pt"]
    assert cfg["rotated"] is True
    assert pt.num_classes == 9 and pt.img_size == 1200
    assert pt.burn_in_step == 8000 and pt.top_k == 3
    assert pt.test.nms_iou == 0.1 and pt.test.nms_pre == 2000
    assert pt.optim.bn_affine_trainable is True


def test_noisy_variant_coupling():
    cfg100 = load_config(os.path.join(os.path.dirname(__file__), "..", "configs",
                                      "point_teacher", "aitodv2_point_teacher_100.py"))
    pt = cfg100["pt"]
    # SURVEY.md §7: the noisy configs change lamda, num_training, bag grids
    assert pt.position == 1.0 and pt.lamda == 0.5
    assert pt.num_training_burninstep1 == 75
    assert pt.fine_proposal_extensive_cfg[0].base_ratios == (
        1.0, 1.2, 1.3, 1.4, 0.8, 0.7, 0.6)
    cfg30 = load_config(os.path.join(os.path.dirname(__file__), "..", "configs",
                                     "point_teacher", "aitodv2_point_teacher_30.py"))
    assert cfg30["pt"].position == 0.3 and cfg30["pt"].lamda == 0.5


def test_cfg_options_dotted_override():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "configs",
                                   "point_teacher", "aitodv2_point_teacher_0.py"))
    cfg = apply_overrides(cfg, ["pt.burn_in_step=123", "pt.optim.base_lr=0.02",
                                "work_dir=/tmp/x"])
    assert cfg["pt"].burn_in_step == 123
    assert cfg["pt"].optim.base_lr == 0.02
    assert cfg["work_dir"] == "/tmp/x"

"""Differential tests binding the reference's TS wrapper detector methods.

The full TS_P2B_FCOS class (fcos_p2b_teacher_student.py) is loaded in place
via tests/_ref_stubs.load_detector(); its pure methods are bound to a
namespace stand-in (the ctor would need build_detector + weights). Pins the
two stateful laws the train step carries in TrainState:

- update_points (:266-274): refined = (1-lamda)*pseudo_centre + lamda*origin,
  written into the per-image cache — our train/steps.py _point_update /
  rsteps.py closing block;
- update_teacher_model (:254-257): in-place EMA t = d*t + (1-d)*s — our
  train/state.py ema_update.
"""
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _ref_stubs


def test_update_points_matches_reference():
    det = _ref_stubs.load_detector()
    r = np.random.RandomState(0)
    n_img, g = 2, 6
    pseudo = r.uniform(10, 700, (n_img, g, 4)).astype(np.float32)
    pseudo[..., 2:] = pseudo[..., :2] + r.uniform(5, 40, (n_img, g, 2))
    origin = r.uniform(10, 700, (n_img, g, 2)).astype(np.float32)

    for lamda in (1.0, 0.5, 0.0):
        self = types.SimpleNamespace(
            lamda=lamda,
            gt_bboxes_point={f"im{i}": torch.from_numpy(origin[i])
                             for i in range(n_img)},
            refined_gt_bboxes_point={},
        )
        metas = [{"ori_filename": f"im{i}"} for i in range(n_img)]
        got_ref = det.TS_P2B_FCOS.update_points(
            self, n_img, metas, [torch.from_numpy(p) for p in pseudo])

        # ours: the same law vectorised (steps.py _point_update core)
        from point_teacher_tpu.ops.boxes import xyxy_to_cxcywh

        centre = xyxy_to_cxcywh(jnp.asarray(pseudo))[..., :2]
        ours = (1 - lamda) * centre + lamda * jnp.asarray(origin)
        for i in range(n_img):
            np.testing.assert_allclose(np.asarray(ours[i]),
                                       got_ref[i].numpy(), rtol=1e-6, atol=1e-5)
            # the cache write is part of the law
            np.testing.assert_allclose(
                self.refined_gt_bboxes_point[f"im{i}"].numpy(),
                got_ref[i].numpy())


def test_update_teacher_model_matches_ema_update():
    det = _ref_stubs.load_detector()
    torch.manual_seed(0)
    t_mod = torch.nn.Linear(4, 3)
    s_mod = torch.nn.Linear(4, 3)
    t0 = {k: v.detach().clone() for k, v in t_mod.state_dict().items()}

    self = types.SimpleNamespace()
    det.TS_P2B_FCOS.update_teacher_model(self, t_mod, s_mod, ema_decay=0.99)

    from point_teacher_tpu.train.state import ema_update

    ours = ema_update(
        {k: jnp.asarray(v.numpy()) for k, v in t0.items()},
        {k: jnp.asarray(v.detach().numpy()) for k, v in s_mod.state_dict().items()},
        0.99,
    )
    for k, v in t_mod.state_dict().items():
        np.testing.assert_allclose(np.asarray(ours[k]), v.detach().numpy(),
                                   rtol=1e-6, atol=1e-6)

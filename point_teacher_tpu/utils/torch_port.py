"""Port torch ResNet-50 weights (torchvision/mmcv layout) into our flax params.

The reference initialises from 'open-mmlab://detectron/resnet50_caffe'
(aitodv2_point_teacher_0%.py:37-39). In a zero-egress environment a local
torch checkpoint (.pth) can be supplied instead; this maps torch NCHW conv
kernels -> flax HWIO and BN running stats -> FrozenBN constants.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_numpy(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def torch_resnet50_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision/mmcv key layout -> our ResNet module tree."""
    sd = {k.removeprefix("backbone."): v for k, v in state_dict.items()}
    out: Dict[str, Any] = {}

    def conv(src, dst):
        w = _to_numpy(sd[src + ".weight"])  # [O, I, H, W]
        out.setdefault(dst, {})["kernel"] = w.transpose(2, 3, 1, 0)

    def bn(src, dst):
        d = out.setdefault(dst, {})
        d["scale"] = _to_numpy(sd[src + ".weight"])
        d["bias"] = _to_numpy(sd[src + ".bias"])
        d["mean"] = _to_numpy(sd[src + ".running_mean"])
        d["var"] = _to_numpy(sd[src + ".running_var"])

    conv("conv1", "stem_conv")
    bn("bn1", "stem_bn")
    blocks_per = {0: 3, 1: 4, 2: 6, 3: 3}
    for stage, n in blocks_per.items():
        for b in range(n):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_block{b}"
            for i in (1, 2, 3):
                conv(f"{src}.conv{i}", f"{dst}/conv{i}")
                bn(f"{src}.bn{i}", f"{dst}/bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0", f"{dst}/downsample_conv")
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")

    # nest the '/'-joined paths
    tree: Dict[str, Any] = {}
    for path, leaves in out.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaves
    return tree


def _conv_w(sd, key):
    """torch conv weight [O, I, kh, kw] -> flax kernel [kh, kw, I, O]."""
    return _to_numpy(sd[key]).transpose(2, 3, 1, 0)


def _linear_w(sd, key):
    """torch linear weight [O, I] -> flax kernel [I, O]."""
    return _to_numpy(sd[key]).T


def _tower_fc0_w(sd, key, c=256, hw=7):
    """First MIL-tower FC: torch flattens roi feats NCHW -> (C*H*W) while the
    flax tower flattens NHWC -> (H*W*C); permute the input-dim layout."""
    w = _to_numpy(sd[key])  # [O, C*H*W]
    o = w.shape[0]
    w = w.reshape(o, c, hw, hw).transpose(0, 2, 3, 1).reshape(o, hw * hw * c)
    return w.T


def torch_fpn_to_flax(sd: Dict[str, Any], n_lat: int = 3, n_extra: int = 2) -> Dict[str, Any]:
    """Reference FPN keys (mmdet/models/necks/fpn.py: lateral_convs.i.conv,
    fpn_convs.i.conv with the extra 'on_output' convs appended to fpn_convs)
    -> our models/fpn.py tree (lateral{i}, fpn_conv{i}, extra_conv{i})."""
    out = {}
    for i in range(n_lat):
        out[f"lateral{i}"] = {"kernel": _conv_w(sd, f"lateral_convs.{i}.conv.weight"),
                              "bias": _to_numpy(sd[f"lateral_convs.{i}.conv.bias"])}
        out[f"fpn_conv{i}"] = {"kernel": _conv_w(sd, f"fpn_convs.{i}.conv.weight"),
                               "bias": _to_numpy(sd[f"fpn_convs.{i}.conv.bias"])}
    for i in range(n_extra):
        j = n_lat + i
        out[f"extra_conv{i}"] = {"kernel": _conv_w(sd, f"fpn_convs.{j}.conv.weight"),
                                 "bias": _to_numpy(sd[f"fpn_convs.{j}.conv.bias"])}
    return out


def torch_psagg_to_flax(sd: Dict[str, Any], n: int = 5) -> Dict[str, Any]:
    """Reference PSAGG (necks/ps_fpn.py lateral_convs.i.conv 1x1) ->
    models/psagg.py agg_conv{i}."""
    return {
        f"agg_conv{i}": {"kernel": _conv_w(sd, f"lateral_convs.{i}.conv.weight"),
                         "bias": _to_numpy(sd[f"lateral_convs.{i}.conv.bias"])}
        for i in range(n)
    }


def torch_fcos_head_to_flax(sd: Dict[str, Any], stacked: int = 4) -> Dict[str, Any]:
    """TS_P2BFCOSHead dense towers (fcos_head_p2b_ts.py:189-211 +
    anchor_free_head.py:96-140; shipped config norm_cfg=None, conv_bias=True)
    -> models/fcos_head.py tree."""
    out = {}
    for i in range(stacked):
        out[f"cls_conv{i}"] = {"kernel": _conv_w(sd, f"cls_convs.{i}.conv.weight"),
                               "bias": _to_numpy(sd[f"cls_convs.{i}.conv.bias"])}
        out[f"reg_conv{i}"] = {"kernel": _conv_w(sd, f"reg_convs.{i}.conv.weight"),
                               "bias": _to_numpy(sd[f"reg_convs.{i}.conv.bias"])}
    for name in ("conv_cls", "conv_reg", "conv_centerness"):
        out[name] = {"kernel": _conv_w(sd, f"{name}.weight"),
                     "bias": _to_numpy(sd[f"{name}.bias"])}
    out["scale"] = _to_numpy(sd["scales.0.scale"])
    return out


def torch_rotated_head_to_flax(sd: Dict[str, Any], stacked: int = 4) -> Dict[str, Any]:
    """TS_P2RBRotatedFCOSHead dense towers (rotated_fcos_head_p2rb_ts.py
    :189-243; SODA-A config leaves the default GN(32) norm -> Conv(bias=False)
    + GN + ReLU towers, plus conv_angle and scale_angle)
    -> models/rotated_head.py tree."""
    out = {}
    for i in range(stacked):
        for side in ("cls", "reg"):
            out[f"{side}_conv{i}"] = {
                "kernel": _conv_w(sd, f"{side}_convs.{i}.conv.weight")}
            out[f"{side}_gn{i}"] = {
                "scale": _to_numpy(sd[f"{side}_convs.{i}.gn.weight"]),
                "bias": _to_numpy(sd[f"{side}_convs.{i}.gn.bias"])}
    for name in ("conv_cls", "conv_reg", "conv_centerness", "conv_angle"):
        out[name] = {"kernel": _conv_w(sd, f"{name}.weight"),
                     "bias": _to_numpy(sd[f"{name}.bias"])}
    out["scale"] = _to_numpy(sd["scales.0.scale"])
    out["scale_angle"] = _to_numpy(sd["scale_angle.scale"])
    return out


def load_torch_rotated_detector_into(params, state_dict: Dict[str, Any],
                                     prefix: str = "", num_stages: int = 2):
    """Rotated analog of load_torch_detector_into: port a reference
    RotatedFCOS_Student state_dict (backbone + neck + neck_agg + rotated
    bbox_head incl. the MIL FC stacks) into our flax params. Pass
    prefix='teacher.'/'student.' for a RotatedFCOS_TS checkpoint branch."""
    import jax

    sd = {k.removeprefix(prefix): v for k, v in state_dict.items()
          if k.startswith(prefix)}

    def sub(p):
        return {k.removeprefix(p): v for k, v in sd.items() if k.startswith(p)}

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    tree = params["params"]
    _merge_into(tree["backbone"], torch_resnet50_to_flax(sub("backbone.")))
    _merge_into(tree["neck"], torch_fpn_to_flax(sub("neck.")))
    _merge_into(tree["neck_agg"], torch_psagg_to_flax(sub("neck_agg.")))
    head_sd = sub("bbox_head.")
    _merge_into(tree["bbox_head"], torch_rotated_head_to_flax(head_sd))
    _merge_into(tree["mil_head"], torch_mil_to_flax(head_sd, num_stages))
    return params


def torch_mil_to_flax(sd: Dict[str, Any], num_stages: int = 1) -> Dict[str, Any]:
    """MIL FC stacks (fcos_head_p2b_ts.py:212-263: shared_fcs_reg/bag per
    stage + fc_reg/fc_cls/fc_ins) -> models/mil_head.py tree. fc_iou and
    shared_fcs/shared_fcs_refine are dead on the shipped path and skipped."""
    out = {}
    for s in range(num_stages):
        for tower, src in ((f"reg_tower{s}", f"shared_fcs_reg.{s}"),
                           (f"bag_tower{s}", f"shared_fcs_bag.{s}")):
            out[tower] = {
                "fc0": {"kernel": _tower_fc0_w(sd, f"{src}.0.weight"),
                        "bias": _to_numpy(sd[f"{src}.0.bias"])},
                "fc1": {"kernel": _linear_w(sd, f"{src}.1.weight"),
                        "bias": _to_numpy(sd[f"{src}.1.bias"])},
            }
        for fc in ("fc_reg", "fc_cls", "fc_ins"):
            out[f"{fc}{s}"] = {"kernel": _linear_w(sd, f"{fc}.{s}.weight"),
                               "bias": _to_numpy(sd[f"{fc}.{s}.bias"])}
    return out


def _merge_into(dst_node, src_node, path=""):
    for k, v in src_node.items():
        if isinstance(v, dict):
            if k not in dst_node:
                raise KeyError(f"unexpected module {path}/{k}")
            _merge_into(dst_node[k], v, f"{path}/{k}")
        else:
            assert np.shape(dst_node[k]) == np.shape(v), (
                path, k, np.shape(dst_node[k]), np.shape(v))
            dst_node[k] = np.asarray(v, np.float32)


def load_torch_detector_into(params, state_dict: Dict[str, Any],
                             prefix: str = "", num_stages: int = 1):
    """Port a full reference Student_FCOS state_dict (backbone + neck +
    neck_agg + bbox_head incl. MIL FCs) into our flax params.

    `prefix` strips a leading submodule path — pass 'teacher.' or 'student.'
    to load one branch of a reference TS_P2B_FCOS checkpoint
    (fcos_p2b_teacher_student.py:60-61 registers both under those names)."""
    import jax

    sd = {k.removeprefix(prefix): v for k, v in state_dict.items()
          if k.startswith(prefix)}

    def sub(p):
        return {k.removeprefix(p): v for k, v in sd.items() if k.startswith(p)}

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    tree = params["params"]
    _merge_into(tree["backbone"], torch_resnet50_to_flax(sub("backbone.")))
    _merge_into(tree["neck"], torch_fpn_to_flax(sub("neck.")))
    _merge_into(tree["neck_agg"], torch_psagg_to_flax(sub("neck_agg.")))
    head_sd = sub("bbox_head.")
    _merge_into(tree["bbox_head"], torch_fcos_head_to_flax(head_sd))
    _merge_into(tree["mil_head"], torch_mil_to_flax(head_sd, num_stages))
    return params


def load_torch_resnet50_into(params, ckpt_path: str):
    """Load a .pth checkpoint and replace the backbone subtree in `params`."""
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw.get("model", raw))
    backbone = torch_resnet50_to_flax(sd)

    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    dst = params["params"]["backbone"]

    def merge(dst_node, src_node, path=""):
        for k, v in src_node.items():
            if isinstance(v, dict):
                if k not in dst_node:
                    raise KeyError(f"unexpected module {path}/{k}")
                merge(dst_node[k], v, f"{path}/{k}")
            else:
                assert dst_node[k].shape == v.shape, (path, k, dst_node[k].shape, v.shape)
                dst_node[k] = v.astype(np.float32)

    merge(dst, backbone)
    return params


def load_reference_ts_checkpoint(params, ckpt_path: str, branch: str = "teacher",
                                 rotated: bool = False, num_stages: int = 1,
                                 allow_pickle: bool = False):
    """Load one branch of a REFERENCE Point-Teacher checkpoint (.pth).

    The reference saves the whole TS wrapper as one state_dict with the
    teacher and student registered as 'teacher.*' / 'student.*' submodules
    (fcos_p2b_teacher_student.py:60-61, rotated_fcos_teacher_student.py:69-70);
    inference runs the teacher (simple_test, :276-298). This opens the
    released checkpoints for direct inference parity the day they are
    mounted: `tools/test.py <cfg> --torch-ckpt <ref.pth>`.
    """
    import torch

    try:
        # mmdet checkpoints are plain state_dicts + meta and load fine with
        # weights_only=True; never unpickle arbitrary code from a released
        # third-party .pth unless the caller explicitly opts in.
        raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise
        raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw.get("model", raw)) if isinstance(raw, dict) else raw
    prefix = branch + "."
    if not any(k.startswith(prefix) for k in sd):
        # also accept a bare Student_FCOS state_dict (no TS wrapper)
        if any(k.startswith("backbone.") for k in sd):
            import warnings
            warnings.warn(
                f"checkpoint {ckpt_path} has no '{prefix}*' keys; loading it as "
                f"a bare Student_FCOS state_dict — the requested '{branch}' "
                f"branch does not exist in this file", stacklevel=2)
            prefix = ""
        else:
            raise KeyError(
                f"no '{prefix}*' keys in {ckpt_path}; top-level keys look like "
                f"{sorted(sd)[:3]}...")
    loader = load_torch_rotated_detector_into if rotated else load_torch_detector_into
    return loader(params, sd, prefix=prefix, num_stages=num_stages)

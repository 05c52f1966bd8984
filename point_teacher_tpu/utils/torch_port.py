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

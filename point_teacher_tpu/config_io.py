"""Python-file config loading with dotted overrides.

Capability target: mmcv Config.fromfile + --cfg-options deep merge
(tools/train.py:61-70,95-97). Configs are plain python files that define a
module-level `cfg: dict` (and may import/derive from other configs with
normal python imports — replacing the `_base_` mechanism, whose shipped
absolute paths are broken anyway, aitodv2_point_teacher_0%.py:1-5).

Overrides address NamedTuple sub-configs with dots:
  train.py cfg.py --cfg-options pt.burn_in_step=100 pt.optim.base_lr=0.01
"""
from __future__ import annotations

import ast
import importlib.util
import os
import sys
from typing import Any, Dict, List


def load_config(path: str) -> Dict[str, Any]:
    path = os.path.abspath(path)
    spec = importlib.util.spec_from_file_location("_ptt_config", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ptt_config"] = mod
    spec.loader.exec_module(mod)
    if not hasattr(mod, "cfg"):
        raise ValueError(f"config file {path} must define a module-level `cfg` dict")
    return dict(mod.cfg)


def _parse_value(s: str):
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _set_dotted(obj, keys: List[str], value):
    key = keys[0]
    if len(keys) == 1:
        if isinstance(obj, dict):
            obj[key] = value
            return obj
        if hasattr(obj, "_replace"):  # NamedTuple
            return obj._replace(**{key: value})
        setattr(obj, key, value)
        return obj
    child = obj[key] if isinstance(obj, dict) else getattr(obj, key)
    new_child = _set_dotted(child, keys[1:], value)
    if isinstance(obj, dict):
        obj[key] = new_child
        return obj
    if hasattr(obj, "_replace"):
        return obj._replace(**{key: new_child})
    setattr(obj, key, new_child)
    return obj


def apply_overrides(cfg: Dict[str, Any], options: List[str]) -> Dict[str, Any]:
    for opt in options or []:
        if "=" not in opt:
            raise ValueError(f"--cfg-options entries must be key=value, got {opt!r}")
        key, value = opt.split("=", 1)
        cfg = _set_dotted(cfg, key.split("."), _parse_value(value))
    return cfg

"""Checkpoint save/resume.

Capability target: mmcv CheckpointHook + runner.resume
(mmdet/apis/train.py:166-169, configs/_base_/default_runtime.py:1). One file
holds the WHOLE TrainState — student, teacher (EMA), optimizer, step counter
AND the per-image point caches, which the reference loses on resume
(SURVEY.md §5 checkpoint gotcha — fixed here by design).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(state: Any, path: str, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def load_meta(path: str) -> dict:
    mp = path + ".meta.json"
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    return {}

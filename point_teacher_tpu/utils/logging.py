"""Training logger: averaged text lines + JSON-lines file.

Capability target: mmcv LogBuffer + TextLoggerHook every 50 iters
(configs/_base_/default_runtime.py:3-8) and the json log consumed by
tools/analysis_tools/analyze_logs.py.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class LogBuffer:
    def __init__(self):
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    def update(self, metrics: Dict[str, float]):
        for k, v in metrics.items():
            self._sums[k] += float(v)
            self._counts[k] += 1

    def averages(self) -> Dict[str, float]:
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def clear(self):
        self._sums.clear()
        self._counts.clear()


class TrainLogger:
    def __init__(self, work_dir: Optional[str] = None, interval: int = 50):
        self.buffer = LogBuffer()
        self.interval = interval
        self.jsonl = None
        if work_dir:
            os.makedirs(work_dir, exist_ok=True)
            self.jsonl = open(os.path.join(work_dir, "train_log.jsonl"), "a")
        self._t0 = time.time()

    def step(self, step: int, epoch: int, metrics: Dict[str, float], lr: float = 0.0):
        self.buffer.update(metrics)
        if step % self.interval == 0:
            self.emit(step, epoch, lr)

    def emit(self, step: int, epoch: int, lr: float = 0.0):
        """Write the averaged buffer now (the TextLoggerHook also fires at
        epoch end regardless of the iter interval — mmcv hook by_epoch path).
        No-op when nothing has been buffered since the last write."""
        if not self.buffer._counts:
            return
        avg = self.buffer.averages()
        dt = time.time() - self._t0
        self._t0 = time.time()
        loss_keys = [k for k in avg if "loss" in k]
        msg = ", ".join(f"{k}: {avg[k]:.4f}" for k in sorted(loss_keys))
        n = max(next(iter(self.buffer._counts.values()), 1), 1)
        print(f"Epoch [{epoch}] Iter [{step}] lr: {lr:.2e}, "
              f"time: {dt / n:.3f}s/it, {msg}", flush=True)
        if self.jsonl:
            rec = dict(mode="train", epoch=epoch, iter=step, lr=lr, **avg)
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        self.buffer.clear()

    def val(self, step: int, epoch: int, metrics: Dict[str, float], lr: float = 0.0):
        """Write a mode="val" record immediately (mmcv EvalHook logs every
        evaluation regardless of the train-iter interval)."""
        if self.jsonl:
            rec = dict(mode="val", epoch=epoch, iter=step, lr=lr,
                       **{k: float(v) for k, v in metrics.items()})
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()

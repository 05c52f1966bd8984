"""Batch loaders: host decode/resize with a background prefetch thread.

Capability target: mmdet build_dataloader (datasets/builder.py, 2 workers,
batch 2) + GroupSampler. AI-TOD images are uniformly 800x800, so the
aspect-ratio grouping of GroupSampler is a no-op there; we shuffle uniformly.
The double-buffered prefetch thread replaces the torch DataLoader workers —
decode overlaps device compute, and fixed shapes mean zero recompilation.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from ..train.state import Batch

from .pipeline import pad_gts, preprocess


class TrainLoader:
    def __init__(self, dataset, batch_size: int, max_gt: int,
                 canvas: int = 800, seed: int = 0, prefetch: int = 2,
                 group_by_aspect: bool = True, img_norm=None):
        self.ds = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.canvas = canvas
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        self.img_norm = img_norm
        # GroupSampler semantics (mmdet group_sampler.py:10): batches drawn
        # within aspect-ratio groups (w/h >= 1 vs < 1). A no-op for the square
        # AI-TOD/SODA patches, kept for the general COCO case.
        self.groups = None
        if group_by_aspect and hasattr(dataset, "img_infos"):
            flags = []
            for info in dataset.img_infos:
                w, h = info.get("width", 1), info.get("height", 1)
                flags.append(1 if w / max(h, 1) > 1 else 0)
            flags = np.asarray(flags)
            if len(np.unique(flags)) > 1:
                self.groups = [np.nonzero(flags == v)[0] for v in (0, 1)]

    def _make_batch(self, idxs) -> Batch:
        imgs, boxes_l, labels_l, valid_l = [], [], [], []
        for i in idxs:
            ann = self.ds.get_ann(i)
            img, boxes, _ = preprocess(self.ds.image_path(i), ann["boxes"], self.canvas,
                                       img_norm=self.img_norm)
            b, l, v = pad_gts(boxes, ann["labels"], self.max_gt)
            imgs.append(img)
            boxes_l.append(b)
            labels_l.append(l)
            valid_l.append(v)
        return Batch(
            image=np.stack(imgs),
            gt_boxes=np.stack(boxes_l),
            gt_labels=np.stack(labels_l),
            gt_valid=np.stack(valid_l),
            image_ids=np.asarray(idxs, np.int32),
        )

    def epoch(self) -> Iterator[Batch]:
        if self.groups is None:
            order = self.rng.permutation(len(self.ds))
            n = (len(order) // self.batch_size) * self.batch_size
            chunks = [order[i:i + self.batch_size] for i in range(0, n, self.batch_size)]
        else:
            chunks = []
            for grp in self.groups:
                order = self.rng.permutation(grp)
                n = (len(order) // self.batch_size) * self.batch_size
                chunks += [order[i:i + self.batch_size] for i in range(0, n, self.batch_size)]
            self.rng.shuffle(chunks)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            for c in chunks:
                q.put(self._make_batch(c))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class EvalLoader:
    def __init__(self, dataset, batch_size: int, canvas: int = 800, img_norm=None):
        self.ds = dataset
        self.batch_size = batch_size
        self.canvas = canvas
        self.img_norm = img_norm

    def __iter__(self):
        n = len(self.ds)
        for start in range(0, n, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, n)))
            imgs, scales, shapes = [], [], []
            for i in idxs:
                img, _, scale, shape = preprocess(
                    self.ds.image_path(i), None, self.canvas,
                    img_norm=self.img_norm, return_shape=True)
                imgs.append(img)
                scales.append(scale)
                shapes.append(shape)
            # pad the tail batch to full size (masked by idx count)
            while len(imgs) < self.batch_size:
                imgs.append(np.zeros_like(imgs[0]))
                scales.append(np.ones(4, np.float32))
                shapes.append(np.asarray([self.canvas, self.canvas], np.float32))
            yield idxs, np.stack(imgs), np.stack(scales), np.stack(shapes)

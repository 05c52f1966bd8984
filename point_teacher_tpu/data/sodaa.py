"""SODA-A dataset: per-patch JSON annotations with 8-point polygons.

Capability target: SODAADataset (OBB_TOD/mmrotate/datasets/sodaa.py):
- per-patch json files (one per image patch) whose 'annotations' carry
  'poly' (8 values) + 'category_id' (0-indexed);
- patch filenames encode their offset in the original image
  ('name__SIZE__X___Y.jpg');
- a parallel folder of original-image jsons is the merged-eval ground truth;
- poly -> (cx, cy, w, h, a) via min-area rect (le90).
"""
from __future__ import annotations

import glob
import json
import os
from typing import List, Optional, Sequence

import numpy as np

from ..evalx.rgeometry import poly2obb_np


class SODAADataset:
    CLASSES = (
        "airplane", "helicopter", "small-vehicle", "large-vehicle",
        "ship", "container", "storage-tank", "swimming-pool", "windmill",
    )

    def __init__(self, ann_folder: str, img_prefix: str = "",
                 ori_ann_folder: Optional[str] = None, filter_empty: bool = True):
        self.img_prefix = img_prefix
        self.infos: List[dict] = []
        for ann_file in sorted(glob.glob(os.path.join(ann_folder, "*.json"))):
            if os.path.getsize(ann_file) == 0:
                continue
            with open(ann_file) as f:
                data = json.load(f)
            boxes, labels = [], []
            for ann in data.get("annotations", []):
                poly = np.asarray(ann["poly"], np.float32)
                if len(poly) > 8:
                    continue  # reference neglects >4-corner polygons
                obb = poly2obb_np(poly)
                if obb is None:
                    continue
                boxes.append(obb)
                labels.append(int(ann["category_id"]))
            if filter_empty and not boxes:
                continue
            name = os.path.basename(ann_file).replace(".json", ".jpg")
            self.infos.append(dict(
                filename=name,
                boxes=np.asarray(boxes, np.float32).reshape(-1, 5),
                labels=np.asarray(labels, np.int64),
            ))
        self.ori_infos = None
        if ori_ann_folder:
            self.ori_infos = self._load_folder(ori_ann_folder)

    @staticmethod
    def _load_folder(folder: str) -> List[dict]:
        infos = []
        for ann_file in sorted(glob.glob(os.path.join(folder, "*.json"))):
            if os.path.getsize(ann_file) == 0:
                continue
            with open(ann_file) as f:
                data = json.load(f)
            boxes, labels = [], []
            for ann in data.get("annotations", []):
                poly = np.asarray(ann["poly"], np.float32)
                if len(poly) > 8:
                    continue
                obb = poly2obb_np(poly)
                if obb is None:
                    continue
                boxes.append(obb)
                labels.append(int(ann["category_id"]))
            infos.append(dict(
                filename=os.path.basename(ann_file).replace(".json", ".jpg"),
                boxes=np.asarray(boxes, np.float32).reshape(-1, 5),
                labels=np.asarray(labels, np.int64),
            ))
        return infos

    def __len__(self):
        return len(self.infos)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.img_prefix, self.infos[idx]["filename"])

    def get_ann(self, idx: int) -> dict:
        return self.infos[idx]

    def ori_gt(self) -> dict:
        """Merged-image ground truth for sodaa_evaluate."""
        assert self.ori_infos is not None, "ori_ann_folder not provided"
        return dict(
            img_ids=[i["filename"] for i in self.ori_infos],
            classes=list(self.CLASSES),
            annotations=[dict(boxes=i["boxes"], labels=i["labels"])
                         for i in self.ori_infos],
        )

"""Metric meters with cross-host reduction.

JAX rebuild of AverageMeter/ProgressMeter/intersectionAndUnion
(ref: utils/utils.py:97-174, 125-152). `all_reduce` uses
jax.experimental.multihost_utils when more than one process exists; the
single-host case is a no-op (the reference all-reduces over NCCL ranks).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0.0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1e-8)

    def all_reduce(self):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            arr = np.asarray([self.sum, self.count], np.float64)
            arr = multihost_utils.process_allgather(arr).sum(axis=0)
            self.sum, self.count = float(arr[0]), float(arr[1])
            self.avg = self.sum / max(self.count, 1e-8)

    def __str__(self):
        return f"{self.name} {self.val:.4f} ({self.avg:.4f})"


class ProgressMeter:
    def __init__(self, num_batches: int, meters: List[AverageMeter],
                 prefix: str = ""):
        self.num_batches = num_batches
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int) -> str:
        entries = [f"{self.prefix}[{batch}/{self.num_batches}]"]
        entries += [str(m) for m in self.meters]
        line = "  ".join(entries)
        print(line, flush=True)
        return line


def intersection_and_union(
    pred: np.ndarray, target: np.ndarray, num_classes: int = 2,
    ignore_index: int = 255,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-class intersection / union / target counts
    (ref intersectionAndUnionGPU utils/utils.py:125-138)."""
    pred = pred.reshape(-1).copy()
    target = target.reshape(-1)
    pred[target == ignore_index] = ignore_index
    inter = pred[pred == target]
    area_i = np.histogram(inter, bins=num_classes, range=(0, num_classes - 1))[0]
    area_p = np.histogram(pred, bins=num_classes, range=(0, num_classes - 1))[0]
    area_t = np.histogram(target, bins=num_classes, range=(0, num_classes - 1))[0]
    return area_i.astype(np.float64), (
        area_p + area_t - area_i
    ).astype(np.float64), area_t.astype(np.float64)


def giou_ciou(
    intersections: np.ndarray, unions: np.ndarray
) -> Tuple[float, float]:
    """gIoU (mean of per-sample IoU) and cIoU (cumulative IoU)
    (ref: utils/utils.py:140-152, train_joint.py:635-641)."""
    per = intersections / np.maximum(unions, 1e-10)
    giou = float(per.mean(axis=0)[1]) if per.ndim > 1 else float(per.mean())
    csum_i = intersections.sum(axis=0)
    csum_u = unions.sum(axis=0)
    ciou_arr = csum_i / np.maximum(csum_u, 1e-10)
    ciou = float(ciou_arr[1]) if ciou_arr.ndim > 0 and ciou_arr.size > 1 else float(ciou_arr)
    return giou, ciou

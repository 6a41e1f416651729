"""Segmentation IoU / Dice metrics (mean_iou, mean_dice equivalents,
/root/reference/mmpt/core/evaluation/iou.py:5-224)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def intersect_and_union(
    pred: np.ndarray, label: np.ndarray, num_classes: int, ignore_index: int = 255
):
    """Per-class (intersection, union, pred-area, label-area) histograms."""
    mask = label != ignore_index
    pred = pred[mask]
    label = label[mask]
    inter = pred[pred == label]
    area_i = np.histogram(inter, bins=num_classes, range=(0, num_classes))[0]
    area_p = np.histogram(pred, bins=num_classes, range=(0, num_classes))[0]
    area_l = np.histogram(label, bins=num_classes, range=(0, num_classes))[0]
    return area_i, area_p + area_l - area_i, area_p, area_l


def mean_iou(
    preds: Sequence[np.ndarray],
    labels: Sequence[np.ndarray],
    num_classes: int,
    ignore_index: int = 255,
    nan_to_num=None,
) -> Dict[str, np.ndarray]:
    ti = np.zeros(num_classes)
    tu = np.zeros(num_classes)
    tl = np.zeros(num_classes)
    for p, l in zip(preds, labels):
        i, u, _, a_l = intersect_and_union(p, l, num_classes, ignore_index)
        ti += i
        tu += u
        tl += a_l
    iou = ti / np.maximum(tu, 1e-12)
    acc = ti / np.maximum(tl, 1e-12)
    if nan_to_num is not None:
        iou = np.nan_to_num(iou, nan=nan_to_num)
        acc = np.nan_to_num(acc, nan=nan_to_num)
    return {"IoU": iou, "Acc": acc, "mIoU": float(iou.mean())}


def mean_dice(
    preds: Sequence[np.ndarray],
    labels: Sequence[np.ndarray],
    num_classes: int,
    ignore_index: int = 255,
) -> Dict[str, np.ndarray]:
    ti = np.zeros(num_classes)
    tp = np.zeros(num_classes)
    tl = np.zeros(num_classes)
    for p, l in zip(preds, labels):
        i, _, a_p, a_l = intersect_and_union(p, l, num_classes, ignore_index)
        ti += i
        tp += a_p
        tl += a_l
    dice = 2 * ti / np.maximum(tp + tl, 1e-12)
    return {"Dice": dice, "mDice": float(dice.mean())}

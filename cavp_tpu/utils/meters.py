"""Small host-side utilities.

Rebuilds ``utils/avsbench_pyutils.py:22-113`` (AverageMeter, Timer) and
``utils/p_value.py:10-54`` (z/t significance tests on metric triples),
plus the semi-supervised metadata subsampler
(``dataset/avss/semi_sample.py:1-31``).
"""

from __future__ import annotations

import math
import time
from typing import Sequence


class DeNormalize:
    """engine/utils.DeNormalize:29-47 — invert ImageNet normalization on
    [..., H, W, C] arrays (for visualization)."""

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        import numpy as np

        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, x):
        return x * self.std + self.mean


def adjust_learning_rate(init_lr: float, epoch: int, epochs: int,
                         schedule: str = "cos", warmup_epochs: int = 0
                         ) -> float:
    """engine/utils.adjust_learning_rate — cosine / constant epoch LR."""
    if schedule == "cos":
        if epoch < warmup_epochs:
            return init_lr * epoch / max(warmup_epochs, 1)
        return init_lr * 0.5 * (1.0 + math.cos(
            math.pi * (epoch - warmup_epochs) / (epochs - warmup_epochs)))
    if schedule == "cte":
        return init_lr
    raise ValueError(schedule)


class AverageMeter:
    """avsbench_pyutils.AverageMeter — running mean of scalars."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Timer:
    """avsbench_pyutils.Timer — cumulative wall-clock sections."""

    def __init__(self):
        self.total = 0.0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._start
        self.total += dt
        return dt

    def __enter__(self):
        self.tic()
        return self

    def __exit__(self, *a):
        self.toc()


def z_test(mean1: float, std1: float, n1: int,
           mean2: float, std2: float, n2: int) -> float:
    """p_value.py z-test: returns the z statistic on two AUC samples."""
    se = math.sqrt(std1 ** 2 / n1 + std2 ** 2 / n2)
    return (mean1 - mean2) / max(se, 1e-12)


def t_test(sample1: Sequence[float], sample2: Sequence[float]) -> float:
    """Welch t statistic on two small metric samples."""
    import numpy as np

    a = np.asarray(sample1, np.float64)
    b = np.asarray(sample2, np.float64)
    se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    return float((a.mean() - b.mean()) / max(se, 1e-12))


def semi_sample(df, ratio: str, label_col: str = "a_obj", seed: int = 1):
    """dataset/avss/semi_sample.py — per-class metadata subsampling for
    semi-supervised ratios ('1/4' keeps a quarter of each class).

    Reference semantics (semi_sample.py:16-30): classes come from the
    '_'-separated MEMBERSHIP of ``label_col`` (a multi-label video is in
    every class's pool and can be emitted once per class — duplicates
    kept), each class's TRAIN rows are sampled at ``frac`` with
    ``random_state=1``, and only train-split rows appear in the output.
    """
    import pandas as pd

    num, den = (int(x) for x in ratio.split("/"))
    if num >= den:
        return df
    frac = num / den
    classes = sorted({c for labels in df[label_col].astype(str)
                      for c in labels.split("_")})
    parts = []
    for cls in classes:
        member = df[df[label_col].astype(str).apply(
            lambda x: cls in x.split("_"))]
        member = member[member["split"] == "train"] \
            if "split" in df.columns else member
        if len(member) == 0:
            continue
        parts.append(member.sample(frac=frac, random_state=seed,
                                   replace=False))
    return pd.concat(parts, ignore_index=True) if parts else df.iloc[:0]

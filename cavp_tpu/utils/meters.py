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


def semi_sample(df, ratio: str, label_col: str = "a_obj", seed: int = 0):
    """dataset/avss/semi_sample.py — per-class metadata subsampling for
    semi-supervised ratios ('1/4' keeps a quarter of each class)."""
    import pandas as pd

    num, den = (int(x) for x in ratio.split("/"))
    if num >= den:
        return df
    frac = num / den
    parts = [g.sample(max(1, int(len(g) * frac)), random_state=seed)
             for _, g in df.groupby(label_col)]
    return pd.concat(parts)

"""Metric meters (reference `utils/utils.py:35-133`), jax-native reduction.

`AverageMeter.all_reduce` uses `jax.experimental.multihost_utils` when
running multi-process, replacing the reference's `dist.all_reduce`.
"""

from __future__ import annotations

import time
from enum import Enum
from typing import List

import numpy as np

import jax


class Summary(Enum):
    NONE = 0
    AVERAGE = 1
    SUM = 2
    COUNT = 3


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f",
                 summary_type: Summary = Summary.AVERAGE):
        self.name = name
        self.fmt = fmt
        self.summary_type = summary_type
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def all_reduce(self):
        """Sum (sum, count) across hosts (reference `utils.py:56-77`)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            total = multihost_utils.process_allgather(
                np.array([self.sum, self.count], np.float64))
            self.sum = float(total[:, 0].sum())
            self.count = int(total[:, 1].sum())
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(name=self.name, val=self.val, avg=self.avg)


class ProgressMeter:
    def __init__(self, num_batches: int, meters: List[AverageMeter],
                 prefix: str = ""):
        self.batch_fmtstr = self._get_batch_fmtstr(num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries), flush=True)

    @staticmethod
    def _get_batch_fmtstr(num_batches: int):
        num_digits = len(str(num_batches // 1))
        fmt = "{:" + str(num_digits) + "d}"
        return "[" + fmt + "/" + fmt.format(num_batches) + "]"


class Timer:
    def __init__(self):
        self.t = time.time()

    def tick(self) -> float:
        now = time.time()
        dt = now - self.t
        self.t = now
        return dt

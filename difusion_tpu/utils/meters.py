"""Loss meters and training bookkeeping.

Parity with reference meters (pytorch/utils/exp_util.py:115-256) minus the
torch-graph-specific chunk-loss machinery, which the functional JAX training
step makes unnecessary.
"""
from __future__ import annotations

import pickle
import sys
from collections import OrderedDict

import numpy as np


class AverageMeter:
    def __init__(self):
        self.loss_dict = OrderedDict()

    def export(self, f):
        if isinstance(f, str):
            f = open(f, "wb")
        pickle.dump(self.loss_dict, f)

    def load(self, f):
        if isinstance(f, str):
            f = open(f, "rb")
        self.loss_dict = pickle.load(f)
        return self

    def append_loss(self, losses: dict):
        for name, val in losses.items():
            if val is None:
                continue
            val = float(val)
            if np.isnan(val):
                continue
            self.loss_dict.setdefault(name, []).append(val)

    def get_mean_loss_dict(self):
        return {name: float(np.mean(arr)) for name, arr in self.loss_dict.items()}

    def get_mean_loss(self):
        means = self.get_mean_loss_dict()
        if not means:
            return 0.0
        return sum(means.values()) / len(means)

    def get_printable_mean(self):
        text = ""
        total = 0.0
        for name, mean in self.get_mean_loss_dict().items():
            total += mean
            text += "(%s:%.4f) " % (name, mean)
        return text + " sum = %.4f" % total

    def get_newest_loss_dict(self, return_count=False):
        newest, counts = {}, {}
        for name, arr in self.loss_dict.items():
            if arr:
                newest[name] = arr[-1]
                counts[name] = len(arr)
        return (newest, counts) if return_count else newest

    def get_printable_newest(self):
        val, cnt = self.get_newest_loss_dict(return_count=True)
        return ", ".join(f"{k}[{cnt[k] - 1}]: {val[k]}" for k in val)

    def print_format_loss(self, color=None):
        device = getattr(sys.stdout, "terminal", sys.stdout)
        codes = {"y": "\033[93m", "g": "\033[92m", "b": "\033[94m"}
        if color in codes:
            device.write(codes[color])
        print(self.get_printable_mean(), flush=True)
        if color in codes:
            device.write("\033[0m")


class RunningAverageMeter:
    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha
        self.loss_dict = OrderedDict()

    def append_loss(self, losses: dict):
        for name, val in losses.items():
            if val is None:
                continue
            val = float(val)
            if np.isnan(val):
                continue
            if name not in self.loss_dict:
                self.loss_dict[name] = val
            else:
                self.loss_dict[name] = self.alpha * self.loss_dict[name] + (1 - self.alpha) * val

    def get_loss_dict(self):
        return dict(self.loss_dict)


class CombinedChunkLoss:
    """Accumulate named losses across gradient-accumulation chunks (parity
    with reference exp_util.CombinedChunkLoss, utils/exp_util.py:231-256)."""

    def __init__(self):
        self.loss_dict = None
        self.loss_sum_dict = None
        self.clear()

    def add_loss(self, name, val):
        self.loss_dict[name] = val
        self.loss_sum_dict[name] += float(val)

    def update_loss_dict(self, loss_dict: dict):
        for name, val in loss_dict.items():
            self.add_loss(name, val)

    def get_total_loss(self):
        total = sum(self.loss_dict.values())
        self.loss_dict = {}
        return total

    def get_accumulated_loss_dict(self):
        return self.loss_sum_dict

    def clear(self):
        from collections import defaultdict
        self.loss_dict = {}
        self.loss_sum_dict = defaultdict(float)

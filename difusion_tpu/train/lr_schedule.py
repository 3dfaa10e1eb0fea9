"""Learning-rate schedules (parity with pytorch/trainer/lr_schedule.py)."""
from __future__ import annotations


class LearningRateSchedule:
    def get_learning_rate(self, epoch: int) -> float:
        raise NotImplementedError


class ConstantLearningRateSchedule(LearningRateSchedule):
    def __init__(self, value: float):
        self.value = value

    def get_learning_rate(self, epoch: int) -> float:
        return self.value


class StepLearningRateSchedule(LearningRateSchedule):
    def __init__(self, initial: float, interval: int, factor: float):
        self.initial = initial
        self.interval = interval
        self.factor = factor

    def get_learning_rate(self, epoch: int) -> float:
        return self.initial * (self.factor ** (epoch // self.interval))


class WarmupLearningRateSchedule(LearningRateSchedule):
    def __init__(self, initial: float, warmed_up: float, length: int):
        self.initial = initial
        self.warmed_up = warmed_up
        self.length = length

    def get_learning_rate(self, epoch: int) -> float:
        if epoch > self.length:
            return self.warmed_up
        return self.initial + (self.warmed_up - self.initial) * epoch / self.length


def get_learning_rate_schedules(specs) -> list:
    """Build from the hyper "lr_schedule" list (lr_schedule.py:33-63)."""
    schedules = []
    for s in specs:
        if s["Type"] == "Step":
            schedules.append(StepLearningRateSchedule(s["Initial"], s["Interval"], s["Factor"]))
        elif s["Type"] == "Warmup":
            schedules.append(WarmupLearningRateSchedule(s["Initial"], s["Final"], s["Length"]))
        elif s["Type"] == "Constant":
            schedules.append(ConstantLearningRateSchedule(s["Value"]))
        else:
            raise ValueError(f"unknown schedule type {s['Type']!r}")
    return schedules

"""Running-average meters for loss / timing statistics.

Behavioral parity with the reference meter (torchreid/utils/avgmeter.py:5-23):
tracks latest value, running sum, count and average.
"""

from __future__ import annotations


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

"""Wall-clock timer with running average and ETA (utils/timer.py parity)."""

from __future__ import annotations

import datetime
import time


class Timer:
    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0
        self.remain_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    def remain(self, iters: int, max_iters: int) -> str:
        if iters == 0:
            self.remain_time = 0.0
        else:
            self.remain_time = (time.time() - self.start_time) * (
                max_iters - iters) / iters
        return str(datetime.timedelta(seconds=int(self.remain_time)))

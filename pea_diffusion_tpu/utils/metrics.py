"""Metrics / observability (replaces Lightning's self.log + TensorBoard,
train_sdxl_zh.py:406-439): JSONL metric stream + stdout progress with EMA,
and an optional jax.profiler trace window (SURVEY.md §5 tracing row)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, directory: Optional[str] = None, ema: float = 0.98):
        self.path = None
        if directory:
            os.makedirs(directory, exist_ok=True)
            self.path = os.path.join(directory, "metrics.jsonl")
        self.ema_decay = ema
        self.ema: Dict[str, float] = {}
        self._t0 = time.time()
        self._last_step = 0
        self._last_t = self._t0

    def log(self, step: int, metrics: Dict[str, float], extra: Dict = None):
        now = time.time()
        rec = {"step": step, "time": round(now - self._t0, 3)}
        for k, v in metrics.items():
            v = float(v)
            rec[k] = v
            self.ema[k] = (self.ema_decay * self.ema.get(k, v)
                           + (1 - self.ema_decay) * v)
        if extra:
            rec.update(extra)
        if step > self._last_step:
            dt = now - self._last_t
            rec["steps_per_sec"] = round((step - self._last_step) / dt, 4) if dt > 0 else 0.0
            self._last_step, self._last_t = step, now
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def summary(self) -> Dict[str, float]:
        return dict(self.ema)


class ProfilerWindow:
    """Capture a jax.profiler trace for steps [start, stop)."""

    def __init__(self, logdir: str, start: int, stop: int):
        self.logdir, self.start, self.stop = logdir, start, stop
        self._active = False

    def step(self, i: int):
        import jax

        if i == self.start and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif i == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

"""Profiler (parity: trainer/profile/profiler.py:31-299 NeurosisProfiler).

torch Kineto → jax.profiler: TensorBoard/Perfetto traces with a step-windowed
schedule (skip/wait/warmup/active/repeat); module spans come from
jax.named_scope (the UNet already wraps attention in named scopes).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Optional

import jax

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ProfilerSchedule:
    """Step windows (profiler.py:31-56)."""

    skip_first: int = 1
    wait: int = 0
    warmup: int = 1
    active: int = 3
    repeat: int = 1

    def phase(self, step: int) -> str:
        if step < self.skip_first:
            return "skip"
        s = step - self.skip_first
        cycle = self.wait + self.warmup + self.active
        if self.repeat > 0 and s >= cycle * self.repeat:
            return "done"
        pos = s % cycle
        if pos < self.wait:
            return "wait"
        if pos < self.wait + self.warmup:
            return "warmup"
        return "active"


class NeurosisProfiler:
    """Step-driven jax.profiler wrapper; call `step()` once per train step.

    Usage as a trainer callback: profiles `active` steps after warmup, writing
    TensorBoard-compatible traces into auto-numbered run dirs
    (utils/system.py get_next_dir parity).
    """

    def __init__(
        self,
        dirpath: str = "./profiles",
        schedule: Optional[ProfilerSchedule] = None,
    ):
        self.schedule = schedule or ProfilerSchedule()
        self.base_dir = Path(dirpath)
        self._active = False
        self._step = 0
        self.trace_dir: Optional[Path] = None

    def _next_dir(self) -> Path:
        self.base_dir.mkdir(parents=True, exist_ok=True)
        n = 0
        while (self.base_dir / f"run_{n:03d}").exists():
            n += 1
        d = self.base_dir / f"run_{n:03d}"
        d.mkdir()
        return d

    def step(self) -> None:
        phase = self.schedule.phase(self._step)
        if phase == "active" and not self._active:
            self.trace_dir = self._next_dir()
            jax.profiler.start_trace(str(self.trace_dir))
            self._active = True
            logger.info(f"profiler: tracing → {self.trace_dir}")
        elif phase in ("done", "wait", "skip") and self._active:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler: trace stopped")
        self._step += 1

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False

    # trainer-callback interface
    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        self.step()

    def on_fit_end(self, trainer, state):
        self.stop()

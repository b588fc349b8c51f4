"""Profiler (parity: trainer/profile/profiler.py:31-299 NeurosisProfiler).

torch Kineto → jax.profiler: TensorBoard/Perfetto traces with a step-windowed
schedule (skip/wait/warmup/active/repeat). Module spans: Flax wraps every
bound module call in a `jax.named_scope`, so each device op's trace metadata
(`tf_op`) carries the module path; `record_module_names=True` additionally
attaches reference-style depth-limited "[mod]path(Class)" spans
(utils/profiling.py, RecordModuleNames parity — profiler.py:236-299).
`summary()` aggregates the captured trace into a device-time-sorted
key-average table (profiler.py:177-188 `key_averages().table()` parity).
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import logging
from pathlib import Path
from typing import Optional

import jax

from neurosis_tpu.utils.profiling import record_module_names

__all__ = ["ProfilerSchedule", "NeurosisProfiler", "record_module_names"]

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


def _iter_trace_events(trace_dir: Path):
    """Device-op events from the trace's chrome-trace JSON dumps, normalized
    to (name, duration_us, tf_op). TPU events carry device_duration_ps +
    tf_op scope metadata; CPU events carry hlo_op + wall `dur` only."""
    for p in glob.glob(str(trace_dir / "**" / "*trace.json.gz"), recursive=True):
        if p.endswith("perfetto_trace.json.gz"):
            continue  # same events, different packaging
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            args = ev.get("args", {})
            if ev.get("ph") != "X":
                continue
            if ev.get("name", "").isdigit():
                continue  # whole-run region rows named by ordinal, not ops
            if "device_duration_ps" in args:
                yield ev["name"], int(args["device_duration_ps"]) / 1e6, args.get("tf_op", "")
            elif "hlo_op" in args:
                yield ev["name"], float(ev.get("dur", 0.0)), args.get("tf_op", "")


def _mod_key(tf_op: str) -> Optional[str]:
    """Innermost "[mod]path(Class)" span in a tf_op scope path, if any."""
    key = None
    for part in tf_op.split("/"):
        if part.startswith("[mod]"):
            key = part[len("[mod]") :]
    return key


class NeurosisProfiler:
    """Step-driven jax.profiler wrapper; call `step()` once per train step.

    Usage as a trainer callback: profiles `active` steps after warmup, writing
    TensorBoard-compatible traces into auto-numbered run dirs
    (utils/system.py get_next_dir parity). With record_module_names=True the
    Trainer traces the step function under utils/profiling.record_module_names
    so device ops carry "[mod]path(Class)" spans (capture_depth limits the
    module depth, reference profiler.py:152 capture_depth)."""

    def __init__(
        self,
        dirpath: str = "./profiles",
        schedule: Optional[ProfilerSchedule] = None,
        record_module_names: bool = True,
        capture_depth: int = -1,
        row_limit: int = 25,
    ):
        self.schedule = schedule or ProfilerSchedule()
        self.base_dir = Path(dirpath)
        self.record_module_names = record_module_names
        self.capture_depth = capture_depth
        self.row_limit = row_limit
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

    # -- summary (profiler.py:177-188 key_averages().table() parity) --------

    def key_averages(self, by: str = "op") -> list[dict]:
        """Aggregate the captured trace's device events.

        by="op": one row per op name (torch key_averages parity).
        by="module": one row per innermost "[mod]path(Class)" span (ops traced
        outside record_module_names fall under "(no module span)").
        Rows: {key, count, device_time_us, avg_us}, sorted by device time."""
        if self.trace_dir is None:
            return []
        rows: dict[str, list] = {}
        for name, dur_us, tf_op in _iter_trace_events(self.trace_dir):
            key = (_mod_key(tf_op) or "(no module span)") if by == "module" else name
            r = rows.setdefault(key, [0, 0.0])
            r[0] += 1
            r[1] += dur_us
        return sorted(
            (
                {"key": k, "count": c, "device_time_us": t, "avg_us": t / max(c, 1)}
                for k, (c, t) in rows.items()
            ),
            key=lambda r: -r["device_time_us"],
        )

    def summary(self) -> str:
        """Device-time-sorted key-average table (row_limit rows), op-keyed
        plus a module-span section when "[mod]" spans are present."""
        self.stop()
        sections = []
        for by, title in (("op", "op key averages"), ("module", "module spans")):
            rows = self.key_averages(by=by)
            if by == "module" and (not rows or all(r["key"] == "(no module span)" for r in rows)):
                continue
            total = sum(r["device_time_us"] for r in rows) or 1.0
            width = max([len(r["key"][:60]) for r in rows[: self.row_limit]] + [len(title)])
            lines = [
                f"-- {title} " + "-" * max(0, 76 - len(title)),
                f"{'name'.ljust(width)}  {'count':>6}  {'total us':>12}  {'avg us':>10}  {'%':>6}",
            ]
            for r in rows[: self.row_limit]:
                lines.append(
                    f"{r['key'][:60].ljust(width)}  {r['count']:>6}  "
                    f"{r['device_time_us']:>12.1f}  {r['avg_us']:>10.1f}  "
                    f"{100.0 * r['device_time_us'] / total:>5.1f}%"
                )
            sections.append("\n".join(lines))
        return "\n".join(sections)

    # trainer-callback interface
    def on_train_batch_end(self, trainer, state, frozen, batch, metrics, step: int):
        self.step()

    def on_fit_end(self, trainer, state):
        self.stop()
        table = self.summary()
        if table:
            logger.info("profiler summary:\n%s", table)
